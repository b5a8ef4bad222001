package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-width histogram quantile SKETCH — the one-pass, mergeable
  * complement to [[GlobalRank]]'s exact two-pass quantiles: bin counts are
  * a single map-side-combined aggregate (each executor emits ≤ #bins
  * partials), they merge by plain addition across batches/days/clusters,
  * and any quantile reads off the cumulative histogram. Exactly the
  * telemetry shape (p50/p95/p99 dashboards, SLA monitors) where a
  * re-sortable corpus doesn't exist — streams, incremental loads — and a
  * deterministic, engine-portable answer beats half a ulp of precision.
  *
  * Error contract: the reported quantile is exact AT BIN RESOLUTION — the
  * true quantile lies in [lo, hi] of the reported bin, so `width` IS the
  * error bound. Deterministic by construction: integer bin ids
  * (`value div width`), integer cumulative counts, and the ceil test
  * `1000·cum ≥ q·n` — no interpolation, no floats, identical in any
  * engine.
  *
  * Values are NON-NEGATIVE LONGS (scale upstream: cents, micros, bytes).
  * The bin table is value-range/width rows — pick `width` so that stays
  * in the thousands; the cumulative window runs over THAT bounded table,
  * never the input.
  */
object HistogramSketch {

  /** The sketch itself: (bin, cnt) counts over `df(valueCol)` — the state
    * a stream/batch-incremental pipeline STORES. NULL values are ignored.
    */
  def binCounts(df: DataFrame, valueCol: String, width: Long): DataFrame = {
    require(width >= 1, s"width=$width must be >= 1")
    df.filter(col(valueCol).isNotNull)
      .groupBy(expr(s"$valueCol div ${width}L").as("bin"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge law: bin counts ADD. Merging a day's partial into the stored
    * table is one bounded aggregate over (≤ 2·#bins) rows.
    */
  def mergeBins(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("bin").agg(sum("cnt").as("cnt"))

  /** Quantile readout from a stored (bin, cnt) table — see
    * [[quantileEdges]] for the output contract.
    */
  def quantilesFromBins(
      bins: DataFrame,
      width: Long,
      quantilesPermille: Seq[Int]): DataFrame = {
    require(width >= 1, s"width=$width must be >= 1")
    require(
      quantilesPermille.nonEmpty && quantilesPermille.forall(q => q >= 1 && q <= 1000),
      s"quantiles=$quantilesPermille must be in [1, 1000] per-mille")
    val spark = bins.sparkSession
    import spark.implicits._
    // both windows run over the BOUNDED bin table (≤ range/width rows)
    val cum = bins
      .withColumn("cum_le",
        sum("cnt").over(Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n", sum("cnt").over())
    val qs = quantilesPermille.distinct.sorted.toDF("q_permille")
    cum
      .join(broadcast(qs), lit(1000L) * col("cum_le") >= col("q_permille") * col("n"))
      .groupBy("q_permille")
      .agg(min(struct(col("bin"), col("cum_le"), col("n"))).as("_first"))
      .select(
        col("q_permille"),
        col("_first.bin").as("bin"),
        (col("_first.bin") * width).as("lo"),
        (col("_first.bin") * width + (width - 1)).as("hi"),
        col("_first.cum_le").as("cum_le"),
        col("_first.n").as("n"))
  }

  /** Per-requested-quantile bin edges over `df(valueCol)`:
    * (q_permille, bin, lo, hi, cum_le, n) where bin is the FIRST bin whose
    * cumulative count reaches ⌈q·n/1000⌉, [lo, hi] its inclusive value
    * range, cum_le its cumulative count, n the total. NULL values are
    * ignored; an empty input yields no rows.
    */
  def quantileEdges(
      df: DataFrame,
      valueCol: String,
      width: Long,
      quantilesPermille: Seq[Int]): DataFrame =
    quantilesFromBins(binCounts(df, valueCol, width), width, quantilesPermille)
}
