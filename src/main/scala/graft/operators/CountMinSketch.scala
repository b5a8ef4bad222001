package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch as a DataFrame program: a (depth × width) grid of
  * counters where occurrence x increments cell (r, h_r(x)) for each of the
  * `depth` hash rows, and a point estimate is the MIN over rows — an upper
  * bound on the true count that tightens as width grows (ε ≈ e/width of the
  * stream length, error probability ≈ e^−depth).
  *
  * The hash family is md5-derived (`h_r(x) = int(md5(r ‖ ":" ‖ x)[0:6]) mod
  * width`) like every portable recipe in this library, so the sketch —
  * including its collisions — is bit-identical in any engine: the oracle
  * rebuilds the same grid in SQL and must land the same estimates.
  *
  * Scale shape: building is explode(depth rows/occurrence) → one map-side-
  * combined count keyed by (row, cell) — the sketch TABLE is at most
  * depth·width rows regardless of stream size, which is the whole point:
  * a fixed-size summary of an unbounded stream, mergeable across batches by
  * summing cells (`merge`). Estimation joins the probe keys against that
  * tiny table (AQE broadcasts it).
  */
object CountMinSketch {

  private def cell(seed: Int, key: Column, width: Int): Column =
    conv(substring(md5(concat(lit(seed.toString), lit(":"), key.cast("string"))), 1, 6), 16, 10)
      .cast("long") % width

  /** Sketch table (row, cell, c) from a column of occurrences (one input
    * row = one occurrence).
    */
  def build(df: DataFrame, key: Column, depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth > 0 && width > 0, s"need positive depth/width, got $depth/$width")
    df.select(posexplode(array((0 until depth).map(r => cell(r, key, width)): _*))
        .as(Seq("row", "cell")))
      .groupBy("row", "cell")
      .agg(count(lit(1)).as("c"))
  }

  /** Merge two sketches built with the SAME (depth, width): cell-wise sum —
    * the streaming/partitioned-build composition law.
    */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("row", "cell").agg(sum("c").as("c"))

  /** Point estimates for `keys` (any extra columns are carried through):
    * min over the depth rows of the key's cell counters; keys the sketch
    * never saw estimate 0. `keys` must be row-distinct over its columns —
    * the groupBy that re-folds the depth probes collapses exact-duplicate
    * rows to one output row — and must not use this operator's internal
    * column names (required below, matching the library's reserved-column
    * convention — cf. temperatureRebalance).
    */
  def estimate(
      sketch: DataFrame,
      keys: DataFrame,
      keyCol: String,
      depth: Int = 4,
      width: Int = 256): DataFrame = {
    require(depth > 0 && width > 0, s"need positive depth/width, got $depth/$width")
    Seq("row", "cell", "c", "_p").foreach(r =>
      require(
        !keys.columns.contains(r),
        s"keys must not contain reserved column '$r' (internal to CountMinSketch.estimate)"))
    val probeStructs = array((0 until depth).map(r =>
      struct(lit(r).cast("int").as("row"), cell(r, col(keyCol), width).as("cell"))): _*)
    val probes = keys
      .withColumn("_p", explode(probeStructs))
      .withColumn("row", col("_p.row"))
      .withColumn("cell", col("_p.cell"))
      .drop("_p")
    probes
      .join(sketch, Seq("row", "cell"), "left")
      .groupBy(keys.columns.map(col): _*)
      .agg(min(coalesce(col("c"), lit(0L))).as("cm_est"))
  }
}
