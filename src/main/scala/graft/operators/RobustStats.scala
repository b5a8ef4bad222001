package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust per-group outlier statistics: median + MAD (median absolute
  * deviation), the standard-deviation pair that heavy-tailed data doesn't
  * fool — one wild value shifts a mean/stddev arbitrarily but moves a
  * median/MAD by at most one rank.
  *
  * Scale shape: two grouped exact-percentile aggregations (Spark's
  * `percentile` — a per-group sort of that group's values, distributed by
  * the group key) with a broadcast-able stats join between them; groups are
  * the unit of parallelism, so skew follows group size, not value
  * distribution.
  */
object RobustStats {

  /** Per-key (median, MAD, outlier count): a row is an outlier when
    * `|value − median| > k·MAD`. Exact interpolated percentiles throughout —
    * deterministic, engine-reproducible (the q54 recipe).
    */
  def madOutlierStats(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      k: Double = 3.0): DataFrame = {
    val med = df.groupBy(keyCols.map(col): _*)
      .agg(expr(s"percentile($valueCol, 0.5)").as("_med"))
    val withMed = df.join(broadcast(med), keyCols)
    val mad = withMed.groupBy(keyCols.map(col): _*)
      .agg(expr(s"percentile(abs($valueCol - _med), 0.5)").as("_mad"))
    withMed.join(broadcast(mad), keyCols)
      .groupBy((keyCols.map(col) :+ col("_med").as("median") :+ col("_mad").as("mad")): _*)
      .agg(sum(when(abs(col(valueCol) - col("_med")) > lit(k) * col("_mad"), 1L)
        .otherwise(0L)).as("n_outliers"))
  }

  /** Weighted (lower) median: the smallest value whose INCLUSIVE cumulative
    * weight reaches ⌈W/2⌉ — "the price below which half the QUANTITY
    * trades", the robust center estimate when rows carry unequal mass.
    * Weights must be non-negative integers (cast to long).
    *
    * Scale shape: the cumulative weight comes from
    * [[GlobalRank.withRunningTotal]] — a two-pass range-partitioned scan
    * (per-partition sums to the driver, then a stamped second pass), NEVER
    * a single-partition running-sum window; the median pick is then one
    * filter + min aggregate. `tieCols` must make (value, tieCols) a total
    * order — running totals over duplicated keys would be nondeterministic
    * (withRunningTotal enforces this loudly).
    */
  def weightedMedian(
      df: DataFrame,
      valueCol: String,
      weightCol: String,
      tieCols: Seq[String]): DataFrame = {
    val slim = df.select(
      (col(valueCol).as("_v") +: tieCols.map(col)) :+
        col(weightCol).cast("long").as("_w"): _*)
    val total = Option(slim.agg(sum(col("_w"))).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    require(total > 0, "weightedMedian needs positive total weight")
    val half = (total + 1L) / 2L
    GlobalRank.withRunningTotal(slim, "_v" +: tieCols, "_w", "_cum")
      .filter(col("_cum") + col("_w") >= half && col("_w") > 0)
      .agg(min(col("_v")).as("weighted_median"))
  }
}
