package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-OVERLAP join — "which events fall inside which maintenance
  * windows", "which shipments straddle which audit periods" — the range
  * predicate (`s1 <= e2 AND s2 <= e1`) that a naive spelling plans as a
  * cartesian product: Catalyst has no equi-key to hash on, so BOTH sides
  * replicate to every task and the work is |L|·|R| regardless of how few
  * pairs actually overlap.
  *
  * The scale formulation every range-join implementation uses (bucketed /
  * grid join): quantize the timeline into `grain`-sized buckets, explode
  * each interval to the buckets it spans, equi-join on the bucket id, then
  * re-check the exact predicate. Work becomes Σ spans·matches-per-bucket —
  * output-sized for intervals ≪ `grain` apart — and the join is an
  * ordinary keyed shuffle that partitions across a cluster.
  *
  * Each overlapping pair would surface once PER SHARED BUCKET, so the
  * standard dedup trick is applied instead of a `distinct` shuffle: a pair
  * is emitted only from the single bucket containing the LATER of the two
  * interval starts (`bucket == floor(max(s1, s2) / grain)`) — every
  * overlapping pair has exactly one such bucket, so the join output is
  * exact without a second aggregate.
  *
  * Pick `grain` near the typical interval length: much smaller explodes
  * long intervals into many buckets; much larger packs unrelated intervals
  * into the same bucket (degrading toward the cartesian). Skewed hot
  * buckets (a day every interval touches) are an AQE skew-join case — the
  * bucket id is an ordinary join key, so runtime skew splitting applies.
  *
  * Bounds are NON-NEGATIVE LONGS (epoch days/seconds/micros — caller's
  * choice; `div` truncates toward zero, so negative bounds would quantize
  * inconsistently), inclusive on both ends; every comparison is
  * integer-exact.
  */
object IntervalJoin {

  /** Overlapping pairs of `left(lCols*, lStart, lEnd)` ×
    * `right(rCols*, rStart, rEnd)`: all columns of both inputs, one row
    * per pair with `max(lStart, rStart) <= min(lEnd, rEnd)`. Column names
    * must be disjoint. Degenerate (end < start) intervals never match.
    */
  def overlapJoin(
      left: DataFrame,
      lStart: String,
      lEnd: String,
      right: DataFrame,
      rStart: String,
      rEnd: String,
      grain: Long): DataFrame = {
    require(grain >= 1, s"grain=$grain must be >= 1")
    require(
      left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "left/right column names must be disjoint")
    val reserved = Set("_bkt", "_bkt2")
    require(
      !(left.columns ++ right.columns).exists(reserved),
      s"column names ${reserved.mkString(", ")} are reserved by overlapJoin")
    def buckets(df: DataFrame, s: String, e: String): DataFrame = df
      .filter(col(s) <= col(e))
      .withColumn(
        "_bkt",
        explode(sequence(
          expr(s"$s div ${grain}L"),
          expr(s"$e div ${grain}L"))))
    buckets(left, lStart, lEnd)
      .join(
        buckets(right, rStart, rEnd).withColumnRenamed("_bkt", "_bkt2"),
        col("_bkt") === col("_bkt2"))
      .filter(
        greatest(col(lStart), col(rStart)) <= least(col(lEnd), col(rEnd)) &&
          col("_bkt") === expr(s"greatest($lStart, $rStart) div ${grain}L"))
      .drop("_bkt", "_bkt2")
  }
}
