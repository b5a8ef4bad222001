package graft.load

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers.
  *
  * AQE's skew-join handling covers joins at runtime; for aggregations over
  * heavily skewed keys (a handful of keys holding most rows — the classic
  * shape of event-type or language columns at 100 TB) the standard fix is
  * salting: a two-phase aggregate where phase 1 spreads each hot key over
  * `saltBuckets` reducers and phase 2 merges the partials. Results are
  * identical to the direct aggregate for decomposable aggregates
  * (sum/count/min/max).
  */
object Skew {

  /** Salted two-phase sum/count aggregation.
    *
    * @param df         input
    * @param keyCols    grouping keys (the skewed dimension)
    * @param sums       columns to sum, name-preserving
    * @param saltBuckets fan-out per key in phase 1
    */
  def saltedAggregate(
      df: DataFrame,
      keyCols: Seq[String],
      sums: Seq[String],
      saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt", contentSalt(df, saltBuckets))
    val p1Aggs = count(lit(1)).as("_cnt") +: sums.map(c => sum(col(c)).as(s"_sum_$c"))
    val phase1 = salted
      .groupBy((keyCols :+ "_salt").map(col): _*)
      .agg(p1Aggs.head, p1Aggs.tail: _*)
    val p2Aggs = sum(col("_cnt")).as("n") +: sums.map(c => sum(col(s"_sum_$c")).as(s"sum_$c"))
    phase1
      .groupBy(keyCols.map(col): _*)
      .agg(p2Aggs.head, p2Aggs.tail: _*)
  }

  /** Salted join for a skewed big side: each big row gets one of
    * `saltBuckets` salts, the small side is replicated across ALL salts,
    * and the equi-join runs on (keys, salt) — a hot key's rows now spread
    * over `saltBuckets` reducers instead of one straggler task. Output is
    * row-identical to the unsalted join.
    *
    * Only `inner` and `left` are sound: each big row carries exactly one
    * salt (so big-side rows never duplicate), but an unmatched SMALL row
    * exists `saltBuckets` times — right/full outer would fabricate copies.
    *
    * Prefer AQE's runtime skew-join handling first; this is for the cases
    * it misses (skew appearing after filters, or a key so hot one split
    * still straggles).
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keyCols: Seq[String],
      saltBuckets: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left", "left_outer", "leftouter").contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left joins only, got $joinType")
    val salted = big.withColumn("_salt", contentSalt(big, saltBuckets))
    // long-typed sequence so the salt key types match without wrapping the
    // generator in a cast (a top-level generator must stay bare)
    val replicated = small.withColumn(
      "_salt", explode(sequence(lit(0L), lit((saltBuckets - 1).toLong))))
    salted.join(replicated, keyCols :+ "_salt", joinType).drop("_salt")
  }

  /** Salt derived from row CONTENT, not physical position: a task retried
    * after a fetch failure recomputes its rows in a possibly different order,
    * so `spark_partition_id() + monotonically_increasing_id()` could re-salt
    * the same row into a different bucket mid-query (the SPARK-23207 class of
    * shuffle-repartition bugs) — duplicating or dropping join output rows.
    * A content hash (map columns excluded — xxhash64 rejects them) is stable
    * across retries and partitionings; hashing the full row (not just the
    * keys — that would put each hot key back on one reducer) spreads a hot
    * key's rows whenever anything else in the row varies.
    *
    * Limit, by construction: rows IDENTICAL in every column land in one
    * bucket — no deterministic function can distinguish them. That is
    * harmless for [[saltedAggregate]] (map-side partial aggregation already
    * collapses exact duplicates to one row per map task before the
    * exchange, so no reducer straggles), but for [[saltedJoin]] a hot key
    * whose rows are exact duplicates should be pre-aggregated to
    * (row, count) and re-expanded after the join instead of salted.
    */
  private def contentSalt(df: DataFrame, saltBuckets: Int): Column =
    pmod(graft.functions.ContentHash.stableRowHash(df), lit(saltBuckets.toLong))
}
