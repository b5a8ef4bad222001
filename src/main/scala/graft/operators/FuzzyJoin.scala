package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance self-join via pigeonhole segment blocking (the PassJoin
  * family): a single edit cannot touch both a prefix segment and an
  * end-anchored suffix segment, so every pair within distance 1 shares the
  * first `prefixLen` characters exactly OR the last `suffixLen` characters
  * exactly (anchored from the END, which keeps the suffix stable under
  * insertions/deletions earlier in the string). Candidates are therefore an
  * EQUI-join on (block, segment) — never a quadratic cross-join — and the
  * banded 3-arg `levenshtein` (early exit past the threshold, O(k·n) per
  * pair) verifies exactly.
  *
  * The pigeonhole argument needs `prefixLen + suffixLen <= min(length)` of
  * a pair (call that sum T) — for pairs whose MIN length is < T the
  * segments would overlap and an edit inside the overlap escapes both
  * blocks. Those pairs are covered by length-keyed short buckets with
  * ASYMMETRIC probe/index keys: the probe side emits `L:<len>` only for
  * len < T, the index side emits `L:<len>` (len < T) and `L:<len-1>`
  * (len ≤ T). A short pair (m, m) or (m, m+1) with m < T then meets on
  * `L:<m>`, while two strings of length exactly T — already sound under
  * the pigeonhole — emit NO bucket keys at all: a uniform-length corpus at
  * T pays nothing (a symmetric bucket would re-create the quadratic join
  * the operator exists to avoid). Asymmetric keys find some pairs in only
  * one (a,b) orientation, so pair ids are normalized with least/greatest
  * before the distinct.
  * Segment lengths are the tuning knob: put the longer segment over the
  * LOW-entropy region (e.g. a constant key prefix) and the shorter one over
  * the high-entropy region, so both block families stay small.
  *
  * SCALE CAVEAT: the short buckets are keyed by (block, length) only, so a
  * corpus DOMINATED by same-length strings below T compares quadratically
  * inside those buckets. The near-linear guarantee holds when strings
  * shorter than prefixLen + suffixLen are rare — size the segments to the
  * data (T at or below the typical length), or pre-partition short strings
  * into their own call with smaller segments.
  *
  * Scale shape: 2 segment rows per input row, one shuffle keyed by
  * (block, segment). Bucket fan-out is bounded by segment-value frequency —
  * the same guarantee LSH banding gives MinHash. At 100 TB the verify step
  * only ever sees the near-linear candidate set.
  */
object FuzzyJoin {

  /** Distinct (id_a, id_b, dist) pairs with dist ≤ 1, id_a < id_b, within
    * equal values of `blockCols`.
    */
  def pairsWithinOne(
      df: DataFrame,
      idCol: String,
      strCol: String,
      blockCols: Seq[String],
      prefixLen: Int,
      suffixLen: Int): DataFrame = {
    require(prefixLen > 0 && suffixLen > 0, "segment lengths must be positive")
    val t = prefixLen + suffixLen
    val len = length(col(strCol))
    val segKeys = Seq(
      concat(lit("P:"), substring(col(strCol), 1, prefixLen)),
      concat(lit("S:"), substring(col(strCol), -suffixLen, suffixLen)))
    // asymmetric short-pair coverage (see class doc): probe side adds
    // L:<len> for len < T; index side adds L:<len> (len < T) and L:<len-1>
    // (len ≤ T) — equal-T strings emit nothing extra
    def keyedSide(extra: Seq[Column], idAs: String, strAs: String) = {
      val segs = explode(filter(array(segKeys.map(_.cast("string")) ++ extra: _*),
        s => s.isNotNull)).as("_seg")
      df.select(blockCols.map(col) ++ Seq(col(idCol).as(idAs), col(strCol).as(strAs), segs): _*)
    }
    val a = keyedSide(
      Seq(when(len < t, concat(lit("L:"), len))), "id_a", "_sa")
    val b = keyedSide(
      Seq(
        when(len < t, concat(lit("L:"), len)),
        when(len <= t, concat(lit("L:"), len - 1))), "id_b", "_sb")
    a.join(b, blockCols :+ "_seg")
      // symmetric P/S keys find every pair in both orientations — keep one;
      // asymmetric L keys may only produce one orientation — keep either
      .filter(
        when(col("_seg").startsWith("L:"), col("id_a") =!= col("id_b"))
          .otherwise(col("id_a") < col("id_b")))
      // asymmetric keys can find a pair in one orientation only — normalize,
      // then dedup the multi-segment / both-orientation copies
      .select(
        least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"),
        when(col("id_a") < col("id_b"), col("_sa")).otherwise(col("_sb")).as("_sa"),
        when(col("id_a") < col("id_b"), col("_sb")).otherwise(col("_sa")).as("_sb"))
      .distinct()
      .withColumn("dist", levenshtein(col("_sa"), col("_sb"), 1).cast("long"))
      .filter(col("dist") >= 0) // 3-arg levenshtein returns -1 past the threshold
      .select("id_a", "id_b", "dist")
  }

  /** Sorted-neighborhood ER blocking (Hernández–Stolfo): rank all records
    * under ONE global sort key, then verify only pairs within `window`
    * rank positions — candidates O(N·w) regardless of value distribution,
    * the method of choice when no natural equi-block exists or blocks are
    * hugely skewed (the q139-style segment block degrades on a 10⁸-row
    * block; rank windows cannot).
    *
    * Distributed shape: [[GlobalRank.withRowNumber]] supplies the global
    * rank with NO Window/SinglePartition stage; rank-window candidates
    * come from an EQUI-join on the rank bucket `rn div window` (a pair
    * within `window` ranks spans at most adjacent buckets, so the probe
    * side explodes to [bucket, bucket+1] — 2 keys/row, never a range
    * join); the levenshtein verify runs only inside the window (and the
    * BandedLevenshtein rule rewrites it to the O(d·n) banded form).
    *
    * Returns (id_a, id_b, dist) with id_a < id_b, dist ≤ `maxDist`.
    * Caveat inherited from the method: matches sorting FAR apart (e.g. a
    * corrupted first character) need a second pass under a different key
    * — compose two calls and union, the standard multi-pass recipe.
    */
  def sortedNeighborhoodPairs(
      df: DataFrame,
      idCol: String,
      strCol: String,
      window: Int,
      maxDist: Int): DataFrame = {
    require(window >= 1, s"window=$window must be >= 1")
    require(maxDist >= 0, s"maxDist=$maxDist must be >= 0")
    val ranked = GlobalRank
      .withRowNumber(df.select(col(idCol), col(strCol)), Seq(strCol, idCol), "_rn", "_n")
      .withColumn("_b", expr(s"_rn div $window"))
    val probe = ranked
      .withColumn("_pb", explode(array(col("_b"), col("_b") + 1)))
      .select(col("_pb"), col("_rn").as("_ra"),
        col(idCol).as("_ia"), col(strCol).as("_sa"))
    val index = ranked
      .select(col("_b").as("_pb"), col("_rn").as("_rb"),
        col(idCol).as("_ib"), col(strCol).as("_sb"))
    probe.join(index, "_pb")
      .filter(col("_rb") > col("_ra") && col("_rb") <= col("_ra") + window)
      .withColumn("dist", levenshtein(col("_sa"), col("_sb")).cast("int"))
      .filter(col("dist") <= maxDist)
      .select(
        least(col("_ia"), col("_ib")).as("id_a"),
        greatest(col("_ia"), col("_ib")).as("id_b"),
        col("dist"))
  }
}
