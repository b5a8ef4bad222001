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
  * a pair — for SHORT strings (length ≤ prefixLen + suffixLen) the segments
  * would overlap and an edit inside the overlap escapes both blocks, so all
  * short strings additionally share one block-local bucket and compare
  * quadratically among themselves (a pair within distance 1 has lengths
  * within 1 of each other, so if its min is short, BOTH members are short —
  * the bucket is complete). Size the segments so the short set stays small.
  * Segment lengths are the tuning knob: put the longer segment over the
  * LOW-entropy region (e.g. a constant key prefix) and the shorter one over
  * the high-entropy region, so both block families stay small.
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
    // short strings (where the pigeonhole segments would overlap) emit an
    // extra shared bucket — see the class doc; nulls (the non-short case)
    // are filtered before the explode
    val shortKey = when(
      length(col(strCol)) <= prefixLen + suffixLen, lit("L:short"))
    val segs = explode(filter(
      array(
        concat(lit("P:"), substring(col(strCol), 1, prefixLen)),
        concat(lit("S:"), substring(col(strCol), -suffixLen, suffixLen)),
        shortKey),
      s => s.isNotNull)).as("_seg")
    val keyed = df.select(
      blockCols.map(col) ++ Seq(col(idCol), col(strCol), segs): _*)
    val a = keyed.select(
      blockCols.map(col) ++ Seq(
        col("_seg"), col(idCol).as("id_a"), col(strCol).as("_sa")): _*)
    val b = keyed.select(
      blockCols.map(col) ++ Seq(
        col("_seg"), col(idCol).as("id_b"), col(strCol).as("_sb")): _*)
    a.join(b, blockCols :+ "_seg")
      .filter(col("id_a") < col("id_b"))
      // a pair sharing BOTH segments arrives twice — dedup before the verify
      .select("id_a", "id_b", "_sa", "_sb")
      .distinct()
      .withColumn("dist", levenshtein(col("_sa"), col("_sb"), 1).cast("long"))
      .filter(col("dist") >= 0) // 3-arg levenshtein returns -1 past the threshold
      .select("id_a", "id_b", "dist")
  }
}
