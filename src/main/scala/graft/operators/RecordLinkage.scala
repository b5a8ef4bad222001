package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage à la Fellegi–Sunter (JASA 1969): candidate
  * pairs from equi-join blocking, then a match score that sums per-field
  * log-odds weights — agreement on a field adds `log(m/u)`, disagreement
  * adds `log((1-m)/(1-u))` — and a threshold splits matches from
  * non-matches. The classic ER scoring layer on top of the library's
  * blocking generators (sorted-neighborhood, LSH, phonetic, …).
  *
  * Weights are INTEGER MILLI-UNITS (e.g. `ln(0.9/0.06)·1000 ≈ +2708`),
  * supplied by the caller from their trained m/u probabilities. Integer
  * weights keep the score an exact 64-bit sum — portable across engines and
  * safe to threshold on (a double log-sum differs in the last ulp with
  * accumulation order, and a threshold sits exactly where that hurts).
  *
  * Scale shape: blocking is one shuffle on the block key (never a cross
  * join); scoring is a codegen'd projection over the pair stream; the
  * threshold filter prunes before anything downstream shuffles again.
  */
object RecordLinkage {

  /** Within-block candidate pairs of `df` against itself: every column of
    * `df` appears twice, prefixed `a_`/`b_`, one row per unordered pair
    * (`a_id < b_id`) sharing all `blockCols`. NULL never blocks with NULL
    * (SQL equality semantics — an unknown key is not evidence of identity).
    */
  def blockedSelfPairs(df: DataFrame, idCol: String, blockCols: Seq[String]): DataFrame = {
    require(blockCols.nonEmpty, "need at least one blocking column")
    val cols = df.columns.toSeq
    val a = df.select(cols.map(c => col(c).as(s"a_$c")): _*)
    val b = df.select(cols.map(c => col(c).as(s"b_$c")): _*)
    val cond = blockCols.map(c => col(s"a_$c") === col(s"b_$c")).reduce(_ && _) &&
      col(s"a_$idCol") < col(s"b_$idCol")
    a.join(b, cond)
  }

  /** The Fellegi–Sunter score: Σ over fields of `when(agree, wAgree)
    * .otherwise(wDisagree)`, each weight in integer milli-log-odds.
    * `evidence` is `(agreePredicate, wAgree, wDisagree)` per field; a NULL
    * predicate result counts as disagreement (unknown ≠ agreement).
    */
  def score(evidence: Seq[(Column, Int, Int)]): Column = {
    require(evidence.nonEmpty, "need at least one evidence field")
    evidence
      .map { case (agree, wa, wd) =>
        when(coalesce(agree, lit(false)), lit(wa.toLong)).otherwise(lit(wd.toLong))
      }
      .reduce(_ + _)
  }

  /** Blocked pairs of `df` scored and thresholded: `(a_*, b_*, link_score)`
    * for pairs with `link_score >= minScore`. `evidence` predicates refer to
    * the `a_`/`b_`-prefixed columns of [[blockedSelfPairs]].
    */
  def linkPairs(
      df: DataFrame,
      idCol: String,
      blockCols: Seq[String],
      evidence: Seq[(Column, Int, Int)],
      minScore: Long): DataFrame =
    blockedSelfPairs(df, idCol, blockCols)
      .withColumn("link_score", score(evidence))
      .filter(col("link_score") >= minScore)
}
