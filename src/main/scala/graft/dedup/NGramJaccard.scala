package graft.dedup

import graft.text.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact n-gram Jaccard similarity for near-duplicate verification.
  *
  * |A∩B| is computed by the classic unnest → equi-join → count shape rather
  * than array_intersect on paired rows: the join is keyed by the shingle
  * value, so at 100 TB it is one shuffle whose fan-out is bounded by shingle
  * frequency (no quadratic pair materialization before the match). Use a
  * candidate filter (MinHashLsh / SimHash / blocking column) to bound the
  * pair space; Jaccard is then the exact verifier over candidates.
  */
object NGramJaccard {

  /** Distinct word n-gram set of an already-tokenized array column (see
    * [[MinHashLsh.shinglesOfTokens]] on why tokens must be pre-projected).
    */
  def shingleSetOfTokens(t: Column, n: Int): Column =
    array_distinct(MinHashLsh.shinglesOfTokens(t, n))

  /** Distinct word n-gram set of a text column (one-shot expression form). */
  def shingleSet(c: Column, n: Int = 3): Column =
    array_distinct(MinHashLsh.shingles(c, n))

  /** Pairwise Jaccard over all docs sharing `blockCol` (the blocking key
    * bounds the pair space). Returns (id_a, id_b, jaccard) for pairs with
    * at least one shared shingle and jaccard >= minJaccard.
    */
  def pairsWithin(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      n: Int = 3,
      minJaccard: Double = 0.5): DataFrame = {
    // three plan branches (sizes + both explode sides) read this — cache it
    // or the tokenize+shingle projection runs per branch
    val sets = df
      .select(
        col(blockCol).as("_blk"),
        col(idCol).as("_id"),
        TextAnalysis.tokens(col(textCol)).as("_t"))
      .select(col("_blk"), col("_id"), shingleSetOfTokens(col("_t"), n).as("_set"))
      .persist()
    val sizes = sets.select(col("_blk"), col("_id"), size(col("_set")).as("_n"))
    val exploded = sets.select(col("_blk"), col("_id"), explode(col("_set")).as("_sh"))
    val inter = exploded.as("a")
      .join(exploded.as("b"),
        col("a._blk") === col("b._blk") && col("a._sh") === col("b._sh") &&
          col("a._id") < col("b._id"))
      .groupBy(col("a._id").as("id_a"), col("b._id").as("id_b"))
      .agg(count(lit(1)).as("_inter"))
    inter
      .join(sizes.select(col("_id").as("id_a"), col("_n").as("_na")), "id_a")
      .join(sizes.select(col("_id").as("id_b"), col("_n").as("_nb")), "id_b")
      .select(
        col("id_a"),
        col("id_b"),
        (col("_inter").cast("double") /
          (col("_na") + col("_nb") - col("_inter")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Exact Jaccard for an explicit candidate-pair frame (columns id_a, id_b)
    * — the verify stage after LSH.
    */
  def verifyPairs(
      candidates: DataFrame,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3): DataFrame = {
    // both candidate-side joins read the shingle sets — cache them or the
    // tokenize+shingle projection runs twice over the corpus. Sets are
    // value-sorted so the per-pair intersect is a codegen'd merge scan
    // (ArrayFunctions.sortedIntersectSize), not a hash-set + materialized
    // intersection array; |A∪B| = na + nb − o, no second pass.
    val sets = docs
      .select(col(idCol).as("_id"), TextAnalysis.tokens(col(textCol)).as("_t"))
      .select(col("_id"), sort_array(shingleSetOfTokens(col("_t"), n)).as("_set"))
      .persist()
    candidates
      .join(sets.select(col("_id").as("id_a"), col("_set").as("_sa")), "id_a")
      .join(sets.select(col("_id").as("id_b"), col("_set").as("_sb")), "id_b")
      .withColumn("_o",
        graft.functions.ArrayFunctions.sortedIntersectSize(col("_sa"), col("_sb")))
      .select(
        col("id_a"),
        col("id_b"),
        (col("_o").cast("double") /
          (size(col("_sa")) + size(col("_sb")) - col("_o")).cast("double")).as("jaccard"))
  }
}
