package graft.dedup

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: remove training documents that overlap an
  * evaluation set — standard hygiene for any corpus that feeds a model
  * whose benchmarks must stay meaningful. Overlap = sharing at least one
  * word k-shingle with any benchmark document (the n-gram–collision
  * definition used by public LM data pipelines).
  *
  * Scale shape: the benchmark side is small by construction (eval sets are
  * thousands of docs, not billions), so its distinct shingle set BROADCASTS
  * and the flag pass is a broadcast semi-join against the exploded corpus
  * shingles — the 100 TB corpus is never shuffled. If the benchmark side
  * ever outgrows the broadcast threshold, Catalyst falls back to a shuffled
  * semi-join on the shingle key automatically (the explode keys are already
  * the join keys).
  */
object Decontaminate {

  /** Distinct shingles of the benchmark set. Tokens go through a projection
    * boundary first — see [[MinHashLsh.shinglesOfTokens]] on why.
    */
  def benchmarkShingles(bench: DataFrame, textCol: String, k: Int): DataFrame =
    bench
      .select(graft.text.TextAnalysis.tokens(col(textCol)).as("_t"))
      .select(explode(MinHashLsh.shinglesOfTokens(col("_t"), k)).as("_sh"))
      .distinct()

  /** Ids of corpus docs sharing ≥1 k-shingle with the benchmark set. */
  def contaminatedIds(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      bench: DataFrame,
      benchTextCol: String,
      k: Int = 5): DataFrame =
    corpus
      .select(col(idCol), graft.text.TextAnalysis.tokens(col(textCol)).as("_t"))
      .select(col(idCol), explode(MinHashLsh.shinglesOfTokens(col("_t"), k)).as("_sh"))
      .join(broadcast(benchmarkShingles(bench, benchTextCol, k)), Seq("_sh"), "left_semi")
      .select(idCol)
      .distinct()

  /** The corpus minus contaminated docs (anti-join on the flagged id set —
    * itself small, so it broadcasts too).
    */
  def removeContaminated(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      bench: DataFrame,
      benchTextCol: String,
      k: Int = 5): DataFrame =
    corpus.join(
      contaminatedIds(corpus, idCol, textCol, bench, benchTextCol, k),
      Seq(idCol),
      "left_anti")
}
