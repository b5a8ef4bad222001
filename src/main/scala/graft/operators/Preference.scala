package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Preference-pair construction — the RLHF/DPO data step: per prompt,
  * the best- and worst-scored completions become one (chosen, rejected)
  * training pair. One grouped aggregate (two max/min-structs riding the
  * same shuffle — map-side combined, never a per-prompt window), fully
  * deterministic tie-breaks, tie-only prompts dropped (a pair with zero
  * margin teaches nothing and DPO losses divide by it).
  *
  *  - chosen  = highest score, ties → LOWEST candidate id;
  *  - rejected = lowest score, ties → HIGHEST candidate id;
  *  - emitted only when margin = chosen_score − rejected_score > 0.
  */
object Preference {

  def preferencePairs(
      df: DataFrame,
      promptCol: String,
      candidateCol: String,
      scoreCol: String): DataFrame =
    df.groupBy(col(promptCol))
      .agg(
        count(lit(1)).as("n_candidates"),
        max(struct(col(scoreCol).as("_s"), (-col(candidateCol)).as("_negc"),
          col(candidateCol).as("_c"))).as("_best"),
        min(struct(col(scoreCol).as("_s"), (-col(candidateCol)).as("_negc"),
          col(candidateCol).as("_c"))).as("_worst"))
      .filter(col("n_candidates") >= 2 && col("_best._s") > col("_worst._s"))
      .select(
        col(promptCol),
        col("n_candidates"),
        col("_best._c").as("chosen"),
        col("_best._s").as("chosen_score"),
        col("_worst._c").as("rejected"),
        col("_worst._s").as("rejected_score"),
        (col("_best._s") - col("_worst._s")).as("margin"))
}
