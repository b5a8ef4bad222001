package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Classifier evaluation at corpus scale: per-class confusion counts and
  * precision/recall/F1 from a (truth, prediction) column pair — the
  * score-the-heuristic step a curation pipeline runs every time a filter
  * model (language ID, quality, toxicity) is revised against a labeled
  * slice.
  *
  * Determinism: every metric is ONE IEEE division of exact integer counts
  * (F1 via its rational identity 2·tp / (n_true + n_pred) — algebraically
  * 2PR/(P+R), but with no intermediate rounding), so results are
  * bit-identical across engines with no pinning needed. Undefined metrics
  * (zero denominator: a class never predicted / never true) are NULL, not
  * NaN — NaN is unorderable and engine-dependent in comparisons.
  *
  * Scale shape: two map-side-combined aggregates over the pair stream
  * (keyed by truth and by prediction), full-outer-joined on the class
  * label — |classes| rows after the first shuffle; no windows, no
  * collect.
  */
object Eval {

  /** Per-class metrics: (clazz, n_true, n_pred, tp, precision, recall,
    * f1). `clazz` ranges over labels appearing as truth OR prediction;
    * counts are 0 where a side never saw the class.
    */
  def perClassPrf(df: DataFrame, truthCol: String, predCol: String): DataFrame = {
    val byTruth = df.groupBy(col(truthCol).as("clazz"))
      .agg(
        count(lit(1)).as("n_true"),
        sum(when(col(predCol) === col(truthCol), 1L).otherwise(0L)).as("_tp_t"))
    val byPred = df.groupBy(col(predCol).as("clazz"))
      .agg(count(lit(1)).as("n_pred"))
    byTruth.join(byPred, Seq("clazz"), "full_outer")
      .select(
        col("clazz"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("_tp_t"), lit(0L)).as("tp"))
      .withColumn("precision",
        when(col("n_pred") > 0, col("tp").cast("double") / col("n_pred").cast("double")))
      .withColumn("recall",
        when(col("n_true") > 0, col("tp").cast("double") / col("n_true").cast("double")))
      .withColumn("f1",
        when(col("n_true") + col("n_pred") > 0,
          (lit(2L) * col("tp")).cast("double") /
            (col("n_true") + col("n_pred")).cast("double")))
  }
}
