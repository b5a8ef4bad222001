package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate clustering: near-dup candidate PAIRS (MinHash/SimHash/embedding
  * output) only say "a ~ b"; deduplicating a corpus needs the transitive
  * closure — connected components — so each duplicate GROUP keeps exactly
  * one canonical document.
  *
  * Components are computed by iterative min-label propagation (the
  * Pregel/GraphX shape without the GraphX dependency): every node starts
  * labeled with itself; each round every node takes the min of its own and
  * its neighbors' labels; fixpoint = each node labeled with the smallest id
  * in its component.
  *
  * Scale shape: one join + one aggregate per round, all keyed by node id —
  * the same exchange reused; rounds needed = component diameter, and
  * near-dup components are shallow (near-cliques — LSH connects most
  * members pairwise), so 3–5 rounds typically converge. Labels persist per
  * round and localCheckpoint cuts the growing lineage; the convergence
  * check is one count per round (the unavoidable action of any iterative
  * fixpoint, GraphX included).
  */
object DupClusters {

  /** (node, component) for every node appearing in `pairs`; component = min
    * node id reachable. Nodes absent from `pairs` are their own singleton
    * components and are NOT emitted (join back with a left join + coalesce
    * if you need them).
    */
  def components(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int = 50): DataFrame = {
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .persist()
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("component", col("node"))
      .persist()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("node", "dst2"), col("dst") === col("dst2"))
        .groupBy(col("src"))
        .agg(min(col("component")).as("_nmin"))
      val next = labels
        .join(neighborMin, labels("node") === neighborMin("src"), "left")
        .select(
          col("node"),
          least(col("component"), coalesce(col("_nmin"), col("component"))).as("component"),
          (col("component") > coalesce(col("_nmin"), col("component"))).as("_changed"))
        .localCheckpoint() // cut the per-round lineage growth
      val changed = next.filter(col("_changed")).limit(1).count()
      val prev = labels
      labels = next.drop("_changed").persist()
      prev.unpersist()
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    // the last round's labels are backed by an eager localCheckpoint, so the
    // cache handle can be released here — callers get materialized data and
    // nothing leaks into long-lived cache state (one processBatch per batch
    // in CorpusPipeline would otherwise accumulate forever)
    labels.unpersist()
    // an unconverged result is WRONG (chains still split) — fail loudly; a
    // diameter past maxIter=50 means the input is not a near-dup pair graph
    if (!converged)
      throw new IllegalStateException(
        s"components did not converge in $maxIter rounds — component diameter exceeds " +
          s"maxIter; raise maxIter or pre-split the graph")
    labels
  }

  /** The corpus with one canonical doc per duplicate cluster: members whose
    * id is NOT the cluster minimum are dropped; docs in no cluster pass
    * through.
    */
  def keepCanonical(corpus: DataFrame, idCol: String, pairsComponents: DataFrame): DataFrame = {
    val losers = pairsComponents
      .filter(col("node") =!= col("component"))
      .select(col("node").as(idCol))
    corpus.join(losers, Seq(idCol), "left_anti")
  }
}
