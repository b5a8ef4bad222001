package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Partitions.numShufflePartitions

/** Duplicate clustering: near-dup candidate PAIRS (MinHash/SimHash/embedding
  * output) only say "a ~ b"; deduplicating a corpus needs the transitive
  * closure — connected components — so each duplicate GROUP keeps exactly
  * one canonical document.
  *
  * Components are computed by min-label propagation WITH pointer doubling
  * (the PRAM shortcutting step, the same O(log) device as the
  * large-star/small-star alternation of Kiveris et al., "Connected
  * Components in MapReduce and Beyond"): every node starts labeled with
  * itself; each round a node takes (1) the min of its own and its
  * neighbors' labels, then (2) jumps through its label's label
  * (`l(u) ← l(l(u))`). Step 2 turns the O(diameter) walk of plain
  * propagation into O(log diameter): on a length-n chain the label's reach
  * doubles every round (1, 3, 7, … 2^t−1), so even pathological
  * chain-shaped components converge in ~log₂(n) rounds, while near-dup
  * components (near-cliques — LSH connects most members pairwise) still
  * converge in 2–3. DupClustersSpec pins the chain datapoint.
  *
  * Round-count caveat: the doubling argument needs the min-id node of a
  * window to sit toward the window's boundary, which holds when id ORDER
  * is roughly monotone along long paths (numeric ids, ingestion-ordered
  * ids). An adversarial ordering on a long chain (e.g. unpadded string
  * ids, where "c1" < "c10" < … < "c2") can degrade rounds toward linear —
  * the `maxIter` guard turns that into a loud failure instead of a silent
  * grind. Real dedup graphs are near-cliques and unaffected; synthetic
  * chain fixtures should zero-pad.
  *
  * One ACTION per round: the round's labels are localCheckpoint'ed LAZILY
  * and the convergence count runs over that checkpoint — the single count
  * job materializes the checkpoint (truncating lineage) AND returns the
  * number of changed labels, instead of the checkpoint-job-plus-count-job
  * pair a naive loop pays. Per-round work is three equi-joins keyed by node
  * id (edges⋈labels, labels⋈min, labels-jump), all over tables no larger
  * than the pair graph — never an edge-set rewrite, so a high-degree node
  * cannot blow up intermediate cardinality.
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
    val (labels, _, converged) = run(pairs, aCol, bCol, maxIter)
    // an unconverged result is WRONG (chains still split) — fail loudly; with
    // pointer doubling maxIter=50 covers diameters past 2^49
    if (!converged)
      throw new IllegalStateException(
        s"components did not converge in $maxIter rounds — component diameter exceeds " +
          s"maxIter; raise maxIter or pre-split the graph")
    labels
  }

  /** Rounds the label loop took to converge on `pairs` — the observability
    * twin of [[components]] for Stress/spec datapoints (chain of length n
    * must come in at ~log₂(n) rounds, near-cliques at 2–3).
    */
  def convergenceRounds(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int = 50): Int =
    run(pairs, aCol, bCol, maxIter)._2

  private def run(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int): (DataFrame, Int, Boolean) = {
    // pre-partitioned on dst, the propagate join's key: the |E|-sized side
    // then stays STATIONARY across all ~log(diameter) rounds (cached
    // partitioning satisfies the join's clustering requirement) and only
    // the node-sized label table moves per round. No broadcast — the label
    // table is |V| rows, which for a dedup-pair graph can be corpus-sized.
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      // EXPLICIT partition count: a bare repartition(col) is advisory under
      // AQE, which would coalesce a small cached adjacency to ONE partition
      // and serialize every round through a single task (measured: a 2M-edge
      // graph ground one core for the whole label loop)
      .repartition(numShufflePartitions(pairs), col("dst"))
      .persist()
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("component", col("node"))
      .localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // (1) propagate: l'(u) = min(l(u), min over neighbors v of l(v))
      val neighborMin = edges
        .join(labels.withColumnRenamed("node", "dst2"), col("dst") === col("dst2"))
        .groupBy(col("src"))
        .agg(min(col("component")).as("_nmin"))
      val prop = labels
        .join(neighborMin, labels("node") === neighborMin("src"), "left")
        .select(
          col("node"),
          col("component").as("_old"),
          least(col("component"), coalesce(col("_nmin"), col("component"))).as("_prop"))
      // (2) pointer-double through the ROUND-START labels (already
      // materialized, so this reads the checkpoint, not a recomputed plan):
      // l''(u) = min(l'(u), l(l'(u))). Labels only shrink and every label
      // value is itself a node, so the jump stays inside u's component.
      val jump = labels.select(col("node").as("_jnode"), col("component").as("_jcomp"))
      val doubled = least(col("_prop"), coalesce(col("_jcomp"), col("_prop")))
      val next = prop
        .join(jump, prop("_prop") === jump("_jnode"), "left")
        .select(
          col("node"),
          doubled.as("component"),
          (doubled < col("_old")).as("_changed"))
        .localCheckpoint(false) // lazy: the count below materializes it
      // ONE job: materializes the checkpoint (cutting lineage) and counts
      // changed labels for the convergence test
      val changed = next.filter(col("_changed")).count()
      labels = next.drop("_changed")
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    (labels, iter, converged)
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

  /** The corpus with the BEST doc per duplicate cluster: within each
    * component the member with the highest `qualityCol` survives (tie →
    * smallest id — deterministic), everything else drops; docs in no
    * cluster pass through. The curation-grade survivor policy
    * [[keepCanonical]]'s min-id rule can't express: when near-dups differ
    * (truncation, boilerplate wrappers, OCR noise), keep the longest/
    * cleanest copy, not the one that happens to carry the smallest id.
    *
    * Scale shape: one id-keyed join of the cluster membership onto the
    * corpus quality column, one component-keyed max-of-struct argmax
    * (map-side combined), one anti-join — all membership-sized, never
    * corpus² . `qualityCol` must be integral (cast upstream; exact
    * comparisons, no float ties).
    */
  def keepBest(
      corpus: DataFrame,
      idCol: String,
      qualityCol: String,
      pairsComponents: DataFrame): DataFrame = {
    val members = pairsComponents.select(col("node").as(idCol), col("component"))
    // NULL quality must LOSE, not win: a null struct FIELD sorts first
    // under min(), so an uncoalesced null would beat every real score.
    // MinValue+1 (not MinValue — its negation overflows) ranks nulls last.
    val winners = members
      .join(corpus.select(col(idCol),
        coalesce(col(qualityCol).cast("long"), lit(Long.MinValue + 1)).as("_q")), idCol)
      .groupBy("component")
      // min over (−quality, id): max quality, tie → smallest id
      .agg(min(struct((-col("_q")).as("_nq"), col(idCol).as("_id"))).as("_best"))
      .select(col("_best._id").as(idCol))
    val losers = members.select(col(idCol)).join(winners, Seq(idCol), "left_anti")
    corpus.join(losers, Seq(idCol), "left_anti")
  }
}
