package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import Partitions.numShufflePartitions

/** Bounded-round single/multi-source BFS over an undirected edge list —
  * unweighted shortest-path levels ("how far is every node from the
  * seed set?"), the reachability-with-distance primitive behind
  * influence radii, link-distance audits of a citation/co-occurrence
  * graph, and "within k hops of a known-bad node" contamination sweeps.
  *
  * Like [[PageRank]] / [[KCore]] / [[Communities]], rounds are a FIXED
  * budget (level-synchronous Bellman-Ford relaxation): after `rounds`
  * rounds every node within that hop distance carries its exact level;
  * farther nodes are absent. Each round is one keyed join (frontier ⋈
  * adjacency) + one min-aggregate — |E|-bounded shuffles, no windows, no
  * driver data paths; distances are exact longs, so the result is
  * engine-reproducible with no tie-break subtleties (min is min).
  *
  * Frontier optimization deliberately NOT applied (joining only
  * last-round's newly-settled nodes): the fixed-round unrolled-oracle
  * contract keeps the whole-labels join, whose cost is the same
  * O(|E|)/round shape — at a 100 TB graph you'd flip to delta-frontier
  * joins plus localCheckpoint per round, the [[graft.dedup.DupClusters]]
  * iteration pattern, without changing any semantics.
  */
object ShortestPath {

  /** (node, dist) for every node within `rounds` hops of `sources` —
    * sources at dist 0. `sources` is a 1-column DataFrame of node ids
    * (any set: one node, a predicate's result, a known-bad list).
    */
  def bfsLevels(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      sources: DataFrame,
      rounds: Int): DataFrame = {
    require(rounds >= 0, s"rounds=$rounds must be >= 0")
    val und = edges
      .select(col(srcCol).as("_a"), col(dstCol).as("_b"))
      .filter(col("_a") =!= col("_b"))
    // partitioned ONCE on the relaxation key and cached: the |E|-sized
    // adjacency then never re-shuffles — each round moves only the
    // frontier (≤ |V| rows). The [[graft.dedup.DupClusters]] discipline.
    val adj = und.union(und.select(col("_b").as("_a"), col("_a").as("_b")))
      .repartition(numShufflePartitions(edges), col("_a"))
      .persist()
    var dist = sources.toDF("node").distinct().withColumn("dist", lit(0L))
    for (_ <- 1 to rounds) {
      val relaxed = dist
        .join(adj, dist("node") === adj("_a"))
        .select(col("_b").as("node"), (col("dist") + 1L).as("dist"))
      dist = dist.union(relaxed).groupBy("node").agg(min("dist").as("dist"))
    }
    dist
  }

  /** Per-seed BFS levels for MANY seeds in ONE traversal: (seed, node,
    * dist) for every node within `rounds` hops of each seed. Identical
    * semantics to running [[bfsLevels]] once per seed, but the frontier
    * carries the seed as part of its key, so k seeds cost the SAME number
    * of join stages as one — the per-run plan/stage overhead of k
    * sequential traversals (measured 12.8 s → 1.3 s for 5 seeds on the
    * q278 bigram graph) is the difference between "centrality of a seed
    * set" being practical and not. Shuffle per round is |E|·k worst case
    * (each seed's frontier relaxes independently) — the inherent cost of
    * exact per-seed distances.
    */
  def bfsLevelsFrom(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: DataFrame,
      rounds: Int): DataFrame = {
    require(rounds >= 0, s"rounds=$rounds must be >= 0")
    val und = edges
      .select(col(srcCol).as("_a"), col(dstCol).as("_b"))
      .filter(col("_a") =!= col("_b"))
    // same stationary-adjacency economy as [[bfsLevels]]
    val adj = und.union(und.select(col("_b").as("_a"), col("_a").as("_b")))
      .repartition(numShufflePartitions(edges), col("_a"))
      .persist()
    var dist = seeds.toDF("seed").distinct()
      .select(col("seed"), col("seed").as("node"), lit(0L).as("dist"))
    for (_ <- 1 to rounds) {
      val relaxed = dist
        .join(adj, dist("node") === adj("_a"))
        .select(col("seed"), col("_b").as("node"), (col("dist") + 1L).as("dist"))
      // lazy pin per round (the DupClusters discipline — [[Lineage.pin]],
      // not localCheckpoint, so carried stats can't compound): the union
      // chain otherwise embeds the previous round TWICE per level —
      // 2^rounds plan copies that exchange reuse only partially dedupes
      dist = Lineage.pin(
        dist.union(relaxed).groupBy("seed", "node").agg(min("dist").as("dist")))
    }
    dist
  }
}
