package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-round k-core peeling: repeatedly delete nodes of degree < k (and
  * their incident edges). The k-core — the maximal subgraph where every node
  * keeps degree ≥ k — is the standard "dense cohesive region" extractor for
  * spam rings, community seeds, and co-occurrence noise floors; one round is
  * NOT enough because deletions cascade (removing a weak node can drag its
  * neighbors below k).
  *
  * A fixed `rounds` count rather than a convergence test keeps the plan
  * static — at 100 TB you run r deterministic peel stages (each: one
  * map-side-combined degree count + two semi-joins), checkpointing between
  * them, not a driver convergence loop; the fixpoint is reached when a round
  * deletes nothing, and r = O(peeling depth), which on real power-law graphs
  * is small. Mirrors [[PageRank.ranks]]' iteration discipline: persist per
  * round so each round's lineage starts from materialized edges, not from
  * the (re-executed) upstream mining plan.
  */
object KCore {

  /** @param edges  undirected edge list as (a, b) pairs, deduplicated,
    *               self-loop-free; each pair in EITHER orientation, once
    * @param k      minimum degree to survive a round
    * @param rounds peel rounds (>= 1)
    * @return (node, deg): nodes surviving `rounds` peels, with their degree
    *         in the surviving subgraph (the input to round `rounds`+1)
    */
  def peel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    require(rounds >= 1, s"rounds=$rounds must be >= 1")
    val half = edges.select(col("a"), col("b"))
    // symmetrize: per-node degree = out-degree in the doubled list
    var sym = half
      .select(col("a").as("s"), col("b").as("d"))
      .union(half.select(col("b").as("s"), col("a").as("d")))
      .persist()
    val n = sym.count() // materialize before the mining plan goes out of scope
    // size the loop's partitioning to the GRAPH, not the session default:
    // each peel round is degree-agg + two semi-joins, and on a small graph
    // 32-partition shuffles make every round pure scheduling overhead
    // (measured 3x the whole-query time on a 435-edge graph). ~100k edges
    // per partition keeps one round one task per core at any real size;
    // the session cap still applies on big graphs.
    val parts = math.max(1L, math.min(n / 100000L,
      sym.sparkSession.sessionState.conf.numShufflePartitions.toLong)).toInt
    if (parts < sym.rdd.getNumPartitions) {
      val re = sym.repartition(parts, col("s")).persist()
      re.count()
      sym.unpersist()
      sym = re
    }
    for (_ <- 1 to rounds) {
      val alive = sym.groupBy("s").agg(count(lit(1)).as("_deg"))
        .filter(col("_deg") >= k)
        .select(col("s").as("_n"))
      val next = sym
        .join(alive.withColumnRenamed("_n", "s"), Seq("s"), "left_semi")
        .join(alive.withColumnRenamed("_n", "d"), Seq("d"), "left_semi")
        .select("s", "d")
        .persist()
      next.count()
      sym.unpersist()
      sym = next
    }
    sym.groupBy(col("s").as("node")).agg(count(lit(1)).as("deg"))
  }
}
