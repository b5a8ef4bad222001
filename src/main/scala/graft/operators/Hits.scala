package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS (hubs and authorities) power-iteration kernel over a directed edge
  * list, in the exact-integer UNNORMALIZED form: starting from h₀ ≡ 1,
  * each round computes `a(v) = Σ_{u→v} h(u)` then `h(u) = Σ_{u→v} a(v)` —
  * after k rounds the scores are the classic HITS iterates scaled by a
  * constant, so the RANKING (the part a query consumes) is identical to
  * the L2-normalized fixpoint's k-th iterate while every score stays an
  * exact integer (no per-round normalization division, no fp divergence,
  * no cross-engine sqrt).
  *
  * Scale shape: each half-round is one grouped sum over the edge list
  * keyed by dst (then src) with a broadcast-size score table joined back —
  * the same shuffle pattern as [[PageRank]]; rounds are a fixed small
  * constant, and scores grow like (edge count)^rounds, so keep rounds ≤ 2
  * on long-type scores (documented overflow bound: rounds·log₂|E| ≪ 63).
  */
object Hits {

  /** Two-round exact-integer HITS. `edges` must be (srcCol, dstCol)
    * distinct directed pairs. Returns one row per node appearing on either
    * side: (node, hub, authority) — hub/authority after the second
    * half-rounds, exact longs.
    */
  def hitsCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.select(col(srcCol).as("_s"), col(dstCol).as("_d")).distinct()
    // round 1: h0 = 1  →  a1(v) = in-degree(v)
    val a1 = e.groupBy(col("_d").as("_n")).agg(count(lit(1)).as("_a1"))
    // h1(u) = Σ_{u→v} a1(v)
    val h1 = e.join(a1.withColumnRenamed("_n", "_d"), Seq("_d"))
      .groupBy(col("_s").as("_n")).agg(sum("_a1").as("_h1"))
    // round 2: a2(v) = Σ_{u→v} h1(u)
    val a2 = e.join(h1.withColumnRenamed("_n", "_s"), Seq("_s"))
      .groupBy(col("_d").as("_n")).agg(sum("_h1").as("_a2"))
    // nodes with no outgoing edges have no hub score (0); likewise authority
    h1.join(a2, Seq("_n"), "full_outer")
      .select(
        col("_n").as("node"),
        coalesce(col("_h1"), lit(0L)).as("hub"),
        coalesce(col("_a2"), lit(0L)).as("authority"))
  }
}
