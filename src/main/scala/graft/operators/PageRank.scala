package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an edge list, in SCALED-INTEGER
  * arithmetic: ranks are `Long`s in units of `scale⁻¹`, every step is
  * integer division and integer sums, so the result is bit-identical across
  * engines and independent of aggregation order (double sums are not
  * associative; long sums are). The classic damping update, d = 17/20:
  *
  *   r'(v) = (3·scale) div 20  +  (17 · Σ_{u→v} (r(u) div deg(u))) div 20
  *
  * This is the power-iteration shape every distributed PageRank uses
  * (contributions keyed by edge, one shuffle per iteration on dst); a fixed
  * iteration count rather than a convergence test keeps the plan static —
  * at 100 TB you run k iterations as k deterministic stages, checkpointing
  * between them, not a driver-side convergence loop over collect()s.
  *
  * Simplifications, both standard and documented: dangling mass (nodes
  * without out-edges) is dropped, not redistributed — feed an undirected
  * graph (each edge in both directions) and none exist; `div` truncation
  * loses < 1 unit per edge per iteration (set `scale` high enough that
  * deg · iterations ≪ scale).
  *
  * Integer headroom: 17 · Σ contrib ≤ 17 · (total mass) = 17 · N · scale
  * must stay below 2⁶³ — at the default scale 10¹² that bounds N at
  * ~5·10⁵ nodes; pass scale = 10⁶ for billion-node graphs (rank resolution
  * trades off against node count — same ratio semantics).
  */
object PageRank {

  /** `edges`: (src, dst) string columns, pre-deduplicated. Returns
    * (node, rank) with rank in `scale⁻¹` units after `iters` updates from
    * the uniform start r₀ = scale.
    *
    * Join strategy: the rank table is NODE-sized while the edge list is
    * EDGE-sized — on power-law graphs orders of magnitude apart — so with
    * `broadcastRanks` (default) each iteration broadcast-joins the rank
    * table into one edge scan and the only shuffle is the map-side-combined
    * contribution sum (≤ |nodes| rows per partition). Two stage-count
    * economies keep an iteration at exactly ONE broadcast + ONE shuffle
    * (iterative jobs pay per-stage scheduler latency `iters` times, and on
    * a real cluster every extra exchange is a barrier):
    *   - out-degree folds into the edge list ONCE before the loop
    *     (`(src, dst, _deg)`), instead of a second per-iteration join;
    *   - zero-in-degree nodes are kept by UNIONING a node-sized zero-
    *     contribution row set into the same aggregation, instead of a
    *     per-iteration left join back onto the node table (a union is a
    *     free concatenation, not a stage).
    * The edge list itself never moves. Set `broadcastRanks` false past
    * broadcast size (~billions of nodes) to fall back to src-keyed shuffle
    * joins — the degree-folded edge list is persisted ALREADY PARTITIONED
    * on src (from its one-time degree join), so across iterations only the
    * node-sized rank table shuffles.
    *
    * `undirected = true` declares every edge is present in BOTH directions
    * (the common way this op is fed — q148's bipartite graph, any mutual-
    * link graph). Then src-set == dst-set == node-set, so the setup skips
    * the nodes union+distinct shuffle entirely (degree keys ARE the
    * nodes), and — since every node has in-edges — the per-iteration
    * zero-contribution union drops too: each iteration is exactly the
    * edge scan + one map-combined shuffle, nothing else in the plan.
    */
  def ranks(
      edges: DataFrame,
      iters: Int,
      scale: Long = 1000000000000L,
      broadcastRanks: Boolean = true,
      undirected: Boolean = false): DataFrame = {
    require(iters >= 1, s"iters=$iters must be >= 1")
    require(scale % 20 == 0, s"scale=$scale must be divisible by 20 (exact 0.15/0.85 split)")
    // every iteration re-reads both; without the persist the edge list's
    // upstream plan (often a distinct over a fact-table scan) would
    // execute per iteration
    val e = edges.select(col("src"), col("dst")).persist()
    val small = (df: DataFrame) => if (broadcastRanks) broadcast(df) else df
    val deg = e.groupBy("src").agg(count(lit(1)).as("_deg"))
    // deg is node-sized: under broadcastRanks the one-time fold is also a
    // broadcast join, so the edge list is cached UNSHUFFLED; on the
    // shuffle fallback the join partitions ed by src — exactly what the
    // per-iteration rank join then reuses
    val ed = e.join(small(deg), "src").persist()
    val nodes =
      if (undirected) deg.select(col("src").as("node")).persist()
      else e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node")))
        .distinct()
        .persist()
    val zero = nodes.select(col("node"), lit(0L).as("_c"))
    var r = nodes.select(col("node"), lit(scale).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = ed
        .join(small(r.withColumnRenamed("node", "src").withColumnRenamed("rank", "_r")), "src")
        .select(col("dst").as("node"), expr("_r div _deg").as("_c"))
      r = (if (undirected) contrib else contrib.unionByName(zero))
        .groupBy("node")
        .agg(sum("_c").as("_in"))
        .select(
          col("node"),
          (lit(3L * (scale / 20)) + expr(s"(17 * _in) div 20")).as("rank"))
    }
    r
  }

  /** PERSONALIZED PageRank: same scaled-integer power iteration, but the
    * (1−d) restart mass teleports to a SOURCE SET instead of everywhere —
    * "importance as seen from these seeds", the relevance spreader behind
    * related-item panels and seed-expansion labeling. `sources` is a
    * one-column (node) frame; restart mass splits equally across it
    * (r₀ = scale at each source, 0 elsewhere; each iteration adds
    * 3·scale/20 at sources only). Non-source nodes keep only propagated
    * mass, so rank decays with seed distance — exactly the locality that
    * distinguishes PPR from the global walk.
    *
    * Scale shape identical to [[ranks]]: per-iteration broadcast of the
    * node-sized rank table into one edge scan + one map-combined sum; the
    * source table broadcasts (seed sets are small by use-case).
    */
  def personalizedRanks(
      edges: DataFrame,
      sources: DataFrame,
      iters: Int,
      scale: Long = 1000000000000L,
      broadcastRanks: Boolean = true,
      sparse: Boolean = false): DataFrame = {
    require(iters >= 1, s"iters=$iters must be >= 1")
    require(scale % 20 == 0, s"scale=$scale must be divisible by 20 (exact 0.15/0.85 split)")
    val e = edges.select(col("src"), col("dst")).persist()
    val small = (df: DataFrame) => if (broadcastRanks) broadcast(df) else df
    val deg = e.groupBy("src").agg(count(lit(1)).as("_deg"))
    // deg is node-sized: under broadcastRanks the one-time fold is also a
    // broadcast join, so the edge list is cached UNSHUFFLED; on the
    // shuffle fallback the join partitions ed by src — exactly what the
    // per-iteration rank join then reuses
    val ed = e.join(small(deg), "src").persist()
    if (sparse) return sparsePersonalized(ed, sources, iters, scale, small)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .persist()
    val src = sources.select(col(sources.columns.head).as("node"))
      .distinct().withColumn("_is_src", lit(1L))
    val seeded = nodes.join(small(src), Seq("node"), "left")
      .withColumn("_is_src", coalesce(col("_is_src"), lit(0L)))
      .persist()
    // same stage economy as [[ranks]]: degree folded into the edge list,
    // zero-contribution rows unioned in instead of a join back onto the
    // seeded node table. Every node gets EXACTLY ONE zero row, which also
    // carries its restart flag — max(_f) over {flag, 0, 0, …} recovers it
    // after the aggregation without a second join.
    val zero = seeded.select(col("node"), col("_is_src").as("_f"), lit(0L).as("_c"))
    var r = seeded.select(col("node"), (col("_is_src") * scale).as("rank"))
    for (_ <- 1 to iters) {
      r = ed
        .join(small(r.withColumnRenamed("node", "src").withColumnRenamed("rank", "_r")), "src")
        .select(col("dst").as("node"), lit(0L).as("_f"), expr("_r div _deg").as("_c"))
        .unionByName(zero)
        .groupBy("node")
        .agg(max(col("_f")).as("_is_src"), sum(col("_c")).as("_in"))
        .select(
          col("node"),
          (col("_is_src") * lit(3L * (scale / 20)) +
            expr(s"(17 * _in) div 20")).as("rank"))
    }
    r
  }

  /** SPARSE personalized ranks: only nodes carrying NONZERO rank ever
    * materialize. PPR mass starts at the seeds and spreads one hop per
    * iteration, so after k iterations only the k-hop seed neighborhood
    * is nonzero — on a large graph that's a vanishing fraction of the
    * node set, and the dense path's nodes union+distinct shuffle, the
    * node-sized seeded join, and the node-sized per-iteration zero union
    * all buy nothing but stages (callers of PPR filter `rank > 0`
    * downstream anyway — that's what "personalized" is FOR). Here setup
    * is just the degree fold; each iteration is one edge scan against
    * the frontier-sized rank broadcast + one map-combined shuffle, with
    * only the seed rows unioned in to keep their restart mass.
    *
    * Contract difference from the dense path, and why it's opt-in:
    * zero-rank nodes are ABSENT instead of present-with-zero (a reached
    * node whose every in-contribution truncates to zero still appears,
    * with rank 0 — identical to dense after a `rank > 0` filter either
    * way). Rank VALUES are bit-identical to the dense path on every
    * emitted node.
    */
  private def sparsePersonalized(
      ed: DataFrame,
      sources: DataFrame,
      iters: Int,
      scale: Long,
      small: DataFrame => DataFrame): DataFrame = {
    val seed = sources.select(col(sources.columns.head).as("node"))
      .distinct().persist()
    val zero = seed.select(col("node"), lit(1L).as("_f"), lit(0L).as("_c"))
    var r = seed.select(col("node"), lit(scale).as("rank"))
    for (_ <- 1 to iters) {
      r = ed
        .join(small(r.withColumnRenamed("node", "src").withColumnRenamed("rank", "_r")), "src")
        .select(col("dst").as("node"), lit(0L).as("_f"), expr("_r div _deg").as("_c"))
        .unionByName(zero)
        .groupBy("node")
        .agg(max(col("_f")).as("_is_src"), sum(col("_c")).as("_in"))
        .select(
          col("node"),
          (col("_is_src") * lit(3L * (scale / 20)) +
            expr(s"(17 * _in) div 20")).as("rank"))
    }
    r
  }
}
