package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Association-rule mining over (basket, item) pairs — the classic
  * support / confidence / lift readout ("customers who bought A also
  * bought B") that doubles, in a training-data pipeline, as the
  * co-occurrence audit between corpus attributes (source × language,
  * domain × license): lift > 1 flags attribute pairs that travel together
  * more than independence predicts.
  *
  * All three measures are ratios of EXACT basket counts:
  *
  *   support(A→B)    = n_AB / N
  *   confidence(A→B) = n_AB / n_A
  *   lift(A→B)       = n_AB·N / (n_A·n_B)
  *
  * counted at the DISTINCT (basket, item) grain (a basket holding A twice
  * still supports A once — the standard itemset semantics). Doubles appear
  * only as the final pinned divisions over those integers.
  *
  * Scale shape: one distinct projection of the fact table, one per-item
  * count (map-side combine), one self-equi-join on basket id for the pair
  * counts — the [[graft.dedup]] blocking shape: pairs explode only within
  * a basket, so output is Σ_b |b|², bounded by basket size, never N². The
  * `minPairCount` floor is applied ON THE COUNT AGGREGATE before the
  * measure joins, so low-support noise never reaches the join stage. A
  * pathological mega-basket (one basket = half the corpus) would dominate
  * Σ|b|² — [[MarketBasket.capBaskets]] is the upstream guard (the same
  * skew discipline [[graft.sim.Similarity.nearDuplicatePairs]] applies to
  * blocks), wired in via `maxBasket`.
  */
object MarketBasket {

  /** Basket-size guard for pair mining: distinct (basket, item) rows with
    * every basket trimmed to its `maxBasket` RAREST items (global item
    * frequency ascending, item id ascending as the deterministic
    * tiebreak — the [[graft.dedup.PrefixJoin]] rarest-token discipline).
    * Pair mining downstream of this is bounded at maxBasket²/2 pairs per
    * basket key, so one pathological 10⁵-item basket (a crawler session,
    * a catch-all account) can no longer put 10¹⁰ pairs on a single
    * shuffle key. Keeping the RAREST items is the standard
    * information-preserving trim: a mega-basket's frequent items produce
    * the least-surprising pairs (lift ≈ 1 by construction), so they are
    * the statistically cheapest rows to drop.
    *
    * Scale shape: one map-side-combined item-frequency aggregate
    * (item-type-table-sized, AQE broadcasts it), then a window ranked
    * WITHIN each basket — partitioned by basket id, the exact key the
    * downstream self-join shuffles on, so the exchange is reused; no
    * global sort, no driver state.
    */
  def capBaskets(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      maxBasket: Int): DataFrame = {
    require(maxBasket >= 1, s"maxBasket=$maxBasket must be >= 1")
    val bi = df.select(col(basketCol).as("_bk"), col(itemCol).as("_it")).distinct()
    val freq = bi.groupBy("_it").agg(count(lit(1)).as("_nf"))
    val w = Window.partitionBy("_bk").orderBy(col("_nf").asc, col("_it").asc)
    bi.join(freq, "_it")
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= maxBasket)
      .select(col("_bk").as(basketCol), col("_it").as(itemCol))
  }

  /** Directional rules A→B (both directions emitted — confidence is
    * asymmetric) with support/confidence/lift in micro-units (exact
    * `floor(x·10⁶ + 0.5)` over one closed-form double each; divide by 10⁶
    * for display). Pairs below `minPairCount` baskets are dropped before
    * any join. Output: (ante, cons, n_a, n_b, n_ab, support_micro,
    * confidence_micro, lift_micro). `maxBasket` (default: uncapped for
    * exact semantics) trims oversized baskets to their rarest items via
    * [[capBaskets]] BEFORE any counting — set it on data where a single
    * basket can grow unbounded.
    */
  def associationRules(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      minPairCount: Long = 2L,
      maxBasket: Int = Int.MaxValue): DataFrame = {
    require(minPairCount >= 1, s"minPairCount=$minPairCount must be >= 1")
    val src =
      if (maxBasket == Int.MaxValue) df
      else capBaskets(df, basketCol, itemCol, maxBasket)
    val bi = src.select(col(basketCol).as("_bk"), col(itemCol).as("_it")).distinct()
    val n = bi.agg(countDistinct("_bk").as("_n"))
    val itemN = bi.groupBy("_it").agg(count(lit(1)).as("_ni"))
    val pairs = bi.select(col("_bk"), col("_it").as("ante"))
      .join(bi.select(col("_bk"), col("_it").as("cons")), "_bk")
      .filter(col("ante") =!= col("cons"))
      .groupBy("ante", "cons")
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)
    def micro(x: org.apache.spark.sql.Column) = floor(x * 1e6 + 0.5).cast("long")
    pairs
      .join(itemN.select(col("_it").as("ante"), col("_ni").as("n_a")), "ante")
      .join(itemN.select(col("_it").as("cons"), col("_ni").as("n_b")), "cons")
      .crossJoin(broadcast(n))
      .select(
        col("ante"), col("cons"), col("n_a"), col("n_b"), col("n_ab"),
        micro(col("n_ab").cast("double") / col("_n").cast("double")).as("support_micro"),
        micro(col("n_ab").cast("double") / col("n_a").cast("double")).as("confidence_micro"),
        micro((col("n_ab") * col("_n")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("lift_micro"))
  }
}
