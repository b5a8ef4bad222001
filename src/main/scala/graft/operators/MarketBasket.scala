package graft.operators

import org.apache.spark.sql.DataFrame
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
  * Σ|b|² — cap or sample basket size upstream, the same guard
  * [[graft.sim.Similarity.nearDuplicatePairs]] applies to blocks.
  */
object MarketBasket {

  /** Directional rules A→B (both directions emitted — confidence is
    * asymmetric) with support/confidence/lift in micro-units (exact
    * `floor(x·10⁶ + 0.5)` over one closed-form double each; divide by 10⁶
    * for display). Pairs below `minPairCount` baskets are dropped before
    * any join. Output: (ante, cons, n_a, n_b, n_ab, support_micro,
    * confidence_micro, lift_micro).
    */
  def associationRules(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      minPairCount: Long = 2L): DataFrame = {
    require(minPairCount >= 1, s"minPairCount=$minPairCount must be >= 1")
    val bi = df.select(col(basketCol).as("_bk"), col(itemCol).as("_it")).distinct()
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
