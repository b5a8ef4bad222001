package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Semi-join reduction via Bloom filter — the explicit form of the runtime
  * filter Spark injects for some shuffle joins (and the classic distributed-
  * join volume killer): build a bloom over the SMALL side's join keys (one
  * partial-aggregated pass; the sketch is MBs at most and ships to executors
  * as a plan literal), pre-filter the BIG side with `might_contain` BEFORE
  * its exchange, then run the exact join over the survivors. False
  * positives are removed by the exact join, so results are identical —
  * but at 100 TB the big side's shuffle carries ~selectivity× the rows
  * instead of all of them, and with parquet the pre-filter sits right on
  * the scan.
  *
  * The ANTI variant matters most to this engine: the pipeline's
  * cross-file/id-guard dedup (J2/J3, `dedup.Dedup`) is anti-join-shaped, and
  * a bloom NEGATIVE is a definitive "not seen before" — those rows skip the
  * join entirely; only bloom-positive candidates (a sliver, tunable via
  * fpp) pay the exchange.
  *
  * Uses Catalyst's own paired expressions (`BloomFilterAggregate` /
  * `BloomFilterMightContain`, the ones runtime filtering itself uses) via
  * the bridge — not a reimplementation, so builder and prober hashing can
  * never drift.
  */
object BloomPrune {

  /** Serialized bloom over `xxhash64(keyCol)` of `keys`. One aggregate job;
    * partial sketches merge map-side. Returns null when `keys` is empty
    * (the prober treats a null bloom as "might contain nothing").
    */
  def buildBloom(keys: DataFrame, keyCol: String, expectedItems: Long = 1000000L): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      GraftExpressionBridge.expression(xxhash64(col(keyCol))), expectedItems)
    keys.select(GraftExpressionBridge.column(agg.toAggregateExpression()).as("bloom"))
      .head().getAs[Array[Byte]](0)
  }

  /** `might_contain(bloom, xxhash64(key))` — codegen'd probe; null bloom →
    * null (no row passes a positive filter on it).
    */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    GraftExpressionBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      GraftExpressionBridge.expression(xxhash64(key))))

  /** Exact LEFT SEMI join, bloom-reduced: identical rows to
    * `big.join(smallKeys, key, "left_semi")`, but only bloom-positive big
    * rows reach the exchange.
    */
  def semiJoinReduced(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      expectedItems: Long = 1000000L): DataFrame = {
    val bloom = buildBloom(small, smallKey, expectedItems)
    val smallKeys = small.select(col(smallKey).as(bigKey))
    big.filter(mightContain(bloom, col(bigKey)) === lit(true))
      .join(smallKeys, Seq(bigKey), "left_semi")
  }

  /** Exact LEFT ANTI join, bloom-reduced: bloom-NEGATIVE rows are
    * definitively unmatched and bypass the join; only bloom-positive
    * candidates join. Null big keys never equi-match, and a null bloom
    * (empty small side) sends every row down the definitive branch — both
    * exactly the plain anti join's answer.
    *
    * Cost shape: the big side is SCANNED twice (once per branch) but each
    * scan is a pure parquet read + codegen'd probe with no exchange; the
    * trade is two cheap scans for a shuffle that carries only the bloom-
    * positive sliver instead of everything — the right side of the trade
    * whenever the join input dwarfs the true match set, which is exactly
    * the append-mostly dedup case this targets.
    */
  def antiJoinReduced(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      expectedItems: Long = 1000000L): DataFrame = {
    val bloom = buildBloom(small, smallKey, expectedItems)
    val probe = mightContain(bloom, col(bigKey))
    val definitiveKeep = big.filter(probe.isNull || probe === lit(false))
    val candidates = big.filter(probe === lit(true))
    val smallKeys = small.select(col(smallKey).as(bigKey))
    definitiveKeep.unionByName(candidates.join(smallKeys, Seq(bigKey), "left_anti"))
  }
}
