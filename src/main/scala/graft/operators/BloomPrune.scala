package graft.operators

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Semi-join reduction via Bloom filter — the explicit form of the runtime
  * filter Spark injects for some shuffle joins (and the classic distributed-
  * join volume killer): build a bloom over the SMALL side's join keys (one
  * partial-aggregated pass), pre-filter the BIG side with a bloom probe
  * BEFORE its exchange, then run the exact join over the survivors. False
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
  * The build side uses Catalyst's own `BloomFilterAggregate` (the exact
  * builder runtime filtering uses); the probe side is graft's
  * [[graft.functions.BloomProbe]], which ships the filter as a BROADCAST
  * rather than Catalyst's literal-in-the-plan `BloomFilterMightContain` — a
  * megabyte-scale literal measurably poisons plan processing (~7× on an
  * otherwise-identical query at 1.27 MB; see BloomProbe's scaladoc), while
  * a broadcast handle keeps the plan tiny at any filter size. Both sides
  * hash with `xxhash64`, so builder and prober can never drift.
  *
  * Contract: `big` and `small` must be DETERMINISTIC plans. The reduced
  * variants evaluate their inputs in more than one job/branch (bloom build
  * vs exact join; definitive-keep vs candidates), so an input derived from
  * `rand`/`monotonically_increasing_id`/unstable sampling can disagree with
  * itself between evaluations and duplicate or drop rows — the standard
  * caveat for any multi-branch reuse of a nondeterministic DataFrame.
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

  /** Probe column: true/false membership of `key` in the serialized bloom,
    * null per row when `bloom` itself is null (empty build side). The
    * deserialized filter is broadcast once; the plan carries a handle.
    */
  def probe(keys: DataFrame, bloom: Array[Byte], key: Column): Column =
    if (bloom == null) lit(null).cast("boolean")
    else {
      val bf = BloomFilter.readFrom(new ByteArrayInputStream(bloom))
      val bc = keys.sparkSession.sparkContext.broadcast(bf)
      GraftExpressionBridge.column(graft.functions.BloomProbe(
        GraftExpressionBridge.expression(xxhash64(key)), bc))
    }

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
    big.filter(probe(big, bloom, col(bigKey)) === lit(true))
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
    val p = probe(big, bloom, col(bigKey))
    val definitiveKeep = big.filter(p.isNull || p === lit(false))
    val candidates = big.filter(p === lit(true))
    val smallKeys = small.select(col(smallKey).as(bigKey))
    definitiveKeep.unionByName(candidates.join(smallKeys, Seq(bigKey), "left_anti"))
  }
}
