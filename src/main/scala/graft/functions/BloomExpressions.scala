package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom membership probe against a BROADCAST filter.
  *
  * Catalyst's own `BloomFilterMightContain` takes the serialized filter as a
  * plan-tree literal — fine for the bounded blooms runtime filtering
  * injects, but a megabyte-scale literal makes every plan copy, canonical-
  * ization, and task serialization drag the blob along: measured ~7× slowdown
  * of an otherwise-identical query at a 1.27 MB bloom (ScratchBloom probe,
  * 2026-08-12). This expression keeps the PLAN small — the tree node holds
  * only a broadcast handle; the filter ships to each executor exactly once
  * through torrent broadcast, the same way a broadcast-hash-join build side
  * travels.
  *
  * `child` must be the `xxhash64(...)` long of the probe key — the same
  * hashing `BloomFilterAggregate` applied on the build side, so builder and
  * prober can never drift.
  */
case class BloomProbe(child: Expression, bloomBc: Broadcast[BloomFilter])
  extends UnaryExpression {

  override def prettyName: String = "bloom_probe"
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_probe needs a LONG child (xxhash64 of the key), got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    bloomBc.value.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the broadcast handle is a tiny reference in the generated class; the
    // filter itself is resolved once per executor at first access
    val bcRef = ctx.addReferenceObj("bloomBc", bloomBc, classOf[Broadcast[_]].getName)
    val filterTerm = ctx.addMutableState(
      classOf[BloomFilter].getName, "bloomFilter",
      v => s"$v = (${classOf[BloomFilter].getName}) $bcRef.value();")
    defineCodeGen(ctx, ev, c => s"$filterTerm.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomProbe =
    copy(child = newChild)
}
