package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression for the set-similarity verify hot path.
  *
  * `size(array_intersect(a, b))` builds a hash set AND materializes the
  * intersection ARRAY per pair — at hundreds of thousands of candidate
  * pairs (PrefixJoin verify at 100 TB: billions), that is a per-pair
  * allocation storm for a value we immediately reduce to its length. When
  * both inputs are SORTED and duplicate-free (set semantics — exactly what
  * [[graft.dedup.PrefixJoin]]'s canonical shingle sets are), the
  * intersection size is one allocation-free merge scan. Stays inside
  * whole-stage codegen like [[DotProduct]].
  *
  * CONTRACT: inputs must be ascending-sorted arrays of non-null strings
  * (binary UTF8 order — `sort_array`'s order). Unsorted input silently
  * undercounts; this is the documented precondition, not a checked one
  * (checking would cost the pass the expression exists to save).
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_size needs array<string> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < n && j < m) {
      val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val cmp = ctx.freshName("cmp")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $n && $j < $m) {
         |  int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect_size"
}

object ArrayFunctions {

  /** Codegen'd merge-scan |A∩B| of two ascending-sorted string-set columns. */
  def sortedIntersectSize(a: Column, b: Column): Column =
    GraftExpressionBridge.column(SortedIntersectSize(
      GraftExpressionBridge.expression(a), GraftExpressionBridge.expression(b)))
}
