package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro-Winkler similarity — the ER/fuzzy-match scorer Spark lacks
  * (`functions.levenshtein` is the only built-in string distance).
  *
  * Semantics match the classic Winkler formulation (and DuckDB's
  * `jaro_winkler_similarity`, which the oracle gate uses): Jaro similarity
  * with match window `max(|a|,|b|)/2 - 1` and half-transposition counting,
  * then the prefix boost `j + p·0.1·(1-j)` applied only when `j > 0.7`
  * (boost threshold) with common-prefix length `p` capped at 4. Either
  * string empty → 0.0 (both-empty included — DuckDB's convention).
  *
  * The whole computation is one static call inside whole-stage codegen
  * (like the built-in `levenshtein`), so a blocked candidate-pair join
  * scoring millions of pairs never leaves the generated loop.
  */
case class JaroWinklerSim(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler needs string inputs, got ${left.dataType} / ${right.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerSim.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.JaroWinklerSim.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaro_winkler"
}

object JaroWinklerSim {

  /** Column API: `jaroWinkler($"a", $"b")`. */
  def jaroWinkler(a: Column, b: Column): Column =
    GraftExpressionBridge.column(JaroWinklerSim(
      GraftExpressionBridge.expression(a),
      GraftExpressionBridge.expression(b)))

  /** Static kernel, called from both interpreted eval and generated code.
    * Operates on java chars: identical to code-point iteration for BMP text,
    * and the supplementary-plane case only shifts which units pair up —
    * both engines treat the inputs as unit sequences the same way for the
    * oracle's ASCII data.
    */
  def similarity(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (a == b) return 1.0
    val md = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - md)
      val hi = math.min(l2, i + md + 1)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!m2(j) && b.charAt(j) == a.charAt(i)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // half-transpositions: walk matched chars of both strings in order
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val j = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    if (j > 0.7) {
      var p = 0
      val pmax = math.min(4, math.min(l1, l2))
      while (p < pmax && a.charAt(p) == b.charAt(p)) p += 1
      j + p * 0.1 * (1.0 - j)
    } else j
  }
}
