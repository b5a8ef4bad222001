package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — the canonical-composition pass that belongs
  * BEFORE any hash/dedup/join on real-world text (a decomposed `e`+U+0301
  * and a precomposed `é` are different byte strings, so un-normalized
  * corpora silently miss duplicates and split group keys). Spark ships no
  * normalization function; this is the standard Unicode algorithm
  * (java.text.Normalizer, Form NFC) as a codegen'd unary expression,
  * SQL-registered as `nfc_normalize` (DuckDB's `nfc_normalize` implements
  * the same Unicode mapping, which is what the oracle gate leans on).
  *
  * Fast path for the common case: NFC-normalized input (all of ASCII
  * included) is detected by `Normalizer.isNormalized` — a scan, no
  * allocation — and returned as-is, so a 100 TB mostly-ASCII corpus pays
  * ~nothing.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize needs a string input, got ${child.dataType}")

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.normalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {

  /** Column API: `nfc($"text")`. */
  def nfc(c: Column): Column =
    GraftExpressionBridge.column(NfcNormalize(GraftExpressionBridge.expression(c)))

  /** Static kernel shared by interpreted eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
