package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge for graft's custom Catalyst expressions.
  *
  * Spark 4 moved Column construction behind `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`); extension libraries
  * conventionally expose it through a shim in the sql package. This is the
  * only file outside the `graft` namespace.
  */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame over an arbitrary LogicalPlan (e.g. a custom operator node) —
    * `Dataset.ofRows` is `private[sql]` in Spark 4.
    */
  def dataFrame(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
