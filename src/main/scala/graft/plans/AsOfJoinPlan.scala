package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Native as-of join: whole-operator Catalyst extension (logical node →
  * planner strategy → physical merge operator), the tier below composing
  * built-ins when an operator deserves its own execution.
  *
  * Child contract (established by [[graft.operators.AsOfJoin]]'s API, not
  * re-checked here): each child's output starts with `numKeys` equi-key
  * columns, then ONE event-time column (same type both sides), then
  * payload. For every left row the operator emits the right payload of the
  * LAST right row with equal keys and `rightTime <= leftTime`, else nulls —
  * a left as-of-backward join.
  *
  * Scale shape: requiredChildDistribution clusters both sides on the keys
  * and requiredChildOrdering sorts each partition by (keys, time), so
  * EnsureRequirements plans exactly the SortMergeJoin layout: one exchange
  * per side, then a SINGLE forward merge pass per partition — no range
  * nested loop, no per-row probe, memory O(1) beyond one buffered right
  * row. The union+window formulation ([[graft.operators.AsOfJoin
  * .lastPriorMatch]]) needs the same one shuffle but materializes the
  * combined sides through a window sort; this operator streams them.
  */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan, numKeys: Int)
    extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.drop(numKeys + 1).map(_.withNullability(true))

  // the child contract is POSITIONAL (keys, time, payload): mark every child
  // column as referenced or ColumnPruning strips the key/time columns the
  // operator consumes but does not emit upstream. Callers project before
  // building the node, so there is nothing useful to prune here anyway.
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(left.output ++ right.output)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] as [[AsOfJoinExec]]; injected via
  * `SparkSessionExtensions.injectPlannerStrategy` in
  * [[graft.functions.GraftExtensions]].
  */
object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, k) => AsOfJoinExec(planLater(l), planLater(r), k) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan, numKeys: Int)
    extends BinaryExecNode {

  private def leftKeys: Seq[Attribute] = left.output.take(numKeys)
  private def rightKeys: Seq[Attribute] = right.output.take(numKeys)
  private def leftTime: Attribute = left.output(numKeys)
  private def rightTime: Attribute = right.output(numKeys)
  private def rightValues: Seq[Attribute] = right.output.drop(numKeys + 1)

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  // the merge emits left rows in their incoming order
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val rVals = rightValues
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyGen = UnsafeProjection.create(lKeys, lOut)
      val rKeyGen = UnsafeProjection.create(rKeys, rOut)
      val lTimeGen = UnsafeProjection.create(Seq(lTime), lOut)
      val rTimeGen = UnsafeProjection.create(Seq(rTime), rOut)
      val rValGen = UnsafeProjection.create(rVals, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTime.dataType))
      // bind the result projection against NULLABLE right-value slots: the
      // unmatched case substitutes an all-null row, and a non-nullable
      // BoundReference would read raw zeros instead of null
      val resultGen = UnsafeProjection.create(outAttrs, lOut ++ rVals.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rVals.size)

      var rCur: InternalRow = if (rIter.hasNext) rIter.next() else null
      // last consumed right row's key + payload (the as-of candidate)
      var candKey: InternalRow = null
      var candVal: InternalRow = null

      lIter.map { lRow =>
        val lKey = lKeyGen(lRow)
        val lT = lTimeGen(lRow)
        // consume right rows that are behind this left row: earlier keys are
        // skipped, equal-key rows at time <= lT become the candidate (later
        // ones overwrite earlier — "last prior" semantics)
        var scanning = rCur != null
        while (scanning) {
          val rKey = rKeyGen(rCur)
          val cmp = keyOrd.compare(rKey, lKey)
          if (cmp < 0) {
            rCur = if (rIter.hasNext) rIter.next() else null
          } else if (cmp == 0 && timeOrd.compare(rTimeGen(rCur), lT) <= 0) {
            candKey = rKey.copy()
            candVal = rValGen(rCur).copy()
            rCur = if (rIter.hasNext) rIter.next() else null
          } else {
            scanning = false
          }
          if (rCur == null) scanning = false
        }
        val matched = candKey != null && keyOrd.compare(candKey, lKey) == 0
        resultGen(joined(lRow, if (matched) candVal else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
