package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single most recent right row with
  * `rightTime <= leftTime` on the same key (the time-series "last known
  * value" join).
  *
  * Implemented as UNION + keyed window (last non-null over time order) —
  * ONE shuffle on (key), no range-condition nested loop, no per-row probe:
  * the scale-correct shape. A naive `left.join(right, key && rt <= lt)` +
  * groupBy-max would explode to |matches| intermediate rows; this stays
  * linear in |left| + |right|.
  */
object AsOfJoin {

  /** @param left      probe side
    * @param right     reference side (its `valueCols` are appended)
    * @param keyCols   equi-join keys
    * @param leftTime  left event-time column name
    * @param rightTime right event-time column name
    * @param valueCols right columns to carry (emitted as `asof_<name>`)
    */
  def lastPriorMatch(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .select((keyCols.map(col) :+ col("_t") :+ col("_side")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"_rv_$c")) ++
        leftCols.filterNot(keyCols.contains).map(col): _*)
    val r = right
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .select((keyCols.map(col) :+ col("_t") :+ col("_side")) ++
        valueCols.map(c => col(c).as(s"_rv_$c")) ++
        leftCols.filterNot(keyCols.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)): _*)
    // right rows sort BEFORE left rows at equal time → `<=` as-of semantics
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .select(
        (keyCols.map(col) ++ leftCols.filterNot(keyCols.contains).map(col) :+
          col("_side")) ++
          valueCols.map(c => last(col(s"_rv_$c"), ignoreNulls = true).over(w).as(s"asof_$c")): _*)
    matched.filter(col("_side") === 1).drop("_side")
  }

  /** [[lastPriorMatch]] executed by the NATIVE merge operator
    * ([[graft.plans.AsOfJoinExec]]): same semantics and output layout, but a
    * single streaming merge pass per partition instead of a union + window
    * sort over both sides combined. Requires a session built with
    * [[graft.functions.GraftExtensions]] (GraftSession sessions are).
    */
  def lastPriorMatchNative(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      valueCols: Seq[String]): DataFrame = {
    require(left.schema(leftTime).dataType == right.schema(rightTime).dataType,
      s"as-of time columns must share a type: " +
        s"${left.schema(leftTime).dataType} vs ${right.schema(rightTime).dataType}")
    // the exec's merge ordering is built from the LEFT key types and applied
    // to both sides' key rows — a type mismatch would compare raw bytes of
    // differently-typed UnsafeRows and silently mis-match
    keyCols.foreach { k =>
      require(left.schema(k).dataType == right.schema(k).dataType,
        s"as-of key column $k must share a type: " +
          s"${left.schema(k).dataType} vs ${right.schema(k).dataType}")
    }
    // child contract of AsOfJoinNode: keys, time, payload
    val restL = left.columns.toSeq.filterNot(c => keyCols.contains(c) || c == leftTime)
    val l = left.select((keyCols :+ leftTime).map(col) ++ restL.map(col): _*)
    val r = right.select(
      (keyCols :+ rightTime).map(col) ++ valueCols.map(c => col(c).as(s"asof_$c")): _*)
    val node = graft.plans.AsOfJoinNode(
      l.queryExecution.analyzed, r.queryExecution.analyzed, keyCols.size)
    org.apache.spark.sql.GraftExpressionBridge.dataFrame(left.sparkSession, node)
      // same column layout as lastPriorMatch: keys, remaining left, asof_*
      .select(
        (keyCols.map(col) ++ left.columns.toSeq.filterNot(keyCols.contains).map(col)) ++
          valueCols.map(c => col(s"asof_$c")): _*)
  }
}
