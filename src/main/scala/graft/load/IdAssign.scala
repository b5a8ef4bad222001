package graft.load

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** P3 — dense, monotonically increasing surrogate ids resuming from a
  * watermark (reference: `df.insert(0,'id', range(last_id+1, ...))`,
  * `util/data_pushing.py:329-331`).
  *
  * Two strategies behind one interface (SURVEY.md §7.4 item 1):
  *  - [[denseIdsWindow]]: `row_number()` over a global order — exact semantic
  *    match, but the window collapses to ONE partition; fine for
  *    reference-scale batches (~10⁷ rows), wrong at 100 TB.
  *  - [[denseIds]]: sort once, then per-partition offsets via
  *    `zipWithIndex` — no single-partition bottleneck, one extra count pass;
  *    this is the scale path and the default.
  */
object IdAssign {

  /** Scalable dense ids: range-repartition by the order columns (so ids follow
    * the global order), then per-partition offsets. `zipWithIndex` is the one
    * sanctioned RDD drop-down: genuinely per-partition imperative logic.
    */
  def denseIds(
      df: DataFrame,
      offset: Long,
      orderCols: Seq[String],
      idCol: String = "id"): DataFrame = {
    val spark = df.sparkSession
    val sorted =
      if (orderCols.isEmpty) df
      else df.repartitionByRange(orderCols.map(col): _*).sortWithinPartitions(orderCols.map(col): _*)
    val outSchema = StructType(StructField(idCol, LongType, nullable = false) +: sorted.schema.fields)
    // both passes run over the INTERNAL row RDD (the [[graft.operators
    // .GlobalRank]] stamp shape; the range shuffle's files are reused
    // between them): the old `rdd.zipWithIndex` + `createDataFrame` pair
    // field-by-field deserialized every row to an external Row and
    // converted it back — for a fact-table id stamp the double conversion
    // cost more than the shuffle. Pass 1 collects per-partition row
    // counts (O(partitions) longs — the same job zipWithIndex ran); pass
    // 2 prepends `offset(partition) + local position` behind the reused
    // shuffle. The prepended struct and the JoinedRow are reused per
    // partition — the standard SparkPlan output contract.
    val rdd = graft.operators.Lineage.internalRdd(sorted)
    val sizes = rdd.mapPartitions(
      it => Iterator.single(it.size.toLong), preservesPartitioning = true).collect()
    val offsets = sizes.scanLeft(0L)(_ + _)
    val stamped = rdd.mapPartitionsWithIndex { (pid, it) =>
      var i = offsets(pid) + offset
      val prepended = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
      it.map { r =>
        i += 1
        prepended.update(0, i)
        joined(prepended, r): org.apache.spark.sql.catalyst.InternalRow
      }
    }
    graft.operators.Lineage.internalDataFrame(spark, stamped, outSchema)
  }

  /** Exact single-window variant — use only when the batch is known-small. */
  def denseIdsWindow(
      df: DataFrame,
      offset: Long,
      orderCols: Seq[String],
      idCol: String = "id"): DataFrame = {
    val w = Window.orderBy(orderCols.map(col): _*)
    df.withColumn(idCol, row_number().over(w).cast("long") + lit(offset))
      .select((idCol +: df.columns.toSeq).map(col): _*)
  }
}
