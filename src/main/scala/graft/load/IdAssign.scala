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
    val rdd = sorted.rdd
      .zipWithIndex()
      .map { case (r, i) => Row.fromSeq((i + 1 + offset) +: r.toSeq) }
    spark.createDataFrame(rdd, outSchema)
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
