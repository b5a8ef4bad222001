package graft.load

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction planning: given a file inventory (partition key,
  * file id, size), assign files to target-size output bins WITHIN each
  * partition — the maintenance pass every long-lived lakehouse table needs
  * once streaming ingest has littered it with kilobyte parquet files. The
  * plan is declarative (a bin id per file + per-bin rollups); executing it
  * is a `coalesce`/rewrite per bin that the caller schedules.
  *
  * Bin assignment is the concat-then-split rule: files ordered by id
  * within their partition, exclusive prefix sum of sizes, `bin = cum div
  * target` — deterministic, one pass, and bins overflow by at most one
  * file (the classic next-fit guarantee), which is the right trade at
  * scale: first-fit-decreasing packs ~0.2% tighter but is inherently
  * sequential per partition, while next-fit is a pure window expression.
  *
  * Scale shape: ONE window partitioned by the table partition key (the
  * unit of parallelism — a partition's file list is bounded by retention,
  * never corpus-sized) + one grouped rollup. The within-partition prefix
  * sum never collapses to a single task because it is partitioned; for a
  * GLOBAL (unpartitioned) pack use [[graft.operators.GlobalRank]]'s
  * running total instead (the q113 manifest shape).
  */
object Compaction {

  /** Per-bin compaction plan: (partition keys…, bin, n_files, bytes,
    * first/last file id, fill_micro = bytes·10⁶ div target). Files larger
    * than `targetBytes` land alone in their own bin (next-fit closes the
    * previous bin once the running total passes the target).
    */
  def plan(
      files: DataFrame,
      partCols: Seq[String],
      fileIdCol: String,
      sizeCol: String,
      targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes=$targetBytes must be positive")
    require(partCols.nonEmpty, "compaction plan needs partition keys (global: use GlobalRank)")
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(col(fileIdCol))
    val sz = col(sizeCol).cast("long")
    val binned = files
      .withColumn("_cum",
        coalesce(sum(sz).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("bin", expr(s"_cum div ${targetBytes}L"))
    binned
      .groupBy(partCols.map(col) :+ col("bin"): _*)
      .agg(
        count(lit(1)).as("n_files"),
        sum(sz).as("bytes"),
        min(col(fileIdCol)).as("first_file"),
        max(col(fileIdCol)).as("last_file"))
      .withColumn("fill_micro", expr(s"bytes * 1000000 div ${targetBytes}L"))
  }
}
