package graft.load

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** K1/K2 — snapshot writes replacing the reference's ClickHouse bulk insert
  * (`util/data_pushing.py:211-222`) and S3 archive (`main.py:294-309`).
  *
  * One directory per table; each ingest batch appends parquet files. Batches
  * are written partitioned (no coalesce-to-1): at 100 TB a batch append is a
  * parallel write of many parquet parts, and readers prune with column
  * projection + predicate pushdown against parquet stats.
  */
object Snapshot {

  def appendBatch(df: DataFrame, tableDir: String): Unit =
    df.write.mode(SaveMode.Append).parquet(tableDir)

  def readTable(spark: SparkSession, tableDir: String): DataFrame =
    spark.read.parquet(tableDir)

  def exists(spark: SparkSession, tableDir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(tableDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet"))
  }

  /** Archive the cleaned batch alongside the table (reference uploads the
    * cleaned CSV to `processed/{table}/`, `main.py:294-309`).
    */
  def archive(df: DataFrame, archiveDir: String, batchName: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(s"$archiveDir/$batchName")

  /** Compact a table directory's accumulated small batch files into
    * `targetFiles` parquet parts. Append-heavy snapshot tables collect one
    * file set per batch; at scale the listing and tiny-row-group overhead
    * dominates reads. Writes to a temp sibling then swaps via rename, so a
    * crash leaves either the old or the new layout, never a mix.
    */
  def compact(spark: SparkSession, tableDir: String, targetFiles: Int): Unit = {
    val path = new org.apache.hadoop.fs.Path(tableDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return
    val tmp = new org.apache.hadoop.fs.Path(tableDir + "._compact_tmp")
    val old = new org.apache.hadoop.fs.Path(tableDir + "._compact_old")
    fs.delete(tmp, true); fs.delete(old, true)
    spark.read.parquet(tableDir)
      .repartition(targetFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    if (!fs.rename(path, old)) throw new java.io.IOException(s"compact: cannot move $path aside")
    if (!fs.rename(tmp, path)) {
      fs.rename(old, path) // roll back
      throw new java.io.IOException(s"compact: cannot promote $tmp")
    }
    fs.delete(old, true)
  }

  /** Order-independent table digest: the SUM (associative + commutative —
    * partitioning- and ordering-proof) of a 40-bit slice of each row's
    * canonical content hash, plus the row count. Equal digests across a
    * source table and its snapshot/backup verify integrity WITHOUT moving
    * either side: each cluster reduces its own table to one number.
    *
    * The sum accumulates in exact DECIMAL(38,0) — 40-bit slices summed over
    * up to ~10^26 rows before precision loss, so no row count a 100 TB
    * table can reach overflows it (a Long sum would wrap at ~2^23 rows
    * worst-case). Emitted as a STRING: decimal digits print identically in
    * every engine, where decimal dtypes themselves differ.
    */
  def tableChecksum(df: DataFrame, cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    df.select(graft.clean.Clean.rowHashExpr(cols).as("_h"))
      .agg(
        // empty table → checksum "0", not null (sum over zero rows is null)
        coalesce(
          sum(conv(substring(col("_h"), 1, 10), 16, 10).cast("decimal(38,0)")).cast("string"),
          lit("0")).as("checksum"),
        count(lit(1)).as("n"))
  }

  /** Latest-wins upsert (MERGE semantics without a table format): one row
    * per key survives — the highest `versionCol`, updates beating current on
    * ties. Pure plan, so it composes with any sink; at 100 TB it is ONE
    * shuffle on the key (window dedup), and Spark 4's WindowGroupLimit
    * pre-filters to a per-partition top-1 before the exchange.
    *
    * `updates` must be union-compatible with `current` (same columns by
    * name).
    */
  def upsertLatestWins(
      current: DataFrame,
      updates: DataFrame,
      keyCols: Seq[String],
      versionCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val all = current.withColumn("_src", lit(0))
      .unionByName(updates.withColumn("_src", lit(1)))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc, col("_src").desc)
    all.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1)
      .drop("_rk", "_src")
  }
}
