package graft.load

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-location — the write-side shuffle eliminator for
  * repeated large-×-large joins. A table written with `bucketBy(n, key)`
  * is physically pre-partitioned by hash(key) % n and (with `sortBy`)
  * pre-sorted within each bucket, so a join of two tables bucketed the
  * SAME way needs no Exchange on either side: the sort-merge join reads
  * co-located buckets directly. At 100 TB this converts the fact-×-fact
  * join's dominant cost (two full shuffles, re-paid every query) into a
  * one-time write-side layout decision — the same trade the reference's
  * target warehouse makes with its ORDER BY table engines
  * (`table_schema.json` ORDER BY clauses), re-expressed as Spark's native
  * bucketing. Aggregations keyed on the bucket column skip their exchange
  * the same way (BucketedSpec pins both plans Exchange-free).
  *
  * Buckets must agree (same count, same key) across the tables that join;
  * pick n so one bucket of the LARGEST table fits an executor's memory
  * comfortably (buckets are the unit of read parallelism).
  */
object Bucketed {

  /** Write `df` as a bucketed+sorted managed table (parquet). Overwrites. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      numBuckets: Int,
      sorted: Boolean = true): Unit = {
    require(numBuckets > 0, s"numBuckets=$numBuckets must be positive")
    val w = df.write.mode("overwrite").format("parquet").bucketBy(numBuckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }

  /** Read a bucketed table back (bucket metadata rides along from the
    * catalog — a plain `spark.read.parquet` of the files would lose it).
    */
  def readTable(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
