package graft.dedup

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The production incremental near-dup loop a 100 TB corpus actually runs —
  * ONE pipeline op composing the pieces the per-verb gates already prove
  * (q31 banding, q129 incremental probe, q81 components, q82 canonical):
  *
  *   1. band the day's batch ([[MinHashLsh.bandedTable]] — signature pass
  *      over the NEW docs only),
  *   2. probe the STORED band index ([[MinHashLsh.candidatePairsAgainst]] —
  *      the shuffle carries the batch plus colliding index rows, never the
  *      corpus),
  *   3. append the batch's band rows and the new pairs to the stored state,
  *   4. recluster ([[DupClusters.components]] over all accumulated pairs —
  *      the pair table is near-linear in the corpus under the LSH
  *      guarantee, and star-alternation converges in O(log n) rounds),
  *   5. the canonical set = every ingested id minus cluster losers.
  *
  * The invariant the gate query (q313) pins: after any sequence of batches,
  * the canonical set EQUALS what one full-corpus batch run would produce —
  * pair (a,b) forms exactly once, when the LATER of the two arrives, so the
  * accumulated pair set converges to the batch pair set.
  *
  * State layout under `root` (all plain parquet appends — object-store
  * friendly, no in-place mutation, the K4 append-only discipline):
  * `band_index/` (id, band, bucket), `pairs/` (id_a, id_b),
  * `doc_ids/` (id). Per-day cost is the batch signature pass + one
  * (band,bucket)-keyed join against the index + components over pairs:
  * the dedupscale Stress probe measures it flat as the index grows.
  *
  * Single-writer contract like the catalog (one daily ingest job owns the
  * state); the stored index should be compacted periodically with the same
  * [[graft.load.Compaction]] machinery as any daily-append table.
  */
object IncrementalDedup {

  /** Parquet state dirs under one root. */
  final case class State(root: String) {
    val indexDir: String = s"$root/band_index"
    val pairsDir: String = s"$root/pairs"
    val docsDir: String = s"$root/doc_ids"
  }

  /** One batch report: sizes after ingesting the batch. */
  final case class BatchReport(
      batchDocs: Long,
      newPairs: Long,
      totalDocs: Long,
      totalPairs: Long,
      canonicalDocs: Long)

  private def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def readOrEmpty(spark: SparkSession, dir: String, schema: String): DataFrame =
    if (exists(spark, dir)) spark.read.parquet(dir)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(schema))

  /** Ingest one day's batch of (id, text) documents: probe, append,
    * recluster. Returns the post-batch sizes. Ids must be globally unique
    * across batches (the caller's ingest contract — surrogate ids from the
    * watermark, P3).
    */
  def ingestBatch(
      state: State,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 12,
      bands: Int = 4): BatchReport = {
    val spark = batch.sparkSession
    val ids = batch.select(col(idCol).cast("long").as("id"))
    val batchDocs = ids.count()

    // 1. band the new docs (cached: probed once, appended once)
    val newBanded = MinHashLsh
      .bandedTable(batch.select(col(idCol).cast("long").as("id"), col(textCol)),
        "id", textCol, shingleSize, numHashes, bands)
      .persist()

    // 2. probe stored index ∪ own rows: new×old plus new×new pairs —
    // exactly the pairs the batch recompute would add (q129 invariant)
    val storedBanded = readOrEmpty(spark, state.indexDir,
      "id BIGINT, band INT, bucket STRING")
    val newPairs = MinHashLsh
      .candidatePairsAgainst(newBanded, storedBanded.unionByName(newBanded), "id")
      .persist()
    val nNewPairs = newPairs.count()

    // 3. append-only state updates
    newBanded.write.mode(SaveMode.Append).parquet(state.indexDir)
    if (nNewPairs > 0) newPairs.write.mode(SaveMode.Append).parquet(state.pairsDir)
    ids.write.mode(SaveMode.Append).parquet(state.docsDir)
    newBanded.unpersist()
    newPairs.unpersist()

    // 4.+5. recluster over ALL pairs, count the canonical survivors
    val allDocs = spark.read.parquet(state.docsDir)
    val totalDocs = allDocs.count()
    val allPairs = readOrEmpty(spark, state.pairsDir, "id_a BIGINT, id_b BIGINT")
    val totalPairs = allPairs.count()
    val canonical = canonicalIds(spark, state)
    BatchReport(batchDocs, nNewPairs, totalDocs, totalPairs, canonical.count())
  }

  /** The current canonical id set: every ingested id minus cluster losers
    * (min-id survivor per component — [[DupClusters.keepCanonical]]'s rule
    * over the accumulated pair state).
    */
  def canonicalIds(spark: SparkSession, state: State): DataFrame = {
    val allDocs = readOrEmpty(spark, state.docsDir, "id BIGINT")
    val allPairs = readOrEmpty(spark, state.pairsDir, "id_a BIGINT, id_b BIGINT")
    if (allPairs.isEmpty) allDocs
    else DupClusters.keepCanonical(
      allDocs, "id", DupClusters.components(allPairs, "id_a", "id_b"))
  }
}
