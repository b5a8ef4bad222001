package graft.pipeline

import graft.catalog.Catalog
import graft.dedup.{Dedup, MinHashLsh, NGramJaccard}
import graft.load.Snapshot
import graft.text.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental training-corpus curation: the LLM-data twin of the warehouse
  * [[Pipeline]]. Each batch of raw documents is annotated, quality-filtered,
  * exact-deduplicated (within the batch and against the existing corpus),
  * near-deduplicated (MinHash candidates → exact Jaccard verify, batch and
  * cross-corpus), then appended to the corpus snapshot with provenance
  * columns.
  *
  * Scale shape per batch: two content-hash anti-joins (shuffles keyed by the
  * hash), one LSH bucket join (keyed by band bucket — near-linear output),
  * one Jaccard verify over candidates only. The corpus side ships only its
  * hash / signature columns into each join, never full documents.
  */
final class CorpusPipeline(
    spark: SparkSession,
    catalog: Catalog,
    corpusDir: String,
    minQualityTokens: Int = 5,
    nearDupJaccard: Double = 0.8) {

  final case class Result(batchName: String, ingested: Long, exactDups: Long, nearDups: Long, rejected: Long)

  /** Annotate one raw batch: content hash, token stats, language guess,
    * quality metrics. Pure projection — fuses into the scan.
    */
  def annotate(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      col(textCol).as("text"),
      md5(col(textCol)).as("text_hash"),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"),
      TextAnalysis.langId(col(textCol)).as("lang_guess"),
      TextAnalysis.distinctTokenRatio(col(textCol)).as("distinct_ratio"),
      TextAnalysis.bagFingerprint(col(textCol)).as("bag_fp"))

  /** Process one batch end to end; returns counts for the audit log. */
  def processBatch(raw: DataFrame, batchName: String, idCol: String = "doc_id", textCol: String = "text"): Result = {
    if (catalog.isProcessed(batchName))
      return Result(batchName, 0L, 0L, 0L, 0L)

    val annotated = annotate(raw, idCol, textCol)

    // 1. quality gate
    val quality = annotated.filter(col("n_tokens") >= minQualityTokens)

    // 2. exact dedup: within batch (keep lowest id) then vs corpus hashes
    val inBatch = Dedup.selfDedupFirstWins(quality, Seq("text_hash"), "doc_id")
    val corpus = if (Snapshot.exists(spark, corpusDir)) Some(Snapshot.readTable(spark, corpusDir)) else None
    val exactNew = corpus match {
      case Some(c) => Dedup.antiJoinPrior(inBatch, c.select("text_hash"), "text_hash")
      case None => inBatch
    }

    // 3. near-dup: LSH candidates within batch + vs corpus, verified by Jaccard
    val batchCands = MinHashLsh.candidatePairs(exactNew, "doc_id", "text")
    val batchNear = NGramJaccard.verifyPairs(batchCands, exactNew, "doc_id", "text")
      .filter(col("jaccard") >= nearDupJaccard)
      .select(col("id_b").as("doc_id")) // keep the lower id of each near-dup pair
      .distinct()
    val crossNear = corpus match {
      case Some(c) =>
        // bucket-join the batch against corpus fingerprints: bag_fp equality
        // is the cheap cross-corpus near-dup proxy (full cross-corpus LSH
        // would ship corpus signatures; bag_fp catches re-tokenized copies)
        exactNew.join(c.select(col("bag_fp")), Seq("bag_fp"), "left_semi").select("doc_id")
      case None => spark.emptyDataFrame.withColumn("doc_id", lit(0L)).filter(lit(false)).select("doc_id")
    }
    val dropIds = batchNear.unionByName(crossNear).distinct()
    val kept = exactNew.join(dropIds, Seq("doc_id"), "left_anti")

    // 4. append with provenance + audit counts (computed BEFORE the append:
    // the anti-joins read the corpus this batch writes into)
    val stamped = kept.withColumn("batch_name", lit(batchName)).persist()
    val nTotal = annotated.count()
    val nQuality = quality.count()
    val nExactNew = exactNew.count()
    val nKept = stamped.count()
    Snapshot.appendBatch(stamped, corpusDir)
    stamped.unpersist()
    catalog.recordStatus(batchName, graft.catalog.Status.Processed)

    Result(
      batchName,
      ingested = nKept,
      exactDups = nQuality - nExactNew,
      nearDups = nExactNew - nKept,
      rejected = nTotal - nQuality)
  }
}
