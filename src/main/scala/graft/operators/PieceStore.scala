package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent, incrementally-maintained PIECE TABLE — the production
  * loop around [[SequencePack]]: curated documents arrive in daily
  * batches, and the training-sequence index must GROW at the stream
  * tail instead of repacking the corpus. Each append packs its batch at
  * the store's recorded token total, so chunk ids continue seamlessly —
  * a chunk straddling a batch boundary holds its head piece from one
  * append and its tail piece from the next, exactly as a whole-corpus
  * pack would emit them (the q375 gate pins incremental == rebuild).
  *
  * Layout under `root` (plain parquet, the [[graft.sim.PqIndexStore]]
  * per-commit-subdir discipline):
  *  - `pieces/<batchId>/` — the batch's piece rows (Overwrite:
  *    re-appending a batchId rewrites its own subdir);
  *  - `state/<batchId>/`  — ONE row (batch_id, first_offset, n_tokens),
  *    written AFTER the pieces commit (the state row is the marker: a
  *    crash between the two leaves orphan piece files that the replay
  *    overwrites byte-identically).
  *
  * Replay idempotence: an append whose batchId already has a state row
  * re-uses its RECORDED first_offset — replaying batch k after batches
  * k+1… landed reproduces identical pieces instead of packing at the
  * (now larger) stream tail. Single-writer, in-arrival-order contract
  * like every store here: one writer owns the tail at a time.
  *
  * Scale shape: an append touches only its batch (one range exchange
  * from [[SequencePack.packChunks]]); the state read is a bounded
  * per-batch listing (batch count is an ops cadence, not a data
  * volume); [[pieces]] is a recursive parquet read of slim integer rows.
  */
object PieceStore {

  private def stateRows(spark: SparkSession, root: String): Seq[(String, Long, Long)] = {
    val d = s"$root/state"
    val f = new Path(d).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(new Path(d))) Seq.empty
    else
      spark.read.option("recursiveFileLookup", "true").parquet(d)
        .select(col("batch_id"), col("first_offset"), col("n_tokens"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
  }

  /** Pack one batch at the stream tail and append its pieces + state
    * row. Returns (the batch's first stream offset, its token count).
    */
  def appendBatch(
      batch: DataFrame,
      idCol: String,
      nTokensCol: String,
      seqLen: Long,
      root: String,
      batchId: String): (Long, Long) = {
    require(batchId.matches("[A-Za-z0-9._-]+"), s"batchId '$batchId' is not filename-safe")
    val spark = batch.sparkSession
    val existing = stateRows(spark, root)
    // replay: a batch that already committed re-packs at its RECORDED
    // offset (later batches must not shift it); first landing: the tail
    val offset = existing.find(_._1 == batchId).map(_._2)
      .getOrElse(existing.map(s => s._2 + s._3).foldLeft(0L)(math.max))
    val pieces = SequencePack.packChunks(
      batch, idCol, nTokensCol, seqLen, streamOffset = offset).persist()
    pieces.write.mode(SaveMode.Overwrite).parquet(s"$root/pieces/$batchId")
    val nTokens = batch.agg(
      coalesce(sum(when(col(nTokensCol) > 0, col(nTokensCol).cast("long"))
        .otherwise(lit(0L))), lit(0L))).head().getLong(0)
    pieces.unpersist()
    import spark.implicits._
    Seq((batchId, offset, nTokens)).toDF("batch_id", "first_offset", "n_tokens")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$root/state/$batchId")
    (offset, nTokens)
  }

  /** The full piece table across every appended batch — identical rows
    * to a whole-corpus [[SequencePack.packChunks]] over the batches'
    * concatenation.
    */
  def pieces(spark: SparkSession, root: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(s"$root/pieces")

  /** Total tokens committed to the stream (the next append's offset). */
  def totalTokens(spark: SparkSession, root: String): Long =
    stateRows(spark, root).map(s => s._2 + s._3).foldLeft(0L)(math.max)

  // ------------------------------------------------------------- deletes

  /** Record a DELETE batch (dedup kills, takedowns) —
    * [[graft.sim.PqIndexStore.appendTombstones]]'s replay-idempotent
    * layout verbatim (`tombstones/<batchId>/`, shared discipline).
    * Removing a document from a PACKED stream cannot shrink it in
    * place — every later offset would shift — so deletes are mask-outs:
    * [[livePieces]] is the query view, and reclaiming the pad space is
    * an explicit NEW GENERATION ([[repackGeneration]]).
    */
  def appendTombstones(
      ids: DataFrame, idCol: String, root: String, batchId: String): Long =
    graft.sim.PqIndexStore.appendTombstones(ids, idCol, root, batchId)

  /** The query view under pending deletes: pieces minus tombstoned
    * documents — one broadcast anti-join; chunk ids and offsets are
    * UNCHANGED (the dead pieces become in-chunk padding the loader
    * masks, exactly like [[SequencePack.lossMaskSpans]]'s pad spans).
    */
  def livePieces(spark: SparkSession, root: String, idCol: String): DataFrame = {
    val p = pieces(spark, root)
    p.join(
      broadcast(graft.sim.PqIndexStore.tombstones(spark, root, idCol)),
      Seq(idCol), "left_anti")
      // a USING join fronts the key column; keep the stored piece order
      .select(p.columns.map(col): _*)
  }

  /** Reclaim tombstoned space by packing the SURVIVORS into a fresh
    * store at `newRoot` (one batch, offset 0) — the piece table carries
    * everything needed: each survivor's token count is the sum of its
    * piece lengths, and the survivor order is the original id order, so
    * the new generation equals a from-scratch pack of the surviving
    * corpus without re-reading any document. Returns the new
    * generation's total tokens.
    */
  def repackGeneration(
      spark: SparkSession,
      root: String,
      newRoot: String,
      idCol: String,
      seqLen: Long): Long = {
    val survivors = livePieces(spark, root, idCol)
      .groupBy(col(idCol))
      .agg(sum(col("piece_len")).as("_n"))
    appendBatch(survivors, idCol, "_n", seqLen, newRoot, "g0")._2
  }
}
