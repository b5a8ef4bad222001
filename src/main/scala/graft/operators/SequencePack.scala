package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence PACKING — the step between a curated corpus and a training
  * run: documents concatenate into one global token stream which is cut
  * into fixed-length training sequences ("concat-then-chunk", the GPT
  * pretraining shape). The output is the PIECE TABLE a data loader
  * indexes by: which chunk holds which token span of which document —
  * so sequence construction at train time is pure ranged reads, no
  * re-tokenization, and document-boundary attention masks can be built
  * from the same rows.
  *
  * Scale shape: the only global state is the exclusive running total of
  * token counts in document order, which is
  * [[GlobalRank.withRunningTotal]]'s two-pass stamp (ONE range shuffle +
  * an O(partitions) driver array — never a single-task window). Piece
  * emission is a stateless explode: a document spanning k chunks yields
  * k rows (k ≤ n_tokens/seqLen + 1), so output is token-volume-bounded.
  * Deterministic end to end — same corpus, same order, same chunks on
  * any cluster layout.
  */
object SequencePack {

  /** Piece table for packing `df`'s documents (in `idCol` order — must
    * be unique) into chunks of exactly `seqLen` tokens: one row per
    * (chunk, document) intersection with
    *
    *  - `chunk_id`    — 0-based training-sequence index;
    *  - `doc_from`    — first token of this piece WITHIN the document;
    *  - `chunk_offset`— where the piece lands WITHIN the chunk;
    *  - `piece_len`   — tokens carried.
    *
    * Every chunk is exactly full (Σ piece_len = seqLen) except the last;
    * zero-token documents carry no piece. `nTokensCol` is the caller's
    * token counter (whitespace, BPE — packing is tokenizer-agnostic).
    */
  def packChunks(
      df: DataFrame,
      idCol: String,
      nTokensCol: String,
      seqLen: Long): DataFrame = {
    require(seqLen >= 1, s"seqLen=$seqLen must be >= 1")
    // a NEGATIVE token count (corrupt upstream counter) must fail LOUDLY
    // before the running total is stamped — silently summing it would
    // shift every later document's stream offset and chunk assignment
    val checked = df.select(
      col(idCol),
      when(col(nTokensCol) < 0, raise_error(concat(
        lit(s"sequencePack: negative $nTokensCol for $idCol="),
        col(idCol).cast("string"))))
        .otherwise(col(nTokensCol)).as(nTokensCol))
    val off = GlobalRank.withRunningTotal(
      checked, Seq(idCol), nTokensCol, "_off")
    off
      .filter(col(nTokensCol) > 0)
      .withColumn("chunk_id", explode(sequence(
        expr(s"_off div ${seqLen}L"),
        expr(s"(_off + $nTokensCol - 1) div ${seqLen}L"))))
      .select(
        col("chunk_id"),
        col(idCol),
        greatest(col("chunk_id") * seqLen - col("_off"), lit(0L)).as("doc_from"),
        greatest(col("_off") - col("chunk_id") * seqLen, lit(0L)).as("chunk_offset"),
        (least(col("_off") + col(nTokensCol), (col("chunk_id") + 1) * seqLen) -
          greatest(col("_off"), col("chunk_id") * seqLen)).as("piece_len"))
  }
}
