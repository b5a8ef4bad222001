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
      seqLen: Long,
      streamOffset: Long = 0L): DataFrame = {
    require(seqLen >= 1, s"seqLen=$seqLen must be >= 1")
    require(streamOffset >= 0, s"streamOffset=$streamOffset must be >= 0")
    // a NEGATIVE token count (corrupt upstream counter) must fail LOUDLY
    // before the running total is stamped — silently summing it would
    // shift every later document's stream offset and chunk assignment
    val checked = df.select(
      col(idCol),
      when(col(nTokensCol) < 0, raise_error(concat(
        lit(s"sequencePack: negative $nTokensCol for $idCol="),
        col(idCol).cast("string"))))
        .otherwise(col(nTokensCol)).as(nTokensCol))
    // `streamOffset` places this frame's documents AFTER an existing
    // token stream (the incremental-append path — [[PieceStore]]): the
    // math is identical, the base just shifts every offset, so a chunk
    // straddling the batch boundary picks up its head and tail pieces
    // from different appends exactly as one global pack would emit them
    val off = GlobalRank.withRunningTotal(
      checked, Seq(idCol), nTokensCol, "_off")
      .withColumn("_off", col("_off") + streamOffset)
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

  /** MULTIMODAL piece table — the 2026 pretraining shape: a document is
    * a SEQUENCE of segments (text spans, image placeholder runs, audio
    * frames …), each a contiguous token run of one modality, and the
    * packed stream must preserve the (doc, segment) order so a piece
    * row still pins modality spans inside each chunk. `df` is the
    * SEGMENT table: one row per (`docCol`, `segCol`) with its
    * `modalityCol` label and `nTokensCol` count (for images, the
    * PLACEHOLDER token count — patches from the media table's
    * dimensions; see [[imagePlaceholderTokens]]). Same algebra as
    * [[packChunks]] at segment granularity: output rows carry
    * (`chunk_id`, doc, seg, modality, `seg_from`, `chunk_offset`,
    * `piece_len`), and a chunk's rows tile it exactly. Scale shape
    * unchanged: ONE range exchange over (doc, seg), stateless explode.
    */
  def packChunksMultimodal(
      df: DataFrame,
      docCol: String,
      segCol: String,
      modalityCol: String,
      nTokensCol: String,
      seqLen: Long): DataFrame = {
    require(seqLen >= 1, s"seqLen=$seqLen must be >= 1")
    val checked = df.select(
      col(docCol), col(segCol), col(modalityCol),
      when(col(nTokensCol) < 0, raise_error(concat(
        lit(s"sequencePack: negative $nTokensCol for $docCol="),
        col(docCol).cast("string"))))
        .otherwise(col(nTokensCol)).as(nTokensCol))
    val off = GlobalRank.withRunningTotal(
      checked, Seq(docCol, segCol), nTokensCol, "_off")
    off
      .filter(col(nTokensCol) > 0)
      .withColumn("chunk_id", explode(sequence(
        expr(s"_off div ${seqLen}L"),
        expr(s"(_off + $nTokensCol - 1) div ${seqLen}L"))))
      .select(
        col("chunk_id"),
        col(docCol),
        col(segCol),
        col(modalityCol),
        greatest(col("chunk_id") * seqLen - col("_off"), lit(0L)).as("seg_from"),
        greatest(col("_off") - col("chunk_id") * seqLen, lit(0L)).as("chunk_offset"),
        (least(col("_off") + col(nTokensCol), (col("chunk_id") + 1) * seqLen) -
          greatest(col("_off"), col("chunk_id") * seqLen)).as("piece_len"))
  }

  /** Image PLACEHOLDER token count from pixel dimensions — the vision-
    * encoder patch-grid convention: ceil(w/patch) · ceil(h/patch).
    */
  def imagePlaceholderTokens(
      width: org.apache.spark.sql.Column,
      height: org.apache.spark.sql.Column,
      patch: Int): org.apache.spark.sql.Column = {
    require(patch >= 1, s"patch=$patch must be >= 1")
    // ceil-div via floor: Column `/` is DOUBLE division, exact here
    // (patch grids are far below 2^53)
    floor((width.cast("long") + (patch - 1)) / patch).cast("long") *
      floor((height.cast("long") + (patch - 1)) / patch).cast("long")
  }

  /** WHOLE-DOCUMENT (no-split) bin packing — the packer for runs that
    * forbid cross-document attention contamination: every document
    * lands INTACT in exactly one bin of capacity `seqLen`. Exact
    * first-fit is inherently sequential, so this is the HARMONIC
    * algorithm (Lee & Lee, JACM 1985): documents class by
    * c = seqLen div n (the per-bin capacity of their size class), and
    * each class fills its own bins c documents at a time — bin fill is
    * guaranteed > seqLen·c/(c+1), the classic harmonic bound, with
    * total waste bounded without any sequential state.
    *
    * Scale shape: the [[TokenBudget]] trick — ONE global rank over
    * (class, id) minus a broadcast #classes-row offset table (classes
    * number at most seqLen, typically a few dozen) — a single range
    * exchange at any corpus size, never a per-class window. Documents
    * longer than `seqLen` fail LOUDLY (truncate or [[packChunks]] them
    * upstream — silently dropping or splitting here would corrupt the
    * no-split contract); zero-token documents drop.
    *
    * Output: one row per document with `bin_cap` (documents its bin
    * holds), `bin` (0-based within the class), `slot` (0-based within
    * the bin) — (bin_cap, bin) identifies the training sequence.
    */
  def packWholeDocs(
      df: DataFrame,
      idCol: String,
      nTokensCol: String,
      seqLen: Long): DataFrame = {
    require(seqLen >= 1, s"seqLen=$seqLen must be >= 1")
    val checked = df.select(
      col(idCol),
      when(col(nTokensCol) > seqLen, raise_error(concat(
        lit(s"packWholeDocs: $nTokensCol exceeds seqLen=$seqLen for $idCol="),
        col(idCol).cast("string"))))
        .when(col(nTokensCol) < 0, raise_error(concat(
          lit(s"packWholeDocs: negative $nTokensCol for $idCol="),
          col(idCol).cast("string"))))
        .otherwise(col(nTokensCol)).as(nTokensCol))
      .filter(col(nTokensCol) > 0)
      .withColumn("bin_cap", expr(s"${seqLen}L div $nTokensCol"))
    val rn = GlobalRank.withRowNumber(
      checked, Seq("bin_cap", idCol), rnCol = "_grn", nCol = "_gn",
      failOnTies = true).drop("_gn")
    val w = org.apache.spark.sql.expressions.Window.orderBy("_cls")
      .rowsBetween(Long.MinValue, -1)
    val offsets = checked.groupBy(col("bin_cap").as("_cls"))
      .agg(count(lit(1)).as("_n"))
      .withColumn("_offset", coalesce(sum(col("_n")).over(w), lit(0L)))
      .select(col("_cls"), col("_offset"))
    rn.join(broadcast(offsets), col("bin_cap") === col("_cls"))
      .withColumn("_cr", col("_grn") - col("_offset") - 1)
      .select(
        col(idCol),
        col(nTokensCol),
        col("bin_cap"),
        expr("_cr div bin_cap").as("bin"),
        expr("_cr % bin_cap").as("slot"))
  }

  /** LOSS-MASK / ATTENTION-SPAN emission — the last step before a data
    * loader: per training chunk, spans (`span_offset`, `span_len`,
    * doc, `mask`) that tile [0, seqLen) EXACTLY. `maskCol` is the
    * caller's per-document loss flag (false for prompt documents — the
    * SFT/DPO shape composing with [[Preference]]); the final chunk's
    * unfilled tail becomes one PAD span (null doc, mask false) so
    * every chunk is loader-ready without ragged-tail special cases.
    *
    * Scale shape: [[packChunks]]'s one range exchange; the pad span
    * comes from a ONE-ROW total-tokens aggregate unioned in (no
    * collect, no extra pass over the pieces).
    */
  def lossMaskSpans(
      df: DataFrame,
      idCol: String,
      nTokensCol: String,
      maskCol: String,
      seqLen: Long): DataFrame = {
    // the mask rides THROUGH the pack as a carried label (the multimodal
    // variant's modality slot) — no second join against the doc table
    val pieces = packChunksMultimodal(
      df.select(col(idCol), lit(0).as("_seg"),
        col(maskCol).cast("boolean").as("_mask"), col(nTokensCol)),
      idCol, "_seg", "_mask", nTokensCol, seqLen)
    val spans = pieces.select(
      col("chunk_id"),
      col(idCol),
      col("chunk_offset").as("span_offset"),
      col("piece_len").as("span_len"),
      col("_mask").as("mask"))
    val lastChunk = expr(s"(_total - 1) div ${seqLen}L")
    val pad = df
      .agg(sum(when(col(nTokensCol) > 0, col(nTokensCol).cast("long"))
        .otherwise(lit(0L))).as("_total"))
      .filter(col("_total") > 0 && col("_total") % seqLen =!= 0)
      .select(
        lastChunk.as("chunk_id"),
        lit(null).cast(df.schema(idCol).dataType).as(idCol),
        (col("_total") - lastChunk * seqLen).as("span_offset"),
        ((lastChunk + 1) * seqLen - col("_total")).as("span_len"),
        lit(false).as("mask"))
    spans.unionByName(pad)
  }

  /** MULTIMODAL loss-mask span emission — [[lossMaskSpans]] at SEGMENT
    * granularity: the input is [[packChunksMultimodal]]'s segment table
    * plus a per-segment loss flag (`maskCol` — typically false for
    * image placeholder runs and prompt spans), and the output tiles
    * every chunk with (`span_offset`, `span_len`, doc, seg, modality,
    * `mask`) rows plus the single PAD span closing the final chunk.
    * The modality AND the mask ride through the pack as ONE carried
    * struct label — same single range exchange, no join back to the
    * segment table.
    */
  def lossMaskSpansMultimodal(
      df: DataFrame,
      docCol: String,
      segCol: String,
      modalityCol: String,
      maskCol: String,
      nTokensCol: String,
      seqLen: Long): DataFrame = {
    val lab = struct(
      col(modalityCol).as("modality"), col(maskCol).cast("boolean").as("mask"))
    val pieces = packChunksMultimodal(
      df.select(col(docCol), col(segCol), lab.as("_lab"), col(nTokensCol)),
      docCol, segCol, "_lab", nTokensCol, seqLen)
    val spans = pieces.select(
      col("chunk_id"),
      col(docCol),
      col(segCol),
      col("_lab.modality").as("modality"),
      col("chunk_offset").as("span_offset"),
      col("piece_len").as("span_len"),
      col("_lab.mask").as("mask"))
    val lastChunk = expr(s"(_total - 1) div ${seqLen}L")
    val pad = df
      .agg(sum(when(col(nTokensCol) > 0, col(nTokensCol).cast("long"))
        .otherwise(lit(0L))).as("_total"))
      .filter(col("_total") > 0 && col("_total") % seqLen =!= 0)
      .select(
        lastChunk.as("chunk_id"),
        lit(null).cast(df.schema(docCol).dataType).as(docCol),
        lit(null).cast(df.schema(segCol).dataType).as(segCol),
        lit(null).cast(df.schema(modalityCol).dataType).as("modality"),
        (col("_total") - lastChunk * seqLen).as("span_offset"),
        ((lastChunk + 1) * seqLen - col("_total")).as("span_len"),
        lit(false).as("mask"))
    spans.unionByName(pad)
  }
}
