package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Subtitle↔audio alignment — the step that turns two span tables the
  * pipeline already extracts (VAD utterances from the WAV decode,
  * [[Subtitles.cues]] from the paired .srt/.vtt) into ASR TRAINING
  * PAIRS: (utterance span, transcript text, overlap ratio), with
  * unmatched spans surfaced rather than dropped (they are the audit
  * trail — a drifting clock, a missing transcript, hallucinated VAD).
  *
  * Join shape (the 100 TB story): both tables quantize their half-open
  * integer-ms spans into `grain`-sized buckets and equi-join on
  * (media_id, bucket) — an ordinary keyed shuffle, never a per-media
  * cross product; each overlapping pair is emitted from exactly ONE
  * bucket (the one containing the later of the two starts — the
  * [[graft.operators.IntervalJoin]] dedup rule), so no distinct pass.
  * Best-cue-per-utterance is a single grouped `max(struct(...))`
  * aggregate — maximal overlap, ties to the LOWER cue index — not a
  * window, so the whole operator is two shuffles (pair join + best
  * aggregate) plus the final utterance left-join at any corpus size.
  * A media file's cues and utterances are both O(duration), so bucket
  * fan-out is bounded by span length / grain; pick `grain` near the
  * typical utterance length (~seconds).
  *
  * Contract: `utts(media_id, utt, u_start_ms, u_end_ms)` and
  * `cues(media_id, cue_idx, c_start_ms, c_end_ms, text)`, spans
  * half-open `[start, end)` in non-negative integer milliseconds.
  * Output: one row per UTTERANCE — matched rows carry the best cue's
  * index/text/overlap and `overlap_ratio_micro` (overlap·10⁶ div
  * utterance length — integer, engine-reproducible), unmatched rows
  * carry nulls and `matched = false`.
  */
object AsrAlign {

  def alignCues(utts: DataFrame, cues: DataFrame, grain: Long = 1000L): DataFrame = {
    require(grain >= 1, s"grain=$grain must be >= 1")
    def buckets(df: DataFrame, s: String, e: String): DataFrame = df
      .filter(col(s) < col(e)) // degenerate/empty spans can't match
      .withColumn("_bkt", explode(sequence(
        expr(s"$s div ${grain}L"),
        expr(s"($e - 1) div ${grain}L")))) // half-open: end-1 is the last occupied ms
    val u = buckets(
      utts.select(col("media_id"), col("utt"), col("u_start_ms"), col("u_end_ms")),
      "u_start_ms", "u_end_ms")
    val c = buckets(
      cues.select(col("media_id").as("_cmedia"), col("cue_idx"),
        col("c_start_ms"), col("c_end_ms"), col("text")),
      "c_start_ms", "c_end_ms")
      .withColumnRenamed("_bkt", "_bkt2")
    val ov = least(col("u_end_ms"), col("c_end_ms")) -
      greatest(col("u_start_ms"), col("c_start_ms"))
    val pairs = u
      .join(c, col("media_id") === col("_cmedia") && col("_bkt") === col("_bkt2"))
      .filter(ov > 0 &&
        col("_bkt") === expr(s"greatest(u_start_ms, c_start_ms) div ${grain}L"))
      .select(col("media_id"), col("utt"), col("cue_idx"),
        col("text").as("cue_text"), ov.as("overlap_ms"))
    // best cue per utterance: ONE aggregate — struct ordering is
    // lexicographic, so (overlap, -cue_idx) maximizes overlap then
    // breaks ties toward the EARLIER cue (the drifting-clock rule:
    // when a shifted transcript straddles two cues, best overlap wins)
    val best = pairs
      .groupBy(col("media_id"), col("utt"))
      .agg(max(struct(col("overlap_ms"), (-col("cue_idx")).as("_neg"),
        col("cue_idx"), col("cue_text"))).as("_b"))
      .select(col("media_id"), col("utt"),
        col("_b.cue_idx").as("cue_idx"), col("_b.cue_text").as("cue_text"),
        col("_b.overlap_ms").as("overlap_ms"))
    utts
      .select(col("media_id"), col("utt"), col("u_start_ms"), col("u_end_ms"))
      .join(best, Seq("media_id", "utt"), "left")
      .select(
        col("media_id"), col("utt"), col("u_start_ms"), col("u_end_ms"),
        col("cue_idx"), col("cue_text"), col("overlap_ms"),
        // integer `div`, not fp `/`: the ratio must hash identically in
        // any engine (the LinkPredict ra_micro discipline)
        expr("overlap_ms * 1000000L div (u_end_ms - u_start_ms)")
          .as("overlap_ratio_micro"),
        col("cue_idx").isNotNull.as("matched"))
  }

  /** The other audit direction: cues NO utterance aligned to — transcript
    * spans with no detected speech (silence-subtitled music, VAD misses,
    * clock drift past recovery). One anti-join on (media_id, cue_idx).
    */
  def unmatchedCues(cues: DataFrame, aligned: DataFrame): DataFrame =
    cues.join(
      aligned.filter(col("matched")).select(col("media_id"), col("cue_idx")),
      Seq("media_id", "cue_idx"),
      "left_anti")
}
