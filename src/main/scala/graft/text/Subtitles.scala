package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SRT / WebVTT subtitle parsing — the transcript side of paired
  * audio-text training data (ASR corpora ship aligned cue files next to
  * their media): cue blocks explode to one relational row each with
  * integer-millisecond spans, ready to join against utterance tables
  * (q321's VAD segments) or feed the text pipeline. Fully regexp-
  * relational — block split, timestamp extraction, text reassembly are
  * the same algebra in Spark and the oracle — and one window ranks cue
  * order per file; everything else is a stateless projection.
  *
  * Both dialects through one chain: SRT (comma decimals, numeric cue
  * ids) and WebVTT (dot decimals, `WEBVTT` header, NOTE comment blocks,
  * cue settings after the end timestamp) — non-cue blocks simply carry
  * no `-->` timestamp line and drop out.
  */
object Subtitles {

  private val TsLine =
    "(\\d{2}):(\\d{2}):(\\d{2})[,.](\\d{3})\\s*-->\\s*(\\d{2}):(\\d{2}):(\\d{2})[,.](\\d{3})"

  private def ms(h: Column, m: Column, s: Column, f: Column): Column =
    h.cast("long") * 3600000L + m.cast("long") * 60000L +
      s.cast("long") * 1000L + f.cast("long")

  /** Explode cue files into (id, cue_idx, start_ms, end_ms, text): cue
    * text is every line after the timestamp line, newline-joined with a
    * single space; `cue_idx` numbers cues in file order (0-based) — the
    * file's own SRT indices are NOT trusted (real files renumber badly).
    */
  def cues(df: DataFrame, idCol: String, subCol: String): DataFrame = {
    val norm = regexp_replace(col(subCol), "\r\n", "\n")
    val blocks = df
      .select(col(idCol).as("_id"),
        posexplode(split(norm, "\n{2,}")).as(Seq("_i", "_b")))
      .withColumn("_ts", regexp_extract(col("_b"), TsLine, 0))
      .filter(col("_ts") =!= "") // headers, NOTEs, stray blanks drop out
    val starts = ms(
      regexp_extract(col("_b"), TsLine, 1), regexp_extract(col("_b"), TsLine, 2),
      regexp_extract(col("_b"), TsLine, 3), regexp_extract(col("_b"), TsLine, 4))
    val ends = ms(
      regexp_extract(col("_b"), TsLine, 5), regexp_extract(col("_b"), TsLine, 6),
      regexp_extract(col("_b"), TsLine, 7), regexp_extract(col("_b"), TsLine, 8))
    // text = everything after the timestamp LINE (cue settings included
    // on that line are discarded with it); internal newlines → one space
    val text = trim(regexp_replace(
      regexp_replace(col("_b"), "(?s)^.*?-->[^\n]*\n?", ""), "\n", " "))
    val w = Window.partitionBy("_id").orderBy("_i")
    blocks
      .withColumn("cue_idx", row_number().over(w).cast("long") - 1)
      .select(col("_id").as(idCol), col("cue_idx"),
        starts.as("start_ms"), ends.as("end_ms"), text.as("text"))
  }
}
