package graft

import graft.text.Subtitles
import org.apache.spark.sql.functions._

/** SRT/WebVTT cue-parse gates: both dialects through one chain, CRLF
  * endings, multi-line text joining, header/NOTE skipping, cue settings
  * discarded with the timestamp line, untrusted SRT renumbering.
  */
class SubtitlesSpec extends SparkSpec {
  import spark.implicits._

  private def parse(sub: String): Seq[(Long, Long, Long, String)] =
    Subtitles.cues(Seq((1L, sub)).toDF("id", "sub"), "id", "sub")
      .orderBy("cue_idx")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toSeq

  test("SRT with CRLF, bad renumbering, multi-line text") {
    val srt = "7\r\n00:00:01,250 --> 00:00:03,000\r\nhello\r\nworld\r\n\r\n" +
      "3\r\n00:01:00,000 --> 00:01:02,500\r\nsecond cue\r\n"
    assert(parse(srt) == Seq(
      (0L, 1250L, 3000L, "hello world"),
      (1L, 60000L, 62500L, "second cue"))) // file's own ids ignored
  }

  test("WebVTT: header + NOTE skipped, dot decimals, settings discarded") {
    val vtt = "WEBVTT\n\nNOTE a comment\nspanning lines\n\n" +
      "00:00:00.500 --> 00:00:02.000 align:start position:10%\ncue text\n\n" +
      "01:02:03.456 --> 01:02:04.000\nlast\n"
    assert(parse(vtt) == Seq(
      (0L, 500L, 2000L, "cue text"),
      (1L, 3723456L, 3724000L, "last")))
  }

  test("empty cue text and cue-text containing an arrow survive") {
    val srt = "1\n00:00:01,000 --> 00:00:02,000\n\n\n" +
      "2\n00:00:03,000 --> 00:00:04,000\nA --> B transition\n"
    val out = parse(srt)
    assert(out.map(_._4) == Seq("", "A --> B transition"))
  }

  test("AsrAlign: best overlap wins under clock drift; ties go to the lower cue") {
    import graft.text.AsrAlign
    // media 1: utterance [900, 2100) against cues [0,1000) and [1000,2500):
    // overlaps 100 ms and 1100 ms — the drifted later cue must win
    // media 2: utterance [0, 1000) against cues [0,500) and [500,1000):
    // overlaps 500/500 — the TIE goes to cue 0
    // media 3: utterance [5000, 6000) overlaps nothing → unmatched row
    val utts = Seq((1L, 0L, 900L, 2100L), (2L, 0L, 0L, 1000L), (3L, 0L, 5000L, 6000L))
      .toDF("media_id", "utt", "u_start_ms", "u_end_ms")
    val cues = Seq(
      (1L, 0L, 0L, 1000L, "one-a"), (1L, 1L, 1000L, 2500L, "one-b"),
      (2L, 0L, 0L, 500L, "two-a"), (2L, 1L, 500L, 1000L, "two-b"),
      (3L, 0L, 0L, 100L, "three-a"))
      .toDF("media_id", "cue_idx", "c_start_ms", "c_end_ms", "text")
    val out = AsrAlign.alignCues(utts, cues, grain = 1000L)
      .orderBy("media_id", "utt").collect()
    assert(out.length == 3)
    val m1 = out(0)
    assert(m1.getLong(4) == 1L && m1.getString(5) == "one-b")
    assert(m1.getLong(6) == 1100L) // overlap_ms
    assert(m1.getLong(7) == 1100L * 1000000L / 1200L) // ratio vs utt length
    val m2 = out(1)
    assert(m2.getLong(4) == 0L && m2.getString(5) == "two-a" && m2.getLong(6) == 500L)
    val m3 = out(2)
    assert(m3.isNullAt(4) && m3.isNullAt(6) && !m3.getBoolean(8))
    // the other audit direction: cues nothing aligned to
    val un = AsrAlign.unmatchedCues(cues, AsrAlign.alignCues(utts, cues, 1000L))
      .select("media_id", "cue_idx").as[(Long, Long)].collect().toSet
    assert(un == Set((1L, 0L), (2L, 1L), (3L, 0L)))
  }

  test("AsrAlign: long spans crossing many buckets emit each pair exactly once") {
    import graft.text.AsrAlign
    // one 10-bucket utterance over a 10-bucket cue at grain 100 — the
    // later-start dedup rule must emit ONE pair, not ten
    val utts = Seq((9L, 0L, 0L, 1000L)).toDF("media_id", "utt", "u_start_ms", "u_end_ms")
    val cues = Seq((9L, 0L, 50L, 950L, "x")).toDF(
      "media_id", "cue_idx", "c_start_ms", "c_end_ms", "text")
    val out = AsrAlign.alignCues(utts, cues, grain = 100L).collect()
    assert(out.length == 1 && out(0).getLong(6) == 900L)
  }
}
