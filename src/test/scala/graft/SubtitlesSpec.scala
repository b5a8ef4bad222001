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
}
