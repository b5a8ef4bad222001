package graft

import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token and subword counts") {
    val df = Seq("Hello, world! It's 42", "", "   ").toDF("t")
    val out = df.select(
      TextAnalysis.tokenCount($"t").as("n"),
      TextAnalysis.subwordCountEstimate($"t").as("s")).collect()
    assert(out(0).getInt(0) == 5) // hello world it s 42
    assert(out(0).getInt(1) == 8) // + ',' '!' '''
    assert(out(1).getInt(0) == 0 && out(2).getInt(0) == 0)
  }

  test("language id picks the stopword-dominant language") {
    val df = Seq(
      "the cat and the dog of the house",
      "el perro de la casa es una maravilla",
      "der hund und die katze ist ein tier",
      "le chien est dans les jardins des villes",
      "xyzzy plugh").toDF("t")
    val out = df.select(TextAnalysis.langId($"t")).as[String].collect()
    assert(out.toSeq == Seq("en", "es", "de", "fr", "und"))
  }

  test("quality metrics are exact ratios") {
    val df = Seq("aa bb aa !!").toDF("t")
    val r = df.select(
      TextAnalysis.distinctTokenRatio($"t").as("d"),
      TextAnalysis.meanTokenLength($"t").as("m"),
      TextAnalysis.punctRatio($"t").as("p")).head()
    assert(r.getDouble(0) == 2.0 / 3.0)
    assert(r.getDouble(1) == 2.0)
    assert(r.getDouble(2) == 2.0 / 11.0) // "aa bb aa !!" = 11 chars, 2 punct
  }

  test("bag fingerprint is order- and repetition-invariant") {
    val df = Seq("alpha beta gamma", "gamma alpha beta alpha", "alpha beta delta").toDF("t")
    val fps = df.select(TextAnalysis.bagFingerprint($"t")).as[String].collect()
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("PII redaction replaces emails and URLs with typed placeholders") {
    val df = Seq(
      "contact bob.smith+x@corp.example or https://ex.com/a?b=1 today",
      "no pii here").toDF("t")
    val out = df.select(TextAnalysis.redactPii($"t")).as[String].collect()
    assert(out(0) == "contact <EMAIL> or <URL> today")
    assert(out(1) == "no pii here")
  }

  test("repetition score flags degenerate bigram loops") {
    val df = Seq(
      (1L, "buy now buy now buy now buy now"),
      (2L, "a perfectly ordinary sentence with no repeats"),
      (3L, "one")).toDF("doc_id", "t")
    val out = TextAnalysis.repetitionScores(df, "doc_id", "t")
      .as[(Long, Double)].collect().toMap
    assert(out(1L) > 0.5) // "buy now" dominates
    assert(out(2L) < 0.2)
    assert(out(3L) == 0.0) // < 2 tokens
  }

  test("rolling fingerprint normalizes whitespace and is deterministic") {
    val df = Seq(
      "the quick   brown\tfox",
      "the quick brown fox", // same after whitespace collapse
      "completely different text").toDF("t")
    val fps = df.select(TextAnalysis.rollingMinFingerprint($"t")).as[String].collect()
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
    // short text falls back to whole-string hash
    val short = Seq("abc").toDF("t")
      .select(TextAnalysis.rollingMinFingerprint($"t")).as[String].head()
    assert(short.length == 32)
  }
}
