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

  test("chunkTokenWindows: overlap, short tail, full coverage, empty-doc drop") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 tokens
      (2L, "a b c"),                                  // shorter than the window
      (3L, ""),                                       // no tokens -> no chunks
      (4L, "x y z p q r s t u v")                     // 10 tokens, disjoint case below
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunkTokenWindows(docs, "doc_id", "text", window = 4, stride = 2)
      .as[(Long, Long, String, Long)].collect().groupBy(_._1)
    // starts 0,2,4,6: every token covered, 2-token overlap between neighbors
    assert(out(1L).sortBy(_._2).map(_._3).toSeq == Seq(
      "w1 w2 w3 w4", "w3 w4 w5 w6", "w5 w6 w7 w8", "w7 w8 w9 w10"))
    assert(out(1L).forall(_._4 == 4))
    assert(out(2L).toSeq == Seq((2L, 0L, "a b c", 3L))) // single short chunk
    assert(!out.contains(3L))
    // stride == window: disjoint blocks, no overlap
    val disjoint = TextAnalysis.chunkTokenWindows(docs.filter($"doc_id" === 4), "doc_id", "text",
      window = 5, stride = 5)
      .as[(Long, Long, String, Long)].collect().sortBy(_._2)
    assert(disjoint.map(_._3).toSeq == Seq("x y z p q", "r s t u v"))
    // coverage invariant: concatenating stride-prefixes + last chunk == all tokens
    val tokens = out(1L).sortBy(_._2).map(_._3.split(" ").toSeq)
    val reconstructed = tokens.init.map(_.take(2)).flatten ++ tokens.last
    assert(reconstructed.toSeq == (1 to 10).map(i => s"w$i"))
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

  test("extractHtmlText: scripts/comments dropped, tags stripped, entities decoded after") {
    val cases = Seq(
      "<p>hello <b>world</b></p>" -> "hello world",
      "<script>var x = '<p>sneaky</p>';</script>real" -> "real",
      // multi-line bodies — the norm in real HTML; (?s) is load-bearing
      "<script>\nvar a = 1;\nvar b = 2;\n</script>kept" -> "kept",
      "<style>\n.a { color: red; }\n</style>kept" -> "kept",
      "<!-- line one\nline two -->a  b" -> "a b",
      "<!-- note -->a  b" -> "a b",
      "x &lt;tag&gt; &amp; y" -> "x <tag> & y", // literal text, not re-stripped
      "  <div>  spaced   out  </div> " -> "spaced out")
    val got = cases.map(_._1).toDF("h")
      .select(TextAnalysis.extractHtmlText($"h")).as[String].collect()
    got.zip(cases.map(_._2)).foreach { case (g, want) => assert(g == want) }
  }

  test("canonicalizeUrl: case, www, default port, utm params, fragment") {
    val cases = Seq(
      "HTTPS://WWW.Site.COM:443/Path?utm_source=x&id=5&utm_campaign=y#frag"
        -> "https://site.com/Path?id=5",
      "https://site.com/p" -> "https://site.com/p", // already canonical
      "http://www.a.org/x?utm_only=1" -> "http://a.org/x", // all-utm query vanishes
      "https://API.site.com/v1?b=2&a=1" -> "https://api.site.com/v1?b=2&a=1", // param order kept
      "http://a.org:443/x" -> "http://a.org:443/x", // :443 is NOT http's default port
      "HTTP://b.org:80/x" -> "http://b.org/x", // :80 IS http's default port
      "https://c.org:80/x" -> "https://c.org:80/x", // :80 is NOT https's default
      "https://d.org/docs/utm_guide?id=1" -> "https://d.org/docs/utm_guide?id=1", // path utm kept
      "https://e.org/p?xutm_source=1&utm_source=2" -> "https://e.org/p?xutm_source=1", // &-anchored
      "https://f.org/p?" -> "https://f.org/p", // bare '?' tidied away
      "https://g.org?utm_source=x&b=1" -> "https://g.org?b=1", // path-less URL keeps its query rules
      "HTTPS://WWW.H.org:443?utm_only=1" -> "https://h.org") // path-less: port+www+utm all apply
    val got = cases.map(_._1).toDF("u")
      .select(TextAnalysis.canonicalizeUrl($"u")).as[String].collect()
    got.zip(cases.map(_._2)).foreach { case (g, want) => assert(g == want) }
  }

  test("stripRepeatedSpans drops cross-doc spans, keeps order, skips empty docs") {
    // span size 2: docs 1 and 2 share the span "dup dup"; everything else
    // is unique. doc 3 is token-less -> no output row.
    val docs = Seq(
      (1L, "dup dup one two"), // spans: "dup dup" (hot), "one two"
      (2L, "dup dup three four five"), // spans: "dup dup" (hot), "three four", "five"
      (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.stripRepeatedSpans(docs, "doc_id", "text", 2, 2)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L) == (("one two", 2L, 1L)))
    assert(got(2L) == (("three four five", 3L, 1L)))
    // a doc whose every span is hot survives with empty kept_text
    val all = Seq((1L, "x y"), (2L, "x y")).toDF("doc_id", "text")
    val wiped = TextAnalysis.stripRepeatedSpans(all, "doc_id", "text", 2, 2)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(wiped == Set((1L, "", 1L, 1L), (2L, "", 1L, 1L)))
  }
}
