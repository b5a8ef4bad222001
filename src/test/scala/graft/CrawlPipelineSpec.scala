package graft

import graft.ingest.{Warc, WarcCodec}
import graft.text.{MainContent, RobotsRules, TextAnalysis}
import org.apache.spark.sql.functions._

/** The CRAWL-CORPUS pipeline composed end to end from this round's
  * intake operators — the capstone wiring a web-scale training pipeline
  * actually runs, each leg individually oracle/spec-gated elsewhere:
  *
  *   sitemap frontier → robots.txt admission → (fetch) → WARC archives
  *   → HTTP route → main-content extraction → quality + URL dedup keys
  *
  * The fetch leg is the synthesizer (this container has no network, and
  * the pipeline's correctness surface is everything AROUND the fetch).
  * What this spec pins is the COMPOSITION: column contracts line up,
  * disallowed URLs never reach extraction, boilerplate never reaches
  * the corpus, and the SURT key of every surviving document round-trips
  * to its frontier URL.
  */
class CrawlPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("frontier → robots → warc → main content → keys, end to end") {
    // ---- 1. frontier: sitemaps of two hosts, three URLs each
    val sitemaps = Seq(
      ("h0", "<urlset>" +
        "<url><loc>https://h0.example.org/doc/0</loc></url>" +
        "<url><loc>https://h0.example.org/doc/1</loc></url>" +
        "<url><loc>https://h0.example.org/private/2</loc></url></urlset>"),
      ("h1", "<urlset>" +
        "<url><loc>https://h1.example.org/doc/3</loc></url>" +
        "<url><loc> https://h1.example.org/doc/4 </loc></url>" +
        "<url><loc>https://h1.example.org/tmp/5</loc></url></urlset>"))
      .toDF("host", "xml")
    val frontier = sitemaps
      .select(col("host"),
        explode(TextAnalysis.sitemapEntries(col("xml"))).as("_p"))
      .select(col("host"), element_at(split(col("_p"), "\u001f"), 1).as("url"))
      .withColumn("path", regexp_extract(col("url"), "^[a-z]+://[^/]+(/.*)$", 1))
    assert(frontier.count() == 6)

    // ---- 2. robots: h0 bans /private, h1 bans /tmp for graftbot
    val robots = Seq(
      ("h0", "User-agent: *\nDisallow: /private\n"),
      ("h1", "User-agent: graftbot\nDisallow: /tmp\nUser-agent: *\nDisallow: /\n"))
      .toDF("host", "txt")
    val eff = RobotsRules.effectiveRules(
      RobotsRules.parseDirectives(robots, "host", "txt"), "graftbot")
    val admitted = RobotsRules.evaluate(
      frontier.select("host", "path"), eff)
      .filter(col("allowed"))
      .join(frontier, Seq("host", "path"))
    val admittedIds = admitted.select(
      regexp_extract(col("url"), "([0-9]+)$", 1).cast("long").as("doc_id"))
      .as[Long].collect().sorted.toSeq
    assert(admittedIds == Seq(0L, 1L, 3L, 4L)) // /private/2 and /tmp/5 blocked

    // ---- 3. fetch (synthesized) → WARC archives: the fetcher writes one
    // archive per admitted page, body = the page's HTML with boilerplate
    val pages = admittedIds.toDF("doc_id")
      .withColumn("lang", lit("en"))
      .withColumn("text",
        concat(lit("genuine article body text long enough to keep number "),
          col("doc_id")))
    val archives = Warc.synthesizeWarc(pages, "doc_id")

    // ---- 4. HTTP route → 5. main-content extraction (the fetched HTML
    // carries the synthesizer's boilerplate-free <p> body; wrap it in a
    // nav/footer shell so the extractor has something to remove)
    val html = Warc.htmlResponses(archives)
      .select(col("media_id"),
        concat(
          lit("<div><a href=\"/\">Home</a> <a href=\"/x\">More</a></div>"),
          col("html"),
          lit("<div><a>Terms</a> <a>Privacy</a></div>")).as("h"))
    val extracted = MainContent.extract(html, "media_id", "h")
    val got = extracted.orderBy("media_id").collect()
    // doc 3 is a 404 in the synthesizer — it must be gone by routing
    assert(got.map(_.getLong(0)).toSeq == Seq(0L, 1L, 4L))
    got.foreach { r =>
      val id = r.getLong(0)
      // the title/h1 shards ("Doc N", "EN") are short blocks with dropped
      // neighbors — boilerplate removal sheds them along with nav/footer;
      // only the real paragraph (entity-decoded) survives
      assert(r.getString(1) ==
        s"genuine article body text long enough to keep number $id & more",
        s"main text for $id")
    }

    // ---- 6. corpus keys: canonical URL + SURT, dedup-ready
    val keyed = admitted
      .withColumn("doc_id", regexp_extract(col("url"), "([0-9]+)$", 1).cast("long"))
      .join(extracted, col("doc_id") === col("media_id")) // only survivors
      .select(col("doc_id"),
        TextAnalysis.surtKey(TextAnalysis.canonicalizeUrl(col("url"))).as("surt"),
        col("main_text"))
    val keys = keyed.orderBy("doc_id").collect()
    assert(keys.map(_.getString(1)).toSeq == Seq(
      "org,example,h0)/doc/0", "org,example,h0)/doc/1", "org,example,h1)/doc/4"))
    // SURT sorts cluster by domain: h0 keys are adjacent
    assert(keys.map(_.getString(1)).sorted.take(2).forall(_.contains("h0)")))
  }
}
