package graft

import graft.text.RobotsRules
import org.apache.spark.sql.functions._

/** RobotsRules unit gates — the RFC 9309 corners the q336 grid can't
  * reach: hosts with NO robots.txt, agent-name case folding, unknown
  * directives and comments, mid-rule `$` as a literal, LIKE
  * metacharacters in paths, and multiple exact groups combining.
  */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private def verdicts(robotsTxt: Map[String, String], urls: Seq[(String, String)],
      agent: String = "graftbot"): Map[(String, String), (Option[String], Boolean)] = {
    val robots = robotsTxt.toSeq.toDF("host", "txt")
    val eff = RobotsRules.effectiveRules(
      RobotsRules.parseDirectives(robots, "host", "txt"), agent)
    RobotsRules.evaluate(urls.toDF("host", "path"), eff)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((Option(r.getString(2)), r.getBoolean(3))))
      .toMap
  }

  test("no robots.txt, no matching group, unknown directives → allowed") {
    val v = verdicts(
      Map(
        "a" -> "User-agent: otherbot\nDisallow: /\n",
        "b" -> "Sitemap: https://b/s.xml\nCrawl-delay: 10\n"),
      Seq(("a", "/x"), ("b", "/x"), ("nohost", "/x")))
    assert(v(("a", "/x")) == (None, true)) // no group binds graftbot
    assert(v(("b", "/x")) == (None, true)) // only unknown directives
    assert(v(("nohost", "/x")) == (None, true)) // no robots at all
  }

  test("agent match folds case; comments stripped; star shaded by exact") {
    val txt = "# policy\nUser-Agent: GRAFTBOT # inline\nDisallow: /d\n" +
      "User-agent: *\nDisallow: /\n"
    val v = verdicts(Map("h" -> txt), Seq(("h", "/d/x"), ("h", "/open")))
    assert(v(("h", "/d/x")) == (Some("/d"), false))
    assert(v(("h", "/open")) == (None, true)) // star group must not apply
  }

  test("mid-rule $ is literal; trailing $ anchors; like metachars literal") {
    val txt = "User-agent: *\nDisallow: /a$b\nDisallow: /p_%x\nAllow: /exact$\n"
    val v = verdicts(Map("h" -> txt),
      Seq(("h", "/a$b/c"), ("h", "/aXb"), ("h", "/p_%xz"), ("h", "/pW%xz"),
        ("h", "/exact"), ("h", "/exactly")))
    assert(v(("h", "/a$b/c")) == (Some("/a$b"), false)) // literal mid-$ prefix
    assert(v(("h", "/aXb")) == (None, true))
    assert(v(("h", "/p_%xz")) == (Some("/p_%x"), false)) // _ and % not wildcards
    assert(v(("h", "/pW%xz")) == (None, true))
    assert(v(("h", "/exact")) == (Some("/exact$"), true)) // anchor hits exact
    assert(v(("h", "/exactly")) == (None, true)) // anchor rejects longer
  }

  test("two exact groups combine; wildcard * spans octets") {
    val txt = "User-agent: graftbot\nDisallow: /one\n" +
      "User-agent: other\nAllow: /\n" +
      "User-agent: graftbot\nDisallow: /two*end\n"
    val v = verdicts(Map("h" -> txt),
      Seq(("h", "/one/a"), ("h", "/two-middle-end/x"), ("h", "/two")))
    assert(v(("h", "/one/a")) == (Some("/one"), false))
    assert(v(("h", "/two-middle-end/x")) == (Some("/two*end"), false))
    assert(v(("h", "/two")) == (None, true)) // * needs the suffix present
  }

  test("longest match wins; equal length → allow wins") {
    val txt = "User-agent: *\nDisallow: /dir\nAllow: /dir/sub\n" +
      "Disallow: /tie1\nAllow: /tie2\n"
    val v = verdicts(Map("h" -> txt),
      Seq(("h", "/dir/sub/x"), ("h", "/dir/other")))
    assert(v(("h", "/dir/sub/x")) == (Some("/dir/sub"), true))
    assert(v(("h", "/dir/other")) == (Some("/dir"), false))
    // equal-length tie on a path both match
    val tie = "User-agent: *\nDisallow: /same\nAllow: /sam*\n"
    val vt = verdicts(Map("h" -> tie), Seq(("h", "/same/x")))
    assert(vt(("h", "/same/x"))._2) // both len 5 → allow wins
  }
}
