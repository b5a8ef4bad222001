package graft

import graft.text.MainContent
import org.apache.spark.sql.functions._

/** Block-density main-content gates: density drops, length drops, the
  * heading bridge (and its one-sided refusal), inline links inside real
  * content, and all-boilerplate pages.
  */
class MainContentSpec extends SparkSpec {
  import spark.implicits._

  private def run(html: String): Option[(String, Long, Long)] =
    MainContent.extract(Seq((1L, html)).toDF("id", "h"), "id", "h")
      .collect().headOption.map(r => (r.getString(1), r.getLong(2), r.getLong(3)))

  private val longA = "this paragraph carries plenty of real sentence text to keep"
  private val longB = "a second paragraph with equally real and sufficient content"

  test("nav and footer drop on link density; paragraphs keep; heading bridges") {
    val html = s"""<div><a href="/">Home</a> <a href="/x">About</a></div>
      |<p>$longA</p><h2>Part two</h2><p>$longB</p>
      |<div><a>Terms</a> <a>Privacy</a></div>""".stripMargin.replace("\n", "")
    val Some((text, total, kept)) = run(html)
    assert(text == s"$longA Part two $longB")
    assert(total == 5 && kept == 3)
  }

  test("bridge needs BOTH neighbors kept; teaser stays dropped") {
    val html = s"""<p>$longA</p><h2>Lonely heading</h2>
      |<div><a href="/m">read more</a> teaser</div><p>$longB</p>""".stripMargin
      .replace("\n", "")
    val Some((text, _, kept)) = run(html)
    // heading's right neighbor (teaser) is not base-kept → no bridge
    assert(text == s"$longA $longB" && kept == 2)
  }

  test("inline link inside long content does not kill the block") {
    val html = s"""<p>$longA with one <a href="/ref">citation</a> inline $longB</p>"""
    val Some((text, total, kept)) = run(html)
    assert(kept == 1 && total == 1)
    assert(text == s"$longA with one citation inline $longB")
  }

  test("all-boilerplate page keeps nothing (auditable empty row); entities decode") {
    assert(run("""<div><a>Home</a></div><div><a>More</a> x</div>""")
      .contains(("", 2L, 0L)))
    val Some((text, _, _)) =
      run(s"<p>$longA &amp; more &lt;raw&gt; content words</p>")
    assert(text == s"$longA & more <raw> content words")
  }
}
