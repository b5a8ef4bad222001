package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MAIN-CONTENT extraction (boilerplate removal) — the curation step
  * BETWEEN "strip the tags" and "train on it": navigation bars, footers,
  * cookie banners, and read-more teasers survive plain tag stripping and
  * poison a text corpus at scale. This is the block-density heuristic
  * family (boilerpipe/readability/trafilatura's core signal) in fully
  * RELATIONAL form: split the page into blocks at block-level tag
  * boundaries, score each block by visible-text length and LINK DENSITY
  * (anchor-text chars / text chars — boilerplate is link-dense, content
  * is not), keep long low-link blocks, and BRIDGE short blocks
  * sandwiched between two kept neighbors (headings between paragraphs).
  * Every step is regexp algebra + one window + one grouped aggregate, so
  * a DuckDB oracle replays it exactly and the whole pass is two shuffles
  * at any corpus size. Thresholds are integer-exact (link_chars·100 ≤
  * text_chars·maxLinkPct — no float density to disagree on).
  *
  * A learned boilerplate classifier drops into the same column contract:
  * the features (block text, length, link chars, position) are exactly
  * what such models consume.
  */
object MainContent {

  /** Block-level boundary tags: splitting at them yields the page's
    * visual text blocks; inline tags (`a`, `b`, `span`, …) stay INSIDE
    * blocks, which is what makes per-block link density measurable.
    */
  val BlockTagPattern: String =
    "(?i)</?(?:p|div|td|li|h[1-6]|section|article|header|footer|nav|aside|ul|ol|table|tr|br)[^>]*>"

  /** Visible text of a raw block: drop script/style bodies, strip the
    * remaining (inline) tags, decode the five basic entities, collapse
    * whitespace — [[TextAnalysis.extractHtmlText]]'s chain at block
    * grain (same order, same patterns, oracle-replayable).
    */
  def visibleText(raw: Column): Column = {
    val noScript =
      regexp_replace(raw, "(?s)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noScript, "<[^>]*>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
      "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, v)) => regexp_replace(c, e, v) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Total visible anchor-text chars of a raw block: the group-1 bodies
    * of its `<a …>…</a>` spans, tag-stripped and whitespace-collapsed by
    * the same algebra.
    */
  def linkChars(raw: Column): Column =
    aggregate(
      regexp_extract_all(raw, lit("(?s)<a[^>]*>(.*?)</a>"), lit(1)),
      lit(0L),
      (acc, m) => acc + length(trim(regexp_replace(
        regexp_replace(m, "<[^>]*>", " "), "\\s+", " "))))

  /** Extract main content per document: (id, main_text, total_blocks,
    * kept_blocks). Invisible blocks (empty visible text — the slivers
    * between adjacent tags) are dropped FIRST, so neighborhood means
    * "adjacent VISIBLE block"; then a block is kept when its text has at
    * least `minChars` chars AND link density ≤ `maxLinkPct`% (integer
    * compare), or when BOTH visible neighbors are base-kept (the
    * heading-between-paragraphs bridge). `total_blocks` counts visible
    * blocks. Plan: one stateless explode + block scoring, one window
    * (lag/lead on block index), one grouped aggregate back to document
    * grain — blocks of a document stay in one partition through both.
    */
  def extract(
      df: DataFrame,
      idCol: String,
      htmlCol: String,
      minChars: Int = 25,
      maxLinkPct: Int = 33): DataFrame = {
    val blocks = df
      .select(col(idCol).as("_id"),
        posexplode(split(col(htmlCol), BlockTagPattern)).as(Seq("_i", "_raw")))
      .select(col("_id"), col("_i"),
        visibleText(col("_raw")).as("_txt"),
        linkChars(col("_raw")).as("_link"))
      .filter(col("_txt") =!= "")
      .withColumn("_base",
        (length(col("_txt")) >= minChars) &&
          (col("_link") * 100 <= length(col("_txt")).cast("long") * maxLinkPct))
    val w = Window.partitionBy("_id").orderBy("_i")
    val bridged = blocks.withColumn("_keep",
      col("_base") ||
        (coalesce(lag(col("_base"), 1).over(w), lit(false)) &&
          coalesce(lead(col("_base"), 1).over(w), lit(false))))
    bridged
      .groupBy(col("_id").as(idCol))
      .agg(
        array_join(
          transform(
            filter(
              sort_array(collect_list(struct(col("_i"), col("_keep"), col("_txt")))),
              s => s.getField("_keep")),
            s => s.getField("_txt")),
          " ").as("main_text"),
        count(lit(1)).as("total_blocks"),
        sum(when(col("_keep"), 1L).otherwise(0L)).as("kept_blocks"))
  }
}
