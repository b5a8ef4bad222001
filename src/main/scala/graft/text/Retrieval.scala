package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Search-index construction and ranked retrieval over a document corpus —
  * the "make the corpus queryable" half of a training-data pipeline (dataset
  * search, contamination forensics, targeted subset extraction).
  *
  * Scale stance, both operators:
  *  - The shuffle key is always (token) or (token, block) — never the
  *    occurrence stream. Per-(doc, token) tf is reduced map-side first.
  *  - No windows partitioned by token: a stop-word token at 100 TB has
  *    hundreds of millions of postings, and `row_number() OVER (PARTITION BY
  *    token)` would drag them into one task. Posting blocks are keyed by a
  *    doc-id RANGE (a pure projection), so hot terms split across
  *    `ceil(maxDoc / docRange)` tasks mechanically, with no skew shuffle.
  *  - All ranking arithmetic is exact-integer until a final fixed-order
  *    IEEE division, so scores are bit-reproducible across engines (see
  *    [[Vocab]] for the same policy and why `ln`/libm is excluded).
  */
object Retrieval {

  /** Blocked inverted index: (token, block_id, n_docs, tf_block, postings)
    * where `block_id = doc_id div docRange` and `postings` is the
    * "docId:tf" list of the block, comma-joined in doc-id order.
    *
    * Blocking by doc-id range (not by rank) is the scale decision: the
    * block id is computable per-row before any aggregation, so the single
    * shuffle is keyed (token, block) and a stop word's millions of postings
    * spread over all its blocks instead of one reducer. Range blocks are
    * uneven where doc ids are sparse — the accepted trade for skew freedom
    * (rank-balanced blocks need a per-token global sort first).
    *
    * The in-block postings string is assembled with `array_sort` over
    * `struct(doc_id, tf)` — collect order is nondeterministic, struct sort
    * restores doc-id order exactly.
    */
  def invertedIndex(
      df: DataFrame,
      idCol: String,
      textCol: String,
      docRange: Long): DataFrame = {
    require(docRange > 0, s"docRange=$docRange must be positive")
    df.select(col(idCol).as("_doc"), explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy(col("_doc"), col("token"))
      .agg(count(lit(1)).as("_tf"))
      .groupBy(col("token"), expr(s"_doc div ${docRange}L").as("block_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("_tf")).as("tf_block"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("_doc"), col("_tf")))),
            p => concat(p("_doc").cast("string"), lit(":"), p("_tf").cast("string"))),
          ",").as("postings"))
  }

  /** BM25 ranking with k1 = 6/5, b = 3/4, as exact rationals:
    *
    *   tfPart = tf·(k1+1) / (tf + k1·(1−b) + k1·b·dl/avgdl)
    *          = 22·tf·S / (10·tf·S + 3·S + 9·dl·N)        with avgdl = S/N
    *   idf    = (2N − 2·df + 1) / (2·df + 1)
    *
    * where S = Σ dl (corpus token count) and N = |docs|. Both factors are
    * a single division of exact 64-bit integers, and the classical
    * `ln((N−df+0.5)/(df+0.5))` idf is replaced by its (monotone) log
    * argument — same ordering per term, no libm in the gate (the [[Vocab]]
    * rational-IDF precedent). Output: (term, doc_id, tf, dl, score) for the
    * given query terms, score = round(tfPart·idf, 4).
    *
    * Scale shape: tf/dl/S/N are map-side-combined aggregates; the
    * query-term filter lands BEFORE the df join, so only matching postings
    * flow; S and N ride a broadcast one-row cross join. Integer headroom:
    * 22·tf·S stays under 2⁶³ while tf·S < 4·10¹⁷ — beyond that corpus
    * size, downscale S and dl·N by a common power of ten first (the ratio,
    * not the magnitude, carries the score).
    */
  def bm25(
      df: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String]): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val toks = df
      .select(col(idCol).as("doc_id"), explode(TextAnalysis.tokens(col(textCol))).as("term"))
    // per-(doc, term) tf — reduced before anything else touches it
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // per-doc length and the corpus totals
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val totals = dl.agg(sum("dl").as("_s"), count(lit(1)).as("_n"))
    val hits = tf.filter(col("term").isin(queryTerms: _*))
    val dfreq = hits.groupBy("term").agg(count(lit(1)).as("_df"))
    hits
      .join(dl, "doc_id")
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(totals))
      .select(
        col("term"),
        col("doc_id"),
        col("tf"),
        col("dl"),
        round(
          (lit(22L) * col("tf") * col("_s")).cast("double") /
            (lit(10L) * col("tf") * col("_s") + lit(3L) * col("_s") +
              lit(9L) * col("dl") * col("_n")).cast("double") *
            ((lit(2L) * col("_n") - lit(2L) * col("_df") + lit(1L)).cast("double") /
              (lit(2L) * col("_df") + lit(1L)).cast("double")),
          4).as("score"))
  }
}
