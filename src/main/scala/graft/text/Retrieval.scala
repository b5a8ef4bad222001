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
    val spark = df.sparkSession
    import spark.implicits._
    bm25ForTerms(df, idCol, textCol, queryTerms.toDF("term"))
  }

  /** [[bm25]] with the query vocabulary supplied as a DataFrame of
    * (`term`) instead of a driver-side literal list — the form
    * [[moreLikeThis]] needs, where the query terms come from data and must
    * never be collected to the driver. The term set is deduplicated and
    * broadcast into the postings filter (a broadcast semi-join replaces
    * `isin`), so the plan is identical to [[bm25]]'s beyond the first
    * join.
    */
  def bm25ForTerms(
      df: DataFrame,
      idCol: String,
      textCol: String,
      terms: DataFrame): DataFrame = {
    val toks = df
      .select(col(idCol).as("doc_id"), explode(TextAnalysis.tokens(col(textCol))).as("term"))
    // per-(doc, term) tf — reduced before anything else touches it
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // per-doc length and the corpus totals
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val totals = dl.agg(sum("dl").as("_s"), count(lit(1)).as("_n"))
    val hits = tf.join(broadcast(terms.select("term").distinct()), Seq("term"), "left_semi")
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

  /** "More like this" retrieval: for each anchor document, every other
    * document scored by the SUM of per-term BM25 contributions over the
    * anchor's distinct tokens — the query-by-example flavor of [[bm25]]
    * (dataset search seeded with an exemplar rather than hand-picked
    * terms). Output: (anchor_id, doc_id, lex_i4, rank), rank 1..k per
    * anchor by (score desc, doc_id); the anchor itself is excluded.
    *
    * Determinism: each per-term score is [[bm25]]'s 4-dp-rounded double,
    * converted to an exact 1e4-scaled long (`lex_i4`); the cross-term SUM
    * then runs in integers, so it is aggregation-order-independent — a
    * straight double sum over ~100 query terms would tie-break differently
    * per engine and per shuffle layout.
    *
    * Scale shape: term scores are computed ONCE over the UNION of all
    * anchors' vocabularies, then fanned out to anchors by an equi-join on
    * term — a_q anchors sharing a term never recompute its postings. The
    * per-anchor top-k is `row_number` partitioned by anchor with a rank
    * filter, which Spark plans as a pre-shuffle WindowGroupLimit (each map
    * task keeps k rows per anchor before the exchange — the q66 pattern);
    * anchors are the partition key, so parallelism = |anchors|, and the
    * candidate stream per anchor is already collapsed to one row per
    * (anchor, doc) by the integer sum.
    */
  def moreLikeThis(
      df: DataFrame,
      idCol: String,
      textCol: String,
      anchorIds: Seq[Long],
      k: Int): DataFrame = {
    require(anchorIds.nonEmpty, "need at least one anchor document")
    require(k > 0, s"k=$k must be positive")
    val anchorTerms = df
      .filter(col(idCol).isin(anchorIds: _*))
      .select(col(idCol).as("anchor_id"),
        explode(array_distinct(TextAnalysis.tokens(col(textCol)))).as("term"))
    val scored = bm25ForTerms(df, idCol, textCol, anchorTerms.select("term"))
      .withColumn("_s4", floor(col("score") * 10000.0 + 0.5).cast("long"))
    val summed = scored
      .join(anchorTerms, "term")
      .filter(col("doc_id") =!= col("anchor_id"))
      .groupBy("anchor_id", "doc_id")
      .agg(sum(col("_s4")).as("lex_i4"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("anchor_id").orderBy(col("lex_i4").desc, col("doc_id"))
    summed
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Reciprocal-rank fusion of ranked retrieval lists (Cormack et al.'s
    * RRF) — the standard hybrid-search combiner: each system contributes
    * 1/(kRrf + rank) for the documents it ranked; documents missing from a
    * system contribute nothing. `systems` maps system name → DataFrame of
    * (queryCol, idCol, rank) with rank 1-based.
    *
    * Determinism: the per-system contribution is computed as the INTEGER
    * quotient 1000000 div (kRrf + rank) — exact and engine-portable where
    * a double 1/(k+r) sum would be order-sensitive in the 17th digit — so
    * `rrf_i6` is an exact 1e6-scaled long and the emitted `rrf` double is
    * one final division. Per-system ranks are carried through as
    * `<name>_rank` columns (null where that system missed the doc).
    *
    * Scale shape: one union + one groupBy keyed (query, doc) with map-side
    * combine; the fused top-k is again the pre-shuffle WindowGroupLimit
    * pattern partitioned by query. Inputs are expected to be per-query
    * top-k lists already (bounded), so the union is k·|systems| rows per
    * query, never corpus-sized.
    */
  def rrfFuse(
      systems: Seq[(String, DataFrame)],
      queryCol: String,
      idCol: String,
      kRrf: Int = 60,
      topK: Int = 10): DataFrame = {
    require(systems.nonEmpty, "need at least one ranked system")
    require(kRrf >= 0 && topK > 0, s"kRrf=$kRrf must be >= 0 and topK=$topK positive")
    val tagged = systems.map { case (name, r) =>
      r.select(col(queryCol), col(idCol), col("rank"), lit(name).as("_sys"))
    }.reduce(_ unionByName _)
    val perSystemRanks = systems.map { case (name, _) =>
      min(when(col("_sys") === name, col("rank"))).as(s"${name}_rank")
    }
    val fusedScores = tagged
      .groupBy(col(queryCol), col(idCol))
      .agg(
        sum(expr(s"1000000L div (${kRrf}L + rank)")).as("rrf_i6"),
        perSystemRanks: _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(queryCol).orderBy(col("rrf_i6").desc, col(idCol))
    fusedScores
      .withColumn("fused_rank", row_number().over(w).cast("long"))
      .filter(col("fused_rank") <= topK)
      .withColumn("rrf", col("rrf_i6").cast("double") / 1000000.0)
  }
}
