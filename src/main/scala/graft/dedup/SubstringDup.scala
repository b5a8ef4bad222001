package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SUBSTRING-level duplication audit — the metric behind exact-substring
  * training-data dedup (Lee et al. 2022, "Deduplicating Training Data
  * Makes Language Models Better"): document-level dedup (exact hash,
  * MinHash, SimHash — [[Dedup]]/[[MinHashLsh]]/[[SimHash]]) misses the
  * boilerplate CASE, where distinct documents share long verbatim runs
  * (licenses, headers, templated paragraphs). The per-document readout is
  * "what fraction of this doc's tokens sit inside a token n-gram that
  * also occurs elsewhere in the corpus" — the number a curation pipeline
  * thresholds to route docs to substring-clipping instead of dropping.
  *
  * Method (the scalable stand-in for the paper's suffix array, which does
  * not distribute): slide a length-`n` token shingle over every document
  * (position-stamped), count global shingle frequencies, keep shingles
  * with corpus frequency ≥ `minCount`, and per document merge the
  * surviving [pos, pos+n−1] intervals to an exact covered-token count.
  *
  * Scale shape: shingle generation is a per-row projection (zip-of-slices,
  * no join); the frequency count is one map-side-combined aggregate keyed
  * by shingle; the join back is shingle-keyed (broadcastable when the
  * duplicated-shingle set is small, which on clean corpora it is); the
  * interval merge is a PER-DOCUMENT window (partitioned by doc id — never
  * a global sort). Everything is integer arithmetic — counts, positions,
  * and a final `div` — so the result is engine-exact.
  */
object SubstringDup {

  /** Per-document duplicated-`n`-gram coverage over `docs(idCol, textCol)`:
    * (id, n_tokens, n_dup_grams, dup_tokens, cov_micro) where
    *  - n_tokens    = tokens in the doc ([a-z0-9]+ runs of lower(text));
    *  - n_dup_grams = positions whose length-`n` shingle has corpus
    *                  frequency ≥ `minCount`;
    *  - dup_tokens  = exact size of the union of those [pos, pos+n−1]
    *                  intervals (merged, not double-counted);
    *  - cov_micro   = dup_tokens·10⁶ div n_tokens (0 for empty docs).
    * Docs shorter than `n` tokens emit 0/0/0.
    */
  def dupNgramCoverage(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minCount: Long = 2L): DataFrame = {
    require(n >= 2, s"n=$n must be >= 2")
    require(minCount >= 2, s"minCount=$minCount must be >= 2 (1 marks everything)")
    val toks = docs.select(
      col(idCol).as("_id"),
      expr(s"filter(regexp_extract_all(lower(coalesce($textCol, '')), '[a-z0-9]+', 0), x -> x != '')")
        .as("_t"))
      .withColumn("_n_tok", size(col("_t")).cast("long"))
      .persist()
    // position-stamped shingles: 1-based pos, gram = tokens[pos .. pos+n-1]
    val grams = toks
      .filter(col("_n_tok") >= n)
      .select(
        col("_id"),
        posexplode(expr(
          s"transform(sequence(1, int(_n_tok) - ${n - 1}), i -> concat_ws(' ', slice(_t, i, $n)))"))
          .as(Seq("_p0", "_gram")))
      .select(col("_id"), (col("_p0") + 1).cast("long").as("_pos"), col("_gram"))
    val dup = grams.groupBy("_gram").agg(count(lit(1)).as("_c"))
      .filter(col("_c") >= minCount)
      .select("_gram")
    // interval merge per doc: contribution of [pos, pos+n-1] is its length
    // minus whatever the running max end of PRIOR intervals already covers
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_id").orderBy("_pos")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val hits = grams.join(dup, "_gram")
      .select(col("_id"), col("_pos"), (col("_pos") + (n - 1)).as("_end"))
      .withColumn("_pmax", max(col("_end")).over(w))
      .select(
        col("_id"),
        greatest(
          lit(0L),
          col("_end") - greatest(col("_pos") - 1L, coalesce(col("_pmax"), lit(0L))))
          .as("_cov"))
      .groupBy("_id")
      .agg(count(lit(1)).as("n_dup_grams"), sum("_cov").as("dup_tokens"))
    toks.select(col("_id"), col("_n_tok").as("n_tokens"))
      .join(hits, Seq("_id"), "left")
      .select(
        col("_id").as(idCol),
        col("n_tokens"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"))
      .withColumn(
        "cov_micro",
        when(col("n_tokens") === 0L, lit(0L))
          .otherwise(expr("(dup_tokens * 1000000L) div n_tokens")))
  }
}
