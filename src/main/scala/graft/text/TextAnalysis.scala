package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * statistics, quality scoring, heuristic language ID, and document
  * fingerprinting. All are pure built-in-function compositions — codegen'd,
  * no UDFs — so they fuse into the scan projection and scale linearly with
  * no shuffle.
  */
object TextAnalysis {

  /** Lower-cased alphanumeric tokens. The shared tokenizer for every operator
    * here (and for the dedup family) — one definition so fingerprints and
    * signatures stay comparable across modules.
    */
  def tokens(c: Column): Column = {
    // coalesce first: a NULL text would yield a NULL array, and with legacy
    // sizeOfNull semantics size(NULL) = -1 — every size()-based branch
    // downstream (shingles, ratios) would silently misbehave
    val arr = regexp_extract_all(lower(coalesce(c, lit(""))), lit("[a-z0-9]+"), lit(0))
    // regexp_extract_all("") yields [""]; normalize to an empty array
    filter(arr, t => t =!= "")
  }

  /** Whitespace-split token count (the cheap estimator). */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** Flesch-style readability ingredients from regex counts shared
    * verbatim with the SQL oracle: words = `[a-z0-9]+` runs, sentences =
    * `[.!?]+` terminator runs (min 1 for non-empty text), syllable proxy =
    * `[aeiouy]+` vowel-group runs. All three are exact integers; the score
    * `206.835 − 1.015·W/S − 84.6·V/W` is the caller's one pinned double.
    */
  def wordCount(c: Column): Column = size(tokens(c))
  def sentenceCount(c: Column): Column =
    greatest(regexp_count(coalesce(c, lit("")), lit("[.!?]+")), lit(1))
  def vowelGroupCount(c: Column): Column =
    regexp_count(lower(coalesce(c, lit(""))), lit("[aeiouy]+"))

  /** BPE-ish subword count estimate: alphanumeric runs + standalone
    * punctuation marks each count as one token (a common pre-tokenizer
    * approximation when no vocab is available).
    */
  def subwordCountEstimate(c: Column): Column =
    size(filter(regexp_extract_all(lower(c), lit("[a-z0-9]+|[^a-z0-9\\s]"), lit(0)), t => t =!= ""))

  /** Distinct-token ratio scaled to [0,1] — low values flag boilerplate. */
  def distinctTokenRatio(c: Column): Column = {
    val t = tokens(c)
    when(size(t) === 0, lit(0.0))
      .otherwise(size(array_distinct(t)).cast("double") / size(t))
  }

  /** Mean token length in characters. */
  def meanTokenLength(c: Column): Column = {
    val t = tokens(c)
    when(size(t) === 0, lit(0.0))
      .otherwise(
        aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double") / size(t))
  }

  /** Fraction of characters that are neither alphanumeric nor whitespace. */
  def punctRatio(c: Column): Column =
    when(length(c) === 0, lit(0.0))
      .otherwise(
        (length(c) - length(regexp_replace(c, "[^a-zA-Z0-9\\s]", ""))).cast("double") /
          length(c))

  /** Per-language stopword sets for the n-gram/stopword language heuristic.
    * Tiny on purpose: language ID at corpus scale wants a cheap, fully
    * data-parallel vote, not a model.
    */
  val StopwordSets: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "a"),
    "es" -> Seq("el", "la", "de", "que", "los", "es", "una"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "nicht"),
    "fr" -> Seq("le", "la", "les", "des", "est", "une", "dans"))

  /** Stopword hit count for one language over the token array. */
  def stopwordHits(c: Column, words: Seq[String]): Column =
    size(filter(tokens(c), t => t.isInCollection(words)))

  /** Heuristic language ID: argmax of stopword votes; ties resolve in
    * [[StopwordSets]] order (deterministic); zero votes → "und" (undetermined).
    */
  def langId(c: Column): Column = {
    val scores = StopwordSets.map { case (lang, ws) => lang -> stopwordHits(c, ws) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = scores.reverse.foldLeft(lit("und")) { case (acc, (lang, s)) =>
      when(s === best && s > 0, lit(lang)).otherwise(acc)
    }
    pick
  }

  /** Stopword ratio for quality scoring: fraction of tokens that are
    * stopwords in ANY known language.
    */
  def stopwordRatio(c: Column): Column = {
    val all = StopwordSets.flatMap(_._2).distinct
    val t = tokens(c)
    when(size(t) === 0, lit(0.0))
      .otherwise(size(filter(t, x => x.isInCollection(all))).cast("double") / size(t))
  }

  /** PII scrub for training corpora: emails, then URLs, replaced with typed
    * placeholder tokens. Patterns are deliberately simple and RE2-compatible
    * so the recipe is portable across engines.
    */
  def redactPii(c: Column): Column = {
    val noEmail = regexp_replace(c, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    regexp_replace(noEmail, "https?://[^\\s]+", "<URL>")
  }

  /** Repetition scores per document: occurrences of the single most frequent
    * word bigram over the total bigram count — near 1.0 flags degenerate
    * boilerplate ("buy now buy now buy now"). Docs with < 2 tokens score 0.
    * Explode → two-level aggregate (a per-gram count inside a lambda would
    * be quadratic per doc); one shuffle keyed by id.
    */
  def repetitionScores(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    // pre-project tokens, then zip shifted slices: bigrams-from-a-lambda
    // re-evaluates the tokenizer per element (the ngramCounts trap)
    val len = greatest(size(col("_t")) - 1, lit(0))
    val grams = df
      .select(col(idCol), tokens(col(textCol)).as("_t"))
      .select(col(idCol), explode(arrays_zip(
        slice(col("_t"), lit(1), len).as("a"),
        slice(col("_t"), lit(2), len).as("b"))).as("_p"))
      .select(col(idCol), concat_ws(" ", col("_p.a"), col("_p.b")).as("_g"))
    val perGram = grams.groupBy(col(idCol), col("_g")).agg(count(lit(1)).as("_c"))
    val scored = perGram.groupBy(col(idCol))
      .agg((max(col("_c")).cast("double") / sum(col("_c"))).as("repetition"))
    df.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("repetition"), lit(0.0)).as("repetition"))
  }

  /** Per-document token-distribution Shannon entropy — the information-
    * density quality signal the ratio features (distinct-token ratio,
    * Gini) approximate: near-zero entropy flags the pathological repeats
    * (keyword stuffing, template loops) and entropy far above the corpus
    * norm flags token soup (hash dumps, minified junk). Computed in
    * PINNED MICRO-NATS (the q182 ln discipline) so the result is
    * engine-exact: with per-doc token frequencies c over n tokens,
    *
    *   h_micro = lnµ(n) − (Σ c·lnµ(c)) div n,   lnµ(x) = ⌊ln(x)·10⁶ + ½⌋
    *
    * — one pinned ln per (doc, type) grain row plus one per doc, exact
    * long sums in between. `h_norm` = h_micro / lnµ(n) (the efficiency
    * normalization, in [0,1]) is the single final double division; NULL
    * for docs with n ≤ 1 (undefined), 0-token docs report h_micro 0.
    *
    * Scale shape: one (doc, token) count aggregate with map-side combine,
    * one doc-keyed reduce, one join back — no windows, no driver paths.
    */
  def tokenEntropy(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val tf = df
      .select(col(idCol), explode(tokens(col(textCol))).as("_tok"))
      .groupBy(col(idCol), col("_tok"))
      .agg(count(lit(1)).as("_c"))
      .withColumn("_lnc",
        floor(log(col("_c").cast("double")) * 1000000.0 + 0.5).cast("long"))
    val agg = tf.groupBy(col(idCol))
      .agg(
        sum("_c").as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(expr("_c * _lnc")).as("_s"))
      .withColumn("_lnn",
        floor(log(col("n_tokens").cast("double")) * 1000000.0 + 0.5).cast("long"))
      .withColumn("h_micro", expr("_lnn - (_s div n_tokens)"))
      .withColumn("h_norm",
        when(col("n_tokens") > 1L,
          col("h_micro").cast("double") / col("_lnn").cast("double")))
    df.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_types"), lit(0L)).as("n_types"),
        coalesce(col("h_micro"), lit(0L)).as("h_micro"),
        col("h_norm"))
  }

  /** Sliding token-window chunking — the context-window preprocessing step
    * of a pretraining/RAG pipeline: each document becomes overlapping chunks
    * of `window` tokens advancing by `stride` (stride < window ⇒ overlap of
    * window − stride tokens carries context across boundaries; stride =
    * window ⇒ disjoint blocks). Chunk count per doc is
    * 1 + ⌈max(n − window, 0) / stride⌉, so every token lands in ≥ 1 chunk
    * and the final chunk may be short; empty docs produce no chunks.
    *
    * Scale shape: tokenize + per-doc chunk-index sequence + posexplode, all
    * built-ins inside one codegen'd projection — no shuffle, no UDF; output
    * grows ~n/stride per doc, linear in corpus size. The explode is the
    * standard row-multiplier Spark distributes for free (contrast a
    * driver-side loop over docs).
    */
  def chunkTokenWindows(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      window: Int,
      stride: Int): org.apache.spark.sql.DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val t = tokens(col(textCol))
    // ceil(max(n-window,0)/stride); Spark `/` is double division even on
    // ints — floor keeps it integral (token counts are far below 2^53)
    val lastIdx =
      floor((greatest(col("_n") - window, lit(0)) + lit(stride - 1)) / lit(stride))
    df.select(col(idCol), t.as("_t"), size(t).as("_n"))
      .filter(col("_n") > 0)
      .select(
        col(idCol),
        col("_t"),
        col("_n"),
        posexplode(sequence(lit(0), lastIdx.cast("int"))).as(Seq("chunk_id", "_i")))
      .select(
        col(idCol),
        col("chunk_id").cast("long").as("chunk_id"),
        array_join(
          slice(
            col("_t"),
            col("chunk_id") * stride + 1,
            least(lit(window), col("_n") - col("chunk_id") * lit(stride))),
          " ").as("chunk_text"),
        least(lit(window), col("_n") - col("chunk_id") * lit(stride))
          .cast("long").as("n_tokens"))
  }

  /** HTML → text extraction (the CommonCrawl-style intake step): drop
    * comments and script/style blocks, strip tags, decode the five basic
    * entities, collapse whitespace. Entity decode runs AFTER tag stripping,
    * so `&lt;b&gt;` yields literal "<b>" text instead of becoming a tag
    * that then vanishes. All global regexp_replace with RE2-safe patterns
    * (non-greedy, no lookarounds) — the oracle replays the identical chain;
    * a real deployment would swap in a proper parser behind this same
    * column contract. The block patterns carry `(?s)` (valid in both Java
    * regex and RE2) because real script/style/comment bodies span lines and
    * `.` stops at `\n` in both engines without it. Stateless projection,
    * no shuffle.
    */
  def extractHtmlText(h: Column): Column = {
    val noScript =
      regexp_replace(h, "(?s)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noScript, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]*>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
      "&amp;" -> "&") // &amp; LAST, or double-encoded entities decode twice
      .foldLeft(noTags) { case (c, (e, v)) => regexp_replace(c, e, v) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Deterministic linear quality score — the slot a learned quality
    * classifier (fastText-style) occupies in a curation pipeline, filled
    * with a fixed public stub model so the plumbing (featurize → score →
    * threshold) is real and oracle-checkable: the features are this
    * module's exact ratios, the weights are constants, and the fully
    * parenthesized arithmetic evaluates in the same order in any engine.
    * Swap the expression for a real model's scorer without touching the
    * pipeline shape.
    */
  def stubQualityScore(textCol: Column): Column =
    round(
      (distinctTokenRatio(textCol) * 2.0) +
        (least(tokenCount(textCol).cast("double"), lit(100.0)) / 100.0) -
        (punctRatio(textCol) * 3.0),
      6)

  /** URL canonicalization — the dedup-key normalizer of web-corpus curation
    * (the same page arrives as `HTTPS://WWW.Site.com:443/p?utm_source=x#top`
    * and `https://site.com/p`; without canonicalization URL-level dedup
    * misses them). Steps, in order: drop the fragment; lowercase the
    * scheme+host prefix; strip only the scheme's DEFAULT port (`:443` for
    * https, `:80` for http — an explicit `http://host:443` keeps its
    * non-default port); strip a leading `www.`; remove `utm_*` tracking
    * params from the QUERY STRING only (a `/docs/utm_guide` path segment or
    * an `xutm_source` param is untouched; surviving params keep their
    * order). Every step is a global regexp_replace / substring over RE2-safe
    * patterns (no lookarounds) — query-only scoping comes from splitting at
    * the first `?` and anchoring each param at a prepended `&`, not from
    * lookbehind — so the DuckDB oracle replays the identical algebra. Pure
    * stateless projection — no shuffle, codegen'd.
    */
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*", "")
    // host prefix stops at '/' OR '?': a path-less URL with a query
    // (https://host?x=1) must not swallow the query into the host, or the
    // utm/port rules below never see it
    val prefix = regexp_extract(noFrag, "^[a-zA-Z]+://[^/?]+", 0)
    val rest = noFrag.substr(length(prefix) + 1, lit(1000000))
    val host = regexp_replace(
      regexp_replace(
        regexp_replace(lower(prefix), "^(https://[^/]*):443$", "$1"),
        "^(http://[^/]*):80$", "$1"),
      "://www\\.", "://")
    // split path|query at the first '?': utm stripping must not see the path
    val qPos = instr(rest, "?")
    val path = when(qPos > 0, rest.substr(lit(1), qPos - 1)).otherwise(rest)
    val query = when(qPos > 0, rest.substr(qPos + 1, lit(1000000))).otherwise(lit(""))
    // prepend '&' so every param is &-anchored: "&utm_…" never matches a
    // param merely CONTAINING utm_ (xutm_source) — then drop the sentinel
    val cleaned = regexp_replace(
      regexp_replace(concat(lit("&"), query), "&utm_[^&]*", ""), "^&", "")
    concat(host, path, when(cleaned === "", lit("")).otherwise(concat(lit("?"), cleaned)))
  }

  /** SURT key (Sort-friendly URI Reordering Transform) — the index key of
    * web-archive lookups (Common Crawl's CDX indexes are SURT-ordered):
    * drop the scheme and a leading `www.`, REVERSE the host labels joined
    * by commas, append `)` and the path+query, lowercase throughout — so
    * a plain sort clusters every URL of a domain (and its subdomains)
    * contiguously, which is what makes per-domain range scans of a
    * 100 TB-crawl index cheap. `https://www.Example.org/A/b?q=1` →
    * `org,example)/a/b?q=1`. Compose after [[canonicalizeUrl]] for the
    * dedup-grade key. Pure string algebra (split/reverse/join) — no
    * shuffle, oracle-replayable.
    */
  def surtKey(u: Column): Column = {
    val lu = lower(u)
    val host = regexp_extract(lu, "^[a-z]+://(?:www\\.)?([^/:?#]+)", 1)
    // an explicit port rides AFTER the reversed labels (`com,example:8080)`)
    // so it never splits a label; canonicalizeUrl already dropped defaults
    val port = regexp_extract(lu, "^[a-z]+://(?:www\\.)?[^/:?#]+(:[0-9]+)?", 1)
    val rest = regexp_extract(lu, "^[a-z]+://[^/?#]+([/?#].*)?$", 1)
    concat(
      array_join(reverse(split(host, "\\.")), ","),
      port,
      lit(")"),
      when(rest === "", lit("/")).otherwise(rest))
  }

  /** Sitemap URL extraction — the crawl-frontier feed: pull every
    * `<loc>` (and its sibling `<lastmod>`, when present in the same
    * `<url>` block) out of a sitemap XML body. Regexp-relational (the
    * `<url>` blocks explode, each yields one row), so the frontier
    * builder is one projection + explode — no XML parser dependency, and
    * the oracle replays it. Returns an array of `loc<US>lastmod`
    * packed strings (empty lastmod when absent) for the caller to
    * explode and split.
    */
  def sitemapEntries(xml: Column): Column =
    transform(
      regexp_extract_all(xml, lit("(?s)<url>(.*?)</url>"), lit(1)),
      b => concat(
        regexp_extract(b, "<loc>\\s*(.*?)\\s*</loc>", 1),
        lit("\u001f"),
        regexp_extract(b, "<lastmod>\\s*(.*?)\\s*</lastmod>", 1)))

  /** Corpus-level repeated-span removal (the RefinedWeb/CCNet "duplicated
    * line" correction, over token spans since this corpus has no line
    * structure): split each doc into NON-overlapping `spanTokens`-token
    * spans ([[chunkTokenWindows]] with stride = window), drop every span
    * whose exact text occurs in ≥ `minDocs` distinct documents (boilerplate,
    * navigation chrome, duplicated-document bodies), and reassemble the
    * survivors in order. Token-less docs produce no output row (they have
    * no spans), matching the chunking contract.
    *
    * Returns (id, kept_text, n_spans, n_dropped).
    *
    * Scale shape: chunking is a no-shuffle projection; the hot-span set is
    * one map-side-combined distinct-count keyed by span text; membership is
    * a span-keyed left join (hot side is the FILTERED span list — tiny by
    * Zipf, AQE broadcasts it); reassembly is one groupBy(id) whose payload
    * is the doc's own spans. No driver-side text ever.
    */
  def stripRepeatedSpans(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      spanTokens: Int,
      minDocs: Int): org.apache.spark.sql.DataFrame = {
    require(minDocs >= 2, s"minDocs=$minDocs: a span always occurs in its own doc")
    val chunks = chunkTokenWindows(df, idCol, textCol, spanTokens, spanTokens)
    val hot = chunks.groupBy(col("chunk_text"))
      .agg(countDistinct(col(idCol)).as("_nd"))
      .filter(col("_nd") >= minDocs)
      .select(col("chunk_text"), lit(1).as("_hot"))
    chunks.join(hot, Seq("chunk_text"), "left")
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(
        col("chunk_id"), col("chunk_text"), col("_hot").isNotNull.as("hot")))).as("_spans"))
      .select(
        col(idCol),
        array_join(
          transform(
            filter(col("_spans"), s => !s.getField("hot")),
            s => s.getField("chunk_text")),
          " ").as("kept_text"),
        size(col("_spans")).cast("long").as("n_spans"),
        size(filter(col("_spans"), s => s.getField("hot"))).cast("long").as("n_dropped"))
  }

  /** Content fingerprint: md5 over the sorted distinct token set — robust to
    * token order and repetition (the "bag fingerprint" used for clustering
    * shuffled copies of a document).
    */
  def bagFingerprint(c: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(c))), " "))

  /** Winnowing-style rolling fingerprint: minimum md5 over all k-length
    * character windows of the normalized text — stable under small edits far
    * from the minimizing window (k-gram winnowing with window = whole doc).
    */
  def rollingMinFingerprint(c: Column, k: Int = 8): Column = {
    val norm = regexp_replace(lower(c), "\\s+", " ")
    val n = length(norm)
    when(n < k, md5(norm)).otherwise(
      array_min(transform(sequence(lit(1), n - k + 1), i => md5(norm.substr(i, lit(k))))))
  }
}
