package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus vocabulary statistics: term/document frequencies, n-gram counts,
  * TF-IDF scoring — the wordcount family, which at 100 TB is the textbook
  * map-side-combine aggregation (explode → partial count per partition →
  * one shuffle of (term, count) partials, NOT of token occurrences).
  *
  * Two IDF weightings:
  *  - [[tfIdf]]: the RATIONAL variant tf·(N+1)/(df+1). Pure integer/rational
  *    arithmetic → bit-reproducible across engines (`ln` can differ in the
  *    last ulp between libm implementations), which is why the oracle-gated
  *    query uses it. NOTE: because tf multiplies the weight, this is NOT
  *    rank-equivalent to log TF-IDF across terms — it boosts high-tf terms
  *    much harder (log compresses the idf range, the rational form doesn't).
  *  - [[tfIdfLog]]: the standard tf·ln((N+1)/(df+1)) for consumers who want
  *    the classical metric and don't need cross-engine bit-parity.
  */
object Vocab {

  /** (token, tf) global term frequencies. */
  def termFrequencies(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("tf"))

  /** (token, tf, df) term + document frequencies in one pass: dedup
    * (doc, token) with a partial-aggregating groupBy, then count docs per
    * token while summing the per-doc tf — two shuffles, both on compact
    * (doc, token) / (token) keys.
    */
  def termDocFrequencies(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("_tf_doc"))
      .groupBy(col("token"))
      .agg(sum("_tf_doc").as("tf"), count(lit(1)).as("df"))

  /** (token, tf, df, score): rational-IDF weighting tf·(N+1)/(df+1) (see
    * the class doc for how it differs from log TF-IDF), rounded to 4 dp.
    * `nDocs` is passed in (a count the caller already has or computes once)
    * so the score stays a stateless projection.
    */
  def tfIdf(df: DataFrame, idCol: String, textCol: String, nDocs: Long): DataFrame =
    termDocFrequencies(df, idCol, textCol)
      .withColumn(
        "score",
        round(col("tf") * (lit(nDocs) + 1.0) / (col("df") + 1.0), 4))

  /** [[tfIdf]] with the corpus size computed IN the plan (broadcast of a
    * one-row count) — no separate driver-side count job, one submitted job
    * total.
    */
  def tfIdf(df: DataFrame, idCol: String, textCol: String): DataFrame =
    termDocFrequencies(df, idCol, textCol)
      .crossJoin(broadcast(df.agg(count(lit(1)).as("_nd"))))
      .withColumn("score", round(col("tf") * (col("_nd") + 1.0) / (col("df") + 1.0), 4))
      .drop("_nd")

  /** (token, tf, df, score): classical log TF-IDF, tf·ln((N+1)/(df+1)).
    * Not oracle-gated (libm `ln` is not bit-portable across engines); use
    * for in-engine ranking.
    */
  def tfIdfLog(df: DataFrame, idCol: String, textCol: String): DataFrame =
    termDocFrequencies(df, idCol, textCol)
      .crossJoin(broadcast(df.agg(count(lit(1)).as("_nd"))))
      .withColumn("score", col("tf") * log((col("_nd") + 1.0) / (col("df") + 1.0)))
      .drop("_nd")

  /** (id, gini) per-document token diversity as Gini impurity
    * 1 − Σ p_i² over the document's token distribution — the rational twin
    * of token entropy (no logarithm → bit-reproducible across engines),
    * low values flag repetitive/boilerplate docs. Token-less docs have no
    * distribution and are omitted. Two partial-aggregated shuffles on
    * (doc, token) / (doc).
    */
  def giniDiversity(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("_c"))
      .groupBy(col(idCol))
      .agg((lit(1.0) - sum(col("_c") * col("_c")).cast("double") /
        (sum(col("_c")) * sum(col("_c"))).cast("double")).as("gini"))

  /** (id, n_tokens, n_oov, oov_ratio) out-of-vocabulary share per document,
    * where the vocabulary is the corpus's own tokens with global term
    * frequency ≥ `minCount` — the self-referential quality signal (docs
    * full of tokens the rest of the corpus never uses are noise, OCR
    * garbage, or another language). Token-less docs report ratio 0.
    *
    * Scale shape: one explode + map-side-combined count builds the vocab;
    * the membership check is a left join keyed by token — the vocab side is
    * exactly the distinct frequent tokens (Zipf-small vs occurrences), so
    * AQE broadcasts it when it fits and falls back to a token-keyed shuffle
    * when it doesn't. No driver-side collect of the vocabulary.
    */
  def oovRatios(df: DataFrame, idCol: String, textCol: String, minCount: Long): DataFrame = {
    val toks = df.select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("token"))
    val vocab = toks.groupBy("token").agg(count(lit(1)).as("_tf"))
      .filter(col("_tf") >= minCount)
      .select(col("token"), lit(1).as("_in"))
    val per = toks.join(vocab, Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("_in").isNull, 1L).otherwise(0L)).as("n_oov"))
    df.select(col(idCol))
      .join(per, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        when(coalesce(col("n_tokens"), lit(0L)) === 0, lit(0.0))
          .otherwise(col("n_oov") * lit(1.0) / col("n_tokens")).as("oov_ratio"))
  }

  /** Per-document n-gram NOVELTY against everything that came before it
    * in `idCol` order: the share of the document's distinct n-grams whose
    * FIRST corpus occurrence (min doc id) is this document — the
    * "how much of this is new text?" curation signal that separates fresh
    * content from boilerplate recombination. Returns (idCol, n_grams,
    * n_novel, novelty_micro) with `novelty_micro = n_novel·10⁶ div
    * n_grams` (exact integer; 0 for gram-less docs).
    *
    * Scale shape: one explode → per-doc-distinct pass, one grouped min to
    * get each gram's first document, one join back keyed on the gram —
    * all shuffles keyed by gram/doc, map-side combined; no windows, no
    * collect. The gram key follows Heaps' law (≪ token count), so the
    * first-occurrence table stays small relative to the corpus.
    */
  def noveltyRatios(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    // zip-of-slices gram generation (see ngramCounts — the lambda form
    // re-runs the tokenizer per element)
    val len = greatest(size(col("_t")) - (n - 1), lit(0))
    val slices = (0 until n).map(j => slice(col("_t"), lit(1 + j), len).as(s"_g$j"))
    val dg = df
      .select(col(idCol).as("_id"), TextAnalysis.tokens(col(textCol)).as("_t"))
      .select(col("_id"), explode(arrays_zip(slices: _*)).as("_z"))
      .select(col("_id"),
        concat_ws(" ", (0 until n).map(j => col(s"_z._g$j")): _*).as("gram"))
      .distinct()
    val first = dg.groupBy("gram").agg(min("_id").as("_first"))
    val per = dg.join(first, Seq("gram"))
      .groupBy(col("_id"))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("_first") === col("_id"), 1L).otherwise(0L)).as("n_novel"))
    df.select(col(idCol))
      .join(per, col(idCol) === col("_id"), "left")
      .select(
        col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        when(coalesce(col("n_grams"), lit(0L)) > 0,
          expr("n_novel * 1000000 div n_grams")).otherwise(0L).as("novelty_micro"))
  }

  /** (gram, n) word n-gram frequencies (n-gram = space-joined token run —
    * same shape as [[graft.dedup.MinHashLsh.shingles]], but counted, not
    * hashed).
    */
  def ngramCounts(df: DataFrame, textCol: String, n: Int): DataFrame = {
    require(n >= 1, s"n=$n must be >= 1")
    // zip of n shifted slices, NOT transform(sequence)(…slice…): a lambda
    // body is interpreted (CodegenFallback) and re-evaluates the token
    // extraction per ELEMENT — measured ~50x the whole-query time on the
    // trigram gate; the skipgramPairs scaladoc documents the same trap.
    // Tokens project once per row, slices shift, arrays_zip aligns.
    val withT = df.select(TextAnalysis.tokens(col(textCol)).as("_t"))
    val len = greatest(size(col("_t")) - (n - 1), lit(0))
    val slices = (0 until n).map(j => slice(col("_t"), lit(1 + j), len).as(s"_g$j"))
    withT
      .select(explode(arrays_zip(slices: _*)).as("_z"))
      .select(concat_ws(" ", (0 until n).map(j => col(s"_z._g$j")): _*).as("gram"))
      .groupBy("gram")
      .agg(count(lit(1)).as("n"))
  }

  /** (center, context, n) skip-gram co-occurrence counts within a ±`window`
    * token radius — the word2vec/fastText training-pair generation step.
    *
    * A (center, context) pair at distance |i−j| = d ≤ window occurs once
    * FORWARD (j = i+d) or once BACKWARD (j = i−d), and the backward count
    * of (x, y) is the forward count of (y, x). So pair generation is
    * `window` zips of the token array against its d-shifted self —
    * `arrays_zip(slice(t,1,n−d), slice(t,1+d,n−d))` — all simple
    * non-lambda expressions (an earlier nested transform/filter/sequence
    * formulation was 100× slower: higher-order functions are
    * CodegenFallback and the per-token inner sequences allocated
    * interpreter objects per pair). The forward counts are aggregated
    * once, then symmetrized by re-aggregating the union with the swapped
    * projection — two shuffles on the compact pair key, never on the
    * occurrence stream.
    */
  def skipgramPairs(df: DataFrame, textCol: String, window: Int): DataFrame = {
    require(window >= 1, s"window=$window must be >= 1")
    val t = TextAnalysis.tokens(col(textCol))
    val perD = (1 to window).map { d =>
      val len = greatest(size(t) - d, lit(0))
      arrays_zip(slice(t, lit(1), len).as("a"), slice(t, lit(1 + d), len).as("b"))
    }
    val fwd = df
      .select(explode(flatten(array(perD: _*))).as("p"))
      .select(col("p.a").as("center"), col("p.b").as("context"))
      .groupBy("center", "context")
      .agg(count(lit(1)).as("_nf"))
    fwd.select(col("center"), col("context"), col("_nf"))
      .unionByName(fwd.select(col("context").as("center"), col("center").as("context"), col("_nf")))
      .groupBy("center", "context")
      .agg(sum("_nf").as("n"))
  }

  /** (gram, n_pair, lift) collocation mining over adjacent token pairs:
    * `lift` is the PMI's log argument
    *
    *   P(x,y) / (P(x)·P(y))  =  (n_pair/T2) / ((n_x/T1)·(n_y/T1))
    *
    * kept UN-logged (PMI = ln(lift); ln is monotone, so the collocation
    * ranking is identical and the gate stays libm-free — the [[tfIdf]]
    * rational-IDF policy). T1 = total tokens, T2 = total adjacent pairs.
    *
    * The quotient is evaluated in a FIXED operation order,
    * ((n_pair·T1)·T1) / ((T2·n_x)·n_y), every operand cast to double before
    * the first multiply: each IEEE multiply/divide is correctly rounded, so
    * the result is bit-identical across engines and immune to 64-bit
    * overflow (T1² alone exceeds 2⁶³ past ~3·10⁹ tokens).
    *
    * `minCount` floors n_pair — lift is a ratio of small counts and explodes
    * on hapax pairs (the classic PMI pathology); real collocation mining
    * always applies a support floor.
    *
    * Scale shape: unigram and bigram counts are map-side-combined wordcount
    * aggregates; the pair→unigram joins are keyed by token, and the unigram
    * side (distinct vocab, Zipf-small) broadcasts under AQE when it fits.
    */
  def collocations(df: DataFrame, textCol: String, minCount: Long): DataFrame = {
    // uni is read three times (cx join, cy join, T1) and bigrams twice
    // (pairs, T2) — persist both vocab-sized aggregates rather than
    // re-tokenizing the corpus per reference (ReuseExchange only dedupes
    // identical exchanges within one stage graph; the five consumers here
    // sit under different projections, measured 4.8 s → sub-second)
    val uni = termFrequencies(df, textCol)
      .select(col("token"), col("tf").as("_c1")).persist()
    val t1 = uni.agg(sum("_c1").as("_t1"))
    val bigrams = ngramCounts(df, textCol, 2).persist()
    val pairs = bigrams.filter(col("n") >= minCount)
    val t2 = bigrams.agg(sum("n").as("_t2"))
    pairs
      .withColumn("_x", split(col("gram"), " ").getItem(0))
      .withColumn("_y", split(col("gram"), " ").getItem(1))
      .join(uni.withColumnRenamed("token", "_x").withColumnRenamed("_c1", "_cx"), "_x")
      .join(uni.withColumnRenamed("token", "_y").withColumnRenamed("_c1", "_cy"), "_y")
      .crossJoin(broadcast(t1))
      .crossJoin(broadcast(t2))
      .select(
        col("gram"),
        col("n").as("n_pair"),
        round(
          col("n").cast("double") * col("_t1").cast("double") * col("_t1").cast("double") /
            (col("_t2").cast("double") * col("_cx").cast("double") * col("_cy").cast("double")),
          4).as("lift"))
  }

  /** (pair, n) adjacent symbol-pair counts over the word-frequency table —
    * one iteration of BPE vocabulary training (the merge-candidate scoring
    * step: the argmax pair becomes the next merge; Sennrich et al. 2016).
    *
    * Scale shape is the whole point: the pair scan runs over the DISTINCT
    * word table weighted by word frequency, not over token occurrences.
    * Under Zipf, distinct words grow ~O(corpus^0.5) (Heaps' law), so at
    * 100 TB the explode touches millions of short strings, not trillions
    * of tokens — this is exactly how production BPE trainers batch the
    * count step. Per word, pair i is `substring(word, i, 2)` for
    * i ∈ [1, len−1] (char-level symbols, the iteration-0 alphabet), an
    * expression DuckDB replays verbatim for the gate.
    */
  def bpePairCounts(df: DataFrame, textCol: String): DataFrame = {
    val words = termFrequencies(df, textCol) // (token, tf): the distinct-word table
    words
      .filter(length(col("token")) >= 2)
      // explode an int sequence, then one codegen'd substring per position —
      // not a transform() lambda (higher-order functions are CodegenFallback,
      // the skipgramPairs lesson)
      .select(
        col("tf"), col("token"),
        explode(sequence(lit(1), length(col("token")) - 1)).as("_i"))
      .select(col("tf"), col("token").substr(col("_i"), lit(2)).as("pair"))
      .groupBy("pair")
      .agg(sum("tf").as("n"))
  }

  /** Per-document mean unigram surprisal — the cheap proxy for LM-perplexity
    * quality filtering (CCNet/Gopher-style): documents made of globally
    * common tokens score low, documents of rare tokens score high, and both
    * tails are curation candidates.
    *
    * Determinism discipline: a double Σ ln p would depend on accumulation
    * order, so per-TOKEN surprisal ln(N / count(t)) is rounded once to
    * integer MICRO-NATS on the (small) vocabulary table, per-document totals
    * are exact long sums of those integers, and the mean is a floor integer
    * division — the single ln call per DISTINCT token is the only fp op, and
    * its 1-ulp wobble is absorbed by the 10⁻⁶ rounding grid.
    *
    * Scale shape: one token explode feeding two aggregates (vocab counts,
    * per-doc sums) + one shuffle join on the token key; the corpus token
    * total N rides in via a broadcast 1-row cross join, never a collect on
    * the hot path (same recipe as docTfidf's N).
    */
  def surprisalScores(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("token"))
    val totals = toks.agg(count(lit(1)).as("_nt"))
    val weights = toks.groupBy("token").agg(count(lit(1)).as("_cnt"))
      .crossJoin(broadcast(totals))
      .select(
        col("token"),
        floor(log(col("_nt").cast("double") / col("_cnt").cast("double")) *
          lit(1000000.0) + lit(0.5)).cast("long").as("_unats"))
    val per = toks.join(weights, Seq("token"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum("_unats").as("_su"))
    df.select(col(idCol))
      .join(per, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        when(coalesce(col("n_tokens"), lit(0L)) > 0,
          expr("_su div n_tokens")).otherwise(lit(0L)).as("mean_unats"))
  }

  /** BPE merge TRAINING, the full loop ([[bpePairCounts]] is its iteration
    * 0): `iterations` rounds of count-pairs → pick-best → apply-merge over
    * the distinct-word table, returning the learned merge list
    * (iter, lsym, rsym, n). The whole loop is declarative DataFrame
    * algebra — merge application is windowed POSITION arithmetic, not a
    * per-row lambda/UDF, so every stage stays in Spark's native execution:
    *
    *  - state = (wid, tf, pos, sym): each distinct word exploded to one
    *    row per current symbol. Size is Σ|word| over DISTINCT words — the
    *    Heaps'-law bound, ~O(corpus^0.5), never the token stream.
    *  - pair counts: `lead(sym)` over (wid, pos) + a tf-weighted aggregate
    *    (map-side combined).
    *  - best pair: orderBy(n desc, pair asc).limit(1) — a distributed
    *    TakeOrdered, broadcast back; total order makes the argmax (and so
    *    the whole training run) deterministic under ties.
    *  - apply: greedy leftmost non-overlapping merge as pure window math.
    *    Overlap only matters when lsym == rsym (an "aaaa" run); flagged
    *    positions group into runs via pos − row_number() and merge at even
    *    in-run offsets — exactly the leftmost-first rule. A merged
    *    position takes symbol lsym||rsym; the position it consumed drops
    *    via a lag(merged) flag; positions renumber with row_number per
    *    word (bounded partitions: a word's symbol count).
    *
    * Each round's state is persisted: round k's plan would otherwise
    * re-derive rounds 1..k−1 once per downstream branch — the standard
    * iterative-algorithm checkpoint discipline (cf. PageRank.ranks).
    * Caches release on session cleanup; callers running many iterations
    * should unpersist as they go.
    */
  def bpeTrain(df: DataFrame, textCol: String, iterations: Int): DataFrame =
    bpeRounds(df, textCol, iterations)._1.reduce(_ unionByName _)

  /** The final per-word segmentation of an `iterations`-round training
    * run: (wid, tf, pos, sym) — one row per SUBWORD of each distinct
    * word, i.e. the trained tokenizer's answer for the whole vocabulary
    * at once. This is the apply-side artifact [[bpeEncode]] joins onto
    * the token stream.
    */
  def bpeSegmentation(df: DataFrame, textCol: String, iterations: Int): DataFrame =
    bpeRounds(df, textCol, iterations)._2.last

  /** BPE ENCODE — the APPLY step of the trained tokenizer over the
    * corpus (training without encoding is half a tokenizer): per
    * document, its word / BPE-subword / character counts plus
    * subwords-per-word in exact micro-units (the fertility statistic
    * tokenizer evaluations report).
    *
    * Scale shape is the tokenizer-serving one: training state lives on
    * the DISTINCT-word table (Heaps'-law, ~O(corpus^0.5)); the per-word
    * subword counts BROADCAST onto the token stream, so the stream —
    * the only corpus-sized thing here — never shuffles: one map-side
    * join + one per-doc aggregate.
    */
  def bpeEncode(df: DataFrame, idCol: String, textCol: String, iterations: Int): DataFrame = {
    val perWord = bpeSegmentation(df, textCol, iterations)
      .groupBy(col("wid").as("token"))
      .agg(count(lit(1)).as("_nsub"))
    df.select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .join(broadcast(perWord), Seq("token"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("_nsub")).cast("long").as("n_subwords"),
        sum(length(col("token"))).cast("long").as("n_chars"))
      .withColumn("subs_per_word_micro", expr("(n_subwords * 1000000L) div n_words"))
  }

  /** Per-round corpus compression audit for the same training run:
    * (iter, corpus_tokens, distinct_syms) for iter 0 (character baseline)
    * through `iterations` — corpus_tokens is the tf-weighted symbol count
    * (what the encoded corpus would occupy), so each row gates the whole
    * round-k STATE table, not just its argmax. The drop from row k−1 to k
    * is the number of merges APPLIED — equal to merge k's pair count n
    * when lsym ≠ rsym, and strictly less under overlap suppression (an
    * "aaa" run counts two (a,a) adjacencies but admits one merge) — so
    * the audit also pins the non-overlap rule, not just the counts.
    */
  def bpeCompressionStats(df: DataFrame, textCol: String, iterations: Int): DataFrame = {
    val (_, states) = bpeRounds(df, textCol, iterations)
    states.zipWithIndex.map { case (st, k) =>
      st.agg(
        sum(col("tf")).as("corpus_tokens"),
        countDistinct(col("sym")).as("distinct_syms"))
        .select(lit(k).as("iter"), col("corpus_tokens"), col("distinct_syms"))
    }.reduce(_ unionByName _)
  }

  /** The shared training loop: per-round merge rows and the state tables
    * for rounds 0..iterations (all persisted — they are Heaps'-law small;
    * callers consuming only the merges can let session cleanup collect
    * them).
    */
  private def bpeRounds(
      df: DataFrame,
      textCol: String,
      iterations: Int): (Seq[DataFrame], Seq[DataFrame]) = {
    require(iterations > 0, s"iterations=$iterations must be positive")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("wid").orderBy("pos")
    var state = termFrequencies(df, textCol)
      .select(col("token").as("wid"), col("tf"),
        explode(sequence(lit(1), length(col("token")))).as("pos"))
      .withColumn("sym", col("wid").substr(col("pos"), lit(1)))
      .persist()
    val states = scala.collection.mutable.ArrayBuffer(state)
    val merges = (1 to iterations).map { k =>
      val pairs = state
        .withColumn("_nxt", lead(col("sym"), 1).over(w))
        .filter(col("_nxt").isNotNull)
        .groupBy(col("sym"), col("_nxt"))
        .agg(sum(col("tf")).as("n"))
      val best = pairs
        .orderBy(col("n").desc, col("sym").asc, col("_nxt").asc)
        .limit(1)
        .select(col("sym").as("_a"), col("_nxt").as("_b"), col("n"))
        .persist()
      val flagged = state.crossJoin(broadcast(best))
        .withColumn("_flg",
          coalesce(col("sym") === col("_a") &&
            lead(col("sym"), 1).over(w) === col("_b"), lit(false)))
      // leftmost non-overlap: runs of ADJACENT flagged positions merge at
      // even in-run offsets (pos - row_number over flagged rows is
      // constant exactly within such a run)
      val wf = org.apache.spark.sql.expressions.Window
        .partitionBy("wid", "_flg").orderBy("pos")
      val grouped = flagged
        .withColumn("_grp", when(col("_flg"), col("pos") - row_number().over(wf)))
      val wg = org.apache.spark.sql.expressions.Window.partitionBy("wid", "_grp")
      val applied = grouped
        .withColumn("_mrg",
          col("_flg") && (col("pos") - min(col("pos")).over(wg)) % 2 === 0)
        .withColumn("_consumed", coalesce(lag(col("_mrg"), 1).over(w), lit(false)))
        .filter(!col("_consumed"))
        .select(col("wid"), col("tf"),
          row_number().over(w).as("pos"),
          when(col("_mrg"), concat(col("sym"), col("_b"))).otherwise(col("sym")).as("sym"))
      state = applied.persist()
      states += state
      best.select(lit(k).as("iter"), col("_a").as("lsym"), col("_b").as("rsym"), col("n"))
    }
    (merges, states.toSeq)
  }

  /** Good-Turing frequency-of-frequencies: (r, n_r, gt_r) for 1 ≤ r ≤
    * `maxR`, where n_r = how many vocabulary types occur exactly r times
    * and gt_r = (r+1)·n_{r+1}/n_r is the Turing-adjusted count (NULL when
    * n_r or n_{r+1} is 0). The table every smoothing scheme (Katz,
    * Simple GT, the q209 KN discounts) starts from, and the corpus-health
    * signal in its own right: n_1/N is the unseen-mass estimate, and a
    * non-monotone n_r tail flags duplicated boilerplate.
    *
    * Determinism: n_r are exact longs; gt_r is ONE IEEE division of exact
    * integers. Scale shape: token-count aggregate (map-side combined) →
    * count-of-counts aggregate (≤ maxR + 1 groups survive the filter) →
    * self-join on r+1; all keyed shuffles of tiny tables after the first.
    */
  def frequencyOfFrequencies(df: DataFrame, textCol: String, maxR: Int = 10): DataFrame =
    frequencyOfFrequenciesIn(termFrequencies(df, textCol), "tf", maxR)

  /** [[frequencyOfFrequencies]] over an arbitrary type-count table —
    * pass n-gram counts ([[ngramCounts]]) when the unigram vocabulary is
    * too small to have a low-frequency tail.
    */
  def frequencyOfFrequenciesIn(counts: DataFrame, cntCol: String, maxR: Int = 10): DataFrame = {
    require(maxR >= 1, s"maxR=$maxR must be >= 1")
    val ff = counts.groupBy(col(cntCol).as("r")).agg(count(lit(1)).as("n_r"))
      .filter(col("r") <= maxR + 1)
    val next = ff.select((col("r") - 1).as("r"), col("n_r").as("_n_next"))
    ff.filter(col("r") <= maxR)
      .join(next, Seq("r"), "left")
      .select(
        col("r"), col("n_r"),
        when(col("_n_next").isNotNull && col("n_r") > 0,
          ((col("r") + 1) * col("_n_next")).cast("double") / col("n_r").cast("double"))
          .as("gt_r"))
  }

  /** Heaps'-law vocabulary-growth curve: split the corpus into `buckets`
    * doc-id ranges and report, per bucket, the CUMULATIVE token count and
    * CUMULATIVE distinct-type count up to that bucket's end — the V(N)
    * curve whose flattening says "more data is mostly repeating itself"
    * (the diminishing-returns audit run before paying for another crawl).
    *
    * A type's first appearance is min(bucket) over its occurrences — so
    * cumulative vocabulary needs no per-prefix distinct pass: one
    * aggregate per type, one count per first-bucket, one 10-row running
    * sum. Exact integers end-to-end. Scale shape: two map-side-combined
    * aggregates over the token stream + one `buckets`-row window (bounded
    * by the constant bucket count, not the corpus).
    */
  def vocabGrowth(df: DataFrame, idCol: String, textCol: String, buckets: Int = 10): DataFrame = {
    require(buckets >= 1, s"buckets=$buckets must be >= 1")
    val nDocs = math.max(df.select(count(lit(1))).head().getLong(0), 1L)
    // integer `div` (not fp /): the bucket boundary must be the same exact
    // floor in every engine
    val bucket = least(expr(s"(cast($idCol as bigint) * $buckets) div ${nDocs}L"),
      lit(buckets - 1L)).cast("long")
    val tok = df.select(bucket.as("_bk"), explode(TextAnalysis.tokens(col(textCol))).as("token"))
    val tokensPerBucket = tok.groupBy("_bk").agg(count(lit(1)).as("_nt"))
    val firstBucket = tok.groupBy("token").agg(min(col("_bk")).as("_fb"))
      .groupBy(col("_fb").as("_bk")).agg(count(lit(1)).as("_nv"))
    val spine = df.sparkSession.range(buckets).select(col("id").as("_bk"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("bucket")
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    spine
      .join(tokensPerBucket, Seq("_bk"), "left")
      .join(firstBucket, Seq("_bk"), "left")
      .select(col("_bk").as("bucket"),
        coalesce(col("_nt"), lit(0L)).as("_nt"),
        coalesce(col("_nv"), lit(0L)).as("_nv"))
      .select(col("bucket"),
        sum(col("_nt")).over(w).as("cum_tokens"),
        sum(col("_nv")).over(w).as("cum_vocab"))
  }

  /** Zipf-law fit over the top-`topK` tokens: ONE row (n_terms, slope,
    * intercept) from an OLS of ln(frequency) on ln(rank) — slope ≈ −1 is
    * the natural-language signature; a much flatter slope flags synthetic
    * or templated text (the corpus-forensics check). Ranks order by
    * (tf DESC, token) — total, so rank assignment is engine-identical.
    *
    * Determinism: ln runs ONCE per term and is pinned to integer
    * micro-units before any summation (the q182 rule); the OLS normal
    * equations are exact decimal sums of those integers; slope and
    * intercept are closed-form doubles the caller pins.
    *
    * Scale shape: global term count → top-K (rank by count-of-larger via
    * window over K rows — K is a constant, so the single-partition window
    * is bounded) → one K-row aggregate.
    */
  def zipfFit(df: DataFrame, textCol: String, topK: Int = 1000): DataFrame = {
    require(topK >= 2, s"topK=$topK must be >= 2")
    val dec = "decimal(38,0)"
    val top = termFrequencies(df, textCol)
      .orderBy(col("tf").desc, col("token"))
      .limit(topK)
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("tf").desc, col("token"))
    val pinned = top
      .withColumn("_rk", row_number().over(w))
      .select(
        floor(log(col("_rk").cast("double")) * 1000000.0 + 0.5).cast("long").as("_x"),
        floor(log(col("tf").cast("double")) * 1000000.0 + 0.5).cast("long").as("_y"))
    pinned
      .agg(
        count(lit(1)).as("n_terms"),
        sum(col("_x").cast(dec)).as("_sx"),
        sum(col("_y").cast(dec)).as("_sy"),
        sum((col("_x").cast(dec) * col("_y").cast(dec))).as("_sxy"),
        sum((col("_x").cast(dec) * col("_x").cast(dec))).as("_sxx"))
      .select(
        col("n_terms"),
        (expr("cast(n_terms * _sxy - _sx * _sy as double)") /
          expr("cast(n_terms * _sxx - _sx * _sx as double)")).as("slope"),
        ((col("_sy").cast("double") -
          (expr("cast(n_terms * _sxy - _sx * _sy as double)") /
            expr("cast(n_terms * _sxx - _sx * _sx as double)")) * col("_sx").cast("double")) /
          col("n_terms").cast("double") / 1000000.0).as("intercept_unats"))
  }

  /** Hashing-trick featurization: (id, idx, weight) sparse vectors where
    * idx = md5(token) mod `dims` and weight sums the ± sign drawn from the
    * next hash nibble (Weinberger et al.'s signed feature hashing — the
    * sign makes collisions cancel in expectation instead of biasing up).
    * The fixed-width, vocabulary-free featurizer: no dictionary to build,
    * ship, or keep consistent across a 100 TB corpus — the feature space
    * is the hash range itself.
    *
    * md5-derived like every recipe here, so any engine reproduces the
    * exact features. Scale shape: explode → one map-side-combined
    * aggregate keyed by (id, idx); ≤ dims rows per doc out.
    */
  def hashedFeatures(df: DataFrame, idCol: String, textCol: String, dims: Int = 64): DataFrame = {
    require(dims >= 2, s"dims=$dims must be >= 2")
    val h = md5(col("token"))
    val idx = conv(substring(h, 1, 6), 16, 10).cast("long") % dims
    val sign = when(conv(substring(h, 7, 1), 16, 10).cast("long") % 2 === 0, 1L).otherwise(-1L)
    df.select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .select(col(idCol), idx.as("idx"), sign.as("_sg"))
      .groupBy(col(idCol), col("idx"))
      .agg(sum(col("_sg")).as("weight"))
  }
}
