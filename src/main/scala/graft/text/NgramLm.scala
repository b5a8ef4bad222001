package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interpolated Kneser-Ney bigram language model (Kneser & Ney 1995; the
  * Chen & Goodman 1998 interpolated form) — the classic count-based LM a
  * data pipeline can train in two aggregates and use for perplexity-proxy
  * quality scoring, domain drift detection, and decontamination triage
  * without any learned weights:
  *
  *   p(w|v) = max(c(vw) − d, 0)/c(v) + λ(v)·p_cont(w)
  *   λ(v)      = d · N1+(v·) / c(v)        (mass discounted off v's bigrams)
  *   p_cont(w) = N1+(·w) / T               (how many CONTEXTS w follows)
  *
  * with the standard discount d = 0.75 = 3/4 — dyadic, so multiplying
  * through by 4 makes every numerator and denominator an exact 64-bit
  * integer product ([[Keyness]]' rational-over-log policy):
  *
  *   p(w|v) = max(4c−3, 0)/(4·c(v)) + 3·N1+(v·)·N1+(·w) / (4·c(v)·T)
  *
  * — two IEEE divisions and one add per bigram, identical in any engine.
  * The continuation count N1+(·w) (distinct LEFT contexts of w) is what
  * makes KN beat naive backoff: "francisco" is frequent but follows only
  * "san", so its unigram fallback mass is tiny.
  *
  * Scale shape: bigram counts from one explode + map-side-combined
  * groupBy ([[Vocab.ngramCounts]]); c(v) / N1+(v·) / N1+(·w) / T are all
  * re-aggregations of that BIGRAM TYPE table (Heaps'-law sized, never the
  * token stream), joined back on (v) and (w) — both sides reduced before
  * every join.
  *
  * Integer headroom: 4·c(v)·T — with corpus-scale c(v) ~ 10⁹ and bigram
  * types T ~ 10⁸ this exceeds int64; downscale T and the continuation
  * counts by a common power of ten first (the ratio carries the
  * statistic — the Keyness/BM25 documented policy).
  */
object NgramLm {

  /** Per-bigram interpolated-KN probability: (v, w, c_vw, c_v, p_kn).
    * `p_kn` is the two-term closed form above, NOT pinned — callers pin
    * for gates. Bigrams are adjacent within-document token pairs.
    */
  def kneserNeyBigrams(df: DataFrame, textCol: String): DataFrame =
    kneserNeyFromCounts(
      Vocab.ngramCounts(df, textCol, 2)
        .select(split(col("gram"), " ").getItem(0).as("v"),
          split(col("gram"), " ").getItem(1).as("w"),
          col("n").as("c_vw")))

  /** Same model from a pre-computed bigram-type table (v, w, c_vw) — for
    * callers that already hold the corpus bigram counts.
    */
  def kneserNeyFromCounts(cb: DataFrame): DataFrame = {
    val cv = cb.groupBy("v").agg(sum("c_vw").as("c_v"))
    val fwd = cb.groupBy("v").agg(count(lit(1)).as("_n1f"))
    val back = cb.groupBy("w").agg(count(lit(1)).as("_n1b"))
    val types = cb.agg(count(lit(1)).as("_t"))
    cb.join(cv, "v")
      .join(fwd, "v")
      .join(back, "w")
      .crossJoin(broadcast(types))
      .withColumn("p_kn",
        when(lit(4L) * col("c_vw") - 3L > 0,
          (lit(4L) * col("c_vw") - 3L).cast("double") /
            (lit(4L) * col("c_v")).cast("double")).otherwise(0.0) +
          (lit(3L) * col("_n1f") * col("_n1b")).cast("double") /
            (lit(4L) * col("c_v") * col("_t")).cast("double"))
      .select("v", "w", "c_vw", "c_v", "p_kn")
  }

  /** Per-document KN-LM surprisal scores: (id, n_bigrams, mean_unats) —
    * the perplexity-proxy quality filter (CCNet's "score every doc with a
    * corpus LM, drop the weird tail") with the q182 determinism recipe:
    * each bigram TYPE's −ln p_kn is pinned ONCE to integer micro-nats on
    * the Heaps'-sized LM table (p_kn itself pinned to 6 dp first, floored
    * at 1e-9 so a sub-micro probability can't become ln 0), and document
    * scores are exact long sums + one integral division. High mean_unats
    * = the LM finds the doc improbable (mojibake, boilerplate soup, wrong
    * language); the filter is a WHERE on the output. Bigrams ABSENT from
    * `counts` (an external LM with partial coverage) are charged the
    * pinned floor surprisal −ln 1e-9 = 20 723 266 micro-nats — an unseen
    * bigram is maximally surprising, never free; an inner join here would
    * score an all-unseen document 0, inverting the filter for exactly the
    * weird tail it targets.
    *
    * Scale shape: LM = two map-side-combined aggregates of the bigram
    * TYPE table; scoring joins the per-doc bigram stream against that
    * table (AQE broadcasts it when small) and reduces per doc — no
    * window, no collect.
    */
  def documentScores(
      df: DataFrame,
      idCol: String,
      textCol: String,
      counts: DataFrame): DataFrame = {
    val pinned = floor(col("p_kn") * 1000000.0 + 0.5) / 1000000.0
    val lm = kneserNeyFromCounts(counts)
      .select(col("v"), col("w"),
        floor(-log(greatest(pinned, lit(1e-9))) * 1000000.0 + 0.5)
          .cast("long").as("_unats"))
    val t = TextAnalysis.tokens(col(textCol))
    val len = greatest(size(t) - 1, lit(0))
    val bp = df
      .select(col(idCol), explode(arrays_zip(
        slice(t, lit(1), len).as("a"), slice(t, lit(2), len).as("b"))).as("_p"))
      .select(col(idCol), col("_p.a").as("v"), col("_p.b").as("w"))
    // floor(−ln(1e-9)·1e6 + 0.5): the same pin recipe the LM side applies
    // at its probability floor, precomputed so unmatched rows need no log
    val floorUnats = lit(20723266L)
    val ds = bp.join(lm, Seq("v", "w"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(coalesce(col("_unats"), floorUnats)).as("_su"))
    df.select(col(idCol))
      .join(ds, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        when(coalesce(col("n_bigrams"), lit(0L)) > 0, expr("_su div n_bigrams"))
          .otherwise(0L).as("mean_unats"))
  }

  /** [[documentScores]] training the LM on the scored corpus itself. */
  def documentScores(df: DataFrame, idCol: String, textCol: String): DataFrame =
    documentScores(df, idCol, textCol,
      Vocab.ngramCounts(df, textCol, 2)
        .select(split(col("gram"), " ").getItem(0).as("v"),
          split(col("gram"), " ").getItem(1).as("w"),
          col("n").as("c_vw")))
}
