package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-based document quality filters in the Gopher/C4 style (cf. Rae et
  * al. 2021 "Scaling Language Models", appendix A — public paper): hard
  * per-document thresholds on word count, word shape, and repetition, used
  * as the first cut of a pretraining-data pipeline before any model-based
  * scoring. Everything here is a pure built-in-function projection or a
  * token-explode + two-level aggregate — codegen'd, no UDFs, linear scans;
  * the repetition family shuffles once keyed by (doc, gram).
  *
  * Reference parity note: the reference system (util/data_processing.py)
  * has row-level cleaning but no corpus-quality surface; this module is
  * part of the beyond-reference training-data layer the engine adds.
  */
object QualityRules {

  /** The classic English function-word probe set (Gopher's "stop word"
    * existence rule). Small on purpose: presence, not coverage.
    */
  val stopWords: Seq[String] =
    Seq("the", "a", "of", "to", "and", "in", "is", "that", "for", "it")

  /** Per-document Gopher-style rule statistics.
    *
    * Output: `idCol`, `n_words`, `mean_word_len_micro` (exact integer
    * micro-units: Σlen·1e6 div n), `alpha_frac_micro` (fraction of words
    * containing an alphabetic char, micro-units), `stop_hits` (how many
    * distinct probe stop words appear), `kept` (all rules pass).
    *
    * Rules (documented thresholds, tuned for the synthetic corpus scale):
    * 10 ≤ n_words ≤ 100000; 2 ≤ mean word length ≤ 12; ≥ 70% of words
    * contain an alphabetic character; ≥ 2 distinct stop words present.
    * All ratios are exact integer floor-divisions — no doubles anywhere,
    * so the keep decision is bit-identical across engines.
    */
  def gopherStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val stopArr = array(stopWords.map(lit): _*)
    // `div` (not `/`): Column./ is double division even on longs, and the
    // oracle's `//` is integer floor division — keep both sides integral
    df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("_t"))
      .select(
        col(idCol),
        size(col("_t")).cast("long").as("n_words"),
        aggregate(col("_t"), lit(0L), (acc, x) => acc + length(x).cast("long"))
          .as("_chars"),
        size(filter(col("_t"), x => x.rlike("[a-z]"))).cast("long").as("_alpha"),
        size(array_intersect(array_distinct(col("_t")), stopArr)).cast("long")
          .as("stop_hits"))
      .select(
        col(idCol),
        col("n_words"),
        when(col("n_words") === 0, lit(0L))
          .otherwise(expr("(_chars * 1000000L) div n_words"))
          .as("mean_word_len_micro"),
        when(col("n_words") === 0, lit(0L))
          .otherwise(expr("(_alpha * 1000000L) div n_words"))
          .as("alpha_frac_micro"),
        col("stop_hits"))
      .withColumn(
        "kept",
        col("n_words").between(10L, 100000L) &&
          col("mean_word_len_micro").between(2000000L, 12000000L) &&
          col("alpha_frac_micro") >= 700000L &&
          col("stop_hits") >= 2L)
  }

  /** Word n-grams of the shared tokenizer's output via the zip-of-slices
    * pattern (a `transform(sequence)` lambda is interpreted and re-runs the
    * tokenizer per element — see [[Vocab.ngramCounts]]).
    */
  private[text] def gramsCol(tokensCol: Column, n: Int): Column = {
    val len = greatest(size(tokensCol) - (n - 1), lit(0))
    val slices = (0 until n).map(j => slice(tokensCol, lit(1 + j), len).as(s"_g$j"))
    transform(
      arrays_zip(slices: _*),
      z => concat_ws(" ", (0 until n).map(j => z.getField(s"_g$j")): _*))
  }

  /** Gopher repetition statistics: for each document and each configured
    * n-gram order, the fraction of gram CHARACTER MASS captured by (a) the
    * single heaviest gram and (b) all grams occurring more than once.
    *
    * Character mass of a gram occurrence = its token characters (separators
    * excluded): `length(gram) − (n−1)`. The "top" fraction maxes
    * `count·len` rather than arg-maxing count, so ties in count cannot make
    * the answer engine-dependent. Fractions are exact integer micro-units
    * (`x·1e6 div total`).
    *
    * Output: `idCol`, `n` (gram order), `total_mass`, `top_frac_micro`,
    * `dup_frac_micro` — one row per (doc, order); docs with zero grams of
    * that order get total_mass 0 and zero fractions.
    *
    * Plan shape: one explode + (doc, gram) count + per-doc aggregate per
    * order — shuffles keyed by doc_id, map-side combined; at 100 TB the
    * widest stage is the per-(doc,gram) count, which is the minimum any
    * exact repetition statistic needs.
    */
  def repetitionStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      orders: Seq[Int]): DataFrame = {
    require(orders.nonEmpty && orders.forall(_ >= 1), s"orders=$orders must all be >= 1")
    val toks = df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("_t"))
    orders.map { n =>
      val grams = toks
        .select(col(idCol), explode(gramsCol(col("_t"), n)).as("_g"))
        .select(col(idCol), col("_g"), (length(col("_g")) - lit(n - 1)).cast("long").as("_len"))
      val perGram = grams
        .groupBy(col(idCol), col("_g"), col("_len"))
        .agg(count(lit(1)).cast("long").as("_c"))
        .select(col(idCol), (col("_c") * col("_len")).as("_mass"), col("_c"))
      val perDoc = perGram
        .groupBy(col(idCol))
        .agg(
          sum(col("_mass")).cast("long").as("total_mass"),
          max(col("_mass")).cast("long").as("_top"),
          sum(when(col("_c") >= 2, col("_mass")).otherwise(lit(0L))).cast("long").as("_dup"))
        .select(
          col(idCol),
          lit(n).cast("int").as("n"),
          col("total_mass"),
          // integer div, matching the oracle's `//` exactly (Column./ is fp)
          expr("(_top * 1000000L) div total_mass").as("top_frac_micro"),
          expr("(_dup * 1000000L) div total_mass").as("dup_frac_micro"))
      // docs shorter than n tokens produce no grams — restore them with zeros
      df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
        .select(
          col(idCol),
          lit(n).cast("int").as("n"),
          coalesce(col("total_mass"), lit(0L)).as("total_mass"),
          coalesce(col("top_frac_micro"), lit(0L)).as("top_frac_micro"),
          coalesce(col("dup_frac_micro"), lit(0L)).as("dup_frac_micro"))
    }.reduce(_ unionAll _)
  }
}
