package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023 — public
  * paper): score every document by how much more likely its hashed n-gram
  * features are under a TARGET distribution (the high-quality subset you
  * want more of) than under the SOURCE distribution (the raw corpus), then
  * resample the corpus by that weight. This module computes the weights;
  * the resampling step is [[graft.load.Splits]]' deterministic samplers.
  *
  * Scale shape: the feature vocabulary is hashed into `dims` buckets, so
  * the per-bucket count tables are `dims` rows — broadcast-sized by
  * construction no matter how large the corpus. Two passes: one token
  * explode + bucket count (map-side combined, one shuffle), then a second
  * explode joined against the broadcast log-ratio table (no shuffle on the
  * corpus side beyond the per-doc sum). No driver-side collection beyond
  * the `dims`-row table.
  *
  * Determinism: bucket = md5-derived index (the [[Vocab.hashedFeatures]]
  * recipe, reproducible in any engine); the only transcendental is ONE
  * `ln` of an exact rational per bucket, floored to integer micro-nats
  * before any summation, so per-doc totals are exact 64-bit sums.
  */
object Dsir {

  /** Per-document hashed-unigram importance weights.
    *
    * Smoothed per-bucket log-ratio (add-1 on both sides):
    * `r(b) = ln( ((ct(b)+1) · (S+dims)) / ((cs(b)+1) · (T+dims)) )`
    * where `ct`/`cs` are target/source token counts in bucket `b` and
    * `T`/`S` their totals. A document's weight is the sum of `r` over its
    * token occurrences, in integer micro-nats.
    *
    * @param isTarget row predicate selecting the target subset (evaluated
    *                 on `df`'s columns, e.g. `col("lang") === "en"`)
    * @return one row per input document: `idCol`, `n_tokens`,
    *         `w_micronats` (Σ bucket log-ratio, exact), and
    *         `mean_micronats` (`w div n`, 0 for empty docs)
    */
  def hashedImportanceWeights(
      df: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column,
      dims: Int = 64): DataFrame = {
    require(dims >= 2, s"dims=$dims must be >= 2")
    val tok = df
      .select(col(idCol), isTarget.as("_tgt"), explode(TextAnalysis.tokens(col(textCol))).as("_token"))
      .withColumn("_b", conv(substring(md5(col("_token")), 1, 6), 16, 10).cast("long") % dims)
    // dims-row count tables; computed over one shuffle each via conditional agg
    val counts = tok
      .groupBy(col("_b"))
      .agg(
        sum(when(col("_tgt"), 1L).otherwise(0L)).as("_ct"),
        count(lit(1)).as("_cs"))
    // totals via a 1-row aggregate broadcast onto the dims rows
    val totals = counts.agg(
      sum(col("_ct")).as("_t_total"), sum(col("_cs")).as("_s_total"))
    val ratios = counts
      .crossJoin(broadcast(totals))
      .select(
        col("_b"),
        floor(
          log(
            ((col("_ct") + 1L) * (col("_s_total") + lit(dims.toLong))).cast("double") /
              ((col("_cs") + 1L) * (col("_t_total") + lit(dims.toLong))).cast("double"))
            * 1000000.0 + 0.5)
          .cast("long")
          .as("_r_micro"))
    val perDoc = tok
      .join(broadcast(ratios), Seq("_b"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(col("_r_micro")).cast("long").as("w_micronats"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("w_micronats"), lit(0L)).as("w_micronats"))
      .withColumn(
        "mean_micronats",
        // NOT `div`: Spark div truncates toward zero while DuckDB `//`
        // floors, and weights go negative. One double division + floor
        // (+0.5) is a single fp op on exact integers — identical in both.
        when(col("n_tokens") === 0, lit(0L))
          .otherwise(floor(col("w_micronats").cast("double") /
            col("n_tokens").cast("double") + 0.5).cast("long")))
  }
}
