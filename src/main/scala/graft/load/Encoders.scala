package graft.load

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Feature-encoding operators for training-data preparation — the
  * "turn a high-cardinality categorical into a model-ready number"
  * step. Leave-one-out target encoding is the leakage-safe variant: each
  * row's encoding excludes its OWN target value, so the feature never
  * memorizes the label it will be asked to predict (plain mean encoding
  * leaks catastrophically on rare categories).
  *
  * Exactness policy: targets are integer units (callers scale first); the
  * encodings are exact integer floor quotients in micro-units
  * (`(Σ−y)·10⁶ div (n−1)` — the jackknifeMeanSe recipe), so any engine
  * reproduces them bit-for-bit with zero fp accumulation.
  */
object Encoders {

  /** `df` + `outCol`: per-row leave-one-out mean of `targetCol` (integer
    * units) within the row's `catCol` category, in MICRO-units:
    *
    *   encᵢ = (Σ_cat y − yᵢ)·10⁶ div (n_cat − 1)
    *
    * Singleton categories (n = 1) have no leave-one-out peers and fall back
    * to the GLOBAL mean (Σy·10⁶ div N) — the shrinkage limit, and the same
    * value an unseen category receives at inference.
    *
    * Scale shape: one keyed window (partitionBy category — sum + count fuse
    * into a single stage, parallelism follows categories) plus a broadcast
    * 1-row global aggregate. No self-join, no second fact pass. Category
    * skew follows label cardinality, the same skew the downstream groupBy
    * would see; salt upstream if one category dominates.
    */
  def looTargetEncode(
      df: DataFrame,
      catCol: String,
      targetCol: String,
      outCol: String = "loo_enc_micro"): DataFrame = {
    require(!df.columns.contains(outCol), s"input already has column '$outCol'")
    val w = Window.partitionBy(col(catCol))
    val y = col(targetCol).cast("long")
    val tot = df.agg(
      sum(y).as("_gsum"), count(lit(1)).as("_gn"))
    df.crossJoin(broadcast(tot))
      .withColumn("_csum", sum(y).over(w))
      .withColumn("_cn", count(lit(1)).over(w))
      .withColumn(outCol,
        when(col("_cn") > 1, expr(s"((_csum - cast($targetCol as long)) * 1000000L) div (_cn - 1)"))
          .otherwise(expr("(_gsum * 1000000L) div _gn")))
      .drop("_gsum", "_gn", "_csum", "_cn")
  }

  /** Equal-frequency (quantile) binning of an integral column via the
    * SQL-standard ntile over a GLOBAL order — computed with
    * [[graft.operators.GlobalRank]]'s two-pass stamp, never a
    * single-partition window. `tieCols` must extend `valueCol` to a total
    * order (same contract as every GlobalRank caller). Adds `outCol` in
    * 1..buckets.
    */
  def quantileBin(
      df: DataFrame,
      valueCol: String,
      tieCols: Seq[String],
      buckets: Int,
      outCol: String = "bin"): DataFrame = {
    require(buckets > 0, s"buckets=$buckets must be positive")
    val ranked = graft.operators.GlobalRank.withRowNumber(
      df, valueCol +: tieCols, "_rn", "_n", failOnTies = true)
    ranked.withColumn(outCol,
      graft.operators.GlobalRank.ntileCol(col("_rn"), col("_n"), buckets))
      .drop("_rn", "_n")
  }
}
