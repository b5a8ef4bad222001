package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyness analysis: which tokens are DISTINCTIVE of each document group
  * (source, language, domain, time slice) relative to the rest of the
  * corpus — the corpus-linguistics primitive behind "what is this source
  * contributing to the mix?" dashboards and mixture-debug investigations
  * in a training-data pipeline.
  *
  * The statistic is the Haldane-corrected odds ratio
  *
  *   OR(g, t) = [(y + ½)/(n − y + ½)] / [(y' + ½)/(n' − y' + ½)]
  *
  * with y = token occurrences in group, n = group token count, primes =
  * the rest of the corpus; +½ keeps zero cells finite (the log of this OR
  * is the Monroe et al. log-odds; the log is monotone, so ranking by OR
  * ranks identically and keeps libm out of the gate — the same
  * rational-over-log policy as [[Retrieval]]'s BM25 idf). Multiplying
  * through by 2 makes numerator and denominator exact 64-bit integer
  * products, so the emitted double is ONE final division —
  * engine-reproducible bit-for-bit.
  *
  * Integer headroom: (2y+1)·(2(n'−y')+1) peaks near 4·n·n'; with corpus
  * token counts beyond ~2·10⁹ per side, downscale all four counts by a
  * common power of ten first (the ratio carries the statistic, not the
  * magnitude — BM25's documented policy).
  *
  * Scale shape: explode → per-(group, token) count with map-side combine,
  * per-group totals, per-token corpus totals — three aggregates over the
  * token stream, joined on (token) and (group), both sides reduced before
  * the join. No windows; top-k ranking is the caller's (pre-shuffle
  * WindowGroupLimit on the group key).
  */
object Keyness {

  /** Per-(group, token) keyness: (group, token, y, n, y_rest, n_rest,
    * odds_ratio). Groups and tokens appear only where y > 0 (a token the
    * group never uses scores below 1 by construction and is not a
    * "distinctive term" candidate).
    */
  def oddsRatio(
      df: DataFrame,
      textCol: String,
      groupCol: String): DataFrame = {
    val toks = df.select(col(groupCol).as("grp"),
      explode(TextAnalysis.tokens(col(textCol))).as("token"))
    val y = toks.groupBy("grp", "token").agg(count(lit(1)).as("y"))
    val n = toks.groupBy("grp").agg(count(lit(1)).as("n"))
    val yTot = toks.groupBy("token").agg(count(lit(1)).as("_ytot"))
    val nTot = toks.agg(count(lit(1)).as("_ntot"))
    y.join(n, "grp")
      .join(yTot, "token")
      .crossJoin(broadcast(nTot))
      .withColumn("y_rest", col("_ytot") - col("y"))
      .withColumn("n_rest", col("_ntot") - col("n"))
      .withColumn("odds_ratio",
        ((lit(2L) * col("y") + 1L) * (lit(2L) * (col("n_rest") - col("y_rest")) + 1L))
          .cast("double") /
          ((lit(2L) * (col("n") - col("y")) + 1L) * (lit(2L) * col("y_rest") + 1L))
            .cast("double"))
      .select(col("grp").as(groupCol), col("token"), col("y"), col("n"),
        col("y_rest"), col("n_rest"), col("odds_ratio"))
  }
}
