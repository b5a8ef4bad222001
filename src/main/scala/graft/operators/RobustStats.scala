package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust per-group outlier statistics: median + MAD (median absolute
  * deviation), the standard-deviation pair that heavy-tailed data doesn't
  * fool — one wild value shifts a mean/stddev arbitrarily but moves a
  * median/MAD by at most one rank.
  *
  * Scale shape: two grouped exact-percentile aggregations (Spark's
  * `percentile` — a per-group sort of that group's values, distributed by
  * the group key) with a broadcast-able stats join between them; groups are
  * the unit of parallelism, so skew follows group size, not value
  * distribution.
  */
object RobustStats {

  /** Per-key (median, MAD, outlier count): a row is an outlier when
    * `|value − median| > k·MAD`. Exact interpolated percentiles throughout —
    * deterministic, engine-reproducible (the q54 recipe).
    */
  def madOutlierStats(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      k: Double = 3.0): DataFrame = {
    val med = df.groupBy(keyCols.map(col): _*)
      .agg(expr(s"percentile($valueCol, 0.5)").as("_med"))
    // null-safe join-backs: a NULL group key is a group like any other —
    // plain equality would silently drop its rows from the stats
    val withMed = JoinBack.nullSafe(df, med, keyCols)
    val mad = withMed.groupBy(keyCols.map(col): _*)
      .agg(expr(s"percentile(abs($valueCol - _med), 0.5)").as("_mad"))
    JoinBack.nullSafe(withMed, mad, keyCols)
      .groupBy((keyCols.map(col) :+ col("_med").as("median") :+ col("_mad").as("mad")): _*)
      .agg(sum(when(abs(col(valueCol) - col("_med")) > lit(k) * col("_mad"), 1L)
        .otherwise(0L)).as("n_outliers"))
  }

  /** Weighted (lower) median: the smallest value whose INCLUSIVE cumulative
    * weight reaches ⌈W/2⌉ — "the price below which half the QUANTITY
    * trades", the robust center estimate when rows carry unequal mass.
    * Weights must be non-negative integers (cast to long).
    *
    * Scale shape: the cumulative weight comes from
    * [[GlobalRank.withRunningTotal]] — a two-pass range-partitioned scan
    * (per-partition sums to the driver, then a stamped second pass), NEVER
    * a single-partition running-sum window; the median pick is then one
    * filter + min aggregate. `tieCols` must make (value, tieCols) a total
    * order — running totals over duplicated keys would be nondeterministic
    * (withRunningTotal enforces this loudly).
    */
  def weightedMedian(
      df: DataFrame,
      valueCol: String,
      weightCol: String,
      tieCols: Seq[String]): DataFrame = {
    val slim = df.select(
      (col(valueCol).as("_v") +: tieCols.map(col)) :+
        col(weightCol).cast("long").as("_w"): _*)
    val total = Option(slim.agg(sum(col("_w"))).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    require(total > 0, "weightedMedian needs positive total weight")
    val half = (total + 1L) / 2L
    GlobalRank.withRunningTotal(slim, "_v" +: tieCols, "_w", "_cum")
      .filter(col("_cum") + col("_w") >= half && col("_w") > 0)
      .agg(min(col("_v")).as("weighted_median"))
  }

  /** Pairwise Welch's t statistic between groups — the unequal-variance
    * two-sample test behind every A/B readout. Values are scaled to integers
    * (`round(value · scale)`), so per-group n / Σx / Σx² are EXACT decimal
    * sums (one map-side-combined aggregate over the facts); each group
    * pair's t is then a single closed-form double expression over those
    * exactly-agreed integers — the only fp ops are the final mean/variance
    * divisions and one sqrt, identical in any IEEE engine. (Welch rather
    * than pooled Student: no equal-variance assumption, the safe default.)
    *
    * Output: one row per unordered group pair (a < b by group value) with
    * n_a/n_b and `t` (sign convention: positive when a's mean is larger).
    * Groups need n >= 2 and nonzero variance on at least one side —
    * degenerate pairs yield null t rather than ±inf. The pairwise join runs
    * on the GROUP aggregate (g rows → g·(g−1)/2 pairs), never on facts.
    */
  def welchT(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      scale: Int = 100): DataFrame = {
    require(scale > 0, s"scale=$scale must be positive")
    val dec = "decimal(38,0)"
    val v = round(col(valueCol) * scale, 0).cast("long")
    val g = df.groupBy(col(groupCol).as("_g"))
      .agg(
        count(lit(1)).as("_n"),
        sum(v.cast(dec)).as("_sx"),
        sum((v * v).cast(dec)).as("_sxx"))
    def side(tag: String) = g.select(
      col("_g").as(s"group_$tag"), col("_n").as(s"n_$tag"),
      col("_sx").as(s"_sx_$tag"), col("_sxx").as(s"_sxx_$tag"))
    def mean(tag: String) =
      col(s"_sx_$tag").cast("double") / col(s"n_$tag").cast("double")
    // sample variance in scaled units: (n·Σx² − (Σx)²) / (n·(n−1))
    def variance(tag: String) =
      (col(s"n_$tag").cast(dec) * col(s"_sxx_$tag") -
        col(s"_sx_$tag") * col(s"_sx_$tag")).cast("double") /
        (col(s"n_$tag").cast("double") * (col(s"n_$tag") - 1).cast("double"))
    val se = sqrt(variance("a") / col("n_a").cast("double") +
      variance("b") / col("n_b").cast("double"))
    side("a").join(side("b"), col("group_a") < col("group_b"))
      .withColumn("t",
        when(col("n_a") >= 2 && col("n_b") >= 2 && se > 0.0,
          (mean("a") - mean("b")) / se))
      .select("group_a", "group_b", "n_a", "n_b", "t")
  }

  /** Delete-one-fold jackknife standard error of a mean — the error bar a
    * metrics pipeline attaches to every scorecard figure without a second
    * pass over the data. Rows hash-partition into `folds` deterministic
    * pseudo-replicates (`md5(key) mod k` — reproducible across runs and
    * layouts, unlike rand()); each leave-one-out mean θᵢ is the exact
    * integer floor quotient (S−sᵢ)·10⁶ div (N−nᵢ) in micro-units, and
    *
    *   SE = 3·√A / 10   with  A = k·Σθᵢ² − (Σθᵢ)²  at k = 10
    *   (general k: SE = √((k−1)/k · (Σθᵢ² − (Σθᵢ)²/k)))
    *
    * where A is computed in decimal(38,0) — exact, aggregation-order-free —
    * and the one double conversion feeds IEEE sqrt (correctly rounded by
    * spec, no libm drift). Output: one row (n, sum_units, mean_micro,
    * se_micro).
    *
    * Scale shape: one map-side-combined aggregate to k fold rows, a
    * broadcast 1-row total, and a k-row reduction — the fold count, not
    * the data, bounds everything after the first pass.
    */
  def jackknifeMeanSe(
      df: DataFrame,
      unitsCol: String,
      keyCol: String,
      folds: Int = 10): DataFrame = {
    require(folds >= 2, s"folds=$folds must be at least 2")
    val dec = "decimal(38,0)"
    val f = df.select(
      (conv(substring(md5(col(keyCol).cast("string")), 1, 4), 16, 10).cast("int")
        % folds).as("_f"),
      col(unitsCol).cast("long").as("_c"))
    val per = f.groupBy("_f").agg(count(lit(1)).as("_ni"), sum("_c").as("_si"))
    val tot = per.agg(sum("_ni").as("_n"), sum("_si").as("_s"))
    val theta = per.crossJoin(broadcast(tot))
      .withColumn("_th", expr("((_s - _si) * 1000000L) div (_n - _ni)"))
    theta
      .agg(
        max(col("_n")).as("n"),
        max(col("_s")).as("sum_units"),
        sum(col("_th").cast(dec)).as("_t1"),
        sum((col("_th").cast(dec) * col("_th").cast(dec))).as("_t2"))
      .withColumn("mean_micro", expr("(sum_units * 1000000L) div n"))
      .withColumn("se_micro",
        sqrt(((lit(folds).cast(dec) * col("_t2") - col("_t1") * col("_t1")).cast("double") *
          (folds - 1).toDouble) / (folds.toDouble * folds.toDouble)))
      .select("n", "sum_units", "mean_micro", "se_micro")
  }

  /** Exact symmetric trimmed mean: drop the lowest and highest
    * ⌊n·trimNum/trimDen⌋ values, average the middle exactly — the robust
    * center when a median is too coarse and a mean too fragile (latency
    * SLO reporting, payout averages). `tieCols` must totalize the order
    * (same contract as [[weightedMedian]]).
    *
    * Scale shape: one [[GlobalRank.withRowNumber]] range-partitioned
    * stamp + a scan-speed rank filter + one exact decimal sum — never a
    * single-partition ORDER BY window. Output: ONE row (n, n_trimmed,
    * trimmed_mean_micro = Σkept·10⁶ div kept-count).
    */
  def trimmedMean(
      df: DataFrame,
      valueCol: String,
      tieCols: Seq[String],
      trimNum: Int,
      trimDen: Int): DataFrame = {
    require(trimDen > 0 && trimNum >= 0 && 2 * trimNum < trimDen,
      s"trim fraction $trimNum/$trimDen must be in [0, 1/2)")
    val dec = "decimal(38,0)"
    val slim = df.select(col(valueCol).cast("long").as("_v") +: tieCols.map(col): _*)
    GlobalRank.withRowNumber(slim, "_v" +: tieCols, "_rn", "_n")
      .withColumn("_k", expr(s"(_n * $trimNum) div $trimDen"))
      .filter(col("_rn") > col("_k") && col("_rn") <= col("_n") - col("_k"))
      .agg(
        max("_n").as("n"),
        max("_k").as("_kk"),
        count(lit(1)).as("_kept"),
        sum(col("_v").cast(dec)).as("_s"))
      .select(
        col("n"),
        (lit(2L) * col("_kk")).as("n_trimmed"),
        expr("(_s * 1000000) div _kept").as("trimmed_mean_micro"))
  }

  /** Weighted lower quantile at pNum/pDen: the smallest value whose
    * INCLUSIVE cumulative weight reaches ⌈W·pNum/pDen⌉ — the
    * generalization of [[weightedMedian]] (pNum/pDen = 1/2) to tail
    * quantiles over unequal-mass rows (p95 of latency weighted by request
    * count). Same running-total shape and `tieCols` contract.
    */
  def weightedQuantile(
      df: DataFrame,
      valueCol: String,
      weightCol: String,
      tieCols: Seq[String],
      pNum: Long,
      pDen: Long): DataFrame = {
    require(pDen > 0 && pNum > 0 && pNum <= pDen,
      s"quantile $pNum/$pDen must be in (0, 1]")
    val slim = df.select(
      (col(valueCol).as("_v") +: tieCols.map(col)) :+
        col(weightCol).cast("long").as("_w"): _*)
    val total = Option(slim.agg(sum(col("_w"))).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    require(total > 0, "weightedQuantile needs positive total weight")
    val target = (total * pNum + pDen - 1L) / pDen // ceil(W·p)
    GlobalRank.withRunningTotal(slim, "_v" +: tieCols, "_w", "_cum")
      .filter(col("_cum") + col("_w") >= target && col("_w") > 0)
      .agg(min(col("_v")).as("weighted_quantile"))
  }

  /** One-way ANOVA across ALL groups of `groupCol` plus the effect size
    * η² = SSB/SST — the "does the group matter at all" omnibus test that
    * precedes [[welchT]]'s pairwise drill-down.
    *
    * Determinism discipline (the welchT/q201 recipe): values → integer
    * units via `round(value·scale)`, per-group (n, Σx, Σx²) as exact
    * decimals, and the between/within sums of squares reduced to exact
    * integer unit² terms before any floating point:
    * `ssb_u = Σ_g ⌊sx_g²/n_g⌋ − ⌊SX²/N⌋` — the floor per group (at one
    * scaled-unit² granularity, relative error ~1e−13 here) is part of the
    * pinned definition, so the cross-group sum is an exact integer in both
    * engines regardless of accumulation order, and stays in int64 range
    * where a micro-unit² scaling would overflow. F and η² are then single
    * closed-form double divisions.
    *
    * Output (one row): `k`, `n`, `df_between` (k−1), `df_within` (n−k),
    * `ssb_u`, `ssw_u` (exact unit²), `f_stat`, `eta_sq` (doubles —
    * callers pin to 6 dp).
    *
    * Scale: one map-side-combined grouped aggregate over the fact table;
    * the k-row group table reduces on the driver side of a 1-row agg. No
    * second scan, no window.
    */
  def anovaF(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      scale: Int = 100): DataFrame = {
    require(scale > 0, s"scale=$scale must be positive")
    val dec = "decimal(38,0)"
    val v = round(col(valueCol) * scale, 0).cast("long")
    val g = df.groupBy(col(groupCol).as("_g"))
      .agg(
        count(lit(1)).as("_n"),
        sum(v.cast(dec)).as("_sx"),
        sum((v * v).cast(dec)).as("_sxx"))
    g.agg(
      count(lit(1)).cast("long").as("k"),
      sum(col("_n")).cast("long").as("n"),
      sum(col("_sx")).cast(dec).as("_SX"),
      sum(col("_sxx")).cast(dec).as("_SXX"),
      // Σ_g ⌊sx_g²/n_g⌋: decimal mult is exact and `div` yields the exact
      // integral quotient as bigint (NOT `/`+floor — decimal `/` rounds to
      // the result type's 6-digit scale first, which can cross an integer
      // boundary). All quotients fit int64 up to ~1e6-row groups at cent
      // precision; beyond that, raise `scale` down, not the unit up.
      sum(expr("(_sx * _sx) div _n")).cast(dec).as("_SB"))
      .select(
        col("k"), col("n"),
        (col("k") - 1L).as("df_between"),
        (col("n") - col("k")).as("df_within"),
        (col("_SB") - expr("(_SX * _SX) div n").cast(dec)).cast(dec).as("_ssb"),
        (col("_SXX") - col("_SB")).cast(dec).as("_ssw"))
      .select(
        col("k"), col("n"), col("df_between"), col("df_within"),
        col("_ssb").cast("long").as("ssb_u"),
        col("_ssw").cast("long").as("ssw_u"),
        when(col("df_between") > 0 && col("df_within") > 0 && col("_ssw") > 0,
          (col("_ssb").cast("double") / col("df_between").cast("double")) /
            (col("_ssw").cast("double") / col("df_within").cast("double")))
          .as("f_stat"),
        when(col("_ssb") + col("_ssw") > 0,
          col("_ssb").cast("double") / (col("_ssb") + col("_ssw")).cast("double"))
          .as("eta_sq"))
  }
}
