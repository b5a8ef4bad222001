package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Experiment / A-B-test analytics: CUPED variance reduction, the
  * chi-squared contingency test (with Cramér's V effect size), and the
  * Kolmogorov-Smirnov separation statistic — the readouts an
  * experimentation or data-quality platform computes daily over the
  * warehouse, built on the library's exact-arithmetic policy (integer /
  * decimal(38,0) sums until ONE closed-form double step at the end, the
  * welchT / jackknifeMeanSe recipe) so every engine reproduces them
  * bit-for-bit. No libm logs anywhere (the Keyness rational-over-log
  * policy): chi-squared and KS are squares, divisions, and one IEEE sqrt.
  *
  * Scale shape, all three: ONE map-side-combined aggregate over the fact
  * table down to a per-group / per-cell / per-score-grain table, then all
  * remaining algebra runs on that reduced table (variants × 1, R × C cells,
  * distinct-score rows). Nothing after the first pass scales with row
  * count; the KS cumulative uses [[GlobalRank.withRunningTotal]]'s
  * two-pass range-partitioned prefix sum, never a single-partition window.
  */
object Experiment {

  private val dec = "decimal(38,0)"

  /** CUPED (Controlled-experiment Using Pre-Existing Data, Deng et al.
    * 2013): shrink each unit's experiment metric Y by its pre-period
    * covariate X before comparing variants —
    *
    *   Y'ᵢ = Yᵢ − θ·(Xᵢ − X̄),   θ = Cov(X,Y) / Var(X)  (pooled)
    *
    * which preserves every variant's true treatment effect (θ·X̄ cancels in
    * any A−B difference) while cutting metric variance by the factor ρ²
    * (the squared X-Y correlation) — the standard way to make an
    * experiment readable at a fraction of the sample size.
    *
    * Values are scaled to integers (`round(value·scale)`): per-variant
    * n/Σx/Σy and pooled Σxy/Σx²/Σy² are EXACT decimal sums from one fact
    * pass, and θ, the adjusted means, and ρ² are closed-form doubles over
    * those exactly-agreed integers — the only fp ops are the final
    * divisions, identical in any IEEE engine.
    *
    * Output: one row per variant — (variant, n, mean_y, mean_y_adj) plus
    * the pooled (theta, rho2) repeated on each row (rho2 IS the fraction of
    * variance CUPED removes). Requires ≥ 2 rows total and nonzero pooled
    * Var(X); a constant covariate has no θ and fails loudly via null.
    */
  def cuped(
      df: DataFrame,
      variantCol: String,
      yCol: String,
      xCol: String,
      scale: Int = 100): DataFrame = {
    require(scale > 0, s"scale=$scale must be positive")
    val yi = round(col(yCol) * scale, 0).cast("long")
    val xi = round(col(xCol) * scale, 0).cast("long")
    val g = df.groupBy(col(variantCol).as("variant"))
      .agg(
        count(lit(1)).as("n"),
        sum(yi.cast(dec)).as("_sy"),
        sum(xi.cast(dec)).as("_sx"),
        sum((xi.cast(dec) * yi.cast(dec))).as("_sxy"),
        sum((xi.cast(dec) * xi.cast(dec))).as("_sxx"),
        sum((yi.cast(dec) * yi.cast(dec))).as("_syy"))
    // pooled moments: a handful of decimal adds over the variant rows
    val tot = g.agg(
      sum("n").as("_tn"), sum("_sy").as("_tsy"), sum("_sx").as("_tsx"),
      sum("_sxy").as("_tsxy"), sum("_sxx").as("_tsxx"), sum("_syy").as("_tsyy"))
    // N·Σxy − Σx·Σy  /  N·Σx² − (Σx)²  — both exact decimals, ONE division
    val covNum = (col("_tn").cast(dec) * col("_tsxy") - col("_tsx") * col("_tsy"))
    val varXNum = (col("_tn").cast(dec) * col("_tsxx") - col("_tsx") * col("_tsx"))
    val varYNum = (col("_tn").cast(dec) * col("_tsyy") - col("_tsy") * col("_tsy"))
    val theta = when(varXNum =!= 0, covNum.cast("double") / varXNum.cast("double"))
    // ρ² as a PRODUCT of two exact-decimal ratios — covNum² / (varX·varY)
    // would overflow decimal(38,0) (and DuckDB's HUGEINT) once the moment
    // sums pass ~10¹⁹; each factor alone stays in range
    val rho2 = when(varXNum =!= 0 && varYNum =!= 0,
      (covNum.cast("double") / varXNum.cast("double")) *
        (covNum.cast("double") / varYNum.cast("double")))
    val meanX = col("_tsx").cast("double") / (lit(scale) * col("_tn")).cast("double")
    g.crossJoin(broadcast(tot))
      .withColumn("_theta", theta)
      .withColumn("mean_y",
        col("_sy").cast("double") / (lit(scale) * col("n")).cast("double"))
      .withColumn("_mean_x",
        col("_sx").cast("double") / (lit(scale) * col("n")).cast("double"))
      .withColumn("mean_y_adj", col("mean_y") - col("_theta") * (col("_mean_x") - meanX))
      .withColumn("rho2", rho2)
      .select(col("variant"), col("n"), col("mean_y"), col("mean_y_adj"),
        col("_theta").as("theta"), col("rho2"))
  }

  /** Pearson chi-squared test of independence between two categorical
    * columns, plus Cramér's V — "does outcome depend on variant / segment /
    * source?" over an R × C contingency table. Per cell,
    *
    *   contrib = (N·n_xy − r_x·c_y)² / (N·r_x·c_y)
    *
    * (the (obs−exp)²/exp term multiplied through by N², so numerator and
    * denominator are exact decimal products). Each cell's contribution is a
    * closed-form double over exact integers, then pinned to integer
    * MICRO-units (`floor(x·10⁶ + 0.5)`) and summed as integers — an exact,
    * aggregation-order-free total where a double sum would depend on cell
    * order. V = √(χ² / (N·min(R−1, C−1))).
    *
    * Output: ONE row — (n, n_rows, n_cols, dof, chi2, cramers_v), chi2 at
    * 6 dp by construction, V pinned to 6 dp.
    *
    * Scale shape: one fact-pass groupBy to R·C cell rows; marginals are
    * re-aggregations of the CELL table (never a second fact pass) joined
    * back broadcast; the micro-integer reduction is over R·C rows.
    */
  def chiSquared(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val cells = df.groupBy(col(xCol).as("_x"), col(yCol).as("_y"))
      .agg(count(lit(1)).as("_nxy"))
    val rows = cells.groupBy("_x").agg(sum("_nxy").as("_r"))
    val cols = cells.groupBy("_y").agg(sum("_nxy").as("_c"))
    val tot = cells.agg(
      sum("_nxy").as("_n"),
      countDistinct("_x").as("n_rows"),
      countDistinct("_y").as("n_cols"))
    val num = (col("_n").cast(dec) * col("_nxy").cast(dec) -
      col("_r").cast(dec) * col("_c").cast(dec))
    val den = col("_n").cast(dec) * col("_r").cast(dec) * col("_c").cast(dec)
    val contribMicro =
      floor(((num * num).cast("double") / den.cast("double")) * 1e6 + 0.5).cast("long")
    // the FULL R × C grid, not just observed cells: an absent combination is
    // an OBSERVED ZERO and still contributes (0−e)²/e = r·c/N — dropping it
    // understates χ² exactly where dependence is strongest
    rows.crossJoin(cols)
      .join(cells, Seq("_x", "_y"), "left")
      .withColumn("_nxy", coalesce(col("_nxy"), lit(0L)))
      .crossJoin(broadcast(tot))
      .groupBy(col("_n").as("n"), col("n_rows"), col("n_cols"))
      .agg(sum(contribMicro).as("_chi2_micro"))
      .withColumn("dof", (col("n_rows") - 1) * (col("n_cols") - 1))
      .withColumn("chi2", col("_chi2_micro").cast("double") / 1e6)
      .withColumn("cramers_v",
        floor(sqrt(col("chi2") /
          (col("n").cast("double") * least(col("n_rows") - 1, col("n_cols") - 1)
            .cast("double"))) * 1e6 + 0.5) / 1e6)
      .select("n", "n_rows", "n_cols", "dof", "chi2", "cramers_v")
  }

  /** Two-sample Kolmogorov-Smirnov statistic of a SCORE against a binary
    * label — the separation readout behind every "does this quality score
    * actually split good from bad?" check in a curation pipeline:
    *
    *   KS = max over thresholds t of |F_pos(t) − F_neg(t)|
    *
    * computed exactly: per distinct score, positive/negative counts; their
    * cumulative sums in score order; and the argmax of the INTEGER
    * |cumPos·N_neg − cumNeg·N_pos| (= KS·N_pos·N_neg — the division by
    * the constant N_pos·N_neg is monotone, so the integer argmax IS the KS
    * argmax, and the reported ks is that one pinned double division). Ties
    * in the max take the SMALLEST score, so the reported threshold is
    * deterministic.
    *
    * `scoreCol` must be integral (cast to long — scale fractional scores
    * first). Output: ONE row (n_pos, n_neg, ks_score, ks) — ks_score the
    * best threshold ("predict positive when score ≤ t"), ks in [0,1]
    * pinned to 6 dp.
    *
    * Scale shape: one fact pass to the distinct-score grain (map-side
    * combine), then [[GlobalRank.withRunningTotal]]'s two-pass prefix sum
    * over the score-grain table — range-partitioned, never a
    * single-partition ORDER BY window — and a 1-row argmax reduction.
    */
  def ksStatistic(df: DataFrame, labelCol: String, scoreCol: String): DataFrame = {
    val grain = df
      .select(col(scoreCol).cast("long").as("_s"),
        when(col(labelCol).cast("boolean"), 1L).otherwise(0L).as("_p"))
      .groupBy("_s")
      .agg(sum("_p").as("_np"), (count(lit(1)) - sum("_p")).as("_nn"))
    val cumP = GlobalRank.withRunningTotal(grain, Seq("_s"), "_np", "_cp")
    val cum = GlobalRank.withRunningTotal(cumP, Seq("_s"), "_nn", "_cn")
      // withRunningTotal is EXCLUSIVE — add the row's own counts for the
      // inclusive "≤ score" CDF numerators
      .select(col("_s"), (col("_cp") + col("_np")).as("_ip"),
        (col("_cn") + col("_nn")).as("_in"))
    val tot = cum.agg(max("_ip").as("n_pos"), max("_in").as("n_neg"))
    val d = cum.crossJoin(broadcast(tot))
      .withColumn("_d", abs(col("_ip") * col("n_neg") - col("_in") * col("n_pos")))
    // deterministic argmax: max |D| first, then the smallest score at it
    d.groupBy("n_pos", "n_neg")
      .agg(max("_d").as("_dmax"))
      .join(d, Seq("n_pos", "n_neg"))
      .filter(col("_d") === col("_dmax"))
      .groupBy("n_pos", "n_neg", "_dmax")
      .agg(min("_s").as("ks_score"))
      .withColumn("ks",
        floor(col("_dmax").cast("double") /
          (col("n_pos").cast(dec) * col("n_neg").cast(dec)).cast("double") * 1e6 + 0.5) / 1e6)
      .select("n_pos", "n_neg", "ks_score", "ks")
  }

  /** Per-key Shannon entropy of a categorical column, in integer
    * micro-nats — the class-balance audit (is this split all one label?
    * is this source all one language?). Per (key, category) counts n and
    * key totals s give H = Σ −(n/s)·ln(n/s); each category's term does its
    * ONE ln on a ratio of exact integers and pins to micro-nats BEFORE the
    * sum (the chiSquared order-free-total recipe), so the total is
    * aggregation-order-independent. Output: (keys…, n_cats, n_rows,
    * entropy_micro); 0 for single-category keys by construction.
    *
    * Scale shape: one fact-pass groupBy to (key, cat) grain, a key-grain
    * re-aggregation joined back broadcast, one integer reduction.
    */
  def entropy(df: DataFrame, keyCols: Seq[String], catCol: String): DataFrame = {
    val cells = df.groupBy(keyCols.map(col) :+ col(catCol).as("_cat"): _*)
      .agg(count(lit(1)).as("_n"))
    val totals = cells.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_cats"), sum("_n").as("n_rows"))
    val p = col("_n").cast("double") / col("n_rows").cast("double")
    cells.join(broadcast(totals), keyCols)
      .withColumn("_term_micro",
        floor(-p * log(p) * lit(1000000.0) + lit(0.5)).cast("long"))
      .groupBy(keyCols.map(col) :+ col("n_cats") :+ col("n_rows"): _*)
      .agg(sum("_term_micro").as("entropy_micro"))
  }

  /** Mutual information between two categorical columns, in integer
    * micro-nats: MI = Σ_xy (n_xy/N)·ln(n_xy·N / (n_x·n_y)) — the
    * dependence-strength companion to [[chiSquared]], on the same
    * one-fact-pass cell/marginal shape. Only observed cells contribute
    * (lim p→0 of p·ln p = 0, so absent combinations add nothing — unlike
    * χ², no zero-cell grid is needed). Each cell pins its one ln to
    * micro-nats before the integer sum. Output: ONE row (n, n_rows,
    * n_cols, mi_micro).
    */
  def mutualInformation(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val cells = df.groupBy(col(xCol).as("_x"), col(yCol).as("_y"))
      .agg(count(lit(1)).as("_nxy"))
    val rows = cells.groupBy("_x").agg(sum("_nxy").as("_r"))
    val cols = cells.groupBy("_y").agg(sum("_nxy").as("_c"))
    val tot = cells.agg(
      sum("_nxy").as("_n"),
      countDistinct("_x").as("n_rows"),
      countDistinct("_y").as("n_cols"))
    val pxy = col("_nxy").cast("double") / col("_n").cast("double")
    val ratio = (col("_nxy").cast(dec) * col("_n").cast(dec)).cast("double") /
      (col("_r").cast(dec) * col("_c").cast(dec)).cast("double")
    cells
      .join(broadcast(rows), Seq("_x"))
      .join(broadcast(cols), Seq("_y"))
      .crossJoin(broadcast(tot))
      .withColumn("_term_micro",
        floor(pxy * log(ratio) * lit(1000000.0) + lit(0.5)).cast("long"))
      .groupBy(col("_n").as("n"), col("n_rows"), col("n_cols"))
      .agg(sum("_term_micro").as("mi_micro"))
      .select("n", "n_rows", "n_cols", "mi_micro")
  }

  /** Two-proportion z-test per stratum: conversion-rate lift between a
    * binary variant's arms, with the pooled-variance z — the categorical
    * sibling of [[RobustStats.welchT]]. Input at unit grain with
    * `variantCol` ∈ {0, 1} and `convCol` ∈ {0, 1}; one map-combined
    * aggregate per stratum. Output: (keys…, n0, n1, conv0, conv1,
    * p0, p1, z) — p0/p1 one exact-count division each, z the closed-form
    * `(p1 − p0) / √(p̂(1−p̂)(1/n0 + 1/n1))` over exactly-agreed operands.
    */
  def twoProportionZ(
      df: DataFrame,
      keyCols: Seq[String],
      variantCol: String,
      convCol: String): DataFrame = {
    val isT = col(variantCol) =!= 0
    val isC = when(col(convCol) =!= 0, 1L).otherwise(0L)
    val agg = df.groupBy(keyCols.map(col): _*)
      .agg(
        sum(when(!isT, 1L).otherwise(0L)).as("n0"),
        sum(when(isT, 1L).otherwise(0L)).as("n1"),
        sum(when(!isT, isC).otherwise(0L)).as("conv0"),
        sum(when(isT, isC).otherwise(0L)).as("conv1"))
    val p0 = col("conv0").cast("double") / col("n0").cast("double")
    val p1 = col("conv1").cast("double") / col("n1").cast("double")
    val pPool = (col("conv0") + col("conv1")).cast("double") /
      (col("n0") + col("n1")).cast("double")
    val se = sqrt(pPool * (lit(1.0) - pPool) *
      (lit(1.0) / col("n0").cast("double") + lit(1.0) / col("n1").cast("double")))
    agg.select(
      keyCols.map(col) ++ Seq(
        col("n0"), col("n1"), col("conv0"), col("conv1"),
        when(col("n0") > 0, p0).as("p0"),
        when(col("n1") > 0, p1).as("p1"),
        when(col("n0") > 0 && col("n1") > 0 && se > 0, (p1 - p0) / se).as("z")): _*)
  }

  /** Benjamini-Hochberg FDR adjustment over a hypothesis table:
    * given (test id, p in exact micro units), ranks the p-values
    * ascending and reports the step-up adjusted value
    * `p_adj(i) = min_{j ≥ i} p(j)·m/j` (clamped to 1) — the
    * multiple-testing correction a metrics platform applies before
    * flagging "significant" segments. Each candidate `p·m div j` is an
    * exact integer floor quotient; the suffix min is a window running
    * min over the ranked table.
    *
    * Scale shape: the hypothesis table is TEST grain (thousands of
    * segments, not fact rows), so one ordered window over it is the
    * documented bounded-grain pattern (cf. kendallTauByGroup); ties in p
    * are broken by `idCol` for a total order. Output: (idCol, p_micro,
    * rank, p_adj_micro).
    */
  def bhFdr(df: DataFrame, idCol: String, pMicroCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = df
      .select(col(idCol), col(pMicroCol).cast("long").as("p_micro"))
      .withColumn("rank",
        row_number().over(Window.orderBy(col("p_micro"), col(idCol))).cast("long"))
      .withColumn("_m", count(lit(1)).over(Window.partitionBy()))
      .withColumn("_cand", least(expr("p_micro * _m div rank"), lit(1000000L)))
    ranked
      .withColumn("p_adj_micro",
        min(col("_cand")).over(
          Window.orderBy(col("rank").desc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col(idCol), col("p_micro"), col("rank"), col("p_adj_micro"))
  }

  /** Sample-ratio-mismatch check — the first health gate of every A/B
    * readout: with uniform expected allocation over the observed variants,
    * a significant χ² on the ASSIGNMENT COUNTS means the bucketing itself
    * is broken (bot filtering, redirect loss, racing writes) and every
    * downstream metric is garbage. Returns one row per variant
    * (variant, n) plus the experiment-level (chi2, srm) repeated on each —
    * χ² = Σ (n_i − n/k)²/(n/k) with exact integer counts, one compound
    * double the caller pins; `srm` flags χ² above the 0.001 critical value
    * for k−1 df (k ≤ 11 tabulated; beyond that `srm` is NULL — an
    * undefined flag, never a silently-wrong cutoff — SRM uses a TIGHT
    * alpha because a true mismatch produces astronomical χ², Fabijan et
    * al. 2019).
    */
  def srmCheck(df: DataFrame, variantCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val byV = df.groupBy(col(variantCol).as("variant")).agg(count(lit(1)).as("n"))
    // χ² against uniform expectation folds to ONE division of exact
    // integers: Σ (n_i − n/k)²/(n/k) = [Σ (k·n_i − n)²] / (k·n) — no
    // per-term double, no float summation order to disagree on
    val tot = byV.agg(sum(col("n")).as("_tn"), count(lit(1)).as("_k"))
    val joined = byV.crossJoin(tot)
    val devSq = (col("_k").cast(dec) * col("n").cast(dec) - col("_tn").cast(dec))
    val chi2 = joined
      .groupBy("_k", "_tn")
      .agg(sum(devSq * devSq).as("_num"))
      .select(col("_k"), col("_tn"),
        (col("_num").cast("double") /
          (col("_k").cast("double") * col("_tn").cast("double"))).as("chi2"))
    // chi-square 0.001 critical values for df = k−1, tabulated to df = 10
    // (k = 11); a k outside the table leaves `crit` NULL so `srm` is NULL
    // rather than over-firing on a too-small threshold
    val crit = when(col("_k") <= 2, 10.828)
      .when(col("_k") === 3, 13.816)
      .when(col("_k") === 4, 16.266)
      .when(col("_k") === 5, 18.467)
      .when(col("_k") === 6, 20.515)
      .when(col("_k") === 7, 22.458)
      .when(col("_k") === 8, 24.322)
      .when(col("_k") === 9, 26.124)
      .when(col("_k") === 10, 27.877)
      .when(col("_k") === 11, 29.588)
    byV.crossJoin(chi2).select(
      col("variant"), col("n"), col("chi2"),
      (col("chi2") > crit).as("srm"))
  }

  /** Minimum detectable effect for a binary conversion metric at
    * α = 0.05 (two-sided), power = 0.80: one row per variant pair is
    * overkill — returns ONE row (n_a, n_b, conv_a, conv_b, p_pooled,
    * mde_abs, mde_rel) where mde_abs = (z_{α/2}+z_β)·√(2p(1−p)/n_min),
    * the planning number read BEFORE the experiment: "with this traffic,
    * the smallest lift we could even see is X%". Counts are exact longs;
    * p_pooled is one IEEE division; mde_* are closed-form doubles the
    * caller pins. One grouped aggregate + single-row reduce.
    *
    * `variantCol` must take exactly two values — any other arity yields a
    * single ALL-NULL row (every derived column is gated on k = 2, so
    * malformed input can never masquerade as a plan); `convCol` is 0/1
    * per unit.
    */
  def mdeBinomial(df: DataFrame, variantCol: String, convCol: String): DataFrame = {
    val zSum = 1.959964 + 0.841621 // z_{0.025} + z_{0.20}, fixed constants
    val byV = df.groupBy(col(variantCol).as("_v"))
      .agg(count(lit(1)).as("_n"), sum(col(convCol).cast("long")).as("_c"))
      .orderBy("_v")
    val two = byV.agg(
      count(lit(1)).as("_k"),
      min(struct(col("_v"), col("_n"), col("_c"))).as("_a"),
      max(struct(col("_v"), col("_n"), col("_c"))).as("_b"))
    val p = (col("_a._c") + col("_b._c")).cast("double") /
      (col("_a._n") + col("_b._n")).cast("double")
    val nMin = least(col("_a._n"), col("_b._n")).cast("double")
    val mdeAbs = lit(zSum) * sqrt(lit(2.0) * p * (lit(1.0) - p) / nMin)
    val ok = col("_k") === 2 // gate EVERY output on arity: k=1 would
    // double-count the lone variant via min=max, k>2 would silently use
    // only the min/max variants
    two.select(
      when(ok, col("_a._n")).as("n_a"),
      when(ok, col("_b._n")).as("n_b"),
      when(ok, col("_a._c")).as("conv_a"),
      when(ok, col("_b._c")).as("conv_b"),
      when(ok, p).as("p_pooled"),
      when(ok, mdeAbs).as("mde_abs"),
      when(ok && p > 0, mdeAbs / p).as("mde_rel"))
  }
}
