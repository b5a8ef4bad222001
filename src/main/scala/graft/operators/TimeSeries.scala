package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series repair operators — the gap-filling step between raw event
  * logs and model-ready features. Forward fill is the q72 window; this adds
  * LINEAR interpolation: interior nulls take the straight line between the
  * nearest non-null neighbors (weighted by x-axis distance), edge nulls
  * stay null (there is nothing to anchor the line to).
  *
  * Scale shape: two frame-bounded windows over the same (key, order)
  * partitioning — ONE shuffle total, both windows and the arithmetic fuse
  * into the same stage; no self-join, no explode.
  */
object TimeSeries {

  /** `df` + `outCol`: `valueCol` with interior nulls linearly interpolated
    * along `xCol` (numeric axis — epoch seconds, sequence number, …) within
    * each `keyCols` group. Non-null values pass through exactly; nulls
    * before the first / after the last observation remain null.
    */
  def interpolateLinear(
      df: DataFrame,
      keyCols: Seq[String],
      xCol: String,
      valueCol: String,
      outCol: String = "interpolated"): DataFrame = {
    val back = Window.partitionBy(keyCols.map(col): _*).orderBy(col(xCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(keyCols.map(col): _*).orderBy(col(xCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val v = col(valueCol)
    val prevV = last(v, ignoreNulls = true).over(back)
    val prevX = last(when(v.isNotNull, col(xCol)), ignoreNulls = true).over(back)
    val nextV = first(v, ignoreNulls = true).over(fwd)
    val nextX = first(when(v.isNotNull, col(xCol)), ignoreNulls = true).over(fwd)
    df.withColumn(
      outCol,
      when(v.isNotNull, v.cast("double"))
        .when(
          prevV.isNotNull && nextV.isNotNull,
          prevV.cast("double") +
            (nextV.cast("double") - prevV.cast("double")) *
            (col(xCol).cast("double") - prevX.cast("double")) /
            (nextX.cast("double") - prevX.cast("double"))))
  }

  /** Per-group ordinary-least-squares trend line, closed form:
    *
    *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    *
    * (intercept = (Σy − slope·Σx)/n), with EVERY sum routed through exact
    * arithmetic: `xCol` must be an integer axis (epoch seconds against a
    * fixed origin — slope is shift-invariant, and the small offsets keep
    * Σx² inside 64-bit range), `yCol` is cast to DECIMAL(18,2) (stored
    * 2-dp doubles are exact there), so Σx, Σy, Σxy, Σx², n are all
    * bit-identical across engines regardless of accumulation order —
    * a double Σxy would differ in the last ulp between Spark's and the
    * oracle's summation order. Only the FINAL division happens in floating
    * point: one correctly-rounded IEEE op on exactly-agreed operands.
    *
    * Scale shape: one map-side-combined aggregation keyed by the group —
    * no window, no second pass; the textbook "regression by sufficient
    * statistics" decomposition that also powers streaming / incremental
    * maintenance (the five sums are mergeable monoids).
    *
    * Groups with < 2 points or a constant x (denominator 0) yield null.
    */
  def groupTrend(
      df: DataFrame,
      keyCols: Seq[String],
      xCol: String,
      yCol: String,
      yScale: Int = 100): DataFrame = {
    require(yScale > 0, s"yScale=$yScale must be positive")
    val dec = "decimal(38,0)"
    val x = col(xCol).cast("long")
    // fixed-dp doubles → exact integer units (2-dp money at yScale = 100):
    // value·scale is within ~1e-10 of an integer, so round() lands on it in
    // every engine — no HALF_UP-vs-double-tie hazard (true .5 ties can't
    // occur)
    val yc = round(col(yCol) * yScale, 0).cast("long")
    df.groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        // per-row products fit comfortably in 64-bit (offset·cents ~ 1e11);
        // the SUMS go through decimal(38,0) so 10^12-row groups can't wrap
        sum(x.cast(dec)).as("_sx"),
        sum(yc.cast(dec)).as("_sy"),
        sum((x * yc).cast(dec)).as("_sxy"),
        sum((x * x).cast(dec)).as("_sxx"))
      .withColumn(
        "_num", col("n").cast(dec) * col("_sxy") - col("_sx") * col("_sy"))
      .withColumn(
        "_den", col("n").cast(dec) * col("_sxx") - col("_sx") * col("_sx"))
      .withColumn(
        "slope",
        when(col("_den") =!= 0,
          col("_num").cast("double") / col("_den").cast("double") / yScale.toDouble))
      .drop("_sx", "_sy", "_sxy", "_sxx", "_num", "_den")
  }

  /** Per-group Pearson correlation by the same sufficient-statistics
    * decomposition as [[groupTrend]] (one map-side-combined aggregate, five
    * exact decimal sums plus Σy²):
    *
    *   r = (n·Σxy − Σx·Σy) / (√(n·Σx² − (Σx)²) · √(n·Σy² − (Σy)²))
    *
    * Every operation after the exact integer sums is CORRECTLY ROUNDED in
    * IEEE 754 on the JVM: BigDecimal→double casts, `sqrt` (required
    * correctly rounded by the standard — unlike ln/exp, which libm only
    * promises faithfully), one multiply, one divide. Cross-engine callers
    * should still pin the result (6-dp floor-round, the q162 rule): other
    * engines' wide-integer→double casts are not all correctly rounded
    * (DuckDB's HUGEINT cast converts limb-wise — measured 1-ulp skew). r is
    * scale-invariant, so the cents scaling cancels and needs no undo.
    *
    * Groups where either variance term is 0 (constant series, < 2 points)
    * yield null.
    */
  def groupCorr(
      df: DataFrame,
      keyCols: Seq[String],
      xCol: String,
      yCol: String,
      yScale: Int = 100): DataFrame = {
    require(yScale > 0, s"yScale=$yScale must be positive")
    val dec = "decimal(38,0)"
    val x = col(xCol).cast("long")
    val yc = round(col(yCol) * yScale, 0).cast("long")
    df.groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(x.cast(dec)).as("_sx"),
        sum(yc.cast(dec)).as("_sy"),
        sum((x * yc).cast(dec)).as("_sxy"),
        sum((x * x).cast(dec)).as("_sxx"),
        sum((yc * yc).cast(dec)).as("_syy"))
      .withColumn(
        "_num", col("n").cast(dec) * col("_sxy") - col("_sx") * col("_sy"))
      .withColumn(
        "_dx", col("n").cast(dec) * col("_sxx") - col("_sx") * col("_sx"))
      .withColumn(
        "_dy", col("n").cast(dec) * col("_syy") - col("_sy") * col("_sy"))
      .withColumn(
        "corr",
        when(col("_dx") =!= 0 && col("_dy") =!= 0,
          col("_num").cast("double") /
            (sqrt(col("_dx").cast("double")) * sqrt(col("_dy").cast("double")))))
      .drop("_sx", "_sy", "_sxy", "_sxx", "_syy", "_num", "_dx", "_dy")
  }

  /** Trailing exponentially-weighted moving average with DYADIC decay
    * (α = 1/2) over a bounded `lags`-term window — the smoothing kernel of
    * monitoring dashboards and feature pipelines, in a form two engines can
    * agree on bit-for-bit. The trick: weight (1/2)^k over values stored at
    * `scale` decimal places means EVERY term `2^(lags-1-k) · round(v·scale)`
    * is a 64-bit integer, so the weighted numerator and the
    * present-weight denominator are exact integer sums; the whole EWMA is
    * ONE IEEE division of exactly-agreed operands (then an exact /scale).
    * Classic unbounded EWMA is a sequential fp recurrence (order-dependent,
    * unfriendly to both parallelism and cross-engine identity); the bounded
    * dyadic form keeps >99.9% of the mass at 10 lags and restores both.
    *
    * Rows with a NULL value contribute nothing (their weight drops from the
    * denominator); a row whose whole window is NULL yields null.
    *
    * Scale shape: one frame-bounded window over (keys, order) — a single
    * shuffle, `lags` lag() calls fused into one window stage, arithmetic in
    * whole-stage codegen. No self-join, no explode.
    */
  def dyadicEwma(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[Column],
      valueCol: String,
      lags: Int = 4,
      scale: Int = 100,
      outCol: String = "ewma"): DataFrame = {
    require(lags >= 1 && lags <= 16, s"lags=$lags must be in [1,16]")
    require(scale > 0, s"scale=$scale must be positive")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
    // exact integer units (2-dp money at scale=100); computed BEFORE the
    // lags so every term below is integer arithmetic
    val cents = round(col(valueCol) * scale, 0).cast("long")
    val terms = (0 until lags).map { k =>
      val c = if (k == 0) cents else lag(cents, k).over(w)
      val wt = 1L << (lags - 1 - k)
      (when(c.isNotNull, c * wt).otherwise(lit(0L)),
        when(c.isNotNull, lit(wt)).otherwise(lit(0L)))
    }
    val num = terms.map(_._1).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    df.withColumn(
      outCol,
      when(den =!= 0,
        num.cast("double") / den.cast("double") / scale.toDouble))
  }

  /** Per-key lag-`lagN` autocorrelation: Pearson correlation of the series
    * against its own `lagN`-step-shifted self — the "is yesterday predictive
    * of today" signal behind seasonality detection and anomaly baselines.
    *
    * Pairs come from ONE keyed window (lag over (keys, order)); the
    * correlation then reuses [[groupCorr]]'s exact-integer-sum formulation
    * (values pre-scaled to longs with `yScale`), so everything up to the
    * final sqrt/divide is engine-exact. Rows whose lagged partner falls off
    * the series start contribute nothing. `n` counts the pairs actually
    * correlated; keys with constant series (zero variance on either side)
    * yield null corr, filter as needed.
    */
  def autoCorrLag(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[Column],
      valueCol: String,
      lagN: Int = 1,
      yScale: Int = 1): DataFrame = {
    require(lagN >= 1, s"lagN=$lagN must be >= 1")
    require(yScale > 0, s"yScale=$yScale must be positive")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
    val vc = round(col(valueCol) * yScale, 0).cast("long")
    val paired = df
      .withColumn("_cur", vc)
      .withColumn("_prev", lag(vc, lagN).over(w))
      .filter(col("_prev").isNotNull)
    // both columns already exact longs → yScale=1 round-trips them unchanged
    groupCorr(paired, keyCols, "_prev", "_cur", yScale = 1)
      .withColumnRenamed("corr", "autocorr")
  }

  /** Per-key TRAILING z-score — "how unusual is today against the
    * preceding `window` observations?", the rolling anomaly detector of
    * metric monitoring. The frame is strictly PRECEDING (rows −window..−1),
    * so the tested value never contaminates its own baseline. Emits `z`
    * only when the trailing frame is FULL (`cnt == window`) and has
    * positive variance — partial or constant baselines yield null, not a
    * fake score.
    *
    * `valueCol` must be integral (long units): the frame's Σx is a long
    * and Σx² a decimal(38,0), so mean and variance numerators are exact
    * and z is one closed-form double —
    * `(x − S/n) / sqrt((n·Σx² − S²)/(n·(n−1)))` — identical in any IEEE
    * engine.
    *
    * Scale shape: ONE frame-bounded keyed window (count/sum/sum-of-squares
    * fuse into a single window stage over the (keys, order) shuffle) —
    * the [[dyadicEwma]] shape; callers pre-aggregate to series grain
    * first, so the window sees thousands of rows per key, not facts.
    */
  def rollingZScore(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      valueCol: String,
      window: Int = 6,
      outCol: String = "z"): DataFrame = {
    require(window >= 2, s"window=$window must be >= 2")
    val dec = "decimal(38,0)"
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(-window, -1)
    val v = col(valueCol).cast("long")
    val cnt = count(lit(1)).over(w)
    val s = sum(v).over(w)
    val ss = sum(v.cast(dec) * v.cast(dec)).over(w)
    val varNum = cnt.cast(dec) * ss - s.cast(dec) * s.cast(dec)
    val z = (v.cast("double") - s.cast("double") / cnt.cast("double")) /
      sqrt(varNum.cast("double") / (cnt * (cnt - 1)).cast("double"))
    df.withColumn(outCol, when(cnt === window && varNum > 0, z))
  }

  /** Per-key CUSUM change-point: the single most likely level-shift
    * position in each series — the "when did this metric move?" detector
    * behind pipeline-drift and data-incident triage. For a series
    * x₁…x_n, the centered cumulative sum S_t = Σ_{i≤t}(xᵢ − x̄) peaks (in
    * absolute value) at the change point; multiplying through by n,
    *
    *   D_t = n·C_t − t·S      (C_t = Σ_{i≤t} xᵢ,  S = Σ xᵢ = n·S_t … /n)
    *
    * is an EXACT integer (`valueCol` cast to long units first), so the
    * argmax is engine-exact — no fp anywhere. Ties on |D| take the
    * SMALLEST t. Output per key: (keys…, n, t_star (1-based position),
    * order-col value at t_star as `at_order`, d_abs = |D_t*|, and
    * `shift_norm` = |S_t*| / n = d_abs/n² — the mean-shift magnitude in
    * original units, ONE pinned double division).
    *
    * Integer headroom: |D| ≤ n·Σ|x| — with per-key series of ~10⁵ points
    * of ~10¹¹-unit sums this stays well inside int64; for larger series,
    * downscale units first.
    *
    * Scale shape: callers pre-aggregate to series grain (key, order, value)
    * — this runs ONE keyed window (partitionBy key, orderBy order: running
    * sum + row number fused in a single stage) and a per-key argmax
    * aggregate. Parallelism follows keys; a single series never exceeds a
    * partition because series grain ≪ fact grain.
    */
  def cusumChangePoint(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "cusumChangePoint needs at least one key column")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
    val v = col(valueCol).cast("long")
    // long, not int: the t_star output must hash-match BIGINT oracles
    val stamped = df
      .withColumn("_t", row_number().over(w).cast("long"))
      .withColumn("_c", sum(v).over(w))
    val per = stamped.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("_n"), sum(v).as("_s"))
    // null-safe join-backs (JoinBack.nullSafe): a NULL series key must not
    // silently drop its whole series from the changepoint output
    val d = JoinBack.nullSafe(stamped, per, keyCols, bcast = false)
      .withColumn("_d", abs(col("_n") * col("_c") - col("_t") * col("_s")))
    // deterministic argmax: per-key max |D|, then smallest t at it, then
    // that row's order value — three reductions over the series grain
    val best = d.groupBy(keyCols.map(col): _*).agg(max("_d").as("_dmax"))
    val at = JoinBack.nullSafe(d, best, keyCols, bcast = false)
      .filter(col("_d") === col("_dmax"))
      .groupBy(keyCols.map(col): _*)
      .agg(min("_t").as("t_star"))
    JoinBack.nullSafe(d, at, keyCols, bcast = false)
      .filter(col("_t") === col("t_star"))
      .select(
        keyCols.map(col) ++ Seq(
          col("_n").as("n"), col("t_star"), col(orderCol).as("at_order"),
          col("_d").as("d_abs"),
          floor(col("_d").cast("double") /
            (col("_n").cast("double") * col("_n").cast("double")) * 1e6 + 0.5)
            .cast("long").as("shift_norm_micro")): _*)
  }

  /** Single-changepoint detection by BINARY SEGMENTATION — the
    * between-segment sum-of-squares argmax (the textbook first step of
    * binary segmentation / PELT): for every interior split t of the
    * per-key series, the variance explained by a mean shift at t is
    *
    *   BSS(t) = (S₁·n − S·t)² / (t·(n − t) · n)
    *
    * and the changepoint is the t maximizing it. This is the NORMALIZED
    * twin of [[cusumChangePoint]]: the numerator |S₁·n − S·t| is exactly
    * the CUSUM statistic, but the t·(n−t) weighting removes CUSUM's bias
    * toward mid-series splits — a shift near either end scores the same
    * as an equal shift in the middle. Emitted `bss = (S₁·n − S·t)² div
    * (t·(n−t))` (the constant /n dropped — argmax-invariant), exact for
    * any series whose MASS×LENGTH product `Σy·n` stays under ~10¹⁸
    * (counts-scale series; pre-aggregate heavier units to thousands first)
    * and whose per-key length n stays under ~6·10⁹ (so t·(n−t) fits a
    * long). The score is computed and ARGMAXED in decimal(38,0) — the
    * quotient can reach ~10³⁶ (d ≤ 10¹⁸ squared over a denominator as
    * small as n−1), far past Long.MaxValue, and a long-valued score would
    * overflow to NULL under non-ANSI semantics and silently LOSE the
    * max-of-struct argmax. Spark's `div` always returns long, so the
    * decimal quotient is built by split division: with q = d div den,
    * `d² div den = q·d + ((d − q·den)·d) div den` — each `div` result is
    * ≤ d ≤ 10¹⁸ (fits long), each product ≤ 10³⁶ (fits decimal(38,0)),
    * and the identity is exact because the q·den·d term divides evenly.
    * Only the EMITTED bss is cast to long, behind an explicit range
    * guard (a bare decimal→long cast WRAPS on overflow under non-ANSI
    * semantics): NULL when the winning score itself exceeds
    * Long.MaxValue, never a shifted argmax and never a wrapped score. No
    * fp anywhere; ties break to the EARLIEST t.
    *
    * Output per key: (keyCols..., n, t_star, at_order — the `orderCol`
    * value of the LAST left-segment row, bss, mean_left_micro,
    * mean_right_micro — truncating `(10⁶·S) div n` quotients). A series
    * with n = 1 has no interior split: its row carries NULLs.
    *
    * Scale shape: same as [[cusumChangePoint]] — one per-key window stamp
    * (series-per-key partitioning, the TimeSeries contract), a per-key
    * aggregate joined back null-safely, and a max-of-struct argmax that
    * combines map-side.
    */
  def changepointBss(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "changepointBss needs at least one key column")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
    val v = col(valueCol).cast("long")
    val stamped = df
      .withColumn("_t", row_number().over(w).cast("long"))
      .withColumn("_c", sum(v).over(w))
    val per = stamped.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("_n"), sum(v).as("_s"))
    val scored = JoinBack.nullSafe(stamped, per, keyCols, bcast = false)
      .filter(col("_t") < col("_n"))
      .withColumn("_d", abs(col("_n") * col("_c") - col("_t") * col("_s"))
        .cast("decimal(38,0)"))
      .withColumn("_den", col("_t") * (col("_n") - col("_t")))
      // exact d² div den in decimal(38,0) — see the scaladoc's split
      // division; a single long-valued quotient would NULL past 2⁶³
      .withColumn("_q", expr("_d div _den"))
      .withColumn("_g",
        expr("_q * _d + ((_d - _q * _den) * _d) div _den")
          .cast("decimal(38,0)"))
    // argmax as ONE map-combined max-of-struct: (bss desc, t asc) is a
    // total order per key (t is unique), so the carried fields are the
    // argmax row's, not a mix
    val best = scored.groupBy(keyCols.map(col): _*)
      .agg(max(struct(
        col("_g"), (-col("_t")).as("_mt"), col(orderCol).as("_o"),
        col("_c").as("_c1"))).as("_b"))
    JoinBack.nullSafe(per, best, keyCols, bcast = false, joinType = "left")
      .select(
        keyCols.map(col) ++ Seq(
          col("_n").as("n"),
          (-col("_b._mt")).as("t_star"),
          col("_b._o").as("at_order"),
          // explicit range guard: a bare decimal→long cast WRAPS on
          // overflow under non-ANSI semantics (Decimal.toLong), which
          // would emit a garbage score — NULL is the honest answer
          when(col("_b._g") > lit(Long.MaxValue).cast("decimal(38,0)"),
            lit(null).cast("long"))
            .otherwise(col("_b._g").cast("long")).as("bss"),
          expr("cast((_b._c1 * 1000000) div (-_b._mt) as long)")
            .as("mean_left_micro"),
          expr("cast(((_s - _b._c1) * 1000000) div (_n + _b._mt) as long)")
            .as("mean_right_micro")): _*)
  }

  /** Multiplicative seasonal index per (key, season): the season's mean
    * value relative to the key's overall mean —
    * `idx = mean(season) / mean(all)` — the day-of-week / month-of-year
    * profile behind seasonally-adjusted anomaly thresholds. Both means are
    * ratios of exact long sums, and the index is emitted as the exact
    * integer floor quotient `(s_season · n_all · 10⁶) div (n_season ·
    * s_all)` — no fp at all.
    *
    * Scale shape: one grouped aggregate at (key, season) grain + a per-key
    * rollup broadcast back — two shuffles of tiny frames, scan-dominated.
    */
  def seasonalIndex(
      df: DataFrame,
      keyCols: Seq[String],
      seasonCol: String,
      valueCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val v = col(valueCol).cast("long")
    val bySeason = df.groupBy(keyCols.map(col) :+ col(seasonCol).as("season"): _*)
      .agg(count(lit(1)).as("n"), sum(v).as("s"))
    val byKey = bySeason.groupBy(keyCols.map(col): _*)
      .agg(sum("n").as("_na"), sum("s").as("_sa"))
    JoinBack.nullSafe(bySeason, byKey, keyCols)
      .select(
        keyCols.map(col) ++ Seq(
          col("season"), col("n"), col("s"),
          // `div`, not `/`: decimal `/` rounds at a derived scale — the
          // integral divide is the exact floor both engines agree on
          when(col("_na") > 0 && col("_sa") =!= 0,
            expr(s"(cast(s as $dec) * cast(_na as $dec) * 1000000) " +
              s"div (cast(n as $dec) * cast(_sa as $dec))"))
            .as("idx_micro")): _*)
  }

  /** Theil-Sen slope per key: the MEDIAN of all pairwise slopes
    * `(vⱼ−vᵢ)/(tⱼ−tᵢ)` over a series — the robust trend estimate a single
    * outlier month can't bend (OLS breaks at one bad point; Theil-Sen
    * tolerates 29%). Input must be at series grain (one row per (key, t),
    * integer t and v); pairs are quadratic in SERIES length, never corpus
    * size — the same bounded-group contract as the library's other pair
    * operators.
    *
    * Determinism: each slope is pinned once to integer micro-units via a
    * floor division with a POSITIVE-offset numerator
    * (`(Δv·10⁶ + B·Δt) div Δt − B`, Δt > 0) so floor-vs-truncate division
    * semantics can never disagree across engines on negative slopes; the
    * median over slopes is the exact lower-mid/upper-mid average (the q124
    * recipe, in-group window — group grain, bounded).
    */
  def theilSenSlope(
      df: DataFrame,
      keyCols: Seq[String],
      tCol: String,
      valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "theilSenSlope needs at least one key column")
    val offset = 1000000000000L // shifts every numerator positive: |Δv·1e6| ≪ B·Δt
    val l = df.select(
      keyCols.map(col) ++ Seq(
        col(tCol).cast("long").as("_t1"), col(valueCol).cast("long").as("_v1")): _*)
    val r = df.select(
      keyCols.map(c => col(c).as(s"_r_$c")) ++ Seq(
        col(tCol).cast("long").as("_t2"), col(valueCol).cast("long").as("_v2")): _*)
    val exact = l.join(
        r,
        keyCols.map(c => col(c) === col(s"_r_$c")).reduce(_ && _) &&
          col("_t1") < col("_t2"))
      .withColumn("_num",
        (col("_v2") - col("_v1")) * lit(1000000L) + lit(offset) * (col("_t2") - col("_t1")))
      .withColumn("_slope", expr("_num div (_t2 - _t1)") - lit(offset))
      .select(keyCols.map(col) :+ col("_slope"): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
    val ranked = exact
      .withColumn("_rn",
        row_number().over(w.orderBy(col("_slope"))).cast("long"))
      .withColumn("_n", count(lit(1)).over(w))
    ranked
      .filter(col("_rn") === expr("(_n + 1) div 2") || col("_rn") === expr("(_n + 2) div 2"))
      .groupBy(keyCols.map(col): _*)
      .agg(
        min("_n").cast("long").as("n_pairs"),
        avg(col("_slope")).as("slope_micro"))
  }

  /** Date-spine coverage audit — the backfill planner: against the GLOBAL
    * [min, max] day span of `dateCol`, report per group how many days are
    * present, how many are missing, and the first gap — the "which
    * partitions need backfilling before this table is trustworthy" check
    * run on every ingest-lagged source. Returns (groups…, n_expected_days,
    * n_present_days, n_missing_days, first_missing) with `first_missing`
    * NULL when coverage is complete.
    *
    * Scale shape: the spine is ONE sequence() row exploded to span-days
    * rows and cross-joined against the DISTINCT group table (groups ×
    * days rows — the audit grain itself, tiny next to the fact table);
    * presence is a left anti-ish aggregate over the distinct
    * (group, day) projection of the facts, which map-side-combines before
    * its shuffle. No windows, no collect.
    *
    * The grid is answer-sized ONLY while the span is sane: a single
    * corrupt date (epoch 0, year 9999) would stretch the spine to tens of
    * thousands of days and multiply EVERY group by it, so the span is
    * guarded — `maxSpanDays` (default 3700, ~10 years of dailies) fails
    * the job loudly via an in-plan `raise_error` (no extra driver job)
    * instead of silently exploding the grid. Widen it deliberately for
    * genuinely longer horizons.
    */
  def dateSpineGaps(
      df: DataFrame,
      groupCols: Seq[String],
      dateCol: String,
      maxSpanDays: Int = 3700): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(maxSpanDays >= 1, s"maxSpanDays=$maxSpanDays must be >= 1")
    val span = df.agg(
        min(col(dateCol).cast("date")).as("_d0"),
        max(col(dateCol).cast("date")).as("_d1"))
      .withColumn("_span", datediff(col("_d1"), col("_d0")) + 1)
      .withColumn("_d0",
        when(col("_span") > maxSpanDays, raise_error(concat(
          lit("dateSpineGaps: span of "), col("_span"),
          lit(s" days exceeds maxSpanDays=$maxSpanDays — corrupt date? "),
          lit("(min="), col("_d0").cast("string"),
          lit(", max="), col("_d1").cast("string"), lit(")"))))
          .otherwise(col("_d0")))
    val spine = span
      .select(explode(sequence(col("_d0"), col("_d1"), expr("interval 1 day"))).as("_day"))
    val groups = df.select(groupCols.map(col): _*).distinct()
    val present = df
      .select(groupCols.map(col) :+ col(dateCol).cast("date").as("_day"): _*)
      .distinct()
      .withColumn("_here", lit(1L))
    groups.crossJoin(spine)
      .join(present, groupCols :+ "_day", "left")
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_expected_days"),
        sum(coalesce(col("_here"), lit(0L))).as("n_present_days"),
        (count(lit(1)) - sum(coalesce(col("_here"), lit(0L)))).as("n_missing_days"),
        min(when(col("_here").isNull, col("_day"))).as("first_missing"))
  }

  /** Brown's double exponential smoothing (level + trend + h-step forecast)
    * in the bounded dyadic form of [[dyadicEwma]]: α = 1/2 truncated at 4
    * lags, applied twice. With s1 = EWMA(y) and s2 = EWMA(s1), Brown's
    * closed forms are level = 2·s1 − s2, trend = s1 − s2 (α/(1−α) = 1 at
    * α = 1/2), forecast(h) = level + h·trend — the trend-aware successor to
    * a plain moving average for capacity planning and ingest-rate
    * projection.
    *
    * Exactness: 15·s1 = 8y₀+4y₁+2y₂+y₃ and 225·s2 = 8·(15s1)₀+…+（15s1)₃
    * are exact int64 sums of scaled-integer values, so level/trend/forecast
    * are single double divisions of exact integers by 225·scale —
    * bit-identical across engines, no recursion, no accumulation order.
    * Rows without 6 prior lags (the first 6 per key — s1 needs 3, s2
    * needs 3 more on top) emit NULLs: a partial-window Brown estimate
    * would silently be a different statistic. Row 7 (1-based) is the
    * first complete estimate.
    *
    * Scale shape: two window stages over the SAME (keys, order) spec — one
    * shuffle, the second stage reuses the first's sort; all arithmetic in
    * whole-stage codegen.
    */
  def brownDouble(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[Column],
      valueCol: String,
      horizon: Int = 1,
      scale: Int = 100): DataFrame = {
    require(horizon >= 0, s"horizon=$horizon must be >= 0")
    require(scale > 0, s"scale=$scale must be positive")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
    val cents = round(col(valueCol) * scale, 0).cast("long")
    def filt(c: Int => Column): Column = {
      val t0 = c(0); val t1 = c(1); val t2 = c(2); val t3 = c(3)
      when(t0.isNotNull && t1.isNotNull && t2.isNotNull && t3.isNotNull,
        t0 * 8L + t1 * 4L + t2 * 2L + t3)
    }
    val withS1 = df.withColumn(
      "_s1_15", filt(k => if (k == 0) cents else lag(cents, k).over(w)))
    val withS2 = withS1.withColumn(
      "_s2_225",
      filt(k => if (k == 0) col("_s1_15") else lag(col("_s1_15"), k).over(w)))
    val den = 225.0 * scale
    withS2
      .withColumn("level",
        (col("_s1_15") * 30L - col("_s2_225")).cast("double") / den)
      .withColumn("trend",
        (col("_s1_15") * 15L - col("_s2_225")).cast("double") / den)
      .withColumn("forecast",
        (col("_s1_15") * (30L + 15L * horizon) -
          col("_s2_225") * (1L + horizon)).cast("double") / den)
      .drop("_s1_15", "_s2_225")
  }
}
