package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank-based statistics at corpus scale: Mann-Whitney U (the
  * nonparametric A/B test), ROC AUC (its classifier-evaluation twin — AUC
  * is exactly U/(n₁n₀)), Spearman rank correlation, and Kendall's τ-b —
  * the monotone-association toolkit a metrics warehouse runs when the data
  * is heavy-tailed enough that Pearson/Welch lie.
  *
  * Scale shape — the whole family avoids the classic scale-killer (a
  * global `rank() OVER (ORDER BY score)` window, which collapses to one
  * task): ranks are never materialized per ROW. Instead the input is
  * aggregated to DISTINCT score values first (map-side combine, one
  * shuffle keyed by score), and the mid-rank of each tie group is
  * reconstructed from a distributed exclusive prefix sum of the tie
  * counts ([[GlobalRank.withRunningTotal]] — range partition + two-pass
  * stamp, O(partitions) driver longs). The rank-sum statistics then come
  * from one more tiny aggregate over |distinct scores| rows. Ties are
  * handled exactly (average ranks and the tie-correction term), not
  * approximately.
  *
  * Determinism: mid-ranks are kept DOUBLED (`2·rank` is always an
  * integer, so `.5` average ranks never touch fp); every sum is an exact
  * long/decimal(38,0); each emitted statistic is one closed-form double
  * expression over exactly-agreed integers — the engine-parity recipe
  * used across the library.
  */
object RankStats {

  private val dec = "decimal(38,0)"

  /** Per-distinct-score tie table: (_s score, _n tie count, _np positives
    * in the tie, _r2 = 2·average-rank of the tie group — exact long).
    * Average rank of a tie group starting after `c` rows with `n` members
    * is `c + (n+1)/2`, so `2·avgrank = 2c + n + 1`.
    */
  private def tieTable(df: DataFrame, scoreCol: String, posCol: String): DataFrame = {
    val byScore = df
      .groupBy(col(scoreCol).cast("long").as("_s"))
      .agg(
        count(lit(1)).as("_n"),
        sum(when(col(posCol) =!= 0, 1L).otherwise(0L)).as("_np"))
    GlobalRank
      .withRunningTotal(byScore, Seq("_s"), "_n", "_cb")
      .withColumn("_r2", lit(2L) * col("_cb") + col("_n") + lit(1L))
  }

  /** ROC AUC of an integer score against a binary label, ties resolved by
    * the mid-rank convention (the Mann-Whitney estimator — equivalent to
    * counting a tied positive/negative pair as half concordant). Returns
    * one row: (n_pos, n_neg, auc). AUC is the single IEEE division
    * `(2·R₊ − n₊(n₊+1)) / (2·n₊·n₀)` of exact integers — bit-identical
    * across engines with no pinning.
    */
  def aucFromScores(df: DataFrame, scoreCol: String, labelCol: String): DataFrame =
    tieTable(df, scoreCol, labelCol)
      .agg(
        sum(col("_np")).as("_npos"),
        sum(col("_n") - col("_np")).as("_nneg"),
        // Σ np·2·avgrank — exact; fits decimal(38) far past 100 TB row counts
        sum((col("_np") * col("_r2")).cast(dec)).as("_rs2"))
      .select(
        col("_npos").cast("long").as("n_pos"),
        col("_nneg").cast("long").as("n_neg"),
        when(col("_npos") > 0 && col("_nneg") > 0,
          (col("_rs2") - (col("_npos").cast(dec) * (col("_npos") + 1).cast(dec)))
            .cast("double") /
            (lit(2L).cast(dec) * col("_npos").cast(dec) * col("_nneg").cast(dec))
              .cast("double"))
          .as("auc"))

  /** Mann-Whitney U with the normal approximation and EXACT tie
    * correction. `groupCol` must be binary 0/1 (1 = treatment); the U
    * reported is the treatment side's. Returns one row:
    * (n1, n0, u2 = 2·U exact long, z) where
    * `z = (U − n₁n₀/2) / σ`, `σ² = n₁n₀/12 · ((n+1) − Σ(t³−t)/(n(n−1)))`.
    * u2 is exact; z is one closed-form double over exact integers.
    */
  def mannWhitney(df: DataFrame, scoreCol: String, groupCol: String): DataFrame =
    tieTable(df, scoreCol, groupCol)
      .agg(
        sum(col("_np")).as("_n1"),
        sum(col("_n") - col("_np")).as("_n0"),
        sum((col("_np") * col("_r2")).cast(dec)).as("_rs2"),
        // tie-correction Σ(t³ − t) over tie groups — exact decimal
        sum((col("_n") * col("_n") * col("_n") - col("_n")).cast(dec)).as("_t3t"))
      .select(
        col("_n1").cast("long").as("n1"),
        col("_n0").cast("long").as("n0"),
        // 2U = 2·R₁ − n₁(n₁+1)
        (col("_rs2") - (col("_n1").cast(dec) * (col("_n1") + 1).cast(dec)))
          .cast("long").as("u2"),
        {
          val n1 = col("_n1").cast("double")
          val n0 = col("_n0").cast("double")
          val n = (col("_n1") + col("_n0")).cast("double")
          val u = (col("_rs2") - (col("_n1").cast(dec) * (col("_n1") + 1).cast(dec)))
            .cast("double") / lit(2.0)
          val sigma2 = n1 * n0 / lit(12.0) *
            ((n + 1) - col("_t3t").cast("double") / (n * (n - 1)))
          when(col("_n1") > 0 && col("_n0") > 0 && sigma2 > 0,
            (u - n1 * n0 / lit(2.0)) / sqrt(sigma2)).as("z")
        })

  /** Per-GROUP ROC AUC (the per-language / per-segment model eval):
    * same mid-rank Mann-Whitney estimator as [[aucFromScores]], with the
    * tie table and its cumulative built per group — the tie aggregation
    * is one grouped count keyed (group, score) and the exclusive prefix
    * sum is a window PARTITIONED by the group (groups are the unit of
    * parallelism — the legitimate window use; a single giant group should
    * use the global [[aucFromScores]] instead). Returns (keys…, n_pos,
    * n_neg, auc).
    */
  def aucByGroup(
      df: DataFrame,
      keyCols: Seq[String],
      scoreCol: String,
      labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(keyCols.nonEmpty, "aucByGroup needs grouping keys (global: aucFromScores)")
    val keys = keyCols.map(col)
    val byScore = df
      .groupBy(keys :+ col(scoreCol).cast("long").as("_s"): _*)
      .agg(
        count(lit(1)).as("_n"),
        sum(when(col(labelCol) =!= 0, 1L).otherwise(0L)).as("_np"))
    val w = Window.partitionBy(keys: _*).orderBy(col("_s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val tied = byScore
      .withColumn("_cb", coalesce(sum(col("_n")).over(w), lit(0L)))
      .withColumn("_r2", lit(2L) * col("_cb") + col("_n") + lit(1L))
    tied
      .groupBy(keys: _*)
      .agg(
        sum(col("_np")).as("_npos"),
        sum(col("_n") - col("_np")).as("_nneg"),
        sum((col("_np") * col("_r2")).cast(dec)).as("_rs2"))
      .select(
        keys ++ Seq(
          col("_npos").cast("long").as("n_pos"),
          col("_nneg").cast("long").as("n_neg"),
          when(col("_npos") > 0 && col("_nneg") > 0,
            (col("_rs2") - (col("_npos").cast(dec) * (col("_npos") + 1).cast(dec)))
              .cast("double") /
              (lit(2L).cast(dec) * col("_npos").cast(dec) * col("_nneg").cast(dec))
                .cast("double"))
            .as("auc")): _*)
  }

  /** Per-group Spearman rank correlation between two integer-valued
    * columns, mid-ranks for ties, computed as Pearson over the DOUBLED
    * average ranks (doubling cancels in the correlation, so ranks stay
    * integral). Returns (keys…, n, rho).
    *
    * Scale shape: ranks within a group come from two per-group windows
    * (`rank()` + tie count) — groups are the unit of parallelism here, the
    * legitimate window use; the cross-moments are one exact
    * decimal-summed aggregate. For a GLOBAL rho over one giant group, rank
    * via [[GlobalRank]] instead.
    */
  def spearmanByGroup(
      df: DataFrame,
      keyCols: Seq[String],
      xCol: String,
      yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(keyCols.nonEmpty, "spearmanByGroup needs grouping keys (global: use GlobalRank)")
    val keys = keyCols.map(col)
    def rank2(c: String, out: String) = {
      val wOrd = Window.partitionBy(keys: _*).orderBy(col(c))
      val wTie = Window.partitionBy(keys :+ col(c): _*)
      // 2·avgrank = 2·rank() + (ties − 1): rank() is the first row number
      // of the tie group, avgrank = rank + (ties−1)/2
      (lit(2L) * rank().over(wOrd) + count(lit(1)).over(wTie) - lit(1L)).as(out)
    }
    val ranked = df.select(
      keys :+ rank2(xCol, "_rx") :+ rank2(yCol, "_ry"): _*)
    ranked
      .groupBy(keys: _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col("_rx").cast(dec)).as("_sx"),
        sum(col("_ry").cast(dec)).as("_sy"),
        sum((col("_rx") * col("_ry")).cast(dec)).as("_sxy"),
        sum((col("_rx") * col("_rx")).cast(dec)).as("_sxx"),
        sum((col("_ry") * col("_ry")).cast(dec)).as("_syy"))
      .withColumn("_num", col("n").cast(dec) * col("_sxy") - col("_sx") * col("_sy"))
      .withColumn("_dx", col("n").cast(dec) * col("_sxx") - col("_sx") * col("_sx"))
      .withColumn("_dy", col("n").cast(dec) * col("_syy") - col("_sy") * col("_sy"))
      .withColumn(
        "rho",
        when(col("_dx") =!= 0 && col("_dy") =!= 0,
          col("_num").cast("double") /
            (sqrt(col("_dx").cast("double")) * sqrt(col("_dy").cast("double")))))
      .drop("_sx", "_sy", "_sxy", "_sxx", "_syy", "_num", "_dx", "_dy")
  }

  /** Per-group Kendall τ-b between two integer columns over BOUNDED groups
    * (time-series grains, per-entity panels — the pair join is quadratic in
    * GROUP size, never corpus size; same contract as the library's other
    * within-group pair operators). Concordant/discordant/tie counts are
    * exact longs from an i<j self-join keyed on the group; τ-b is one
    * closed-form double `(C−D)/√((n₀−n₁)(n₀−n₂))`.
    *
    * `ordCol` must totally order rows within a group (pairs are taken as
    * ord_i < ord_j).
    */
  def kendallTauByGroup(
      df: DataFrame,
      keyCols: Seq[String],
      ordCol: String,
      xCol: String,
      yCol: String): DataFrame = {
    val l = df.select(
      keyCols.map(col) ++ Seq(
        col(ordCol).as("_o1"), col(xCol).cast("long").as("_x1"),
        col(yCol).cast("long").as("_y1")): _*)
    val r = df.select(
      keyCols.map(c => col(c).as(s"_r_$c")) ++ Seq(
        col(ordCol).as("_o2"), col(xCol).cast("long").as("_x2"),
        col(yCol).cast("long").as("_y2")): _*)
    val joined = l.join(
      r,
      keyCols.map(c => col(c) === col(s"_r_$c")).reduce(_ && _) &&
        col("_o1") < col("_o2"))
    val sgn = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      when(a > b, 1L).when(a < b, -1L).otherwise(0L)
    joined
      .groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("_pairs"),
        sum(when(sgn(col("_x2"), col("_x1")) * sgn(col("_y2"), col("_y1")) > 0, 1L)
          .otherwise(0L)).as("_c"),
        sum(when(sgn(col("_x2"), col("_x1")) * sgn(col("_y2"), col("_y1")) < 0, 1L)
          .otherwise(0L)).as("_d"),
        sum(when(col("_x1") === col("_x2"), 1L).otherwise(0L)).as("_tx"),
        sum(when(col("_y1") === col("_y2"), 1L).otherwise(0L)).as("_ty"))
      .select(
        keyCols.map(col) ++ Seq(
          col("_pairs").as("n_pairs"),
          col("_c").as("concordant"),
          col("_d").as("discordant"),
          when((col("_pairs") - col("_tx")) > 0 && (col("_pairs") - col("_ty")) > 0,
            (col("_c") - col("_d")).cast("double") /
              sqrt((col("_pairs") - col("_tx")).cast("double") *
                (col("_pairs") - col("_ty")).cast("double"))).as("tau_b")): _*)
  }

  /** Rank-biased overlap (Webber et al. 2010) between two top-`depth`
    * rankings, in the exact dyadic form: with persistence p = 1/2 the
    * weight of depth d is (1−p)·p^(d−1) = 1/2^d, so
    * `RBO@D = Σ_{d=1..D} overlap(d) / (d·2^d)` — every term is a ratio of
    * small exact integers, floored to micro-units BEFORE the sum, making
    * the score engine-identical (no geometric-series fp accumulation).
    * Truncated form (no residual extrapolation): the published min-RBO.
    *
    * Inputs are rank tables (`itemCol`, `rankCol` with ranks 1..depth —
    * produce them with a deterministic total order, e.g. (count DESC,
    * item ASC)). The key identity: overlap(d) = #items with
    * max(rank_a, rank_b) ≤ d, so one inner join + a `depth`-row histogram
    * prefix sum replaces the per-depth set intersections.
    *
    * Output (one row): `depth`, `rbo_micro` (exact integer micro-units).
    *
    * Scale: rankings are top-k by construction — everything after the
    * caller's ranking aggregate is k-row work.
    */
  def rboDyadic(
      ranksA: DataFrame,
      ranksB: DataFrame,
      itemCol: String,
      rankCol: String,
      depth: Int = 16): DataFrame = {
    require(depth >= 1 && depth <= 20,
      s"depth=$depth must be in [1,20] (d·2^d must stay in micro-precision range)")
    val a = ranksA.filter(col(rankCol) <= depth)
      .select(col(itemCol).as("_it"), col(rankCol).cast("long").as("_ra"))
    val b = ranksB.filter(col(rankCol) <= depth)
      .select(col(itemCol).as("_it"), col(rankCol).cast("long").as("_rb"))
    val m = a.join(b, "_it")
      .select(greatest(col("_ra"), col("_rb")).as("_m"))
    // overlap(d) = #rows with _m <= d; term_micro(d) = overlap·1e6 div (d·2^d)
    val spark = ranksA.sparkSession
    import spark.implicits._
    val depths = (1 to depth).map(_.toLong).toDF("_d")
    m.join(broadcast(depths), col("_m") <= col("_d"), "right")
      .groupBy(col("_d"))
      .agg(sum(when(col("_m").isNotNull, 1L).otherwise(0L)).as("_ov"))
      .select(expr("(_ov * 1000000L) div (_d * shiftleft(1L, CAST(_d AS INT)))").as("_term"))
      .agg(lit(depth).cast("int").as("depth"),
        sum(col("_term")).cast("long").as("rbo_micro"))
  }
}
