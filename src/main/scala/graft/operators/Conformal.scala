package graft.operators

import graft.load.Splits
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Split-conformal prediction intervals — the distribution-free
  * uncertainty wrapper a serving pipeline puts around ANY point
  * predictor: fit on a train split, take the calibration split's absolute
  * residuals, and the ⌈(n_cal+1)·(1−α)⌉-th SMALLEST residual is a radius
  * `qhat` such that `prediction ± qhat` covers a fresh point with
  * probability ≥ 1−α (finite-sample, no distributional assumption — the
  * classic split-conformal guarantee of Papadopoulos et al. 2002 / Lei et
  * al. 2018).
  *
  * This implementation is fully deterministic and engine-replayable:
  *  - the train/cal/test split is the md5 hash split ([[graft.load.Splits
  *    .assignSplit]], weights 2/1/1) — a pure function of the row id;
  *  - y is quantized ONCE per row to micro-units with the repo's pin
  *    recipe `y6 = floor(10⁶·y + 0.5)` (exact for doubles up to ~2⁵²/10⁶;
  *    a plain cast-then-scale would silently floor fractional y to whole
  *    units and compute the guarantee on a different statistic);
  *  - the predictor is the per-group TRAIN mean of the quantized values,
  *    as the truncating integer quotient `Σy6 div n` over an exact
  *    decimal(38,0) sum;
  *  - residuals are exact longs `|y6 − mu|`, and `qhat` is an exact
  *    ORDER STATISTIC — the k-th smallest — found without any
  *    per-group-partition window: [[GlobalRank.withRowNumber]] range-
  *    exchanges on (group, residual, id) and the per-group rank is
  *    `rn − min(rn over group) + 1` via an O(|groups|)-row broadcast
  *    join-back (a hot group spans many range partitions; a
  *    `Window.partitionBy(group)` would pin it to one task);
  *  - the readout re-scores the held-out TEST split: `coverage =
  *    n_covered / n_test` in one final double division — the empirical
  *    check that the guarantee transferred.
  *
  * When `⌈(n_cal+1)(1−α)⌉ > n_cal` (tiny calibration sets) the interval is
  * unbounded: `qhat`, `n_covered` and `coverage` come back NULL rather
  * than a silently-clamped radius.
  *
  * Output, one row per group: (groupCols..., n_train, mu_micro, n_cal,
  * k_idx, qhat, n_test, n_covered, coverage).
  */
object Conformal {

  def splitConformal(
      df: DataFrame,
      groupCols: Seq[String],
      yCol: String,
      idCol: String,
      alphaPermille: Int = 100): DataFrame = {
    require(groupCols.nonEmpty, "splitConformal needs at least one group column")
    require(alphaPermille > 0 && alphaPermille < 1000,
      s"alphaPermille=$alphaPermille must be in (0, 1000)")
    require(!df.columns.contains("_y6"), "splitConformal: reserved column _y6 in input")
    val gcols = groupCols.map(col)
    // the split frame feeds THREE consumers (train mean, calibration
    // residuals, test re-score) — persist the slim projection once, or
    // each re-scans the fact table and re-runs the md5 split hash per row
    val y6in = floor(col(yCol).cast("double") * 1000000.0 + 0.5).cast("long")
    val split = df.select(
      (gcols :+ y6in.as("_y6") :+ col(idCol).as(idCol)): _*)
      .withColumn(
        "_split",
        Splits.assignSplit(col(idCol), Seq("train" -> 2, "cal" -> 1, "test" -> 1)))
      .persist()
    val y6 = col("_y6")

    val mu = split.filter(col("_split") === "train")
      .groupBy(gcols: _*)
      .agg(
        count(lit(1)).as("n_train"),
        sum(y6.cast("decimal(38,0)")).as("_s"))
      .select(
        gcols :+ col("n_train") :+
          expr("cast(_s div n_train as long)").as("mu_micro"): _*)

    // groups are an aggregate grain (small); the row tables are not
    val cal = JoinBack.nullSafe(
      split.filter(col("_split") === "cal"), mu, groupCols, bcast = true)
      .withColumn("_r", abs(y6 - col("mu_micro")))
    val ranked = GlobalRank.withRowNumber(
      cal.select(gcols :+ col("_r") :+ col(idCol).as("_tie"): _*),
      groupCols ++ Seq("_r", "_tie"))
    val bounds = ranked.groupBy(gcols: _*)
      .agg(min(col("_rn")).as("_rn0"), count(lit(1)).as("n_cal"))
      .withColumn(
        "k_idx",
        expr(s"((n_cal + 1) * ${1000 - alphaPermille} + 999) div 1000"))
    val qhat = JoinBack.nullSafe(ranked, bounds, groupCols, bcast = true)
      .filter(col("_rn") - col("_rn0") + 1L === col("k_idx"))
      .groupBy(gcols: _*)
      .agg(min(col("_r")).as("qhat")) // rank row is unique; min = identity
    // left join: k_idx > n_cal leaves the group without a rank row → NULL
    val calStats = JoinBack.nullSafe(
      bounds.drop("_rn0"), qhat, groupCols, bcast = true, joinType = "left")

    val test = JoinBack.nullSafe(
      split.filter(col("_split") === "test"), mu, groupCols, bcast = true)
    val testStats = JoinBack.nullSafe(test, calStats, groupCols, bcast = true)
      .groupBy(gcols: _*)
      .agg(
        count(lit(1)).as("n_test"),
        // NULL qhat (unbounded interval) → NULL count, not a spurious 0
        sum(when(col("qhat").isNotNull,
          when(abs(y6 - col("mu_micro")) <= col("qhat"), 1L).otherwise(0L)))
          .as("n_covered"))

    JoinBack.nullSafe(
      JoinBack.nullSafe(mu, calStats, groupCols, bcast = true),
      testStats, groupCols, bcast = true)
      .withColumn(
        "coverage",
        col("n_covered").cast("double") / col("n_test").cast("double"))
      .select(
        gcols ++ Seq(
          col("n_train"), col("mu_micro"), col("n_cal"), col("k_idx"),
          col("qhat"), col("n_test"), col("n_covered"), col("coverage")): _*)
  }
}
