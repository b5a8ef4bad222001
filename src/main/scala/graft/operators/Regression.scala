package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Closed-form least-squares regression — the "fit a small linear model per
  * group, at corpus scale, without an iterative solver" operator. One
  * map-side-combined aggregate computes the exact integer moment matrix;
  * the normal equations are solved per group by Cramer's rule on those
  * exact sums, so the only floating point is the final determinant
  * ratios — deterministic across engines and partitionings, unlike any
  * gradient/IRLS path.
  *
  * This is [[TimeSeries.groupTrend]]'s one-regressor slope generalized to
  * two regressors + intercept (y ≈ β₀ + β₁x₁ + β₂x₂).
  */
object Regression {

  /** Per-group OLS fit of `yCol ≈ β₀ + β₁·x1Col + β₂·x2Col`.
    *
    * Inputs are integerized: y via `round(y·yScale)`, x₁/x₂ taken as exact
    * integers (cast to long — callers pass small integral features like
    * hour-of-day; fractional regressors should be pre-scaled). Moments
    * (n, Σx₁, Σx₂, Σx₁², Σx₂², Σx₁x₂, Σy, Σx₁y, Σx₂y) accumulate as exact
    * decimal(38,0); the 3×3 normal-equation determinants expand exactly in
    * decimal, and each β is ONE double division det_j/det — pinned by the
    * caller.
    *
    * Output per group: `n`, `beta0`, `beta1`, `beta2` (null when the
    * design matrix is singular — collinear or constant regressors), plus
    * the exact `det` (decimal) for singularity diagnostics.
    *
    * Scale shape: one grouped aggregate over the fact table (map-side
    * combine, one shuffle); everything after is per-group O(1) arithmetic.
    * Decimal envelope: |det| terms are triple products of moment sums —
    * exact while n·max(x²)·max(x)² stays under 10³⁸, i.e. any realistic
    * bounded-feature fact table.
    */
  def ols2(
      df: DataFrame,
      groupCols: Seq[String],
      yCol: String,
      x1Col: String,
      x2Col: String,
      yScale: Int = 100): DataFrame = {
    require(yScale > 0, s"yScale=$yScale must be positive")
    val dec = "decimal(38,0)"
    val y = round(col(yCol) * yScale, 0).cast("long").cast(dec)
    val x1 = col(x1Col).cast("long").cast(dec)
    val x2 = col(x2Col).cast("long").cast(dec)
    val m = df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).cast(dec).as("_n"),
        sum(x1).cast(dec).as("_s1"),
        sum(x2).cast(dec).as("_s2"),
        sum(x1 * x1).cast(dec).as("_s11"),
        sum(x2 * x2).cast(dec).as("_s22"),
        sum(x1 * x2).cast(dec).as("_s12"),
        sum(y).cast(dec).as("_sy"),
        sum(x1 * y).cast(dec).as("_s1y"),
        sum(x2 * y).cast(dec).as("_s2y"))
    // X'X = [[n, s1, s2], [s1, s11, s12], [s2, s12, s22]]; X'y = [sy, s1y, s2y]
    // det(X'X) and the three Cramer numerators, expanded exactly
    def det3(
        a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
        c: org.apache.spark.sql.Column, d: org.apache.spark.sql.Column,
        e: org.apache.spark.sql.Column, f: org.apache.spark.sql.Column,
        g: org.apache.spark.sql.Column, h: org.apache.spark.sql.Column,
        i: org.apache.spark.sql.Column) =
      (a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)).cast(dec)
    val out = m
      .withColumn("_det", det3(
        col("_n"), col("_s1"), col("_s2"),
        col("_s1"), col("_s11"), col("_s12"),
        col("_s2"), col("_s12"), col("_s22")))
      .withColumn("_d0", det3(
        col("_sy"), col("_s1"), col("_s2"),
        col("_s1y"), col("_s11"), col("_s12"),
        col("_s2y"), col("_s12"), col("_s22")))
      .withColumn("_d1", det3(
        col("_n"), col("_sy"), col("_s2"),
        col("_s1"), col("_s1y"), col("_s12"),
        col("_s2"), col("_s2y"), col("_s22")))
      .withColumn("_d2", det3(
        col("_n"), col("_s1"), col("_sy"),
        col("_s1"), col("_s11"), col("_s1y"),
        col("_s2"), col("_s12"), col("_s2y")))
    val denom = col("_det").cast("double") * yScale.toDouble
    out.select(
      groupCols.map(col) ++ Seq(
        col("_n").cast("long").as("n"),
        col("_det").as("det"),
        when(col("_det") =!= 0, col("_d0").cast("double") / denom).as("beta0"),
        when(col("_det") =!= 0, col("_d1").cast("double") / denom).as("beta1"),
        when(col("_det") =!= 0, col("_d2").cast("double") / denom).as("beta2")): _*)
  }
}
