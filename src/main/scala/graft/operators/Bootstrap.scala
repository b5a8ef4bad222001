package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Poisson bootstrap — THE resampling scheme that scales:
  * instead of drawing n rows with replacement (which needs global
  * coordination), each row independently appears in resample b with
  * multiplicity ~ Poisson(1) (Chamandy et al., "Estimating Uncertainty
  * for Massive Data Streams", Google 2012). Independence per row makes it
  * a pure projection: B resamples cost one explode + one grouped
  * aggregate, embarrassingly parallel at any scale.
  *
  * Randomness is md5-derived like every recipe in this library: row id ‖
  * ":" ‖ resample index hashes to a 24-bit integer, and the multiplicity
  * is the Poisson(1) inverse CDF evaluated by comparing against
  * PRECOMPUTED integer thresholds floor(CDF(k)·16²⁴) — no exp/ln at query
  * time, so the resample assignment (and therefore every downstream
  * statistic) is bit-identical in any engine. Thresholds cover k ≤ 5;
  * P(K ≥ 6) < 6·10⁻⁴ collapses to multiplicity 6 (negligible and, being
  * deterministic, still cross-engine identical).
  */
object Bootstrap {

  /** floor(Poisson(1) CDF(k) · 16^6) for k = 0..5. */
  val PoissonThresholds: Seq[Long] =
    Seq(6171992L, 12343985L, 15429982L, 16458647L, 16715813L, 16767247L)

  /** Poisson(1) multiplicity of `id` in resample `b` (both any type; id
    * is cast to string for hashing). Draws are PACKED five-per-digest:
    * resample b reads 24 bits at hex offset 6·(b mod 5) of
    * md5(id ":" b div 5) — one md5 covers five resamples, so B = 16
    * costs 4 hashes per row instead of 16 (the md5 is the dominant cost
    * of the whole operator; the 128-bit digest's bit groups are as
    * independent as separate digests for resampling purposes).
    */
  def multiplicity(id: Column, b: Column): Column = {
    val grp = floor(b.cast("long") / 5.0).cast("int") // b is a small non-negative index — fp /5 is exact here
    val slot = pmod(b.cast("int"), lit(5))
    val hex = md5(concat(id.cast("string"), lit(":"), grp.cast("string")))
    val h = conv(hex.substr(slot * lit(6) + lit(1), lit(6)), 16, 10).cast("long")
    // foldRight so the SMALLEST threshold is the outermost when — the
    // chain must read "h < t0 → 0 else h < t1 → 1 …", not the reverse
    PoissonThresholds.zipWithIndex.foldRight(lit(6)) { case ((t, k), acc) =>
      when(h < t, k).otherwise(acc)
    }.cast("int")
  }

  /** Bootstrap standard error of the mean of an exact integer-unit value
    * column: one row (n, mean_micro, n_resamples, se_micro) where
    * `mean_micro = (Σv·10⁶) div n` is the full-sample mean in micro-units
    * (exact bigint) and `se_micro` is the standard deviation across the B
    * resample means (each itself an exact integer micro-unit mean),
    * computed from exact HUGEINT moment sums with ONE closed-form sqrt at
    * the end — pin it with the caller's 6-dp rule if emitting a double.
    *
    * Scale shape: explode(B) → grouped agg keyed by resample (map-side
    * combined: B rows per partition reach the shuffle) → B-row reduce.
    * Input rows are read once; no collect, no window.
    */
  def meanSe(df: DataFrame, idCol: String, valueCol: String, b: Int = 16): DataFrame = {
    require(b >= 2, s"need at least 2 resamples, got $b")
    Seq("_b", "_m") foreach { r =>
      require(!df.columns.contains(r), s"df must not contain reserved column '$r'")
    }
    val dec = "decimal(38,0)"
    // spread the (id, value) projection before the B-way explode: the md5
    // multiplicity draws are heavy per-row work, and a single-row-group
    // scan would run all n·B of them on one task; both branches read the
    // same exchange (reused), so the spread costs one slim shuffle
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val proj = df.select(col(idCol), col(valueCol)).repartition(parts, col(idCol))
    val full = proj.agg(
      count(lit(1)).as("n"),
      sum(col(valueCol).cast(dec)).as("_sv"))
    val perResample = proj
      .select(col(idCol), col(valueCol), explode(sequence(lit(0), lit(b - 1))).as("_b"))
      .withColumn("_m", multiplicity(col(idCol), col("_b")))
      .groupBy("_b")
      .agg(
        sum(col("_m").cast("long")).as("_nb"),
        // m·v fits a long (m ≤ 6); sum in decimal for the exact total
        sum((col("_m").cast("long") * col(valueCol).cast("long")).cast(dec)).as("_svb"))
      .filter(col("_nb") > 0) // an empty resample (vanishing p at any real n) has no mean
      .select(expr(s"(_svb * 1000000) div _nb").cast("long").as("_mb"))
    val se = perResample.agg(
      count(lit(1)).as("n_resamples"),
      sum(col("_mb").cast(dec)).as("_sm"),
      sum((col("_mb").cast(dec) * col("_mb").cast(dec))).as("_sm2"))
    full.crossJoin(se).select(
      col("n"),
      expr("(_sv * 1000000) div n").cast("long").as("mean_micro"),
      col("n_resamples"),
      // sample variance over the resample means: (B·Σm² − (Σm)²) / (B·(B−1)),
      // numerator formed EXACTLY in decimal, one cast to double before sqrt
      // (the CUPED recipe — casting the two e23-scale terms separately would
      // put catastrophic cancellation after the rounding)
      sqrt(
        expr("cast(_sm2 * n_resamples - _sm * _sm as double)") /
          (col("n_resamples").cast("double") * (col("n_resamples") - 1).cast("double")))
        .as("se_micro"))
  }
}
