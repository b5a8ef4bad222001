package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan-Meier survival estimation at warehouse scale: from
  * (duration, event) observations — duration an integer time-to-event,
  * event 1 if observed / 0 if right-censored — the product-limit curve
  * S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ), the "how long do users stay?" /
  * "how long until churn?" readout.
  *
  * Determinism: the running product is reassociated as a SUM of per-step
  * `ln(1 − dᵢ/nᵢ)` terms, each pinned ONCE to integer micro-nats at the
  * distinct-time grain (the library's one-fp-op-per-distinct-value
  * recipe), cumulated as exact integers, and exponentiated once per
  * OUTPUT row — so the curve is independent of aggregation order and
  * engine. Steps where dᵢ = nᵢ (everyone left) drop survival to exactly
  * 0 from that time on.
  *
  * Scale shape: observations aggregate to the DISTINCT-TIME grain first
  * (map-side combine; cardinality is the time domain, not subjects);
  * at-risk counts nᵢ = N − (subjects gone before tᵢ) come from a
  * cumulative window per group — per-GROUP windows at time grain, the
  * bounded-window contract. No per-subject windows, no collect.
  */
object Survival {

  /** Per-(keys, time) KM table: (keys…, t, n_risk, n_event, n_censor,
    * surv_micro) at every distinct observed time (event or censor), with
    * `surv_micro = ⌊exp(Σ ln-terms)·10⁶ + ½⌋` and 0 once a step consumes
    * every at-risk subject.
    */
  def kaplanMeier(
      df: DataFrame,
      keyCols: Seq[String],
      durationCol: String,
      eventCol: String): DataFrame = {
    require(keyCols.nonEmpty, "kaplanMeier needs grouping keys (use a constant for global)")
    val keys = keyCols.map(col)
    val byTime = df
      .groupBy(keys :+ col(durationCol).cast("long").as("t"): _*)
      .agg(
        sum(when(col(eventCol) =!= 0, 1L).otherwise(0L)).as("n_event"),
        sum(when(col(eventCol) =!= 0, 0L).otherwise(1L)).as("n_censor"))
    val wAll = Window.partitionBy(keys: _*)
    val wCum = Window.partitionBy(keys: _*).orderBy(col("t"))
    val stepped = byTime
      // at-risk at t = total subjects − everyone whose time is strictly earlier
      .withColumn("_total", sum(col("n_event") + col("n_censor")).over(wAll))
      .withColumn("_gone_before",
        coalesce(sum(col("n_event") + col("n_censor"))
          .over(wCum.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_risk", col("_total") - col("_gone_before"))
      // per-step ln(1 − d/n) pinned to micro-nats; d = n → sentinel NULL
      // (survival is exactly 0 afterward, no -inf in the sum)
      .withColumn("_step_micro",
        when(col("n_event") === 0, lit(0L)).otherwise(
          when(col("n_event") < col("n_risk"),
            floor(log((col("n_risk") - col("n_event")).cast("double") /
              col("n_risk").cast("double")) * lit(1000000.0) + lit(0.5)).cast("long"))))
    stepped
      .withColumn("_dead",
        max(when(col("_step_micro").isNull, 1).otherwise(0))
          .over(wCum.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("_cum_micro",
        sum(coalesce(col("_step_micro"), lit(0L)))
          .over(wCum.rowsBetween(Window.unboundedPreceding, 0)))
      .select(
        keys ++ Seq(
          col("t"), col("n_risk"), col("n_event"), col("n_censor"),
          when(col("_dead") === 1, 0L).otherwise(
            floor(exp(col("_cum_micro").cast("double") / lit(1000000.0)) *
              lit(1000000.0) + lit(0.5)).cast("long")).as("surv_micro")): _*)
  }
}
