package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization: split each key's event stream into sessions at
  * inactivity gaps — the batch twin of Structured Streaming's
  * `session_window` (which [[graft.streaming.StreamingIngest]] uses on live
  * streams), and the standard first step of behavioral / funnel analytics
  * over event logs.
  *
  * The reference has no event semantics at all (its "stream" is a daily file
  * poll, `main.py:412-424`); this operator is part of the beyond-reference
  * training-pipeline surface.
  *
  * Scale shape: ONE shuffle on the key column. Both window passes (the lag
  * and the running sum) and the optional per-session aggregate all share the
  * `partitionBy(key)` hash partitioning, so Catalyst plans a single
  * Exchange; per-key state is a sort within the partition, never a
  * driver-side structure. Skewed keys (one user with millions of events)
  * sort within one task — at 100 TB pre-filter bot-like keys or bound
  * sessions with a secondary date split.
  */
object Sessionize {

  /** Adds a `session_id` column: 1-based per-key session ordinal. A new
    * session starts when the gap from the key's previous event exceeds
    * `gapSeconds`. `tieCol` breaks timestamp ties deterministically.
    */
  def sessionize(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val prevTs = lag(col(tsCol), 1).over(w)
    val gapUs = lit(gapSeconds * 1000000L)
    val newSession =
      when(prevTs.isNull || (unix_micros(col(tsCol)) - unix_micros(prevTs)) > gapUs, 1L)
        .otherwise(0L)
    df.withColumn(
      "session_id",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session summary: event count, start (as a second-precision string —
    * portable across engines), and duration in microseconds.
    */
  def sessionStats(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      gapSeconds: Long): DataFrame =
    sessionize(df, keyCol, tsCol, tieCol, gapSeconds)
      .groupBy(col(keyCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        date_format(min(col(tsCol)), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        (unix_micros(max(col(tsCol))) - unix_micros(min(col(tsCol)))).as("duration_us"))

  /** First-order Markov transition matrix of a per-key event sequence:
    * (src, dst, n, p_micro) where n counts src→dst adjacencies across all
    * keys' sequences and p_micro is the row-normalized transition
    * probability as an EXACT integer floor quotient (n·10⁶ div Σ_dst n) —
    * the behavioral fingerprint behind next-event prediction baselines,
    * funnel-drift detection, and bot/anomaly triage ("this cohort's
    * click→purchase mass halved"). `orderCols` must totally order each
    * key's events (append a unique tie-break — the sessionize contract).
    *
    * Scale shape: ONE keyed window (lead over (key, order)) + one
    * map-side-combined pair count; the row-normalizing join runs on the
    * STATE-PAIR table (|states|² rows at most), never on events.
    */
  def transitionMatrix(
      df: DataFrame,
      keyCol: String,
      orderCols: Seq[String],
      stateCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    val pairs = df
      .withColumn("_nxt", lead(col(stateCol), 1).over(w))
      .filter(col("_nxt").isNotNull)
      .groupBy(col(stateCol).as("src"), col("_nxt").as("dst"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("src").agg(sum("n").as("_tn"))
    pairs.join(totals, "src")
      .withColumn("p_micro", expr("(n * 1000000L) div _tn"))
      .select("src", "dst", "n", "p_micro")
  }
}

/** Ordered-step funnel analysis: how many keys reached step k, where step k
  * only counts if it happened at-or-after that key's step k−1 time (min-time
  * semantics per step).
  *
  * Scale shape: one aggregate per step, each keyed by `keyCol` — the step
  * chain is a linear sequence of joins on the SAME key, so every stage
  * reuses one hash partitioning (single Exchange under AQE); the final
  * count-per-step rollup is a metadata-sized union.
  */
object Funnel {

  /** Per-key earliest qualifying time of each step (null once the chain
    * breaks). Output: keyCol, t_0 … t_{n-1}.
    */
  def stepTimes(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val first = events
      .filter(col(typeCol) === steps.head)
      .groupBy(col(keyCol))
      .agg(min(col(tsCol)).as("t_0"))
    steps.zipWithIndex.tail.foldLeft(first) { case (acc, (step, i)) =>
      val stepMin = events
        .filter(col(typeCol) === step)
        .join(acc.select(col(keyCol), col(s"t_${i - 1}")), keyCol)
        .filter(col(tsCol) >= col(s"t_${i - 1}"))
        .groupBy(col(keyCol))
        .agg(min(col(tsCol)).as(s"t_$i"))
      acc.join(stepMin, Seq(keyCol), "left")
    }
  }

  /** Funnel counts: one row per step — (position, step, n_keys that reached
    * it in order). All step counts come from ONE aggregation over the step-
    * times chain (a per-step aggregate would re-execute the whole join
    * chain once per step), then the single result row unpivots.
    */
  def completionCounts(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String]): DataFrame = {
    val times = stepTimes(events, keyCol, tsCol, typeCol, steps)
    val aggs = steps.indices.map(i => count(col(s"t_$i")).as(s"_n_$i"))
    val one = times.agg(aggs.head, aggs.tail: _*)
    val rows = steps.zipWithIndex.map { case (step, i) =>
      struct(
        lit(i + 1).cast("long").as("pos"),
        lit(step).as("step"),
        col(s"_n_$i").as("n_keys"))
    }
    one.select(explode(array(rows: _*)).as("r")).select("r.*").orderBy("pos")
  }

  /** Windowed, strictly-ordered variant of [[stepTimes]]: step k counts only
    * STRICTLY after the key's step k−1 time (a simultaneous event can't
    * satisfy two steps), and every step must land within `windowSec` of the
    * step-0 time — the "converted within 7 days" funnel of product
    * analytics. Same scale shape: one user-keyed aggregate per step chained
    * by same-key joins, shuffles bounded by distinct keys.
    */
  def windowedStepTimes(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String],
      windowSec: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(windowSec > 0, s"windowSec=$windowSec must be positive")
    val first = events
      .filter(col(typeCol) === steps.head)
      .groupBy(col(keyCol))
      .agg(min(col(tsCol)).as("t_0"))
    steps.zipWithIndex.tail.foldLeft(first) { case (acc, (step, i)) =>
      val stepMin = events
        .filter(col(typeCol) === step)
        .join(acc.select(col(keyCol), col("t_0"), col(s"t_${i - 1}")), keyCol)
        .filter(
          col(tsCol) > col(s"t_${i - 1}") &&
            col(tsCol) <= col("t_0") + expr(s"INTERVAL $windowSec SECONDS"))
        .groupBy(col(keyCol))
        .agg(min(col(tsCol)).as(s"t_$i"))
      acc.join(stepMin, Seq(keyCol), "left")
    }
  }

  /** (step, step_type, n_users) counts for [[windowedStepTimes]] — one
    * aggregation, then stack() to rows (per-step aggregates would re-run
    * the join chain once per step).
    */
  def windowedCounts(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String],
      windowSec: Long): DataFrame = {
    require(steps.forall(!_.contains("'")), "step names must not contain quotes")
    val times = windowedStepTimes(events, keyCol, tsCol, typeCol, steps, windowSec)
    val aggs = steps.indices.map(i => count(col(s"t_$i")).as(s"_n_$i"))
    val one = times.agg(aggs.head, aggs.tail: _*)
    val stackArgs = steps.zipWithIndex
      .map { case (st, k) => s"${k}L, '$st', _n_$k" }
      .mkString(", ")
    one.selectExpr(
      s"stack(${steps.size}, $stackArgs) AS (step, step_type, n_users)")
  }
}
