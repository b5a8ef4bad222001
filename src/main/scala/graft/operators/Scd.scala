package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) building blocks: turn an event-level
  * changelog into versioned dimension rows with validity intervals, and join
  * facts to the version that was current at fact time (the "point-in-time"
  * join every warehouse backfill needs).
  *
  * The reference keeps only the latest row per entity (its catalog tracks
  * current status; history lives in append-only logs, `util/
  * data_pushing.py:183-210`); SCD2 is the standard warehouse answer to
  * "what did this row look like WHEN the fact happened", so it belongs in
  * the engine's surface.
  *
  * Scale shape: one window shuffle on the entity key builds versions (the
  * run-collapse filter and the version numbering share the same partitioning
  * and sort, so Catalyst plans a single exchange); the point-in-time join is
  * the native as-of merge ([[AsOfJoin.lastPriorMatchNative]]) — one keyed
  * shuffle, a single streaming pass per partition, never an interval
  * nested-loop join.
  */
object Scd {

  /** Collapse a changelog into SCD2 version rows.
    *
    * Input: one row per observed state, keyed by `keyCols`, totally ordered
    * within a key by (`timeCol`, `tieCols`) — duplicate (key, time, ties)
    * rows would make run boundaries nondeterministic, so make that a total
    * order. Consecutive rows with the same `stateCol` value (null-safe
    * comparison) collapse into one version: a version starts where the state
    * CHANGES.
    *
    * Output: keyCols ++ (version, state, valid_from, valid_to, is_current) —
    * `valid_from` inclusive, `valid_to` exclusive (= next version's
    * valid_from, null on the open current version), `version` numbered from
    * 1 in time order.
    */
  def buildVersions(
      log: DataFrame,
      keyCols: Seq[String],
      timeCol: String,
      tieCols: Seq[String],
      stateCol: String): DataFrame = {
    val reserved = Seq("version", "state", "valid_from", "valid_to", "is_current")
    reserved.foreach { c =>
      require(!keyCols.contains(c), s"key column name '$c' is reserved for the output")
    }
    val order = (timeCol +: tieCols).map(col(_).asc)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    // run starts: first row per key, or a (null-safe) state change. The
    // post-filter window below reuses the same partitioning + sort, so the
    // second window stage adds no exchange.
    val marked = log
      .withColumn("_rn", row_number().over(w))
      .withColumn("_prev", lag(col(stateCol), 1).over(w))
      .filter(col("_rn") === 1 || !(col(stateCol) <=> col("_prev")))
    val w2 = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    marked
      .select(
        (keyCols.map(col) :+
          row_number().over(w2).cast("long").as("version") :+
          col(stateCol).as("state") :+
          col(timeCol).as("valid_from") :+
          lead(col(timeCol), 1).over(w2).as("valid_to")): _*)
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Join each fact row to the dimension version current at `factTime`:
    * the version with the greatest `valid_from <= factTime` — exactly the
    * as-of contract, executed by the native merge exec. `valueCols` name
    * dimension columns to carry (emitted as `asof_<name>`); facts before a
    * key's first version (or with no dimension key at all) get nulls.
    *
    * `dim` is typically [[buildVersions]] output, whose intervals partition
    * the key's timeline — so the as-of pick IS the containing interval; no
    * separate `valid_to` probe is needed.
    */
  def pointInTime(
      facts: DataFrame,
      dim: DataFrame,
      keyCols: Seq[String],
      factTime: String,
      valueCols: Seq[String]): DataFrame =
    AsOfJoin.lastPriorMatchNative(
      facts, dim, keyCols, factTime, "valid_from", valueCols)
}
