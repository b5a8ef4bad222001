package graft.load

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deletion-request propagation — the "right to be forgotten" cascade a
  * warehouse owes its compliance team: given a tombstone set of subject
  * ids, purge every table that references them and account for what was
  * removed. The reference's pipeline only ever ADDS rows (append-only
  * catalog, SURVEY §2.5); deletion is the missing half of that lifecycle.
  *
  * Scale shape: each table purges with ONE broadcast anti-join (the
  * tombstone set is small — it is a request queue, not a data table), so
  * the cascade is a single scan per table, no shuffle of the fact data;
  * the audit counts ride the same scan via an aggregate, not a second
  * pass per table.
  */
object Tombstone {

  /** `table` minus rows whose `keyCol` is in `tombstones` (its `idCol`).
    * Broadcast LEFT ANTI — null keys survive (a row that references no
    * subject cannot match a deletion request, mirroring SQL NOT IN ...
    * semantics minus the null trap).
    */
  def purge(table: DataFrame, keyCol: Column, tombstones: DataFrame, idCol: String): DataFrame =
    table.join(
      broadcast(tombstones.select(col(idCol).as("_tomb_id")).distinct()),
      keyCol === col("_tomb_id"),
      "left_anti")

  /** Audit ledger for a cascade over many tables: one row per table —
    * (table, n_before, n_purged, n_after) — each computed in a single scan
    * (conditional count over a broadcast LEFT SEMI flag, not a purge plus
    * recount).
    */
  def purgeCounts(
      tables: Seq[(String, DataFrame, Column)],
      tombstones: DataFrame,
      idCol: String): DataFrame = {
    require(tables.nonEmpty, "need at least one table to audit")
    val tomb = broadcast(tombstones.select(col(idCol).as("_tomb_id")).distinct())
    tables
      .map { case (name, df, keyCol) =>
        df.join(tomb, keyCol === col("_tomb_id"), "left")
          .agg(
            count(lit(1)).as("n_before"),
            count(col("_tomb_id")).as("n_purged"))
          .select(
            lit(name).as("table_name"),
            col("n_before"),
            col("n_purged"),
            (col("n_before") - col("n_purged")).as("n_after"))
      }
      .reduce(_ unionAll _)
  }
}
