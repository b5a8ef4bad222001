package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Null-safe grouped-aggregate join-back: `groupBy` treats NULL as a
  * regular key value, but a plain equi-join back onto the source drops
  * every NULL-keyed row — the silent-data-loss class the kAnonymize /
  * exactStratifiedSplit fixes closed. This helper is the one shape all
  * per-group join-backs share: join on `<=>` (null-safe equality, still
  * an equi-join predicate Spark hashes on — broadcast works), then drop
  * the right side's duplicated key columns.
  */
private[graft] object JoinBack {

  /** Join `right` (typically a per-key aggregate) back onto `left` with
    * null-safe key equality. `right` must contain every key column;
    * its non-key columns are appended. Broadcasts `right` when `bcast`
    * (the aggregate side is keys-grain — small by construction).
    */
  def nullSafe(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      bcast: Boolean = true,
      joinType: String = "inner"): DataFrame = {
    require(keys.nonEmpty, "nullSafe join-back needs at least one key")
    require(!left.columns.exists(_.startsWith("_nsj_")) &&
      !right.columns.exists(_.startsWith("_nsj_")),
      "inputs must not contain reserved '_nsj_*' columns")
    val renamed = right.select(
      keys.map(c => col(c).as("_nsj_" + c)) ++
        right.columns.filterNot(keys.contains).map(col): _*)
    val r = if (bcast) broadcast(renamed) else renamed
    left.join(r, keys.map(c => col(c) <=> col("_nsj_" + c)).reduce(_ && _), joinType)
      .drop(keys.map("_nsj_" + _): _*)
  }
}
