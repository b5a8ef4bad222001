package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** Deterministic whole-row content hash for salting / tie-breaking.
  *
  * `xxhash64` rejects MapType inputs (anywhere in the type tree), so hashing
  * "every column" naively breaks on map-bearing schemas that otherwise work.
  * This helper hashes every column whose type IS hashable and degrades to a
  * constant when none are — callers get "best-available determinism" instead
  * of an AnalysisException.
  */
object ContentHash {

  private def hashable(dt: DataType): Boolean = dt match {
    case _: MapType => false
    case s: StructType => s.fields.forall(f => hashable(f.dataType))
    case a: ArrayType => hashable(a.elementType)
    case _ => true
  }

  /** xxhash64 over every hashable column of `df`'s schema (map-typed
    * columns excluded), by name — resolves against any plan carrying those
    * columns. Constant 42 when nothing is hashable (an all-map schema):
    * still analyzable, just no longer discriminating.
    */
  def stableRowHash(df: DataFrame): Column = {
    val cols = df.schema.fields.filter(f => hashable(f.dataType)).map(f => col(f.name)).toSeq
    if (cols.isEmpty) lit(42L) else xxhash64(cols: _*)
  }
}
