package graft.clean

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-shape operators: rename, conform, content hash.
  *
  * All are pure `DataFrame => DataFrame` (or `Either` where the reference
  * rejects a file), so Catalyst collapses the whole clean stage into one
  * projection over the scan (`CollapseProject`) — nothing materializes between
  * steps, unlike the reference's intermediate CSV files.
  */
object Clean {

  sealed trait CleanError { def message: String }

  /** File declares headers the mapping does not know — fatal
    * (reference: `util/data_processing.py:143-151`).
    */
  final case class ExtraColumns(cols: Seq[String]) extends CleanError {
    def message = s"file has extra columns not in mapping: ${cols.mkString(", ")}"
  }

  /** Bulk header rename via mapping, with the reference's validation asymmetry
    * (SURVEY.md §2.10): EXTRA columns (present in file, absent from mapping)
    * are fatal; MISSING columns (mapping keys absent from file) are tolerated
    * and simply not renamed — they get back-filled by [[conform]].
    *
    * Reference: `rename_column_in_csv`, `util/data_processing.py:107-206`.
    */
  def renameColumns(df: DataFrame, mapping: Map[String, String]): Either[CleanError, DataFrame] = {
    val fileCols = df.columns.toSeq
    val extra = fileCols.filterNot(mapping.contains)
    if (extra.nonEmpty) Left(ExtraColumns(extra))
    else Right(df.select(fileCols.map(c => col(c).as(mapping(c))): _*))
  }

  /** Conform to the declared column list: missing columns are inserted as empty
    * string at their declared position; output column order == declared order.
    * (Reference: `add_column_to_csv` + driver loop, `main.py:178-195`,
    * `util/data_processing.py:526-569` — position is just select order here.)
    */
  def conform(df: DataFrame, declared: Seq[String]): DataFrame = {
    val present = df.columns.toSet
    df.select(declared.map(c => if (present(c)) col(c) else lit("").as(c)): _*)
  }

  /** Canonical content-hash recipe: MD5 over all (or the given) columns joined
    * with a U+0001 separator. This is the stable dedup key across batches —
    * never change it for a table once data is written (SURVEY.md §7.4 item 2).
    *
    * Reference computes `md5(str(row))` over the raw string fields
    * (`util/data_processing.py:476-482`); the byte recipe differs, the
    * semantics (deterministic content hash over ordered raw fields) match.
    * Nulls are normalized to a sentinel distinct from the empty string so that
    * (null, "a") and ("", "a") hash differently.
    */
  def rowHashExpr(cols: Seq[String]): Column =
    md5(concat_ws("\u0001", cols.map(c => coalesce(col(c).cast("string"), lit("\u0002"))): _*))

  def withRowHash(df: DataFrame, cols: Seq[String] = Nil, hashCol: String = "row_hash"): DataFrame = {
    val use = if (cols.nonEmpty) cols else df.columns.toSeq
    df.withColumn(hashCol, rowHashExpr(use))
  }
}
