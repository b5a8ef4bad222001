package graft.load

import graft.schema.{Role, TableSchema}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The typed-cast stage: all-string columns → typed columns per role lists,
  * with null-on-error semantics throughout (the session runs with
  * `spark.sql.ansi.enabled=false`, matching the reference's
  * `errors="coerce"`).
  *
  * Reference: `process_and_insert_csv` cast block, `util/data_pushing.py:341-372`,
  * and `handle_nan_for_type`, `util/data_pushing.py:20-50` (C1–C7 in SURVEY §2.7).
  * Everything here is a built-in, codegen'd expression — one fused projection.
  */
object Casts {

  /** C7 — literal "<NA>" / "nan" strings → null (pandas artifacts). */
  def normalizeNullStrings(c: Column): Column =
    when(c.isin("<NA>", "nan"), lit(null)).otherwise(c)

  /** C1 — string → timestamp, null on parse failure. */
  def toTimestampCoerce(c: Column): Column = to_timestamp(c)

  /** C2 — string → long, null on failure; parses "3.0" → 3 like pandas
    * `to_numeric().astype('Int64')`. The direct cast already truncates
    * decimal strings AND is exact over the full int64 range (a
    * double-intermediate would corrupt ids above 2^53); the double route
    * only backstops scientific notation ("1e3").
    */
  def toLongCoerce(c: Column): Column =
    coalesce(c.cast("long"), c.cast("double").cast("long"))

  /** C3 — string → double, null on failure. */
  def toDoubleCoerce(c: Column): Column = c.cast("double")

  /** C5 — strip a trailing ".0" (pandas float-inference artifact on string
    * columns).
    */
  def stripTrailingDotZero(c: Column): Column = regexp_replace(c, "\\.0$", "")

  /** C6 — date-of-birth role: parse then reformat as a yyyy-MM-dd STRING
    * (the reference keeps dob columns string-typed,
    * `util/data_pushing.py:368-370`).
    */
  def dobFormat(c: Column): Column = date_format(to_timestamp(c), "yyyy-MM-dd")

  /** Apply every role cast for `schema` in one projection. Column order is
    * preserved; columns not present in `df` are ignored (conform runs first).
    */
  def applyRoles(df: DataFrame, schema: TableSchema): DataFrame = {
    val present = df.columns.toSet
    val cols = df.columns.toSeq.map { name =>
      val roles = schema.roleOf(name)
      val c = col(name)
      val cast =
        if (roles(Role.DobCol)) dobFormat(normalizeNullStrings(c))
        else if (roles(Role.DateCol)) toTimestampCoerce(normalizeNullStrings(c))
        else if (roles(Role.IntCol)) toLongCoerce(normalizeNullStrings(c))
        else if (roles(Role.FloatCol)) toDoubleCoerce(normalizeNullStrings(c))
        else if (roles(Role.StrCol)) stripTrailingDotZero(normalizeNullStrings(c))
        else if (roles(Role.IdCol)) c.cast("long")
        else c
      cast.as(name)
    }
    require(present.nonEmpty, "applyRoles on empty schema")
    df.select(cols: _*)
  }
}
