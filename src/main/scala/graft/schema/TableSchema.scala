package graft.schema

import org.apache.spark.sql.types._

/** Roles a column plays during the typed-cast stage.
  *
  * Mirrors the role lists of the reference's schema registry
  * (reference: `table_schema.json:200-311`, `util/data_pushing.py:341-372`):
  * a column is all-string on read and is cast according to its role.
  */
sealed trait Role
object Role {
  case object IdCol extends Role // surrogate id (UInt64 in the reference)
  case object HashCol extends Role // content hash (row_hash)
  case object DateCol extends Role // parse to timestamp, null on error
  case object DobCol extends Role // parse to timestamp then reformat yyyy-MM-dd string
  case object IntCol extends Role // parse to long via double ("3.0" -> 3), null on error
  case object FloatCol extends Role // parse to double, null on error
  case object StrCol extends Role // normalize "<NA>"/"nan" to null, strip trailing ".0"
}

/** ClickHouse type string → Spark type translation (SURVEY.md §1.2).
  * The reference declares column types as ClickHouse strings
  * (`table_schema.json:102-199`); we map them onto Spark's type system.
  */
object ClickHouseTypes {
  def toSpark(ch: String): (DataType, Boolean) = {
    val nullable = ch.startsWith("Nullable(")
    val inner = if (nullable) ch.stripPrefix("Nullable(").stripSuffix(")") else ch
    val dt: DataType = inner match {
      case "UInt64" | "Int64" | "UInt32" | "Int32" | "UInt16" | "Int16" => LongType
      case "String" | "FixedString" => StringType
      case "DateTime" | "DateTime64" => TimestampType
      case "Date" | "Date32" => DateType
      case "Float64" | "Float32" => DoubleType
      case "UInt8" | "Int8" | "Bool" => BooleanType
      case _ => StringType
    }
    (dt, nullable)
  }
}

/** One warehouse table's declared shape: ordered column names, per-column
  * declared store types, and the role lists driving the cast stage.
  *
  * Reference: one entry of `table_schema.json` (`table_name`, `column_names`,
  * `column_types`, `date_columns`, `int_columns`, `float_columns`,
  * `string_columns`, `dob_columns`, `last_id`), loaded by
  * `util/data_pushing.py:168-185`. The mutable `last_id` watermark is NOT part
  * of this model — it lives in the catalog (SURVEY.md §7.4 item 6).
  */
final case class TableSchema(
    tableName: String,
    columnNames: Seq[String],
    columnTypes: Seq[String],
    dateColumns: Seq[String] = Nil,
    intColumns: Seq[String] = Nil,
    floatColumns: Seq[String] = Nil,
    stringColumns: Seq[String] = Nil,
    dobColumns: Seq[String] = Nil) {

  require(
    columnNames.length == columnTypes.length,
    s"$tableName: ${columnNames.length} names vs ${columnTypes.length} types")

  /** Typed schema after the cast stage. */
  def structType: StructType = StructType(columnNames.zip(columnTypes).map { case (n, t) =>
    val (dt, nullable) = ClickHouseTypes.toSpark(t)
    StructField(n, dt, nullable)
  })

  /** All-string schema-on-read shape (reference reads CSVs with `dtype=str`,
    * `util/data_processing.py:173`).
    */
  def allStringSchema: StructType =
    StructType(columnNames.map(StructField(_, StringType, nullable = true)))

  def roleOf(column: String): Set[Role] = {
    val b = Set.newBuilder[Role]
    if (column == "id") b += Role.IdCol
    if (column == "row_hash") b += Role.HashCol
    if (dateColumns.contains(column)) b += Role.DateCol
    if (dobColumns.contains(column)) b += Role.DobCol
    if (intColumns.contains(column)) b += Role.IntCol
    if (floatColumns.contains(column)) b += Role.FloatCol
    if (stringColumns.contains(column)) b += Role.StrCol
    b.result()
  }
}
