package graft

import graft.load.{Casts, IdAssign}
import graft.schema.TableSchema
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class CastsSpec extends SparkSpec {
  import spark.implicits._

  test("C1 timestamp coercion: parse ok, junk → null") {
    val df = Seq("2024-01-02 03:04:05", "junk", null).toDF("d")
    val out = df.select(Casts.toTimestampCoerce($"d").as("t")).collect()
    assert(out(0).getTimestamp(0).toString.startsWith("2024-01-02"))
    assert(out(1).isNullAt(0) && out(2).isNullAt(0))
  }

  test("C2 long coercion parses \"3.0\" like pandas to_numeric") {
    val df = Seq("3.0", "7", "junk", "").toDF("n")
    val out = df.select(Casts.toLongCoerce($"n").as("v")).collect()
    assert(out(0).getLong(0) == 3L && out(1).getLong(0) == 7L)
    assert(out(2).isNullAt(0) && out(3).isNullAt(0))
  }

  test("C2 long coercion is exact above 2^53 (no double intermediate)") {
    val big = "9007199254740993" // 2^53 + 1: a double round-trip loses it
    val out = Seq(big, "1e3").toDF("n")
      .select(Casts.toLongCoerce($"n").as("v")).collect()
    assert(out(0).getLong(0) == 9007199254740993L)
    assert(out(1).getLong(0) == 1000L) // scientific notation via the fallback
  }

  test("C5 strips exactly one trailing .0") {
    val df = Seq("3.0", "3.00", "30", "x.0").toDF("s")
    val out = df.select(Casts.stripTrailingDotZero($"s").as("v")).as[String].collect()
    // "3.00" does NOT match \.0$ (ends in "00"), mirroring pandas str.replace
    assert(out.toSeq == Seq("3", "3.00", "30", "x"))
  }

  test("C6 dob reformat keeps a string column") {
    val df = Seq("1990-12-31 10:00:00", "junk").toDF("dob")
    val out = df.select(Casts.dobFormat($"dob").as("v")).collect()
    assert(out(0).getString(0) == "1990-12-31")
    assert(out(1).isNullAt(0))
  }

  test("C7 normalizes pandas artifact strings to null") {
    val df = Seq("<NA>", "nan", "ok").toDF("s")
    val out = df.select(Casts.normalizeNullStrings($"s").as("v")).collect()
    assert(out(0).isNullAt(0) && out(1).isNullAt(0) && out(2).getString(0) == "ok")
  }

  test("applyRoles drives all casts from the schema registry roles") {
    val schema = TableSchema(
      tableName = "mini_events",
      columnNames = Seq("id", "event_datetime", "total_orders", "amount", "name", "date_of_birth", "row_hash"),
      columnTypes = Seq("UInt64", "Nullable(DateTime)", "Nullable(Int64)", "Nullable(Float64)", "Nullable(String)", "Nullable(String)", "String"),
      dateColumns = Seq("event_datetime"),
      intColumns = Seq("total_orders"),
      floatColumns = Seq("amount"),
      stringColumns = Seq("name", "date_of_birth"),
      dobColumns = Seq("date_of_birth"))
    val df = Seq(
      ("1", "2024-01-02 03:04:05", "3.0", "1.5", "Ana.0", "1990-05-06", "h"))
      .toDF(schema.columnNames: _*)
    val out = Casts.applyRoles(df, schema)
    val types = out.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("id") == LongType)
    assert(types("event_datetime") == TimestampType)
    assert(types("total_orders") == LongType)
    assert(types("amount") == DoubleType)
    assert(types("name") == StringType)
    assert(types("date_of_birth") == StringType) // dob stays string
    val r = out.head()
    assert(r.getLong(out.columns.indexOf("total_orders")) == 3L)
    assert(r.getString(out.columns.indexOf("name")) == "Ana") // .0 stripped
    assert(r.getString(out.columns.indexOf("date_of_birth")) == "1990-05-06")
  }

  test("P3 dense ids: contiguous from watermark, both strategies agree") {
    val df = (1 to 97).map(i => (i.toLong, s"v$i")).toDF("k", "v").repartition(7)
    val a = IdAssign.denseIds(df, 50L, Seq("k"))
    val b = IdAssign.denseIdsWindow(df, 50L, Seq("k"))
    val idsA = a.select("id").as[Long].collect().sorted
    val idsB = b.select("id").as[Long].collect().sorted
    assert(idsA.toSeq == (51L to 147L))
    assert(idsA.toSeq == idsB.toSeq)
    // dense ids follow the order column
    assert(a.orderBy("id").select("k").as[Long].collect().toSeq == (1L to 97L))
  }
}
