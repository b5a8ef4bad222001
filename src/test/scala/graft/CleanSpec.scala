package graft

import graft.clean.Clean
import org.apache.spark.sql.functions._

class CleanSpec extends SparkSpec {
  import spark.implicits._

  test("renameColumns applies the mapping") {
    val df = Seq(("a@x.com", "Ana")).toDF("Email", "prénom")
    val out = Clean.renameColumns(df, Map("Email" -> "email", "prénom" -> "first_name"))
    assert(out.isRight)
    assert(out.toOption.get.columns.toSeq == Seq("email", "first_name"))
  }

  test("renameColumns: extra columns are fatal (reference asymmetry)") {
    val df = Seq(("a", "b")).toDF("Email", "EXTRA")
    val out = Clean.renameColumns(df, Map("Email" -> "email"))
    assert(out.isLeft)
    assert(out.swap.toOption.get.message.contains("EXTRA"))
  }

  test("renameColumns: missing mapping keys are tolerated") {
    val df = Seq(Tuple1("a")).toDF("Email")
    val out = Clean.renameColumns(df, Map("Email" -> "email", "prénom" -> "first_name"))
    assert(out.isRight)
    assert(out.toOption.get.columns.toSeq == Seq("email"))
  }

  test("conform back-fills missing columns at their declared position") {
    val df = Seq(("a@x.com", "Ana")).toDF("email", "first_name")
    val out = Clean.conform(df, Seq("email", "smtp_response", "first_name"))
    assert(out.columns.toSeq == Seq("email", "smtp_response", "first_name"))
    assert(out.select("smtp_response").head().getString(0) == "")
  }

  test("row_hash: deterministic, order-sensitive, null != empty") {
    val df = Seq(("a", "b"), ("a", "b"), ("b", "a")).toDF("x", "y")
    val hashes = Clean.withRowHash(df).select("row_hash").collect().map(_.getString(0))
    assert(hashes(0) == hashes(1)) // same content, same hash
    assert(hashes(0) != hashes(2)) // order-sensitive
    val withNull = Seq((null.asInstanceOf[String], "b"), ("", "b")).toDF("x", "y")
    val h2 = Clean.withRowHash(withNull).select("row_hash").collect().map(_.getString(0))
    assert(h2(0) != h2(1)) // null and empty hash differently
  }
}
