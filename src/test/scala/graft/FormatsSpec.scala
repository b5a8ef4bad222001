package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Interchange-format coverage beyond the parquet snapshot store: ORC
  * (the other columnar format Spark ships a vectorized, pushdown-capable
  * reader for) and the text line source. The round-trip plus
  * plan-visible pushdown is what matters — a format the scan can't prune
  * would read 100 TB to answer a 2-column projection.
  */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  test("orc: round-trip preserves schema and rows") {
    val dir = tmp("orc-rt")
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, null.asInstanceOf[String], 3.5))
      .toDF("id", "name", "score")
    df.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("orc: filter and projection reach the scan") {
    val dir = tmp("orc-push")
    spark.range(1000).select(col("id"), (col("id") % 7).as("k"),
      concat(lit("pad"), col("id")).as("pad"))
      .write.mode("overwrite").orc(dir)
    val q = spark.read.orc(dir).filter(col("id") > 900).select("id", "k")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("id"), plan)
    // projection pruning: the scan schema must not carry the unused column
    assert(!plan.contains("pad"), plan)
    assert(q.count() == 99)
  }

  test("text line source: one row per line, usable as an ingest fallback") {
    val dir = tmp("txt-src")
    Files.writeString(java.nio.file.Paths.get(dir, "f.txt"), "alpha\nbeta\n\ngamma")
    val lines = spark.read.text(dir)
    assert(lines.columns.toSeq == Seq("value"))
    assert(lines.as[String].collect().sorted.toSeq == Seq("", "alpha", "beta", "gamma"))
  }
}
