package graft


import java.nio.file.{Files, Paths}
/** Dev-only: dump a name-prefix subset of the gate queries for a local
  * check_oracle.py run (full Verify replays all 234).
  */
object QuickVerify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, prefix) = args
    val spark = GraftSession.builder("quick-verify", Some("8")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val qs = SparkEntry.allQs.filter(_.name >= prefix)
    qs.foreach { q =>
      try q.run(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/${q.name}")
      catch { case e: Throwable => System.err.println(s"[qv] ${q.name} failed: ${e.getMessage}") }
    }
    def esc(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    val json = qs.flatMap(q => q.oracle.map(o => s"${esc(q.name)}: ${esc(o)}"))
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
