package graft

/** Dev helper for the optimization rounds: dump `.explain("formatted")`
  * of named gate queries to `plans/<tag>/<query>_<suffix>.txt` — the
  * before/after plan evidence the round deliverables require.
  *
  * `runMain graft.PlanSnap <tag> <suffix> <query...>`
  * e.g. `runMain graft.PlanSnap r15 after q313_incremental_canonical`
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanSnap <tag> <suffix> <query...>")
    val (tag, suffix) = (args(0), args(1))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.get("graft-plansnap")
    val dir = java.nio.file.Paths.get(s"plans/$tag")
    java.nio.file.Files.createDirectories(dir)
    for (name <- args.drop(2)) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt =
        try {
          // executed plan (AQE-final) when the query runs; header carries
          // the formatted pre-execution plan for PushedFilters/ReadSchema
          val formatted = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          df.collect()
          formatted + "\n\n== Executed (AQE-final) ==\n" +
            df.queryExecution.executedPlan.toString
        } catch { case e: Throwable => s"PLAN FAILED: $e" }
      java.nio.file.Files.write(
        dir.resolve(s"${name}_$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plansnap] wrote plans/$tag/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
