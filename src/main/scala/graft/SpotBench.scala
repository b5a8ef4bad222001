package graft

/** Spot-measure a handful of gate queries in isolation — the diagnostic
  * companion to [[Bench]] for separating plan regressions from sandbox
  * contention windows (BENCH_r04/r08 both saw contiguous query blocks
  * stall 2-17× under external load; a query that is fast HERE but slow in
  * the sweep was contended, not regressed).
  *
  * Usage: `sbt "runMain graft.SpotBench q148_pagerank q230_ppr"`
  * (SPARK_GRAFT_SF_DIR overrides the data dir; three timed runs each,
  * min reported, cache cleared between queries like the sweep does.)
  */
object SpotBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass at least one query name from SparkEntry.queries")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("graft-spot", Some(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try SparkEntry.queries("q23_agg_group")(spark, sfDir).count() // untimed warm
    catch { case _: Throwable => () }
    for (q <- args) {
      val fn = SparkEntry.queries.getOrElse(q,
        sys.error(s"unknown query '$q' — names come from SparkEntry.queries"))
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"SPOT $q min=${times.min}%.3f runs=[${times.map(t => f"$t%.3f").mkString(", ")}]")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
