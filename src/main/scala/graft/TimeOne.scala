package graft
/** Dev-only: time one gate query N times at a scale dir. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, reps) = args
    val spark = GraftSession.builder("time-one", Some("32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    for (i <- 1 to reps.toInt) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      println(f"[timeone] $name rep$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
