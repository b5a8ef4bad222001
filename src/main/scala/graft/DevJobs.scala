package graft

import org.apache.spark.scheduler._

/** Dev-only scratch: per-job accounting for one gate query — job start
  * offset, duration, and call site, to find where a lifecycle query's
  * driver round-trips go. `runMain graft.DevJobs <query> [sfDir] [runs]`.
  * Delete before shipping if unused.
  */
object DevJobs {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 2
    val spark = GraftSession.builder("dev-jobs", Some("32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var t0 = System.nanoTime()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val site = e.stageInfos.lastOption.map(_.name).getOrElse("?")
        starts.put(e.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val (s, site) = starts.getOrDefault(e.jobId, (0L, "?"))
        lines.add(f"[job] ${(s - t0) / 1e9}%7.3f +${(System.nanoTime() - s) / 1e9}%6.3f  $site")
      }
    })
    val fn = SparkEntry.queries(name)
    for (r <- 1 to runs) {
      lines.clear()
      t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      if (r == runs) {
        import scala.jdk.CollectionConverters._
        lines.asScala.toSeq.sorted.foreach(println)
        println(f"[total] $name $total%.3f s, ${lines.size} jobs (run $r)")
      } else println(f"[total] $name $total%.3f s warmup")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
