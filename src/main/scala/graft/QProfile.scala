package graft

/** Dev helper: time one gate query by name (best of N) and dump its
  * formatted plan. `runMain graft.QProfile <queryName> [sfDir] [runs]`.
  */
object QProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 2
    val spark = GraftSession.get("graft-qprofile")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    val fn = SparkEntry.queries(name)
    val times = (1 to runs).map { _ =>
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      ((System.nanoTime() - t0) / 1e9, jobs.get() - j0)
    }
    println(f"[qprofile] $name best=${times.map(_._1).min}%.3f " +
      s"all=${times.map(t => f"${t._1}%.3f/${t._2}j").mkString(",")}")
    fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
