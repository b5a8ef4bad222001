package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Dev probe (round 14): shuffle accounting of the q369 crawl-capstone's
  * fused plan — stages, shuffle write/read volume, task count — measured
  * with a stage listener (AQE hides the finalized plan from a node walk).
  * `runMain graft.CapstoneProbe [sfDir]`; findings live in SCALING.md.
  */
object CapstoneProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("graft-capstone-probe", Some("32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var stages = 0
    @volatile var shuffleWriteStages = 0
    @volatile var shuffleWriteBytes = 0L
    @volatile var shuffleReadBytes = 0L
    @volatile var tasks = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += e.stageInfo.numTasks
        val m = e.stageInfo.taskMetrics
        if (m != null) {
          if (m.shuffleWriteMetrics.bytesWritten > 0) shuffleWriteStages += 1
          shuffleWriteBytes += m.shuffleWriteMetrics.bytesWritten
          shuffleReadBytes += m.shuffleReadMetrics.totalBytesRead
        }
      }
    })
    val t0 = System.nanoTime()
    val n = SparkEntry.queries("q369_crawl_capstone")(spark, sfDir).count()
    val secs = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // listener drain
    println(f"CAPSTONE rows=$n secs=$secs%.2f stages=$stages tasks=$tasks " +
      f"shuffleWriteStages=$shuffleWriteStages " +
      f"shuffleWriteMB=${shuffleWriteBytes / 1e6}%.1f shuffleReadMB=${shuffleReadBytes / 1e6}%.1f")
    spark.stop()
  }
}
