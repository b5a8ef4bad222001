package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Dev probe (rounds 14–15): shuffle accounting of a capstone's fused
  * plan — stages, shuffle write/read volume, task count — measured
  * with a stage listener (AQE hides the finalized plan from a node
  * walk). `runMain graft.CapstoneProbe [sfDir] [queryName]` (default:
  * every capstone gate); findings live in SCALING.md.
  */
object CapstoneProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq match {
      case Seq() => Seq("q369_crawl_capstone", "q378_multimodal_capstone")
      case qs => qs
    }
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
    names.foreach { name =>
      stages = 0; shuffleWriteStages = 0; shuffleWriteBytes = 0L
      shuffleReadBytes = 0L; tasks = 0
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener drain
      println(f"CAPSTONE $name rows=$n secs=$secs%.2f stages=$stages " +
        f"tasks=$tasks shuffleWriteStages=$shuffleWriteStages " +
        f"shuffleWriteMB=${shuffleWriteBytes / 1e6}%.1f " +
        f"shuffleReadMB=${shuffleReadBytes / 1e6}%.1f")
    }
    spark.stop()
  }
}
