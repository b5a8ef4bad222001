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
    val fn = SparkEntry.queries(name)
    val times = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[qprofile] $name best=${times.min}%.3f all=${times.map(t => f"$t%.3f").mkString(",")}")
    fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
