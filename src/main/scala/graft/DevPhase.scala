package graft

import org.apache.spark.sql.functions._

/** Dev-only scratch: phase-level timing of the IVF+PQ store lifecycle
  * (q382's shape) to find where the seconds go. Delete before shipping
  * if unused.
  */
object DevPhase {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.builder("dev-phase", Some("32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.sim.{IvfPq, IvfPqStore, PqIndexStore}
    val s = spark
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    import org.apache.spark.metrics.source.CodegenMetrics
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val j0 = jobs.get()
      val c0 = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
      val ct0 = CodegenMetrics.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum
      val r = f
      val ct1 = CodegenMetrics.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum
      println(f"[phase] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  " +
        f"jobs=${jobs.get() - j0}%3d compiles=${CodegenMetrics.METRIC_COMPILATION_TIME.getCount - c0}%3d " +
        f"compileMs=${(ct1 - ct0) / 1e6}%.0f")
      r
    }
    for (rep <- 1 to 2) {
      println(s"== rep $rep")
      val emb = Tables.load(s, dir, "embeddings").persist()
      val (cents, cb) = t("fitResidual") {
        IvfPq.fitResidual(emb, "vec_id", "embedding", "label", dims = 64, m = 4, k = 4, iters = 2)
      }
      val root = s"target/devphase_store"
      val gen = s"${root}_g1"
      for (d <- Seq(root, gen)) {
        val p = new org.apache.hadoop.fs.Path(d)
        val fsys = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fsys.exists(p)) fsys.delete(p, true)
      }
      t("writeCentroids+codebook") {
        IvfPqStore.writeCentroids(s, root, cents)
        PqIndexStore.writeCodebook(s, root, cb)
      }
      t("appendBatch b0") {
        IvfPqStore.appendBatch(emb.filter(col("vec_id") % 3 === 0), cents,
          "vec_id", "embedding", "label", root, cb, "b0")
      }
      t("appendBatch b1") {
        IvfPqStore.appendBatch(emb.filter(col("vec_id") % 3 === 1), cents,
          "vec_id", "embedding", "label", root, cb, "b1")
      }
      t("tombstones t0") {
        IvfPqStore.appendTombstones(
          emb.filter(col("vec_id") % 7 === 3).select(col("vec_id")), "vec_id", root, "t0")
      }
      t("compact") { IvfPqStore.compact(s, root, "c0", "vec_id", "label") }
      t("appendBatch b2") {
        IvfPqStore.appendBatch(emb.filter(col("vec_id") % 3 === 2), cents,
          "vec_id", "embedding", "label", root, cb, "b2")
      }
      t("tombstones t1") {
        IvfPqStore.appendTombstones(
          emb.filter(col("vec_id") % 5 === 4).select(col("vec_id")), "vec_id", root, "t1")
      }
      t("refitGeneration") {
        IvfPqStore.refitGeneration(s, root, gen, emb,
          "vec_id", "embedding", "label", dims = 64, m = 4, k = 4, iters = 2)
      }
      val probe = t("probe head") {
        emb.filter(col("vec_id") === 0)
          .select("embedding").head().getSeq[Float](0).map(_.toDouble).toArray
      }
      emb.unpersist()
      t("adcTopK cold") {
        IvfPq.adcTopK(
          IvfPqStore.codes(s, gen), IvfPqStore.readCentroids(s, gen),
          "vec_id", "label", PqIndexStore.readCodebook(s, gen),
          probe, nProbe = 2, topK = 10).count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
