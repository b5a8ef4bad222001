package graft

import graft.catalog.{Catalog, Status}

class CatalogSpec extends SparkSpec {
  import spark.implicits._

  test("status log is append-only; files may carry many statuses") {
    val cat = new Catalog(spark, tmpDir("cat"))
    cat.recordStatus("f1.csv", Status.Processed)
    cat.recordStatus("f1.csv", Status.Uploaded)
    cat.recordStatus("f2.csv", Status.RenameError)
    assert(cat.statusLog.count() == 3)
    assert(cat.processedFileNames.count() == 2)
    assert(cat.isProcessed("f1.csv") && cat.isProcessed("f2.csv"))
    assert(!cat.isProcessed("f3.csv"))
  }

  test("F1 filterUnprocessed anti-joins the idempotency set") {
    val cat = new Catalog(spark, tmpDir("cat"))
    cat.recordStatus("done.csv", Status.Uploaded)
    val incoming = Seq("done.csv", "new.csv").toDF("file_name")
    val out = cat.filterUnprocessed(incoming).as[String].collect()
    assert(out.toSeq == Seq("new.csv"))
  }

  test("probe cache sees an EXTERNAL writer's append (mtime-bounded staleness)") {
    val dir = tmpDir("cat")
    val mine = new Catalog(spark, dir)
    mine.recordStatus("a.csv", Status.Processed)
    assert(mine.isProcessed("a.csv")) // warms the name cache
    assert(!mine.isProcessed("b.csv"))
    // local-FS mtime is millisecond-grained: let the tick move past the
    // cached stamp before the external append lands
    Thread.sleep(20)
    // a SECOND instance (external orchestrator) appends behind our back
    val other = new Catalog(spark, dir)
    other.recordStatus("b.csv", Status.Processed)
    // the probe must reload off the moved status-dir mtime — no manual
    // refreshProcessedNames() — closing the double-processing window
    assert(mine.isProcessed("b.csv"),
      "external append invisible: staleness bound broken")
    // and our own appends still keep the cache warm in-place
    mine.recordStatus("c.csv", Status.Uploaded)
    assert(mine.isProcessed("c.csv"))
  }

  test("watermark: 0 when unset, latest commit wins") {
    val cat = new Catalog(spark, tmpDir("cat"))
    assert(cat.watermark("t") == 0L)
    cat.setWatermark("t", 10L)
    cat.setWatermark("t", 25L)
    cat.setWatermark("other", 99L)
    assert(cat.watermark("t") == 25L)
  }
}
