package graft

import java.nio.file.{Files, Paths}

import graft.load.Snapshot
import graft.pipeline.Retention

class RetentionSpec extends SparkSpec {

  private def mkFile(dir: String, name: String, bytes: Int, ageDays: Int = 0): String = {
    val p = Paths.get(dir, name)
    Files.write(p, Array.fill[Byte](bytes)(1))
    if (ageDays > 0)
      p.toFile.setLastModified(System.currentTimeMillis() - ageDays.toLong * 86400_000L)
    p.toString
  }

  test("O3 folder size accounting") {
    val dir = tmpDir("ret")
    mkFile(dir, "a.bin", 1000)
    mkFile(dir, "b.bin", 500)
    assert(Retention.folderSize(spark, dir) == 1500L)
    assert(Retention.folderSize(spark, s"$dir/missing") == 0L)
  }

  test("O4 age-based retention deletes only files older than the cutoff") {
    val dir = tmpDir("ret")
    mkFile(dir, "old.bin", 10, ageDays = 10)
    mkFile(dir, "fresh.bin", 10, ageDays = 1)
    val deleted = Retention.cleanupOldFiles(spark, dir, maxAgeDays = 7)
    assert(deleted.size == 1 && deleted.head.endsWith("old.bin"))
    assert(Files.exists(Paths.get(dir, "fresh.bin")))
  }

  test("O5 size-cap eviction removes oldest-first down to 90% of the cap") {
    val dir = tmpDir("ret")
    mkFile(dir, "oldest.bin", 400, ageDays = 3)
    mkFile(dir, "middle.bin", 400, ageDays = 2)
    mkFile(dir, "newest.bin", 400, ageDays = 1)
    // cap 1000 → evict to 900: dropping oldest (400) brings 1200 → 800 ≤ 900
    val deleted = Retention.enforceSizeCap(spark, dir, capBytes = 1000)
    assert(deleted.size == 1 && deleted.head.endsWith("oldest.bin"))
    assert(Retention.folderSize(spark, dir) == 800L)
    // under cap: no-op
    assert(Retention.enforceSizeCap(spark, dir, capBytes = 1000).isEmpty)
  }

  test("K2 archive writes a per-batch snapshot copy") {
    import spark.implicits._
    val dir = tmpDir("arch")
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    Snapshot.archive(df, s"$dir/processed/t1", "batch_0001")
    val back = spark.read.parquet(s"$dir/processed/t1/batch_0001")
    assert(back.count() == 2)
  }
}
