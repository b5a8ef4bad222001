package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.catalog.{Catalog, Status}
import graft.pipeline.Pipeline
import graft.schema.TableSchema

/** End-to-end per-file ingest over FIXTURES.md-style miniature CSVs:
  * rename → conform → hash → J1 → J2 → casts → ids → J3 → snapshot append,
  * with catalog statuses and watermark commits.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val schema = TableSchema(
    tableName = "mini_campaign_events",
    columnNames = Seq("id", "email", "first_name", "event_datetime", "total_orders", "row_hash"),
    columnTypes = Seq("UInt64", "Nullable(String)", "Nullable(String)", "Nullable(DateTime)", "Nullable(Int64)", "String"),
    dateColumns = Seq("event_datetime"),
    intColumns = Seq("total_orders"),
    stringColumns = Seq("email", "first_name"))

  private val mapping = Map(
    "Email" -> "email", "prénom" -> "first_name",
    "Event Datetime" -> "event_datetime", "NB_TOTAL_COMMANDES" -> "total_orders")

  private def mkPipeline() = {
    val root = tmpDir("pipe")
    val cat = new Catalog(spark, s"$root/catalog")
    val p = new Pipeline(spark, cat, Seq(schema), Map("mini_campaign_events" -> mapping),
      s"$root/warehouse", Map("last24h__" -> "mini_campaign_events"))
    (root, cat, p)
  }

  private def write(dir: String, name: String, body: String): String = {
    val p = s"$dir/$name"
    Files.write(Paths.get(p), body.getBytes(StandardCharsets.UTF_8))
    p
  }

  test("clean file: ingest, dedup, ids, statuses, watermark") {
    val (root, cat, pipe) = mkPipeline()
    val csv = write(root, "mini_campaign_events_b1.csv",
      """Email,prénom,Event Datetime,NB_TOTAL_COMMANDES
        |a@x.com,Ana,2024-01-01 10:00:00,3.0
        |b@x.com,Bob,2024-01-02 11:00:00,1
        |a@x.com,Ana,2024-01-01 10:00:00,3.0
        |c@x.com,Cleo,junk-date,
        |""".stripMargin)
    val res = pipe.processFile(csv)
    assert(res.status == Status.Uploaded)
    assert(res.inserted == 3) // 4 rows, 1 intra-file dup
    assert(cat.watermark("mini_campaign_events") == 3L)

    val table = spark.read.parquet(s"$root/warehouse/mini_campaign_events")
    assert(table.count() == 3)
    assert(table.columns.toSeq == schema.columnNames)
    assert(table.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    // junk date coerced to null, "3.0" parsed to 3
    assert(table.filter($"event_datetime".isNull).count() == 1)
    assert(table.filter($"total_orders" === 3L).count() == 1)
    // statuses recorded
    val statuses = cat.statusLog.filter($"file_name" === res.fileName)
      .select("status").as[String].collect().toSet
    assert(statuses == Set(Status.Processed, Status.Uploaded))
  }

  test("cross-batch dedup + filename idempotency + watermark resume") {
    val (root, cat, pipe) = mkPipeline()
    write(root, "mini_campaign_events_b1.csv",
      "Email,prénom,Event Datetime,NB_TOTAL_COMMANDES\na@x.com,Ana,2024-01-01 10:00:00,1\nb@x.com,Bob,2024-01-01 11:00:00,2\n")
    // b2: one row duplicates b1 content, one is new
    write(root, "mini_campaign_events_b2.csv",
      "Email,prénom,Event Datetime,NB_TOTAL_COMMANDES\na@x.com,Ana,2024-01-01 10:00:00,1\nd@x.com,Dia,2024-01-03 09:00:00,4\n")
    val results = pipe.runBatch(root)
    assert(results.map(_.inserted) == Seq(2L, 1L)) // J2 dropped the cross dup
    assert(cat.watermark("mini_campaign_events") == 3L) // ids resumed 3 total

    // re-running the batch is a no-op (filename gate)
    val again = pipe.runBatch(root)
    assert(again.forall(_.inserted == 0L))
    assert(spark.read.parquet(s"$root/warehouse/mini_campaign_events").count() == 3)
  }

  test("missing column tolerated, extra column fatal") {
    val (root, cat, pipe) = mkPipeline()
    val missing = write(root, "mini_campaign_events_missing.csv",
      "Email,prénom\na@x.com,Ana\n") // Event Datetime + NB_TOTAL_COMMANDES absent
    val r1 = pipe.processFile(missing)
    assert(r1.status == Status.Uploaded && r1.inserted == 1)
    val extra = write(root, "mini_campaign_events_extra.csv",
      "Email,prénom,UNDECLARED\na@x.com,Ana,boom\n")
    val r2 = pipe.processFile(extra)
    assert(r2.status == Status.RenameError)
    assert(cat.statusLog.filter($"status" === Status.RenameError).count() == 1)
  }

  test("zip routing via last24h__ alias (first entry only)") {
    val (root, _, pipe) = mkPipeline()
    val zipPath = s"$root/last24h__20240101.zip"
    val zos = new java.util.zip.ZipOutputStream(Files.newOutputStream(Paths.get(zipPath)))
    zos.putNextEntry(new java.util.zip.ZipEntry("last24h__20240101.csv"))
    zos.write("Email,prénom,Event Datetime,NB_TOTAL_COMMANDES\nz@x.com,Zoe,2024-02-01 00:00:00,9\n"
      .getBytes(StandardCharsets.UTF_8))
    zos.closeEntry(); zos.close()
    val res = pipe.processFile(zipPath)
    assert(res.table.contains("mini_campaign_events"))
    assert(res.inserted == 1)
  }

  test("unroutable and non-CSV files get error statuses") {
    val (root, cat, pipe) = mkPipeline()
    val bad = write(root, "unknown_table.csv", "a,b\n1,2\n")
    assert(pipe.processFile(bad).status == Status.NoSchema)
    val notCsv = write(root, "data.txt", "hello")
    assert(pipe.processFile(notCsv).status == Status.NotValidCsv)
    assert(cat.statusLog.count() == 2)
  }
}
