package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.streaming.StreamingIngest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("v", StringType)))

  private def writeCsv(dir: String, name: String, rows: Seq[String]): Unit =
    Files.write(
      Paths.get(s"$dir/$name"),
      ("k,v\n" + rows.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))

  test("AvailableNow drains new files exactly once across runs (poll-loop contract)") {
    val root = tmpDir("stream")
    val in = s"$root/in"; val ckpt = s"$root/ckpt"
    Files.createDirectories(Paths.get(in))
    writeCsv(in, "batch1.csv", Seq("a,1", "b,2"))

    var seen = Vector.empty[(String, String)]
    def sink(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
      seen ++= df.collect().map(r => (r.getString(0), r.getString(1)))

    val s1 = StreamingIngest.fileStream(spark, in, schema)
    StreamingIngest.runAvailableNow(s1, ckpt)(sink)
    assert(seen.sorted == Vector(("a", "1"), ("b", "2")))

    // run 2 with no new files: nothing re-processed (checkpoint = catalog)
    StreamingIngest.runAvailableNow(StreamingIngest.fileStream(spark, in, schema), ckpt)(sink)
    assert(seen.size == 2)

    // run 3 after a late-arriving file: only the new file drains
    writeCsv(in, "batch2.csv", Seq("c,3"))
    StreamingIngest.runAvailableNow(StreamingIngest.fileStream(spark, in, schema), ckpt)(sink)
    assert(seen.sorted == Vector(("a", "1"), ("b", "2"), ("c", "3")))
  }

  test("watermarked hourly aggregate matches the batch q28 shape") {
    val root = tmpDir("streamagg")
    val in = s"$root/in"
    Files.createDirectories(Paths.get(in))
    // parquet chunk of the real events table as the stream input
    Tables.events(spark, sf).limit(200).write.parquet(s"$in/chunk")

    val stream = spark.readStream
      .schema(Tables.events(spark, sf).schema)
      .parquet(s"$in/chunk")
    val agg = StreamingIngest.hourlyAggregate(stream)
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("hourly_out")
      .start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("hourly_out")
      .agg(sum("n")).head().getLong(0)
    assert(got == 200L)
  }

  test("sessionize: event-time session windows split on the inactivity gap") {
    val root = tmpDir("sess")
    val in = s"$root/in"
    Files.createDirectories(Paths.get(in))
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // user 1: two events 5 min apart (one session), then one 2 h later
    Seq((1L, ts(0), 2.0), (1L, ts(5), 3.0), (2L, ts(1), 5.0))
      .toDF("user_id", "ts", "value").write.parquet(s"$in/chunk")

    val stream = spark.readStream
      .schema(spark.read.parquet(s"$in/chunk").schema)
      .parquet(s"$in/chunk")
    val sessions = StreamingIngest.sessionize(stream, gap = "30 minutes")
    val q = sessions.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("sessions_out")
      .start()
    q.processAllAvailable()
    q.stop()

    val out = spark.table("sessions_out")
      .select("user_id", "events", "total").as[(Long, Long, Double)].collect().toSet
    assert(out == Set((1L, 2L, 5.0), (2L, 1L, 5.0)))
  }

  test("dedupedStream drops duplicate keys across micro-batches, bounded by watermark") {
    val root = tmpDir("sdedup")
    val in = s"$root/in"
    Files.createDirectories(Paths.get(in))
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // two files → two micro-batches; key "a" repeats within AND across them
    Seq(("a", ts(0), 1.0), ("a", ts(1), 2.0), ("b", ts(2), 3.0))
      .toDF("k", "ts", "v").repartition(1).write.parquet(s"$in/c1")
    Seq(("a", ts(3), 4.0), ("c", ts(4), 5.0))
      .toDF("k", "ts", "v").repartition(1).write.parquet(s"$in/c2")

    val stream = spark.readStream
      .schema(spark.read.parquet(s"$in/c1").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$in/*")
    val deduped = StreamingIngest.dedupedStream(stream, Seq("k"), "ts", "1 hour")
    val q = deduped.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("dedup_out")
      .start()
    q.processAllAvailable()
    q.stop()

    val keys = spark.table("dedup_out").select("k").as[String].collect().toSeq
    assert(keys.sorted == Seq("a", "b", "c")) // each key exactly once
  }

  test("stream-stream interval join: clicks attribute to in-window impressions only") {
    val root = tmpDir("ssjoin")
    val impDir = s"$root/imp"; val clkDir = s"$root/clk"
    Files.createDirectories(Paths.get(impDir))
    Files.createDirectories(Paths.get(clkDir))
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    Seq(("a", ts(10, 0), 1L), ("b", ts(10, 5), 2L))
      .toDF("ad", "imp_ts", "imp_id").repartition(1).write.parquet(s"$impDir/f1")
    // click 7: 10 min after impression 1 (in window); click 8: 25 min after
    // impression 2 (out); click 9: BEFORE any impression of "a" (out)
    Seq(("a", ts(10, 10), 7L), ("b", ts(10, 30), 8L), ("a", ts(9, 50), 9L))
      .toDF("ad_c", "clk_ts", "clk_id").repartition(1).write.parquet(s"$clkDir/f1")

    val imps = spark.readStream
      .schema(spark.read.parquet(s"$impDir/f1").schema).parquet(s"$impDir/*")
    val clks = spark.readStream
      .schema(spark.read.parquet(s"$clkDir/f1").schema).parquet(s"$clkDir/*")
    val joined = StreamingIngest.intervalJoin(
      imps, clks, "ad", "ad_c", "imp_ts", "clk_ts", maxDelay = "15 minutes")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssjoin_out").start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("ssjoin_out").select("imp_id", "clk_id")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 7L)))
  }

  test("statefulSessions: event-time timeout closes sessions exactly once, state evicted") {
    val root = tmpDir("fmgws")
    val evDir = s"$root/ev"
    Files.createDirectories(Paths.get(evDir))
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    def stream() = spark.readStream
      .schema("userId LONG, ts TIMESTAMP").parquet(s"$evDir/*")
      .as[(Long, java.sql.Timestamp)]
    // batch 1: user 7's session (10:00, 10:05); batch 2 advances the
    // watermark only to 10:05−10m (timeout 10:35 not reached — nothing
    // emits); batch 3 pushes the watermark past 10:35 → session closes.
    Seq((7L, ts(10, 0)), (7L, ts(10, 5)))
      .toDF("userId", "ts").repartition(1).write.parquet(s"$evDir/f1")
    val q = StreamingIngest.statefulSessions(stream(), gapMinutes = 30)
      .writeStream.outputMode("append").format("memory").queryName("fmgws_out").start()
    q.processAllAvailable()
    assert(spark.table("fmgws_out").isEmpty, "open session must not emit")
    Seq((8L, ts(10, 20))).toDF("userId", "ts").repartition(1).write.parquet(s"$evDir/f2")
    q.processAllAvailable()
    assert(spark.table("fmgws_out").isEmpty, "watermark still before the timeout")
    Seq((8L, ts(12, 0))).toDF("userId", "ts").repartition(1).write.parquet(s"$evDir/f3")
    q.processAllAvailable()
    q.stop()
    val got = spark.table("fmgws_out")
      .as[StreamingIngest.ClosedSession].collect().toSet
    assert(got == Set(
      StreamingIngest.ClosedSession(7L, ts(10, 0), ts(10, 5), 2L)),
      s"exactly user 7's session closes (8's is still open): $got")
  }

  test("stream-static enrichment: dim broadcast-joined per batch, stream rows preserved") {
    val root = tmpDir("enrich")
    val evDir = s"$root/ev"
    Files.createDirectories(Paths.get(evDir))
    Seq((1L, 10.0), (2L, 20.0), (9L, 90.0)) // 9 has no dim row
      .toDF("uid", "v").repartition(1).write.parquet(s"$evDir/f1")
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("uid", "tier")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$evDir/f1").schema).parquet(s"$evDir/*")
    val q = StreamingIngest.enrichWithDim(stream, dim, Seq("uid"))
      .writeStream.outputMode("append").format("memory").queryName("enrich_out").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("enrich_out").select("uid", "tier")
      .as[(Long, Option[String])].collect().toSet
    assert(got == Set((1L, Some("gold")), (2L, Some("basic")), (9L, None)))
    intercept[IllegalArgumentException] {
      StreamingIngest.enrichWithDim(stream, dim, Seq("uid"), how = "right_outer")
    }
  }

  test("streaming corpus curation: quality gate + exact dedup across files AND runs") {
    val root = tmpDir("scur")
    val in = s"$root/in"; val table = s"$root/table"; val ckpt = s"$root/ckpt"
    Files.createDirectories(Paths.get(in))
    def stream() = spark.readStream
      .schema(spark.read.parquet(s"$in/c1").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$in/*")
    // run 1: two files (two micro-batches); doc 2 duplicates doc 1's text
    // ACROSS files; doc 3 fails the 5-token quality gate
    Seq((1L, "alpha beta gamma delta epsilon zeta"), (3L, "too short"))
      .toDF("doc_id", "text").repartition(1).write.parquet(s"$in/c1")
    Seq((2L, "alpha beta gamma delta epsilon zeta"), (4L, "one two three four five six"))
      .toDF("doc_id", "text").repartition(1).write.parquet(s"$in/c2")
    StreamingIngest.runCurationStream(stream(), table, ckpt)
    val after1 = spark.read.parquet(table).select("doc_id").as[Long].collect().toSet
    assert(after1 == Set(1L, 4L)) // dup dropped (first id wins), low-quality dropped
    // run 2: a late file duplicating doc 1 across RUNS plus one new doc;
    // already-processed files are not re-read (checkpoint), the old text is
    // not re-admitted (snapshot anti-join)
    Seq((5L, "alpha beta gamma delta epsilon zeta"), (6L, "seven eight nine ten eleven twelve"))
      .toDF("doc_id", "text").repartition(1).write.parquet(s"$in/c3")
    StreamingIngest.runCurationStream(stream(), table, ckpt)
    val after2 = spark.read.parquet(table).select("doc_id").as[Long].collect().toSet
    assert(after2 == Set(1L, 4L, 6L))
    // run 3 with nothing new: idempotent
    StreamingIngest.runCurationStream(stream(), table, ckpt)
    assert(spark.read.parquet(table).count() == 3)
  }

  test("streaming sequence packing: piece table grows at the stream tail, " +
    "equals the batch pack, restart-idempotent") {
    import graft.operators.{PieceStore, SequencePack}
    val root = tmpDir("spack")
    val in = s"$root/in"; val store = s"$root/store"; val ckpt = s"$root/ckpt"
    Files.createDirectories(Paths.get(in))
    // two files = two micro-batches; the boundary chunk spans them
    Seq((1L, 3L), (2L, 5L)).toDF("doc_id", "n_tokens")
      .repartition(1).write.parquet(s"$in/c1")
    Seq((3L, 4L), (4L, 2L)).toDF("doc_id", "n_tokens")
      .repartition(1).write.parquet(s"$in/c2")
    def stream() = spark.readStream
      .schema(spark.read.parquet(s"$in/c1").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$in/*")
    StreamingIngest.runPackStream(stream(), store, ckpt, seqLen = 4L)
    assert(PieceStore.totalTokens(spark, store) == 14L)
    val whole = SequencePack.packChunks(
      Seq((1L, 3L), (2L, 5L), (3L, 4L), (4L, 2L)).toDF("doc_id", "n_tokens"),
      "doc_id", "n_tokens", 4L)
      .orderBy("chunk_id", "doc_id").collect().map(_.toSeq).toSeq
    assert(PieceStore.pieces(spark, store)
      .orderBy("chunk_id", "doc_id").collect().map(_.toSeq).toSeq == whole)
    // a late file appends at the tail; earlier files are not re-read
    Seq((5L, 6L)).toDF("doc_id", "n_tokens")
      .repartition(1).write.parquet(s"$in/c3")
    StreamingIngest.runPackStream(stream(), store, ckpt, seqLen = 4L)
    assert(PieceStore.totalTokens(spark, store) == 20L)
    assert(PieceStore.pieces(spark, store).count() == whole.size + 2)
    // restart with nothing new: idempotent
    StreamingIngest.runPackStream(stream(), store, ckpt, seqLen = 4L)
    assert(PieceStore.totalTokens(spark, store) == 20L)
  }

  test("streaming schedule packing: fenced per-batch mixture positions " +
    "stream through the store and equal the whole-schedule pack") {
    import graft.operators.{PieceStore, SequencePack}
    val root = tmpDir("sspack")
    val in = s"$root/in"; val store = s"$root/store"; val ckpt = s"$root/ckpt"
    Files.createDirectories(Paths.get(in))
    val fence = 1000000000L
    // two schedule batches: positions restart at 0 per batch, the FENCE
    // (batch·F + position) restores global monotonicity — the q377
    // construction over a live source
    Seq((0L * fence + 0L, 3L), (0L * fence + 1L, 5L))
      .toDF("sid", "n_tokens").repartition(1).write.parquet(s"$in/c1")
    Seq((1L * fence + 0L, 4L), (1L * fence + 1L, 2L))
      .toDF("sid", "n_tokens").repartition(1).write.parquet(s"$in/c2")
    def stream() = spark.readStream
      .schema(spark.read.parquet(s"$in/c1").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$in/*")
    StreamingIngest.runPackStream(stream(), store, ckpt, idCol = "sid", seqLen = 4L)
    val whole = SequencePack.packChunks(
      Seq((0L, 3L), (1L, 5L), (fence, 4L), (fence + 1L, 2L))
        .toDF("sid", "n_tokens"),
      "sid", "n_tokens", 4L)
      .orderBy("chunk_id", "sid").collect().map(_.toSeq).toSeq
    assert(PieceStore.pieces(spark, store)
      .orderBy("chunk_id", "sid").collect().map(_.toSeq).toSeq == whole)
    assert(PieceStore.totalTokens(spark, store) == 14L)
  }

  test("streaming upsert sink: latest version wins across micro-batches") {
    val root = tmpDir("supsert")
    val in = s"$root/in"; val table = s"$root/table"; val ckpt = s"$root/ckpt"
    Files.createDirectories(Paths.get(in))
    Seq(("a", 1L, "v1a"), ("a", 2L, "v2a"), ("b", 1L, "v1b"))
      .toDF("k", "ver", "v").repartition(1).write.parquet(s"$in/c1")
    Seq(("a", 3L, "v3a"), ("c", 1L, "v1c"))
      .toDF("k", "ver", "v").repartition(1).write.parquet(s"$in/c2")

    val stream = spark.readStream
      .schema(spark.read.parquet(s"$in/c1").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$in/*")
    StreamingIngest.runUpsertStream(stream, table, ckpt, Seq("k"), "ver")

    val out = spark.read.parquet(table)
      .select("k", "v").as[(String, String)].collect().toMap
    assert(out == Map("a" -> "v3a", "b" -> "v1b", "c" -> "v1c"))
  }

  test("runningUserState: mapGroupsWithState accumulates across batches") {
    val root = tmpDir("state")
    val in = s"$root/in"; val ckpt = s"$root/ckpt"
    Files.createDirectories(Paths.get(in))
    Seq((1L, 2.0), (1L, 3.0), (2L, 5.0))
      .toDF("user_id", "value").write.parquet(s"$in/chunk")

    var emitted = Vector.empty[(Long, Long, Double)]
    def run(): Unit = {
      val stream = spark.readStream
        .schema(spark.read.parquet(s"$in/chunk").schema)
        .parquet(s"$in/chunk")
        .as[(Long, Double)]
      val q = StreamingIngest.runningUserState(stream).writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch((ds: org.apache.spark.sql.Dataset[(Long, Long, Double)], _: Long) =>
          emitted ++= ds.collect())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    run()
    assert(emitted.toSet == Set((1L, 2L, 5.0), (2L, 1L, 5.0)))
    // second batch arrives: user 1 adds one more event; state carries over
    Seq((1L, 10.0)).toDF("user_id", "value").write.mode("append").parquet(s"$in/chunk")
    run()
    assert(emitted.last == ((1L, 3L, 15.0)))
  }

  test("streaming HLL: foreachBatch-merged registers equal the batch whole-build") {
    import graft.operators.HyperLogLog
    val root = tmpDir("shll")
    val in = s"$root/in"; val reg = s"$root/registers"; val ckpt = s"$root/ckpt"
    Files.createDirectories(Paths.get(in))
    // two arriving files with overlapping keys — the sketch must count
    // distincts across batches, which the bucket-wise-max merge law gives
    spark.range(0L, 600L).select($"id".as("k")).repartition(1).write.parquet(s"$in/c1")
    spark.range(400L, 1000L).select($"id".as("k")).repartition(1).write.parquet(s"$in/c2")

    val stream = spark.readStream
      .schema(spark.read.parquet(s"$in/c1").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$in/*")
    val q = stream.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // merge this micro-batch's partial sketch into the stored register
        // table — 256 rows of state regardless of stream volume
        val partial = HyperLogLog.registers(batch, col("k"))
        val merged =
          if (Files.exists(Paths.get(reg)))
            HyperLogLog.merge(spark.read.parquet(reg), partial)
          else partial
        // two actions on a lazy plan over the file being overwritten would
        // race; pin the merged rows first (256 max), then overwrite
        val pinned = merged.collect()
        spark.createDataFrame(
          spark.sparkContext.parallelize(pinned.toIndexedSeq, 1), merged.schema)
          .write.mode("overwrite").parquet(reg)
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.read.parquet(reg)
      .orderBy("bucket").as[(Int, Int)].collect().toSeq
    val whole = HyperLogLog
      .registers(spark.range(0L, 1000L).select($"id".as("k")), $"k")
      .orderBy("bucket").as[(Int, Int)].collect().toSeq
    assert(streamed == whole)
    // identical registers -> identical estimate, and the raw estimator is
    // in-band for n=1000 (> 2.5m): sanity-pin it loosely
    val est = HyperLogLog.estimate(spark.read.parquet(reg)).as[Double].head()
    assert(math.abs(est - 1000.0) <= 250.0, s"streamed HLL estimate $est")
  }

  test("streaming histogram sketch: foreachBatch-merged bins equal the whole-build") {
    import graft.operators.HistogramSketch
    val root = tmpDir("shist")
    val in = s"$root/in"; val reg = s"$root/bins"; val ckpt = s"$root/ckpt"
    Files.createDirectories(Paths.get(in))
    // two arriving value files; bins must ADD across micro-batches
    spark.range(0L, 700L).select($"id".as("v")).repartition(1).write.parquet(s"$in/c1")
    spark.range(300L, 1000L).select($"id".as("v")).repartition(1).write.parquet(s"$in/c2")

    val stream = spark.readStream
      .schema(spark.read.parquet(s"$in/c1").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$in/*")
    val q = stream.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val partial = HistogramSketch.binCounts(batch, "v", width = 100L)
        val merged =
          if (Files.exists(Paths.get(reg)))
            HistogramSketch.mergeBins(spark.read.parquet(reg), partial)
          else partial
        // pin before overwriting the file the lazy plan reads (HLL twin)
        val pinned = merged.collect()
        spark.createDataFrame(
          spark.sparkContext.parallelize(pinned.toIndexedSeq, 1), merged.schema)
          .write.mode("overwrite").parquet(reg)
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // values 300-699 arrive TWICE — the sketch counts occurrences, so the
    // stored bins must equal the batch build over the concatenated stream
    val whole = spark.range(0L, 1000L).select($"id".as("v"))
      .union(spark.range(300L, 700L).select($"id".as("v")))
    val streamedBins = spark.read.parquet(reg)
      .orderBy("bin").as[(Long, Long)].collect().toSeq
    val wholeBins = HistogramSketch.binCounts(whole, "v", 100L)
      .orderBy("bin").as[(Long, Long)].collect().toSeq
    assert(streamedBins == wholeBins)
    val qr = HistogramSketch.quantilesFromBins(spark.read.parquet(reg), 100L, Seq(500))
      .collect()(0)
    // n = 1400, target 700: bins 0-2 hold 100 each, 3-6 hold 200 → cum at
    // bin 4 is 100·3 + 200·2 = 700 → p50 lands in bin 4
    assert(qr.getAs[Long]("n") == 1400L && qr.getAs[Long]("bin") == 4L)
  }

  test("quality rules stream: gopherStats is a stateless projection over readStream") {
    // the corpus-quality first cut runs unchanged in a micro-batch stream —
    // no state, no watermark, the rule columns are per-row projections
    val root = tmpDir("streamquality")
    val in = s"$root/in"
    Files.createDirectories(Paths.get(in))
    val docs = Tables.load(spark, sf, "documents").limit(100)
    docs.write.parquet(s"$in/chunk")
    val stream = spark.readStream.schema(docs.schema).parquet(s"$in/chunk")
    val q = graft.text.QualityRules.gopherStats(stream, "doc_id", "text")
      .writeStream.outputMode("append").format("memory")
      .queryName("quality_out").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("quality_out")
    val batch = graft.text.QualityRules.gopherStats(docs, "doc_id", "text")
    assert(streamed.count() == 100L)
    // row-identical to the batch projection
    assert(streamed.exceptAll(batch).count() == 0L &&
      batch.exceptAll(streamed).count() == 0L)
  }
}
