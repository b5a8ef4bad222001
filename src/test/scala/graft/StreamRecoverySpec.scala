package graft

import java.nio.file.{Files, Paths}

import graft.streaming.StreamingIngest
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Crash-recovery gates — the fault-tolerance story a 100 TB pipeline
  * actually depends on: a streaming query is KILLED (q.stop with no
  * graceful drain beyond committed batches), data keeps arriving while it
  * is down, and a NEW query starting from the same checkpoint must (a)
  * never re-ingest committed input (exactly-once offsets), (b) resume
  * custom flatMapGroupsWithState state (an open session spanning the
  * crash closes with ALL its events counted once), and (c) leave
  * externally-maintained sketch state correct — including under the
  * at-least-once REPLAY a mid-sink crash produces, which the bucket-max
  * HLL merge absorbs idempotently.
  */
class StreamRecoverySpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("statefulSessions: kill/restart resumes state store and offsets from checkpoint") {
    val root = tmpDir("screcov")
    val evDir = s"$root/ev"; val ckpt = s"$root/ckpt"; val out = s"$root/out"
    Files.createDirectories(Paths.get(evDir))
    def stream() = spark.readStream
      .schema("userId LONG, ts TIMESTAMP").parquet(s"$evDir/*")
      .as[(Long, java.sql.Timestamp)]
    // idempotent sink: overwrite-by-batch-id, so a replayed batch lands on
    // the same path instead of appending twice
    def runLeg(): Unit = {
      val q = StreamingIngest.statefulSessions(stream(), gapMinutes = 30)
        .toDF()
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch((df: DataFrame, id: Long) =>
          df.write.mode("overwrite").parquet(s"$out/b$id"))
        .start()
      q.processAllAvailable()
      q.stop() // the crash: no flush beyond the last committed batch
    }
    // leg 1: user 7's open session (10:00, 10:05) + user 9's (10:07)
    Seq((7L, ts(10, 0)), (7L, ts(10, 5)), (9L, ts(10, 7)))
      .toDF("userId", "ts").repartition(1).write.parquet(s"$evDir/f1")
    runLeg()
    // leg 2 (down-time arrival, then restart): 7 EXTENDS the open session
    // carried in the state store; 8 opens a new one. If f1 were re-read,
    // user 7's event count would inflate past 3 — caught below.
    Seq((7L, ts(10, 20)), (8L, ts(10, 30)))
      .toDF("userId", "ts").repartition(1).write.parquet(s"$evDir/f2")
    runLeg()
    // leg 3: a watermark-pushing event closes everything older
    Seq((99L, ts(12, 0)))
      .toDF("userId", "ts").repartition(1).write.parquet(s"$evDir/f3")
    runLeg()
    val got = spark.read.parquet(s"$out/b*")
      .as[StreamingIngest.ClosedSession].collect()
    assert(got.length == 3, s"each session closes exactly once: ${got.toSeq}")
    assert(got.toSet == Set(
      StreamingIngest.ClosedSession(7L, ts(10, 0), ts(10, 20), 3L), // spans the crash
      StreamingIngest.ClosedSession(8L, ts(10, 30), ts(10, 30), 1L),
      StreamingIngest.ClosedSession(9L, ts(10, 7), ts(10, 7), 1L)),
      s"resumed state must carry pre-crash events: ${got.toSeq}")
  }

  test("statefulSessions: RocksDB state store carries state across kill/restart") {
    // the state store a 100 TB deployment actually runs (bounded heap,
    // state spills to local disk + changelog in the checkpoint): the same
    // kill/restart contract must hold with the provider swapped — state
    // written by an HDFS-default run is NOT the point; this pins that our
    // flatMapGroupsWithState shapes are provider-agnostic
    val provider = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
    try {
      val root = tmpDir("rocksrecov")
      val evDir = s"$root/ev"; val ckpt = s"$root/ckpt"; val out = s"$root/out"
      Files.createDirectories(Paths.get(evDir))
      def stream() = spark.readStream
        .schema("userId LONG, ts TIMESTAMP").parquet(s"$evDir/*")
        .as[(Long, java.sql.Timestamp)]
      def runLeg(): Unit = {
        val q = StreamingIngest.statefulSessions(stream(), gapMinutes = 30)
          .toDF()
          .writeStream.outputMode("append")
          .option("checkpointLocation", ckpt)
          .foreachBatch((df: DataFrame, id: Long) =>
            df.write.mode("overwrite").parquet(s"$out/b$id"))
          .start()
        q.processAllAvailable()
        q.stop()
      }
      Seq((7L, ts(10, 0)), (7L, ts(10, 5)))
        .toDF("userId", "ts").repartition(1).write.parquet(s"$evDir/f1")
      runLeg()
      Seq((7L, ts(10, 20)))
        .toDF("userId", "ts").repartition(1).write.parquet(s"$evDir/f2")
      runLeg()
      Seq((99L, ts(12, 0)))
        .toDF("userId", "ts").repartition(1).write.parquet(s"$evDir/f3")
      runLeg()
      val got = spark.read.parquet(s"$out/b*")
        .as[StreamingIngest.ClosedSession].collect()
      assert(got.toSeq == Seq(
        StreamingIngest.ClosedSession(7L, ts(10, 0), ts(10, 20), 3L)),
        s"RocksDB-resumed session must span the crash: ${got.toSeq}")
    } finally {
      prev.fold(spark.conf.unset("spark.sql.streaming.stateStore.providerClass"))(
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", _))
    }
  }

  test("HLL register maintenance: restart resumes, and batch REPLAY is a no-op") {
    import graft.operators.HyperLogLog
    val root = tmpDir("shllrecov")
    val in = s"$root/in"; val reg = s"$root/registers"; val ckpt = s"$root/ckpt"
    Files.createDirectories(Paths.get(in))
    def mergeInto(batch: DataFrame): Unit = {
      val partial = HyperLogLog.registers(batch, col("k"))
      val merged =
        if (Files.exists(Paths.get(reg)))
          HyperLogLog.merge(spark.read.parquet(reg), partial)
        else partial
      val pinned = merged.collect() // pin before overwriting the source file
      spark.createDataFrame(
        spark.sparkContext.parallelize(pinned.toIndexedSeq, 1), merged.schema)
        .write.mode("overwrite").parquet(reg)
    }
    def runLeg(): Unit = {
      val q = spark.readStream
        .schema("k LONG")
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$in/*")
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch((batch: DataFrame, _: Long) => mergeInto(batch))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.range(0L, 600L).select($"id".as("k")).repartition(1).write.parquet(s"$in/c1")
    runLeg() // leg 1 commits c1, then the process dies
    spark.range(400L, 1000L).select($"id".as("k")).repartition(1).write.parquet(s"$in/c2")
    runLeg() // restart: drains ONLY c2 (c1's offset is committed)
    val streamed = spark.read.parquet(reg)
      .orderBy("bucket").as[(Int, Int)].collect().toSeq
    val whole = HyperLogLog
      .registers(spark.range(0L, 1000L).select($"id".as("k")), $"k")
      .orderBy("bucket").as[(Int, Int)].collect().toSeq
    assert(streamed == whole,
      "registers after kill/restart must equal the whole-stream build")
    // at-least-once replay: a crash between the register write and the
    // checkpoint commit re-runs the batch — bucket-wise max is idempotent,
    // so re-merging c2 must leave the registers bit-identical
    mergeInto(spark.read.parquet(s"$in/c2"))
    val replayed = spark.read.parquet(reg)
      .orderBy("bucket").as[(Int, Int)].collect().toSeq
    assert(replayed == streamed, "max-merge must absorb a replayed batch")
  }

  test("runMediaCurationStream: poison payload lands in quarantine, stream advances") {
    import graft.multimodal.Multimodal
    val root = tmpDir("mediastream")
    val inDir = s"$root/in"; val ckpt = s"$root/ckpt"
    val featDir = s"$root/features"; val quarDir = s"$root/quarantine"
    Files.createDirectories(Paths.get(inDir))
    def runLeg(): Unit = StreamingIngest.runMediaCurationStream(
      spark.readStream.schema(Multimodal.MediaSchema).parquet(s"$inDir/*"),
      featDir, quarDir, ckpt, format = "png")
    // leg 1: ids 1..5, id 5's payload corrupted (IEND CRC flip) — without
    // the quarantine twin this micro-batch would throw and AvailableNow
    // would retry the same poison on every future run
    Multimodal.corruptPayloads(
      Multimodal.synthesizePng(Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id"), "doc_id"),
      everyN = 5L)
      .repartition(1).write.parquet(s"$inDir/f1")
    runLeg()
    val feats1 = spark.read.parquet(featDir)
    assert(feats1.select("media_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L))
    val quar1 = spark.read.parquet(quarDir).collect()
    assert(quar1.length == 1 && quar1(0).getAs[Long]("media_id") == 5L)
    assert(quar1(0).getAs[String]("decode_error") != null &&
      quar1(0).getAs[String]("decode_error").contains("CRC"))
    // leg 2: new clean files arrive AFTER the poison — the checkpoint
    // committed past the poisoned batch, so the stream advances (f1 is
    // never reprocessed, the audit row is not duplicated)
    Multimodal.synthesizePng(Seq(6L, 7L).toDF("doc_id"), "doc_id")
      .repartition(1).write.parquet(s"$inDir/f2")
    runLeg()
    val feats2 = spark.read.parquet(featDir)
    assert(feats2.select("media_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L, 6L, 7L))
    assert(spark.read.parquet(quarDir).count() == 1, "audit row written once")
    // good rows carry the exact features of the throwing extractor
    val strict = Multimodal.extractPngFeatures(
      Multimodal.synthesizePng(Seq(1L, 2L, 3L, 4L, 6L, 7L).toDF("doc_id"), "doc_id"))
      .orderBy("media_id").collect()
    val got = feats2.orderBy("media_id").collect()
    for ((g, s) <- got.zip(strict))
      assert(g.getAs[Long]("sum_r") == s.getAs[Long]("sum_r"),
        s"feature drift for id ${g.getAs[Long]("media_id")}")
  }

  test("runDedupStream: the incremental near-dup loop as a stream, exactly-once across restarts") {
    import graft.dedup.{DupClusters, IncrementalDedup, MinHashLsh}
    val root = tmpDir("dedupstream")
    val inDir = s"$root/in"; val ckpt = s"$root/ckpt"; val stateRoot = s"$root/state"
    Files.createDirectories(Paths.get(inDir))
    val corpus = Map(
      1L -> "the quick brown fox jumps over the lazy dog again and again today",
      2L -> "completely different text about spark shuffles and partition pruning",
      3L -> "the quick brown fox jumps over the lazy dog again and again today",
      4L -> "a third subject entirely concerning jpeg entropy coding and huffman",
      5L -> "completely different text about spark shuffles and partition pruning",
      6L -> "the quick brown fox jumps over the lazy dog again and again today",
      7L -> "a fourth lonely document with no duplicate partner in the corpus",
      8L -> "a third subject entirely concerning jpeg entropy coding and huffman")
    def docsDf(ids: Seq[Long]) = ids.map(i => (i, corpus(i))).toDF("id", "text")
    def arrive(name: String, ids: Seq[Long]): Unit =
      docsDf(ids).repartition(1).write.parquet(s"$inDir/$name")
    def stream() = spark.readStream.schema("id LONG, text STRING").parquet(s"$inDir/*")
    def runLeg(): Unit = StreamingIngest.runDedupStream(stream(), stateRoot, ckpt)
    val state = IncrementalDedup.State(stateRoot)
    def canonical(): Seq[Long] = IncrementalDedup.canonicalIds(spark, state)
      .select("id").as[Long].collect().sorted.toSeq
    def fullAnswer(ids: Seq[Long]): Seq[Long] = DupClusters.keepCanonical(
      docsDf(ids), "id",
      DupClusters.components(
        MinHashLsh.candidatePairs(docsDf(ids), "id", "text", 3, 12, 4), "id_a", "id_b"))
      .select("id").as[Long].collect().sorted.toSeq
    // leg 1: one "day" arrives, the query drains and stops
    arrive("f1", Seq(1L, 2L, 4L))
    runLeg()
    assert(canonical() == fullAnswer(Seq(1L, 2L, 4L)))
    // leg 2: more data arrived while down; a NEW query from the same
    // checkpoint must ingest ONLY the new file (exactly-once offsets —
    // re-reading f1 would double doc_ids and break the counts)
    arrive("f2", Seq(3L, 5L, 7L))
    runLeg()
    assert(canonical() == fullAnswer(Seq(1L, 2L, 3L, 4L, 5L, 7L)))
    // leg 3: the last groups close; incremental == batch, audit clean
    arrive("f3", Seq(6L, 8L))
    runLeg()
    assert(canonical() == Seq(1L, 2L, 4L, 7L))
    assert(IncrementalDedup.audit(spark, state) == 0)
    val docs = spark.read.option("recursiveFileLookup", "true")
      .parquet(state.docsDir).select("id").as[Long].collect().sorted.toSeq
    assert(docs == (1L to 8L), s"doc state double-ingested or dropped: $docs")
  }
}
