package graft

import graft.dedup.{DupClusters, IncrementalDedup, MinHashLsh}
import org.apache.spark.sql.functions._

/** The stateful daily-ingest dedup loop: parquet state on disk, one
  * ingestBatch per "day", and the invariant that the incremental canonical
  * set equals the full-corpus batch answer after every batch.
  */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  // duplicate GROUPS spanning batches: ids sharing a text are near-dups
  // (identical signatures collide in every band); distinct texts are far
  // apart. Batch membership deliberately splits the groups.
  private val corpus = Seq(
    1L -> "the quick brown fox jumps over the lazy dog again and again today",
    2L -> "completely different text about spark shuffles and partition pruning",
    3L -> "the quick brown fox jumps over the lazy dog again and again today",
    4L -> "a third subject entirely concerning jpeg entropy coding and huffman",
    5L -> "completely different text about spark shuffles and partition pruning",
    6L -> "the quick brown fox jumps over the lazy dog again and again today",
    7L -> "a fourth lonely document with no duplicate partner in the corpus",
    8L -> "a third subject entirely concerning jpeg entropy coding and huffman")

  private def docsDf(ids: Seq[Long]) =
    corpus.filter(t => ids.contains(t._1)).toDF("id", "text")

  test("ingestBatch: state accumulates, canonical set == full-batch answer per day") {
    val state = IncrementalDedup.State(tmpDir("incdedup"))
    val batches = Seq(Seq(1L, 2L, 4L), Seq(3L, 5L, 7L), Seq(6L, 8L))
    var seen = Seq.empty[Long]
    for (b <- batches) {
      val report = IncrementalDedup.ingestBatch(state, docsDf(b), "id", "text")
      seen = seen ++ b
      assert(report.batchDocs == b.size && report.totalDocs == seen.size)
      // the invariant: incremental canonical == full-batch canonical over
      // the docs ingested so far
      val full = DupClusters.keepCanonical(
        docsDf(seen), "id",
        DupClusters.components(
          MinHashLsh.candidatePairs(docsDf(seen), "id", "text", 3, 12, 4),
          "id_a", "id_b"))
        .select("id").as[Long].collect().sorted.toSeq
      val inc = IncrementalDedup.canonicalIds(spark, state)
        .select("id").as[Long].collect().sorted.toSeq
      assert(inc == full, s"after batch $b: inc=$inc full=$full")
      assert(report.canonicalDocs == full.size)
    }
    // end state: groups {1,3,6}, {2,5}, {4,8} collapse to min ids; 7 alone
    val end = IncrementalDedup.canonicalIds(spark, state)
      .select("id").as[Long].collect().sorted.toSeq
    assert(end == Seq(1L, 2L, 4L, 7L), end.toString)
    // stored pair state is the batch pair set (formed exactly once each)
    val pairs = spark.read.parquet(state.pairsDir)
      .select("id_a", "id_b").as[(Long, Long)].collect().sorted.toSeq
    assert(pairs == pairs.distinct, "a pair must never be appended twice")
    assert(pairs.toSet == Set((1L, 3L), (1L, 6L), (3L, 6L), (2L, 5L), (4L, 8L)))
  }

  test("first batch bootstraps empty state; duplicate-free batch adds no pairs") {
    val state = IncrementalDedup.State(tmpDir("incdedup2"))
    val r1 = IncrementalDedup.ingestBatch(state, docsDf(Seq(2L, 4L, 7L)), "id", "text")
    assert(r1.newPairs == 0 && r1.canonicalDocs == 3)
    // canonicalIds with pairs dir absent (no pair ever written)
    val c = IncrementalDedup.canonicalIds(spark, state)
      .select("id").as[Long].collect().sorted.toSeq
    assert(c == Seq(2L, 4L, 7L))
    val r2 = IncrementalDedup.ingestBatch(state, docsDf(Seq(5L)), "id", "text")
    assert(r2.newPairs == 1 && r2.canonicalDocs == 3) // 5 loses to 2
  }

  test("audit: incremental rep fold == full recluster; compact preserves state and prunes deltas") {
    val state = IncrementalDedup.State(tmpDir("incdedup3"))
    IncrementalDedup.ingestBatch(state, docsDf(Seq(1L, 2L, 4L)), "id", "text")
    IncrementalDedup.ingestBatch(state, docsDf(Seq(3L, 5L, 7L)), "id", "text")
    // the decoupled audit: full DupClusters recluster over stored pairs
    // must agree row-for-row with the incrementally maintained reps
    assert(IncrementalDedup.audit(spark, state) == 0)
    val before = IncrementalDedup.canonicalIds(spark, state)
      .select("id").as[Long].collect().sorted.toSeq
    IncrementalDedup.compact(spark, state)
    // vacuum pruned the per-day deltas: ONE snapshot generation remains
    val parts = new java.io.File(state.docsDir).listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).toSeq
    assert(parts.length == 1 && parts.head.startsWith("batch=snap"), parts.toString)
    assert(IncrementalDedup.canonicalIds(spark, state)
      .select("id").as[Long].collect().sorted.toSeq == before)
    assert(IncrementalDedup.audit(spark, state) == 0)
    // ingest continues on top of the snapshot; invariants hold
    val r = IncrementalDedup.ingestBatch(state, docsDf(Seq(6L, 8L)), "id", "text")
    assert(r.totalDocs == 8 && r.canonicalDocs == 4)
    assert(IncrementalDedup.audit(spark, state) == 0)
    assert(IncrementalDedup.canonicalIds(spark, state)
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 4L, 7L))
  }

  test("commit markers: committed re-ingest is a no-op; a crashed attempt's rows stay invisible") {
    val state = IncrementalDedup.State(tmpDir("incdedup4"))
    val r1 = IncrementalDedup.ingestBatch(
      state, docsDf(Seq(1L, 3L)), "id", "text", batchId = "day1")
    assert(r1.totalDocs == 2 && r1.canonicalDocs == 1)
    // same batchId again (a retried orchestrator step): nothing doubles
    val r2 = IncrementalDedup.ingestBatch(
      state, docsDf(Seq(1L, 3L)), "id", "text", batchId = "day1")
    assert(r2.totalDocs == 2 && r2.canonicalDocs == 1)
    // crash simulation: a batch's data rows landed but its marker never
    // did — readers must not see them (the commit point is the marker)
    Seq(6L).toDF("id")
      .select(col("id"), lit("dead-attempt").as("attempt"), lit("day2").as("batch"))
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .partitionBy("batch").parquet(state.docsDir)
    assert(IncrementalDedup.canonicalIds(spark, state)
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L))
    // recovery re-runs day2 with a fresh attempt: correct, no double rows
    val r3 = IncrementalDedup.ingestBatch(
      state, docsDf(Seq(6L)), "id", "text", batchId = "day2")
    assert(r3.batchDocs == 1 && r3.totalDocs == 3 && r3.canonicalDocs == 1)
    assert(IncrementalDedup.audit(spark, state) == 0)
    assert(IncrementalDedup.canonicalIds(spark, state)
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L))
  }

  test("a partial marker (crash mid-commit) reads as uncommitted; recovery rewrites it") {
    val state = IncrementalDedup.State(tmpDir("incdedup5"))
    IncrementalDedup.ingestBatch(state, docsDf(Seq(1L, 3L)), "id", "text", batchId = "d1")
    // crash simulation: the NEXT batch's data landed and its marker write
    // died halfway — one line instead of three
    Seq(6L).toDF("id")
      .select(col("id"), lit("half-attempt").as("attempt"), lit("d2").as("batch"))
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .partitionBy("batch").parquet(state.docsDir)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(state.commitsDir))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(state.commitsDir, "d2"), "half-att".getBytes("UTF-8"))
    // the corpse neither crashes reads nor exposes the uncommitted rows
    assert(IncrementalDedup.canonicalIds(spark, state)
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L))
    // recovery re-runs d2: the corrupt marker is overwritten, state correct
    val r = IncrementalDedup.ingestBatch(state, docsDf(Seq(6L)), "id", "text", batchId = "d2")
    assert(r.totalDocs == 3 && r.canonicalDocs == 1)
    assert(IncrementalDedup.audit(spark, state) == 0)
  }

  test("replay of a batchId folded by compact stays a no-op (snapshot marker records folded ids)") {
    val state = IncrementalDedup.State(tmpDir("incdedup6"))
    IncrementalDedup.ingestBatch(state, docsDf(Seq(1L, 2L)), "id", "text", batchId = "day1")
    IncrementalDedup.ingestBatch(state, docsDf(Seq(3L, 5L)), "id", "text", batchId = "day2")
    IncrementalDedup.compact(spark, state) // vacuum deletes day1/day2 markers
    // a stream-epoch replay of a pre-compact batch (crash between the
    // sink commit and the checkpoint) must NOT re-ingest: without the
    // folded-id record it would append duplicate doc_ids/band rows
    val r = IncrementalDedup.ingestBatch(
      state, docsDf(Seq(1L, 2L)), "id", "text", batchId = "day1")
    assert(r.totalDocs == 4 && r.canonicalDocs == 2, r.toString)
    assert(IncrementalDedup.canonicalIds(spark, state)
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    assert(IncrementalDedup.audit(spark, state) == 0)
    // a SECOND compact carries the folded set forward transitively
    IncrementalDedup.ingestBatch(state, docsDf(Seq(4L)), "id", "text", batchId = "day3")
    IncrementalDedup.compact(spark, state)
    val r2 = IncrementalDedup.ingestBatch(
      state, docsDf(Seq(3L, 5L)), "id", "text", batchId = "day2")
    assert(r2.totalDocs == 5 && r2.canonicalDocs == 3, r2.toString)
  }

  test("autoCompactEvery: compaction fires on the ingest cadence, state bit-identical") {
    val state = IncrementalDedup.State(tmpDir("incdedup7"))
    def parts() = Option(new java.io.File(state.docsDir).listFiles())
      .map(_.map(_.getName).filter(_.startsWith("batch=")).sorted.toSeq)
      .getOrElse(Seq.empty)
    // cadence 3: two deltas accumulate, the third ingest triggers compact
    IncrementalDedup.ingestBatch(state, docsDf(Seq(1L, 2L)), "id", "text",
      batchId = "d1", autoCompactEvery = 3)
    IncrementalDedup.ingestBatch(state, docsDf(Seq(3L, 5L)), "id", "text",
      batchId = "d2", autoCompactEvery = 3)
    assert(parts().length == 2 && parts().forall(!_.contains("snap")), parts().toString)
    val before = IncrementalDedup.canonicalIds(spark, state)
      .select("id").as[Long].collect().sorted.toSeq
    val r3 = IncrementalDedup.ingestBatch(state, docsDf(Seq(4L, 6L)), "id", "text",
      batchId = "d3", autoCompactEvery = 3)
    assert(r3.totalDocs == 6) // the report reflects the ingest, pre-compact
    // the trigger fired: ONE snapshot generation remains, deltas vacuumed
    assert(parts().length == 1 && parts().head.startsWith("batch=snap"), parts().toString)
    // state is bit-identical: canonical set unchanged + the new batch
    assert(IncrementalDedup.canonicalIds(spark, state)
      .select("id").as[Long].collect().sorted.toSeq == (before :+ 4L).sorted)
    assert(IncrementalDedup.audit(spark, state) == 0)
    // replay of a pre-compact batch is still a no-op (folded ids recorded)
    val rr = IncrementalDedup.ingestBatch(state, docsDf(Seq(1L, 2L)), "id", "text",
      batchId = "d1", autoCompactEvery = 3)
    assert(rr.totalDocs == 6, rr.toString)
    // cadence keeps counting fresh deltas after the snapshot
    IncrementalDedup.ingestBatch(state, docsDf(Seq(7L)), "id", "text",
      batchId = "d4", autoCompactEvery = 3)
    assert(parts().count(!_.contains("snap")) == 1, parts().toString)
  }

  test("audit runs concurrently with ingest: pinned marker generation, zero mismatches, no torn reads") {
    val state = IncrementalDedup.State(tmpDir("incdedup8"))
    IncrementalDedup.ingestBatch(state, docsDf(Seq(1L, 2L, 4L)), "id", "text",
      batchId = "d1")
    // hammer audits from another thread WHILE a second batch ingests:
    // every audit pins one committed generation at entry, so it must
    // always see a consistent (pairs, reps) pair — 0 mismatches whether
    // it lands before or after d2's marker, and never a torn mix
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val auditor = new Thread(() => {
      try {
        var i = 0
        while (i < 6) { results.add(IncrementalDedup.audit(spark, state)); i += 1 }
      } catch { case t: Throwable => errors.add(t) }
    })
    auditor.start()
    IncrementalDedup.ingestBatch(state, docsDf(Seq(3L, 5L, 6L, 7L)), "id", "text",
      batchId = "d2")
    auditor.join(120000)
    assert(!auditor.isAlive, "auditor wedged")
    assert(errors.isEmpty, s"audit threw under concurrent ingest: ${errors.peek()}")
    import scala.jdk.CollectionConverters._
    assert(results.asScala.forall(_ == 0L),
      s"torn read: audit mismatches ${results.asScala.toSeq}")
    assert(results.size == 6)
    // and the post-ingest state is the full-batch answer
    assert(IncrementalDedup.audit(spark, state) == 0)
    assert(IncrementalDedup.canonicalIds(spark, state)
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 4L, 7L))
  }
}
