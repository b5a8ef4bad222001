package graft

import graft.operators.{Mixture, Preference, SequencePack}
import org.apache.spark.sql.functions._

/** Training-schedule operators: sequence packing (piece algebra, full
  * chunks, boundary splits, zero-token docs), the WFQ mixture
  * interleave (±1 prefix fairness — the property the schedule exists
  * for), and preference-pair construction (tie-breaks, tie-only drop).
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packChunks: exact piece algebra, boundary split, full chunks, empty docs") {
    // tokens: 3, 0, 5, 4, 2 at seqLen 4 → stream of 14 tokens, 4 chunks
    val docs = Seq((1L, 3L), (2L, 0L), (3L, 5L), (4L, 4L), (5L, 2L))
      .toDF("doc_id", "n_tokens")
    val out = SequencePack.packChunks(docs, "doc_id", "n_tokens", seqLen = 4L)
      .orderBy("chunk_id", "doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // doc1 [0,3), doc3 [3,8), doc4 [8,12), doc5 [12,14)
    assert(out == Seq(
      (0L, 1L, 0L, 0L, 3L), // doc1 whole, chunk 0 offset 0
      (0L, 3L, 0L, 3L, 1L), // doc3 first token closes chunk 0
      (1L, 3L, 1L, 0L, 4L), // doc3 middle fills chunk 1
      (2L, 4L, 0L, 0L, 4L), // doc4 exactly fills chunk 2
      (3L, 5L, 0L, 0L, 2L))) // doc5 opens the (partial) last chunk
    // doc2 (zero tokens) carries no piece
    assert(!out.exists(_._2 == 2L))
    // every chunk except the last is exactly full
    val byChunk = out.groupBy(_._1).view.mapValues(_.map(_._5).sum).toMap
    assert(byChunk == Map(0L -> 4L, 1L -> 4L, 2L -> 4L, 3L -> 2L))
    // piece doc_from spans reassemble each document exactly
    val doc3 = out.filter(_._2 == 3L).sortBy(_._3).map(p => (p._3, p._5))
    assert(doc3 == Seq((0L, 1L), (1L, 4L)))
  }

  test("mixture interleave: every prefix holds each source within 1 of its share") {
    val rows = (0 until 60).map(i => (i.toLong, if (i % 3 == 0) "a" else "b"))
    val df = rows.toDF("id", "src") // 20 a, 40 b
    val w = Seq("a" -> 1L, "b" -> 2L)
    val sched = Mixture.interleave(df, "src", "id", w)
      .orderBy("position").select("src").as[String].collect()
    assert(sched.length == 60)
    var na = 0; var nb = 0
    sched.zipWithIndex.foreach { case (s, i) =>
      if (s == "a") na += 1 else nb += 1
      val t = i + 1
      assert(math.abs(na - t / 3.0) <= 1.0, s"prefix $t: a=$na")
      assert(math.abs(nb - 2 * t / 3.0) <= 1.0, s"prefix $t: b=$nb")
    }
    // deterministic: same inputs, same schedule
    val again = Mixture.interleave(df, "src", "id", w)
      .orderBy("position").select("src").as[String].collect()
    assert(sched.toSeq == again.toSeq)
    // a source value without a weight fails loudly, not silently last
    val bad = Seq((1L, "a"), (2L, "zz")).toDF("id", "src")
    intercept[Exception] {
      Mixture.interleave(bad, "src", "id", Seq("a" -> 1L)).collect()
    }
  }

  test("tokenBudget: prefix truncation — the crossing doc and everything after drop") {
    import graft.operators.TokenBudget
    // domain a, best-first by quality: q=9(n=4), q=7(n=3), q=5(n=2), q=3(n=1)
    // budget 7 → cum_after = 4, 7, 9, 10 → kept, kept, DROP, DROP —
    // even though the q=3 doc (n=1) would fit a remaining gap of 0…
    // prefix semantics: once crossed, nothing later is taken
    val docs = Seq(
      (1L, "a", 9L, 4L), (2L, "a", 7L, 3L), (3L, "a", 5L, 2L), (4L, "a", 3L, 1L),
      (5L, "b", 1L, 10L)) // domain b: first doc already over budget 5
      .toDF("id", "dom", "q", "n")
    val out = TokenBudget.selectUnderBudget(
      docs, "dom", "q", "id", "n", Seq("a" -> 7L, "b" -> 5L))
      .orderBy("id")
      .select("id", "dom_rank", "cum_before", "kept")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, 1L, 0L, true), (2L, 2L, 4L, true),
      (3L, 3L, 7L, false), (4L, 4L, 9L, false),
      (5L, 1L, 0L, false)))
    // a domain without a budget fails loudly
    intercept[Exception] {
      TokenBudget.selectUnderBudget(
        docs, "dom", "q", "id", "n", Seq("a" -> 7L)).collect()
    }
  }

  test("preferencePairs: tie-breaks deterministic, tie-only prompts dropped") {
    val c = Seq(
      // prompt 1: clear winner/loser
      (1L, 10L, 5L), (1L, 11L, 9L), (1L, 12L, 2L),
      // prompt 2: top score TIED between 20 and 21 → chosen = LOWER id;
      // bottom tied between 22 and 23 → rejected = HIGHER id
      (2L, 20L, 7L), (2L, 21L, 7L), (2L, 22L, 3L), (2L, 23L, 3L),
      // prompt 3: all tied → no pair
      (3L, 30L, 4L), (3L, 31L, 4L),
      // prompt 4: single candidate → no pair
      (4L, 40L, 8L))
      .toDF("prompt_id", "cand", "score")
    val out = Preference.preferencePairs(c, "prompt_id", "cand", "score")
      .orderBy("prompt_id")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 3L, 11L, 9L, 12L, 2L, 7L),
      (2L, 4L, 20L, 7L, 23L, 3L, 4L)))
  }
}
