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

  test("packChunksMultimodal: segment order survives, modality spans tile chunks, " +
    "ceil patch grids, negative counts fail loudly") {
    // doc 1: text 3 + image 2 + text 1; doc 2: image 5; seqLen 4
    val segs = Seq(
      (1L, 0L, "text", 3L), (1L, 1L, "image", 2L), (1L, 2L, "text", 1L),
      (2L, 0L, "image", 5L))
      .toDF("doc_id", "seg", "modality", "n_tokens")
    val out = SequencePack.packChunksMultimodal(
      segs, "doc_id", "seg", "modality", "n_tokens", seqLen = 4L)
      .orderBy("chunk_id", "doc_id", "seg")
      .as[(Long, Long, Long, String, Long, Long, Long)].collect().toSeq
    // stream: d1s0 [0,3) d1s1 [3,5) d1s2 [5,6) d2s0 [6,11)
    assert(out == Seq(
      (0L, 1L, 0L, "text", 0L, 0L, 3L),
      (0L, 1L, 1L, "image", 0L, 3L, 1L), // image splits across the boundary
      (1L, 1L, 1L, "image", 1L, 0L, 1L),
      (1L, 1L, 2L, "text", 0L, 1L, 1L),
      (1L, 2L, 0L, "image", 0L, 2L, 2L),
      (2L, 2L, 0L, "image", 2L, 0L, 3L)))
    // every chunk's pieces tile it: offsets contiguous from 0
    out.groupBy(_._1).foreach { case (c, ps) =>
      val sorted = ps.sortBy(_._6)
      assert(sorted.head._6 == 0L, s"chunk $c starts at 0")
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a._6 + a._7 == b._6, s"chunk $c gap")
        case _ =>
      }
    }
    // reassembly: each segment's seg_from spans cover [0, n) exactly
    val d2 = out.filter(r => r._2 == 2L).sortBy(_._5).map(p => (p._5, p._7))
    assert(d2 == Seq((0L, 2L), (2L, 3L)))
    // placeholder math: ceil grids, non-multiple width
    val dims = Seq((10, 6), (17, 11), (24, 16), (31, 8)).toDF("w", "h")
    val toks = dims.select(
      SequencePack.imagePlaceholderTokens(col("w"), col("h"), 8).as("t"))
      .as[Long].collect().toSeq
    assert(toks == Seq(2L * 1, 3L * 2, 3L * 2, 4L * 1))
    // corrupt upstream counter fails loudly
    intercept[Exception] {
      SequencePack.packChunksMultimodal(
        Seq((1L, 0L, "text", -2L)).toDF("doc_id", "seg", "modality", "n_tokens"),
        "doc_id", "seg", "modality", "n_tokens", 4L).collect()
    }
  }

  test("lossMaskSpans: every chunk tiles [0, seqLen) exactly, pad span closes " +
    "the tail, masks ride through") {
    // tokens 3, 5, 4 at seqLen 4 → 12 tokens, 3 exact chunks (no pad)
    val exact = Seq((1L, 3L, true), (2L, 5L, false), (3L, 4L, true))
      .toDF("doc_id", "n_tokens", "m")
    val outE = SequencePack.lossMaskSpans(exact, "doc_id", "n_tokens", "m", 4L)
      .orderBy("chunk_id", "span_offset").collect()
    assert(outE.length == 4 && outE.forall(!_.isNullAt(1)), "no pad when exact")
    // tokens 3, 0, 5 at seqLen 4 → 8 tokens... make it ragged: 3 + 5 + 3
    val ragged = Seq((1L, 3L, false), (2L, 5L, true), (3L, 3L, true))
      .toDF("doc_id", "n_tokens", "m")
    val out = SequencePack.lossMaskSpans(ragged, "doc_id", "n_tokens", "m", 4L)
      .orderBy("chunk_id", "span_offset")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        r.getLong(2), r.getLong(3), r.getBoolean(4))).toSeq
    // stream: d1 [0,3) mask F, d2 [3,8) mask T, d3 [8,11) mask T, pad [11,12)
    assert(out == Seq(
      (0L, 1L, 0L, 3L, false),
      (0L, 2L, 3L, 1L, true),
      (1L, 2L, 0L, 4L, true),
      (2L, 3L, 0L, 3L, true),
      (2L, -1L, 3L, 1L, false))) // the pad span, null doc, mask off
    // tiling: every chunk's spans cover [0, 4) with no gap or overlap
    out.groupBy(_._1).foreach { case (c, ss) =>
      val sorted = ss.sortBy(_._3)
      assert(sorted.head._3 == 0L && sorted.map(_._4).sum == 4L, s"chunk $c")
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a._3 + a._4 == b._3, s"chunk $c gap")
        case _ =>
      }
    }
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
