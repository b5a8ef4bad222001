package graft

import graft.operators.{Allocation, Eval, Splits}
import graft.text.{Keyness, Retrieval}
import org.apache.spark.sql.functions._

/** Unit gates for the q189–q193 batch: RRF hybrid fusion, more-like-this
  * BM25, grouped largest remainder, exact stratified split, epoch shuffle,
  * keyness odds ratio, per-class classifier metrics.
  */
class SplitsEvalSpec extends SparkSpec {
  import spark.implicits._

  // ---- rrfFuse ----

  test("rrfFuse: integer RRF contributions sum, per-system ranks carry, misses are null") {
    val lex = Seq(("q1", 10L, 1L), ("q1", 11L, 2L)).toDF("q", "id", "rank")
    val sem = Seq(("q1", 11L, 1L), ("q1", 12L, 2L)).toDF("q", "id", "rank")
    val out = Retrieval.rrfFuse(Seq("lex" -> lex, "sem" -> sem), "q", "id")
      .orderBy("fused_rank").collect()
    // doc 11: 1000000/62 + 1000000/61 = 16129 + 16393; docs 10/12 single-system
    assert(out.map(r => (r.getLong(1), r.getLong(r.fieldIndex("rrf_i6")))).toSeq ==
      Seq((11L, 32522L), (10L, 16393L), (12L, 16129L)))
    val d10 = out.find(_.getLong(1) == 10L).get
    assert(d10.getLong(d10.fieldIndex("lex_rank")) == 1L)
    assert(d10.isNullAt(d10.fieldIndex("sem_rank")))
    assert(out.map(_.getLong(out.head.fieldIndex("fused_rank"))).toSeq == Seq(1L, 2L, 3L))
  }

  test("rrfFuse: topK truncates per query by (rrf desc, id)") {
    val one = Seq(("q", 1L, 1L), ("q", 2L, 2L), ("q", 3L, 3L)).toDF("q", "id", "rank")
    val out = Retrieval.rrfFuse(Seq("s" -> one), "q", "id", topK = 2).collect()
    assert(out.map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L))
  }

  // ---- moreLikeThis ----

  test("moreLikeThis: anchor excluded, shared-vocabulary docs rank by summed bm25") {
    val docs = Seq(
      (0L, "alpha beta gamma"),
      (1L, "alpha beta gamma delta"), // shares 3 anchor terms
      (2L, "alpha zzz yyy xxx"), //       shares 1
      (3L, "qqq rrr sss")) //             shares 0 -> absent
      .toDF("doc_id", "text")
    val out = Retrieval.moreLikeThis(docs, "doc_id", "text", Seq(0L), k = 10)
      .orderBy("rank").collect()
    assert(!out.map(_.getLong(1)).contains(0L), "anchor must not retrieve itself")
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L), "3-term overlap beats 1, 0 absent")
    assert(out.map(r => r.getLong(r.fieldIndex("rank"))).toSeq == Seq(1L, 2L))
  }

  // ---- largestRemainderBy ----

  test("largestRemainderBy: per-group exact apportionment with split-name tie-break") {
    val targets = Seq(
      ("g1", "train", 8L, 7L), ("g1", "val", 1L, 7L), ("g1", "test", 1L, 7L),
      ("g2", "train", 8L, 20L), ("g2", "val", 1L, 20L), ("g2", "test", 1L, 20L))
      .toDF("g", "split", "w", "tot")
    val out = Allocation.largestRemainderBy(targets, Seq("g"), "w", "tot", Seq("split"))
      .select("g", "split", "alloc").collect()
    val byKey = out.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // g1 n=7: bases 5/0/0, remainders 6/7/7 -> the two +1s go to test, val (name asc)
    assert(byKey(("g1", "train")) == 5L && byKey(("g1", "val")) == 1L
      && byKey(("g1", "test")) == 1L)
    // g2 n=20: exact 16/2/2, no remainder distribution
    assert(byKey(("g2", "train")) == 16L && byKey(("g2", "val")) == 2L
      && byKey(("g2", "test")) == 2L)
    assert(byKey.size == 6)
  }

  // ---- exactStratifiedSplit ----

  test("exact split: per-stratum counts are the largest-remainder sizes, all rows kept") {
    val rows = (0L until 37L).map(i => (i, if (i % 3 == 0) "a" else "b")).toDF("id", "grp")
    val out = Splits.exactStratifiedSplit(
      rows, "id", Seq("grp"), Seq("train" -> 8L, "val" -> 1L, "test" -> 1L), "s1")
    assert(out.count() == 37L)
    val sizes = out.groupBy("grp", "split").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // stratum a: 13 rows -> bases 10/1/1, remainders 4/3/3 -> +1 to train
    assert(sizes(("a", "train")) == 11L && sizes(("a", "val")) == 1L
      && sizes(("a", "test")) == 1L)
    // stratum b: 24 rows -> bases 19/2/2, remainders 2/4/4 -> +1 to test (name asc)
    assert(sizes(("b", "train")) == 19L && sizes(("b", "val")) == 2L
      && sizes(("b", "test")) == 3L)
  }

  test("exact split: NULL-stratum rows form their own stratum and are kept") {
    // rows with a NULL group must land in a split like any other stratum —
    // the null-safe join-back contract (same class as the kAnonymize fix)
    val rows = (0L until 30L).map(i =>
      (i, if (i % 3 == 0) None else Some("a"))).toDF("id", "grp")
    val out = Splits.exactStratifiedSplit(
      rows, "id", Seq("grp"), Seq("train" -> 8L, "val" -> 1L, "test" -> 1L), "s1")
    assert(out.count() == 30L, "every row must land in exactly one split")
    val nullRows = out.filter(col("grp").isNull)
    assert(nullRows.count() == 10L)
    // the 10-row NULL stratum splits 8/1/1 by largest remainder
    val sizes = nullRows.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes == Map("train" -> 8L, "val" -> 1L, "test" -> 1L))
  }

  test("exact split: assignment is a pure function of (seed, id)") {
    val rows = (0L until 50L).map(i => (i, "x")).toDF("id", "grp")
    def run(seed: String) = Splits.exactStratifiedSplit(
      rows, "id", Seq("grp"), Seq("train" -> 8L, "val" -> 1L, "test" -> 1L), seed)
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(run("s1") == run("s1"), "same seed must reproduce")
    assert(run("s1") != run("s2"), "different seed must re-deal")
  }

  // ---- epochShuffle ----

  test("epochShuffle: shards bounded, positions contiguous per shard, global_pos unique") {
    val rows = (0L until 100L).map(Tuple1(_)).toDF("id")
    val out = Splits.epochShuffle(rows, "id", "e1", numShards = 8).collect()
    assert(out.length == 100)
    assert(out.forall(r => { val sh = r.getInt(r.fieldIndex("shard")); sh >= 0 && sh < 8 }))
    val byShard = out.groupBy(_.getInt(out.head.fieldIndex("shard")))
    byShard.foreach { case (_, rs) =>
      val ps = rs.map(r => r.getLong(r.fieldIndex("pos"))).sorted.toSeq
      assert(ps == (0L until ps.length).toSeq, "pos must be 0..n_s-1 within a shard")
    }
    val gp = out.map(r => r.getLong(r.fieldIndex("global_pos")))
    assert(gp.distinct.length == gp.length, "global_pos must be unique")
  }

  test("epochShuffle: a new seed permutes, the same seed reproduces") {
    val rows = (0L until 64L).map(Tuple1(_)).toDF("id")
    def order(seed: String) = Splits.epochShuffle(rows, "id", seed, 4)
      .orderBy("global_pos").select("id").as[Long].collect().toSeq
    assert(order("e1") == order("e1"))
    assert(order("e1") != order("e2"))
  }

  // ---- bpeTrain ----

  test("bpeTrain: three rounds with hand-computed merges, greedy leftmost apply") {
    // corpus: aaab ×2, ab ×1
    val docs = Seq("aaab aaab ab").toDF("text")
    val out = graft.text.Vocab.bpeTrain(docs, "text", iterations = 3)
      .orderBy("iter").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // r1: (a,a)=4 beats (a,b)=3; aaab -> [aa,a,b] (leftmost of the aa-run)
    // r2: (a,b)=3 (aaab's a+b ×2, ab ×1) beats (aa,a)=2; aaab -> [aa,ab], ab -> [ab]
    // r3: (aa,ab)=2
    assert(out.toSeq == Seq((1, "a", "a", 4L), (2, "a", "b", 3L), (3, "aa", "ab", 2L)))
  }

  test("bpeTrain: an aaaa run merges at even offsets only (non-overlap rule)") {
    val docs = Seq("aaaa").toDF("text")
    val out = graft.text.Vocab.bpeTrain(docs, "text", iterations = 2)
      .orderBy("iter").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // r1: (a,a)=3 raw adjacencies; apply merges positions 1&3 -> [aa,aa]
    // r2: the only remaining pair is (aa,aa)=1
    assert(out.toSeq == Seq((1, "a", "a", 3L), (2, "aa", "aa", 1L)))
  }

  test("bpeCompressionStats: per-round weighted token totals pin the applied merges") {
    val docs = Seq("aaab aaab ab").toDF("text")
    val out = graft.text.Vocab.bpeCompressionStats(docs, "text", iterations = 3)
      .orderBy("iter").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // iter0: 2*4 + 1*2 = 10 chars, syms {a,b}
    // iter1 merge (a,a): ONE applied per aaab instance (overlap rule) -> 8, {aa,a,b}
    // iter2 merge (a,b): applied 3x -> 5, {aa,ab}
    // iter3 merge (aa,ab): applied 2x -> 3, {aaab,ab}
    assert(out.toSeq == Seq((0, 10L, 2L), (1, 8L, 3L), (2, 5L, 2L), (3, 3L, 2L)))
  }

  test("bpeEncode: per-doc counts match hand segmentation; totals tie to the compression audit") {
    // same corpus as the audit test: after 3 rounds words segment as
    // aaab -> [aaab] (1 subword), ab -> [ab] (1 subword)
    val docs = Seq((1L, "aaab aaab ab"), (2L, "ab ab"), (3L, "aaab")).toDF("id", "text")
    val enc = graft.text.Vocab.bpeEncode(docs, "id", "text", iterations = 3)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(enc.toSeq == Seq(
      (1L, 3L, 3L, 10L, 1000000L), // 3 words, 3 subwords, 10 chars
      (2L, 2L, 2L, 4L, 1000000L),
      (3L, 1L, 1L, 4L, 1000000L)))
    // the corpus-total invariant: Σ n_subwords over docs == the round-3
    // tf-weighted symbol count of the audit (encode and train must agree
    // on what the corpus compresses to); Σ n_chars == the round-0 total
    val audit = graft.text.Vocab.bpeCompressionStats(docs, "text", iterations = 3)
      .orderBy("iter").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(enc.map(_._3).sum == audit.last._2)
    assert(enc.map(_._4).sum == audit.head._2)
    // a 1-round encode splits aaab as [aa, a, b] (3), ab as [a, b] (2)
    val enc1 = graft.text.Vocab.bpeEncode(docs, "id", "text", iterations = 1)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(enc1.toSeq == Seq((1L, 8L), (2L, 4L), (3L, 3L)))
  }

  // ---- jackknifeMeanSe ----

  test("jackknifeMeanSe: constant values give SE exactly 0, exact n/sum/mean") {
    val rows = (1L to 100L).map(i => (i, 250L)).toDF("k", "cents")
    val out = graft.operators.RobustStats.jackknifeMeanSe(rows, "cents", "k").collect().head
    assert(out.getLong(out.fieldIndex("n")) == 100L)
    assert(out.getLong(out.fieldIndex("sum_units")) == 25000L)
    assert(out.getLong(out.fieldIndex("mean_micro")) == 250000000L)
    assert(out.getDouble(out.fieldIndex("se_micro")) == 0.0)
  }

  test("jackknifeMeanSe: non-degenerate data gives a positive, bounded SE") {
    val rows = (1L to 1000L).map(i => (i, i % 97)).toDF("k", "cents")
    val out = graft.operators.RobustStats.jackknifeMeanSe(rows, "cents", "k").collect().head
    val se = out.getDouble(out.fieldIndex("se_micro"))
    val mean = out.getLong(out.fieldIndex("mean_micro"))
    assert(se > 0.0, "spread data must have positive SE")
    // jackknife SE of a mean of values in [0, 96] over 1000 rows: well under
    // the value range itself (micro-units)
    assert(se < 96000000.0)
    assert(mean > 0L && mean < 96000000L)
  }

  // ---- Keyness ----

  test("keyness odds ratio: hand-computed Haldane-corrected value") {
    val docs = Seq(("g1", "a a b"), ("g2", "b b")).toDF("grp", "text")
    val out = Keyness.oddsRatio(docs, "text", "grp").collect()
      .map(r => (r.getString(r.fieldIndex("grp")), r.getString(r.fieldIndex("token"))) ->
        r.getDouble(r.fieldIndex("odds_ratio"))).toMap
    // (g1, a): y=2 n=3 y'=0 n'=2 -> (2*2+1)(2*2+1) / (2*1+1)(2*0+1) = 25/3
    assert(math.abs(out(("g1", "a")) - 25.0 / 3.0) < 1e-12)
    // (g2, b): y=2 n=2 y'=1 n'=3 -> (5)(2*2+1) / (1)(3) = 25/3
    assert(math.abs(out(("g2", "b")) - 25.0 / 3.0) < 1e-12)
    assert(!out.contains(("g2", "a")), "zero-occurrence (group, token) cells are absent")
  }

  // ---- Eval ----

  test("perClassPrf: confusion counts and single-division metrics, nulls not NaN") {
    val pairs = Seq(("a", "a"), ("a", "b"), ("b", "b"), ("c", "b"))
      .toDF("truth", "pred")
    val out = Eval.perClassPrf(pairs, "truth", "pred").orderBy("clazz").collect()
    val a = out(0); val b = out(1); val c = out(2)
    assert(a.getString(0) == "a" && a.getLong(1) == 2 && a.getLong(2) == 1 && a.getLong(3) == 1)
    assert(a.getDouble(a.fieldIndex("precision")) == 1.0)
    assert(a.getDouble(a.fieldIndex("recall")) == 0.5)
    assert(math.abs(a.getDouble(a.fieldIndex("f1")) - 2.0 / 3.0) < 1e-15)
    assert(b.getLong(2) == 3 && b.getDouble(b.fieldIndex("precision")) == 1.0 / 3.0)
    // class c: never predicted -> precision NULL, recall 0, f1 0
    assert(c.isNullAt(c.fieldIndex("precision")))
    assert(c.getDouble(c.fieldIndex("recall")) == 0.0)
    assert(c.getDouble(c.fieldIndex("f1")) == 0.0)
  }

  test("rankingMetrics: integer-quotient MRR and AP, capped denominator, null on no qrels") {
    val ranked = Seq(("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L), ("a", 4L, 4L),
      ("b", 1L, 1L)).toDF("q", "id", "rank")
    val rel = Seq(("a", 2L), ("a", 4L), ("a", 9L)).toDF("q", "id")
    val rt = Seq(("a", 3L), ("b", 0L)).toDF("q", "n_rel")
    val out = Eval.rankingMetrics(ranked, rel, rt, "q", "id", pAtK = 10, apAtK = 20)
      .orderBy("q").collect()
    val a = out(0); val b = out(1)
    assert(a.getLong(a.fieldIndex("hits")) == 2L)
    assert(a.getLong(a.fieldIndex("first_rel_rank")) == 2L)
    assert(a.getDouble(a.fieldIndex("mrr")) == 0.5)
    assert(a.getDouble(a.fieldIndex("p_at_k")) == 0.2)
    // AP terms: rank 2 -> 1e6*1 div 2 = 500000; rank 4 -> 1e6*2 div 4 = 500000;
    // denominator min(3, 20) * 1e6 -> AP = 1/3
    assert(math.abs(a.getDouble(a.fieldIndex("ap")) - 1.0 / 3.0) < 1e-12)
    // query b: empty qrels -> mrr 0, ap NULL (0/0 undefined, not zero)
    assert(b.getDouble(b.fieldIndex("mrr")) == 0.0)
    assert(b.isNullAt(b.fieldIndex("ap")))
    assert(b.isNullAt(b.fieldIndex("first_rel_rank")))
  }

  test("ndcgAtK: pinned-discount DCG/IDCG, perfect ranking is exactly 1") {
    // pinned discounts rmicro(i) = (693147·1e6) div floor(ln(i+1)·1e6+0.5):
    // 1000000, 630929, 500000, 430676, 386852 for ranks 1..5
    val ranked = Seq(
      ("p", 1L, 1L), ("p", 2L, 2L), ("p", 3L, 3L), ("p", 4L, 4L), ("p", 5L, 5L),
      ("w", 1L, 1L), ("w", 2L, 2L), ("w", 3L, 3L), ("w", 4L, 4L), ("w", 5L, 5L),
      ("z", 1L, 1L)).toDF("q", "id", "rank")
    val rel = Seq( // p: relevant at ranks 1,2,3 (perfect); w: at ranks 4,5 (worst)
      ("p", 1L), ("p", 2L), ("p", 3L), ("w", 4L), ("w", 5L)).toDF("q", "id")
    val rt = Seq(("p", 3L), ("w", 2L), ("z", 0L)).toDF("q", "n_rel")
    val out = Eval.ndcgAtK(ranked, rel, rt, "q", "id", k = 5).orderBy("q").collect()
    val p = out(0); val w = out(1); val z = out(2)
    assert(p.getLong(p.fieldIndex("dcg_micro")) == 1000000L + 630929L + 500000L)
    assert(p.getLong(p.fieldIndex("idcg_micro")) == p.getLong(p.fieldIndex("dcg_micro")))
    assert(p.getDouble(p.fieldIndex("ndcg")) == 1.0) // EXACT: same pinned terms
    assert(w.getLong(w.fieldIndex("dcg_micro")) == 430676L + 386852L)
    assert(w.getLong(w.fieldIndex("idcg_micro")) == 1000000L + 630929L)
    assert(math.abs(w.getDouble(w.fieldIndex("ndcg")) - 817528.0 / 1630929.0) < 1e-15)
    assert(z.isNullAt(z.fieldIndex("ndcg"))) // no relevant docs → undefined, not 0
  }

  test("ndcgGradedAtK: exponential gains, ideal ordering from the qrels window") {
    // query p: list docs 1,2,3 with grades 3,0(absent),1 → gains 7,0,1
    // dcg = 7·1000000 + 1·500000; ideal order (3 then 1) → 7·1000000 + 1·630929
    val ranked = Seq(("p", 1L, 1L), ("p", 2L, 2L), ("p", 3L, 3L),
      ("w", 1L, 1L), ("w", 2L, 2L)).toDF("q", "id", "rank")
    val qrels = Seq(("p", 1L, 3L), ("p", 3L, 1L), ("w", 9L, 0L)).toDF("q", "id", "g")
    val out = Eval.ndcgGradedAtK(ranked, qrels, "q", "id", "g", k = 5)
      .orderBy("q").collect()
    val p = out(0); val w = out(1)
    assert(p.getLong(p.fieldIndex("dcg_micro")) == 7L * 1000000L + 500000L)
    assert(p.getLong(p.fieldIndex("idcg_micro")) == 7L * 1000000L + 630929L)
    assert(math.abs(p.getDouble(p.fieldIndex("ndcg")) - 7500000.0 / 7630929.0) < 1e-15)
    assert(p.getLong(p.fieldIndex("n_ideal")) == 2L)
    // w's only qrel is grade 0 → gain 0 → idcg 0 → NULL ndcg, not 0
    assert(w.getLong(w.fieldIndex("idcg_micro")) == 0L)
    assert(w.isNullAt(w.fieldIndex("ndcg")))
    // a perfect graded ranking is exactly 1.0: same pinned terms both sides
    val perfect = Seq(("x", 1L, 1L), ("x", 2L, 2L)).toDF("q", "id", "rank")
    val qx = Seq(("x", 1L, 2L), ("x", 2L, 1L)).toDF("q", "id", "g")
    val rx = Eval.ndcgGradedAtK(perfect, qx, "q", "id", "g", k = 5).head()
    assert(rx.getDouble(rx.fieldIndex("ndcg")) == 1.0)
  }

  test("perClassPrf: a class only ever predicted gets null recall") {
    val pairs = Seq(("a", "und"), ("a", "a")).toDF("truth", "pred")
    val und = Eval.perClassPrf(pairs, "truth", "pred")
      .filter(col("clazz") === "und").collect().head
    assert(und.getLong(und.fieldIndex("n_true")) == 0L)
    assert(und.isNullAt(und.fieldIndex("recall")))
    assert(und.getDouble(und.fieldIndex("precision")) == 0.0)
  }
}
