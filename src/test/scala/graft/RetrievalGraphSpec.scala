package graft

import graft.operators.{PageRank, Triangles}
import graft.text.{Retrieval, Vocab}
import org.apache.spark.sql.functions._

class RetrievalGraphSpec extends SparkSpec {
  import spark.implicits._

  test("invertedIndex: doc-range blocks, doc-id-ordered postings") {
    val docs = Seq(
      (0L, "alpha beta alpha"),
      (1L, "alpha gamma"),
      (128L, "alpha alpha alpha"),
      (200L, "beta")).toDF("doc_id", "text")
    val idx = Retrieval.invertedIndex(docs, "doc_id", "text", docRange = 128)
      .orderBy("token", "block_id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    // alpha: docs 0 (tf 2), 1 (tf 1) in block 0; doc 128 (tf 3) in block 1
    assert(idx.toSeq == Seq(
      ("alpha", 0L, 2L, 3L, "0:2,1:1"),
      ("alpha", 1L, 1L, 3L, "128:3"),
      ("beta", 0L, 1L, 1L, "0:1"),
      ("beta", 1L, 1L, 1L, "200:1"),
      ("gamma", 0L, 1L, 1L, "1:1")))
  }

  test("bm25: exact score on a hand-computed corpus; tf raises, length lowers") {
    // corpus: S = 2 + 2 + 4 = 8, N = 3; term 'x' has df = 2
    val docs = Seq(
      (1L, "x y"), // tf=1, dl=2
      (2L, "y z"),
      (3L, "x x y z")) // tf=2, dl=4
      .toDF("doc_id", "text")
    val out = Retrieval.bm25(docs, "doc_id", "text", Seq("x"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(1), r.getDouble(4)))
    // doc1: 22*1*8/(10*1*8+3*8+9*2*3) * (2*3-2*2+1)/(2*2+1) = 176/158 * 3/5
    val s1 = math.rint(176.0 / 158.0 * (3.0 / 5.0) * 1e4) / 1e4
    // doc3: 22*2*8/(10*2*8+3*8+9*4*3) * 3/5 = 352/292 * 3/5
    val s3 = math.rint(352.0 / 292.0 * (3.0 / 5.0) * 1e4) / 1e4
    assert(out.toSeq == Seq((1L, s1), (3L, s3)))
    assert(s3 > s1) // tf dominates here despite doc 3 being longer
  }

  test("collocations: lift is the exact rational PMI argument") {
    // tokens: a b a b c -> T1 = 5; pairs: (a b) x2, (b a), (b c) -> T2 = 4
    val docs = Seq("a b a b c").toDF("text")
    val out = Vocab.collocations(docs, "text", minCount = 1)
      .orderBy("gram").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    def lift(n: Long, cx: Long, cy: Long): Double =
      math.rint(n.toDouble * 5 * 5 / (4.0 * cx * cy) * 1e4) / 1e4
    assert(out.toSeq == Seq(
      ("a b", 2L, lift(2, 2, 2)),
      ("b a", 1L, lift(1, 2, 2)),
      ("b c", 1L, lift(1, 2, 1))))
  }

  test("skipgramPairs: ±window pairs, empty docs contribute nothing") {
    val docs = Seq("a b c", "", "d").toDF("text")
    val out = Vocab.skipgramPairs(docs, "text", window = 2)
      .orderBy("center", "context").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("a", "b", 1L), ("a", "c", 1L), ("b", "a", 1L),
      ("b", "c", 1L), ("c", "a", 1L), ("c", "b", 1L)))
    // window=1 is exactly adjacent-pair adjacency, both directions
    val w1 = Vocab.skipgramPairs(Seq("x y x").toDF("text"), "text", window = 1)
      .orderBy("center", "context").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(w1.toSeq == Seq(("x", "y", 2L), ("y", "x", 2L)))
  }

  test("pagerank: 2-cycle is a fixed point; star center outranks leaves, exactly") {
    val cyc = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val rc = PageRank.ranks(cyc, iters = 4).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rc == Map("a" -> 1000000000000L, "b" -> 1000000000000L))

    val star = Seq(("c", "l1"), ("c", "l2"), ("c", "l3"),
      ("l1", "c"), ("l2", "c"), ("l3", "c")).toDF("src", "dst")
    val rs = PageRank.ranks(star, iters = 1).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // center: 0.15e12 + (17 * 3e12) div 20; leaf: 0.15e12 + (17 * (1e12 div 3)) div 20
    assert(rs("c") == 150000000000L + (17L * 3000000000000L) / 20L)
    assert(rs("l1") == 150000000000L + (17L * (1000000000000L / 3L)) / 20L)
    assert(rs("l1") == rs("l2") && rs("l2") == rs("l3"))
    assert(rs("c") > rs("l1"))

    // the undirected fast path (no nodes-distinct, no zero-union) is
    // row-identical to the general path on a both-directions edge list
    val both = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"),
      ("a", "c"), ("c", "a"), ("c", "d"), ("d", "c")).toDF("src", "dst")
    val general = PageRank.ranks(both, iters = 3).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val fast = PageRank.ranks(both, iters = 3, undirected = true).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(fast == general, s"undirected fast path diverged: $fast vs $general")
  }

  test("triangles: K4 has four, every vertex in three; a square has none") {
    val k4 = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"))
      .toDF("a", "b")
    assert(Triangles.triangles(k4).count() == 4L)
    val per = Triangles.perVertexCounts(k4).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(per == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L))

    val square = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")).toDF("a", "b")
    assert(Triangles.triangles(square).isEmpty)
  }

  test("triangles: duplicate and reversed edges, self-loops don't inflate the count") {
    val messy = Seq(("a", "b"), ("b", "a"), ("a", "b"), ("b", "c"), ("c", "a"), ("a", "a"))
      .toDF("a", "b")
    assert(Triangles.triangles(messy).count() == 1L)
  }
}
