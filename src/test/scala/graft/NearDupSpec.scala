package graft

import graft.dedup.{MinHashLsh, NGramJaccard, SimHash}
import org.apache.spark.sql.functions._

class NearDupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 1
    (3L, "completely unrelated text about spark catalyst optimizer rules and plans"),
    (4L, "another very different document discussing parquet column pruning stats"))
    .toDF("doc_id", "text")

  test("minhash shingles: k-grams, short-text and empty handling") {
    val out = Seq("a b c d", "a b", "").toDF("t")
      .select(MinHashLsh.shingles($"t", 3).as("s")).collect()
    assert(out(0).getSeq[String](0) == Seq("a b c", "b c d"))
    assert(out(1).getSeq[String](0) == Seq("a b"))
    assert(out(2).getSeq[String](0).isEmpty)
  }

  test("minhash LSH finds the planted near-duplicate, not the unrelated pair") {
    val pairs = MinHashLsh.candidatePairs(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((3L, 4L)))
  }

  test("jaccard verify: near-dup scores high, exact dup = 1.0") {
    val cands = Seq((1L, 2L), (3L, 4L), (1L, 1L)).toDF("id_a", "id_b")
    val scored = NGramJaccard.verifyPairs(cands, docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(scored((1L, 1L)) == 1.0)
    assert(scored((1L, 2L)) > 0.7)
    assert(scored((3L, 4L)) == 0.0)
  }

  test("simhash: identical text → hamming 0; near-dup close; unrelated far") {
    val fp = docs.select($"doc_id", SimHash.simhashBits($"text").as("f"))
    val fps = fp.as[(Long, String)].collect().toMap
    assert(fps(1L).length == 64 && fps(1L).forall(c => c == '0' || c == '1'))
    def ham(a: String, b: String) = a.zip(b).count(p => p._1 != p._2)
    assert(ham(fps(1L), fps(2L)) < ham(fps(1L), fps(3L)))
  }

  test("simhash segment-blocked pairs == brute force at small scale") {
    val got = SimHash.nearDuplicatePairs(docs, "doc_id", "text", maxHamming = 16)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // brute force via collected fingerprints
    val fps = docs.select($"doc_id", SimHash.simhashBits($"text").as("f"))
      .as[(Long, String)].collect()
    val want = (for {
      (ia, fa) <- fps; (ib, fb) <- fps
      if ia < ib && fa.zip(fb).count(p => p._1 != p._2) <= 16
    } yield (ia, ib)).toSet
    assert(got == want)
  }

  test("jaccard pairsWithin blocks by column and respects threshold") {
    val blocked = docs.withColumn("blk", lit(1))
    val out = NGramJaccard.pairsWithin(blocked, "doc_id", "text", "blk", 3, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L)))
  }

  test("incremental LSH pairs == full pairs filtered to new-side membership") {
    val full = MinHashLsh.candidatePairs(docs, "doc_id", "text", 3, 12, 4)
      .as[(Long, Long)].collect().toSet
    val newIds = docs.select("doc_id").as[Long].collect().filter(_ % 2 == 0).toSet
    val corpusIndex = MinHashLsh.bandedTable(docs, "doc_id", "text", 3, 12, 4)
    val newBanded = MinHashLsh.bandedTable(
      docs.filter($"doc_id" % 2 === 0), "doc_id", "text", 3, 12, 4)
    val incr = MinHashLsh.candidatePairsAgainst(newBanded, corpusIndex, "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(incr == full.filter(p => newIds(p._1) || newIds(p._2)))
  }

  test("packBits64 keeps the bit pattern (sign half included); generic fingerprint pairs == brute force") {
    // top bit set -> negative long, but xor/bit_count see the same 64 bits
    val one = ("1" + "0" * 63, java.lang.Long.MIN_VALUE)
    val mix = ("10" * 32, 0xAAAAAAAAAAAAAAAAL)
    val got = Seq(one._1, mix._1).toDF("fp")
      .select(SimHash.packBits64($"fp")).as[Long].collect().toSeq
    assert(got == Seq(one._2, mix._2))
    // four 64-bit fingerprints with known pairwise distances
    val base = "0" * 64
    def flip(s: String, idxs: Int*) = idxs.foldLeft(s)((acc, i) => acc.updated(i, '1'))
    val fps = Seq(
      (1L, base), (2L, flip(base, 0, 7)), // d(1,2)=2
      (3L, flip(base, 40, 41, 42, 43, 44)), // d(1,3)=5 > 3
      (4L, flip(base, 0))) // d(1,4)=1, d(2,4)=1
    val fp = fps.toDF("id", "fp").select($"id", $"fp", SimHash.packBits64($"fp").as("fpl"))
    val pairs = SimHash.pairsFromFingerprints(fp, "id", "fp", "fpl", 64, 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Long)].collect().toSet
    val brute = (for {
      (ia, fa) <- fps; (ib, fb) <- fps
      if ia < ib
      d = fa.zip(fb).count(p => p._1 != p._2) if d <= 3
    } yield (ia, ib, d.toLong)).toSet
    assert(pairs == brute && brute.nonEmpty)
  }

  test("prefix join: exactly the brute-force Jaccard pairs — no false negatives") {
    // 10 docs: 1/2 are near-dups, 5/6 are exact dups, rest unrelated plus
    // one empty and one too-short doc (single-shingle sets)
    val corpus = docs.union(Seq(
      (5L, "shared exact duplicate body for the pair five and six to match"),
      (6L, "shared exact duplicate body for the pair five and six to match"),
      (7L, ""),
      (8L, "tiny doc"),
      (9L, "tiny doc")).toDF("doc_id", "text"))
    val got = graft.dedup.PrefixJoin
      .jaccardPairs(corpus, "doc_id", "text", shingleSize = 3, tNum = 1, tDen = 2)
      .as[(Long, Long, Double)].collect().toSet
    // brute force over every pair (the thing prefix filtering must equal)
    val sets = corpus.select($"doc_id",
        NGramJaccard.shingleSet($"text", 3).as("s"))
      .as[(Long, Seq[String])].collect().toMap
    val brute = (for {
      a <- sets.keys; b <- sets.keys
      if a < b && sets(a).nonEmpty && sets(b).nonEmpty
      o = sets(a).toSet.intersect(sets(b).toSet).size
      u = sets(a).size + sets(b).size - o
      if o * 2 >= u
    } yield (a, b, o.toDouble / u)).toSet
    assert(got == brute)
    assert(got.exists { case (a, b, j) => (a, b) == (5L, 6L) && j == 1.0 }) // exact dup
    assert(got.exists { case (a, b, _) => (a, b) == (8L, 9L) }) // single-shingle dup
    assert(got.contains((1L, 2L, got.find(p => p._1 == 1L && p._2 == 2L).get._3))) // near-dup found
    // t = 1 degenerates to identical-set pairs only: prefix length 1 (the
    // single rarest shingle) and the threshold forces o == na == nb
    val exact = graft.dedup.PrefixJoin
      .jaccardPairs(corpus, "doc_id", "text", shingleSize = 3, tNum = 1, tDen = 1)
      .as[(Long, Long, Double)].collect().toSet
    assert(exact == Set((5L, 6L, 1.0), (8L, 9L, 1.0)))
  }

  test("containment join: exactly the brute-force directed pairs; catches doc-in-doc") {
    // doc 11 is doc 10 plus a long tail: Jaccard is low (size imbalance)
    // but containment(10 -> 11) is 1
    val corpus = docs.union(Seq(
      (10L, "alpha beta gamma delta epsilon"),
      (11L, "alpha beta gamma delta epsilon plus a very long unrelated tail " +
        "of extra words that dilutes the union far below any jaccard cut"),
      (12L, "")).toDF("doc_id", "text"))
    val got = graft.dedup.PrefixJoin
      .containmentPairs(corpus, "doc_id", "text", shingleSize = 3, tNum = 2, tDen = 3)
      .as[(Long, Long, Double)].collect().toSet
    val sets = corpus.select($"doc_id",
        NGramJaccard.shingleSet($"text", 3).as("s"))
      .as[(Long, Seq[String])].collect().toMap
    val brute = (for {
      a <- sets.keys; b <- sets.keys
      if a != b && sets(a).nonEmpty && sets(b).nonEmpty
      o = sets(a).toSet.intersect(sets(b).toSet).size
      if o * 3 >= sets(a).size * 2
    } yield (a, b, o.toDouble / sets(a).size)).toSet
    assert(got == brute)
    assert(got.contains((10L, 11L, 1.0))) // sub swallowed by super
    assert(!got.exists { case (a, b, _) => (a, b) == (11L, 10L) }) // not symmetric
    // the symmetric join must MISS the swallowed doc at the same threshold
    val jac = graft.dedup.PrefixJoin
      .jaccardPairs(corpus, "doc_id", "text", shingleSize = 3, tNum = 2, tDen = 3)
      .as[(Long, Long, Double)].collect().toSet
    assert(!jac.exists { case (a, b, _) => (a, b) == (10L, 11L) })
  }

  test("hard negatives: hardest different-label neighbor, ties to lowest id") {
    import graft.sim.Similarity
    val emb = Seq(
      (0L, Array(1f, 0f), 0),
      (1L, Array(0.9f, 0.1f), 0), // same label — never a negative
      (2L, Array(0.8f, 0.6f), 1),
      (3L, Array(0f, 1f), 1),
      (4L, Array(1f, 0f), 2)) // identical direction to anchor, label 2
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(
      emb.filter($"vec_id" === 0), emb, "vec_id", "embedding", "label")
      .as[(Long, Long, Double)].collect().toSeq
    // cos(anchor, 4) = 1.0 beats cos(anchor, 2) ≈ 0.8; label-0 vec 1 excluded
    assert(out == Seq((0L, 4L, 1.0)))
  }

  test("semanticDedup: within-cluster first-wins drop, cross-cluster pairs never compared") {
    import graft.sim.Similarity
    // two orthogonal directions; Lloyd (k=2, iters=2, init = ids 0,1)
    // converges to x-axis {0,1} vs y-axis {2,3}; within each cluster the
    // colinear pair has cosine 1 ≥ 0.3 → higher id dropped. 0 and 2 are
    // orthogonal but in DIFFERENT clusters — never even compared.
    val emb = Seq(
      (0L, Array(1f, 0f)), (1L, Array(2f, 0f)),
      (2L, Array(0f, 1f)), (3L, Array(0f, 3f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.semanticDedup(emb, "vec_id", "embedding",
      k = 2, iters = 2, minCosine = 0.3)
      .as[(Long, Long, Boolean)].collect()
      .map { case (id, c, kept) => id -> (c, kept) }.toMap
    assert(got(0L)._2 && got(2L)._2, "lowest id per direction survives")
    assert(!got(1L)._2 && !got(3L)._2, "colinear higher ids are dropped")
    assert(got(0L)._1 == got(1L)._1 && got(2L)._1 == got(3L)._1)
    assert(got(0L)._1 != got(2L)._1)
  }
}
