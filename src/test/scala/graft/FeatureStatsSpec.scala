package graft

import graft.operators.Experiment
import graft.sim.Similarity
import graft.text.Vocab
import org.apache.spark.sql.functions._

/** Corpus-statistics + feature operators: Good-Turing, Heaps, Zipf,
  * feature hashing, embedding dim stats, SRM, MDE.
  */
class FeatureStatsSpec extends SparkSpec {
  import spark.implicits._

  test("frequencyOfFrequencies counts the count-of-counts and adjusts") {
    // counts: a:3, b:1, c:1, d:2 → n_1=2, n_2=1, n_3=1
    val df = Seq("a a a b", "c d d").toDF("text")
    val ff = Vocab.frequencyOfFrequencies(df, "text", maxR = 3)
      .orderBy("r").as[(Long, Long, Option[Double])].collect()
    assert(ff.map(t => (t._1, t._2)).toSeq == Seq((1L, 2L), (2L, 1L), (3L, 1L)))
    assert(ff(0)._3.contains(1.0)) // gt_1 = 2·n_2/n_1 = 2·1/2
    assert(ff(1)._3.contains(3.0)) // gt_2 = 3·n_3/n_2
    assert(ff(2)._3.isEmpty) // no n_4 → NULL
  }

  test("vocabGrowth is cumulative and ends at corpus totals") {
    val df = Seq((0L, "a b"), (1L, "a c"), (2L, "a b c d")).toDF("doc_id", "text")
    val g = Vocab.vocabGrowth(df, "doc_id", "text", buckets = 3)
      .orderBy("bucket").as[(Long, Long, Long)].collect()
    assert(g.map(_._1).toSeq == Seq(0L, 1L, 2L))
    assert(g.last._2 == 8L) // all tokens
    assert(g.last._3 == 4L) // distinct types a b c d
    assert(g.map(_._2).sameElements(g.map(_._2).sorted)) // monotone
    assert(g.head._3 == 2L) // doc 0 introduces a, b
  }

  test("zipfFit recovers a negative slope on rank-decaying counts") {
    // frequencies 8,4,2,1 → ln f = ln 8 − rank-ish decay, slope < 0
    val words = Seq.fill(8)("w1") ++ Seq.fill(4)("w2") ++ Seq.fill(2)("w3") ++ Seq("w4")
    val df = Seq(words.mkString(" ")).toDF("text")
    val row = Vocab.zipfFit(df, "text", topK = 4).head()
    assert(row.getAs[Long]("n_terms") == 4L)
    assert(row.getAs[Double]("slope") < -0.9)
  }

  test("hashedFeatures is deterministic with bounded indices") {
    val df = Seq((1L, "alpha beta gamma alpha")).toDF("id", "text")
    val f = Vocab.hashedFeatures(df, "id", "text", dims = 16)
      .as[(Long, Long, Long)].collect().sortBy(_._2)
    assert(f.forall(t => t._2 >= 0 && t._2 < 16))
    // |weight| of the doubled token is 2 somewhere
    assert(f.map(t => math.abs(t._3)).max == 2L)
    val again = Vocab.hashedFeatures(df, "id", "text", dims = 16)
      .as[(Long, Long, Long)].collect().sortBy(_._2)
    assert(f.sameElements(again))
  }

  test("embeddingDimStats per-dim moments are exact") {
    val df = Seq(
      Tuple1(Array(1.0f, -0.5f)),
      Tuple1(Array(3.0f, 0.5f))).toDF("embedding")
    val s = Similarity.embeddingDimStats(df, "embedding")
      .orderBy("dim").collect()
    assert(s(0).getAs[Long]("mean_micro") == 2000000L)
    assert(s(0).getAs[Long]("min_micro") == 1000000L)
    assert(s(0).getAs[Long]("max_micro") == 3000000L)
    assert(s(1).getAs[Long]("mean_micro") == 0L)
    // std of {1,3} = sqrt(2) → 1414213.56 micro
    assert(math.abs(s(0).getAs[Double]("std_micro") - math.sqrt(2) * 1e6) < 1.0)
  }

  test("srmCheck flags a gross imbalance and passes a fair split") {
    val fair = (1 to 1000).map(i => if (i % 2 == 0) "a" else "b").toDF("v")
    assert(Experiment.srmCheck(fair, "v").select("srm").head().getBoolean(0) == false)
    val broken = (Seq.fill(900)("a") ++ Seq.fill(100)("b")).toDF("v")
    val r = Experiment.srmCheck(broken, "v").orderBy("variant").collect()
    assert(r.forall(_.getBoolean(3)))
    // chi2 = (2·900−1000)² + (2·100−1000)² over 2·1000 = (640000+640000)/2000
    assert(math.abs(r.head.getAs[Double]("chi2") - 640.0) < 1e-9)
  }

  test("srmCheck uses the df=k−1 critical value beyond 4 variants") {
    // fair 5-way split: chi2 = 0 must NOT flag under the df=4 cutoff
    val fair5 = (1 to 1000).map(i => s"v${i % 5}").toDF("v")
    val r5 = Experiment.srmCheck(fair5, "v").collect()
    assert(r5.forall(!_.getBoolean(3)))
    // 5 variants with one starved arm — far above the df=4 cutoff of 18.467
    val broken5 = (Seq.fill(300)("a") ++ Seq.fill(300)("b") ++ Seq.fill(300)("c") ++
      Seq.fill(99)("d") ++ Seq.fill(1)("e")).toDF("v")
    val rb = Experiment.srmCheck(broken5, "v").collect()
    assert(rb.forall(_.getBoolean(3))) // gross starvation flags at df=4 too
    // 12 variants: outside the tabulated range → srm is NULL, not a guess
    val many = (1 to 1200).map(i => s"v${i % 12}").toDF("v")
    val rm = Experiment.srmCheck(many, "v").collect()
    assert(rm.forall(_.isNullAt(3)))
  }

  test("mdeBinomial yields an all-null row for arity != 2") {
    val three = Seq(("a", 1L), ("b", 0L), ("c", 1L)).toDF("v", "cv")
    val r3 = Experiment.mdeBinomial(three, "v", "cv").head()
    assert((0 until r3.length).forall(r3.isNullAt)) // no silent min/max pick
    val one = Seq(("a", 1L), ("a", 0L)).toDF("v", "cv")
    val r1 = Experiment.mdeBinomial(one, "v", "cv").head()
    assert((0 until r1.length).forall(r1.isNullAt)) // no double-counted lone variant
  }

  test("documentScores scores rare bigrams as more surprising") {
    val df = Seq(
      (0L, "a b a b a b a b"), // all common bigrams
      (1L, "a b a b x y"), // one rare bigram pair
      (2L, "z") // no bigrams at all
    ).toDF("doc_id", "text")
    val s = graft.text.NgramLm.documentScores(df, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    assert(s(2) == ((2L, 0L, 0L))) // bigram-less doc scores 0, not null
    assert(s(0)._2 == 7L && s(1)._2 == 5L)
    assert(s(1)._3 > s(0)._3) // rare x/y bigrams raise mean surprisal
  }

  test("documentScores charges unseen bigrams the floor surprisal (external LM)") {
    // external LM covering only a→b: a document of entirely-unseen bigrams
    // must score the PINNED FLOOR −ln 1e-9 = 20723266 micro-nats, the
    // most-IMPROBABLE score — not 0, which would invert the quality filter
    val lmCounts = Seq(("a", "b", 10L)).toDF("v", "w", "c_vw")
    val docs = Seq((0L, "x y z"), (1L, "a b")).toDF("doc_id", "text")
    val s = graft.text.NgramLm.documentScores(docs, "doc_id", "text", lmCounts)
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    assert(s(0)._2 == 2L) // both x→y, y→z counted, not dropped
    assert(s(0)._3 == 20723266L) // exactly the floor surprisal
    assert(s(1)._3 < s(0)._3) // the covered doc scores more probable
  }

  test("dateSpineGaps finds the missing days and the first gap") {
    val df = Seq(
      ("a", "2024-01-01"), ("a", "2024-01-02"), ("a", "2024-01-04"),
      ("b", "2024-01-01")).toDF("g", "d").select(col("g"), col("d").cast("date").as("d"))
    val r = graft.operators.TimeSeries.dateSpineGaps(df, Seq("g"), "d")
      .orderBy("g").collect()
    assert(r(0).getAs[Long]("n_expected_days") == 4L) // global span 01-01..01-04
    assert(r(0).getAs[Long]("n_missing_days") == 1L)
    assert(r(0).getAs[java.sql.Date]("first_missing").toString == "2024-01-03")
    assert(r(1).getAs[Long]("n_present_days") == 1L)
    assert(r(1).getAs[java.sql.Date]("first_missing").toString == "2024-01-02")
  }

  test("dateSpineGaps: a corrupt epoch date fails the span guard loudly") {
    // one epoch-0 row would stretch the spine to ~20k days and multiply
    // EVERY group by it — the guard must throw, not explode the grid
    val df = Seq(
      ("a", "2024-01-01"), ("a", "2024-01-02"),
      ("b", "1970-01-01")) // the corrupt date
      .toDF("g", "d").select(col("g"), col("d").cast("date").as("d"))
    val e = intercept[Exception] {
      graft.operators.TimeSeries.dateSpineGaps(df, Seq("g"), "d").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("maxSpanDays")), s"wrong failure: $e")
    // a deliberately widened horizon still works
    val ok = graft.operators.TimeSeries
      .dateSpineGaps(df, Seq("g"), "d", maxSpanDays = 30000)
      .orderBy("g").collect()
    assert(ok(0).getAs[Long]("n_expected_days") > 19000L)
    // and the guard itself rejects nonsense
    intercept[IllegalArgumentException] {
      graft.operators.TimeSeries.dateSpineGaps(df, Seq("g"), "d", maxSpanDays = 0)
    }
  }

  test("mdeBinomial computes the planning MDE from exact counts") {
    val df = (1 to 200).map { i =>
      (if (i <= 100) "control" else "treatment", if (i % 4 == 0) 1L else 0L)
    }.toDF("v", "cv")
    val row = Experiment.mdeBinomial(df, "v", "cv").head()
    assert(row.getAs[Long]("n_a") == 100L && row.getAs[Long]("n_b") == 100L)
    assert(math.abs(row.getAs[Double]("p_pooled") - 0.25) < 1e-12)
    val expected = (1.959964 + 0.841621) * math.sqrt(2 * 0.25 * 0.75 / 100.0)
    assert(math.abs(row.getAs[Double]("mde_abs") - expected) < 1e-9)
    assert(math.abs(row.getAs[Double]("mde_rel") - expected / 0.25) < 1e-9)
  }
}
