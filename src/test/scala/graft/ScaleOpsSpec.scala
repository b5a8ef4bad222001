package graft

import graft.dedup.SubstringDup
import graft.load.Splits
import graft.operators.{Eval, HistogramSketch, IntervalJoin}
import org.apache.spark.sql.functions._

class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---------- SubstringDup ----------

  test("dupNgramCoverage: shared 8-gram across docs marks both spans") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),          // 10 tokens, gram at pos 1 shared
      (2L, "x a b c d e f g h k"),          // 10 tokens, gram at pos 2 shared
      (3L, "totally unrelated words here")) // 4 tokens, < n
      .toDF("doc_id", "text")
    val r = SubstringDup.dupNgramCoverage(docs, "doc_id", "text", n = 8)
      .orderBy("doc_id").collect()
    assert(r.length == 3)
    val d1 = r(0)
    assert(d1.getAs[Long]("n_tokens") == 10L)
    assert(d1.getAs[Long]("n_dup_grams") == 1L)
    assert(d1.getAs[Long]("dup_tokens") == 8L)
    assert(d1.getAs[Long]("cov_micro") == 800000L) // 8e6 div 10
    val d2 = r(1)
    assert(d2.getAs[Long]("dup_tokens") == 8L && d2.getAs[Long]("cov_micro") == 800000L)
    val d3 = r(2)
    assert(d3.getAs[Long]("n_tokens") == 4L && d3.getAs[Long]("n_dup_grams") == 0L &&
      d3.getAs[Long]("dup_tokens") == 0L && d3.getAs[Long]("cov_micro") == 0L)
  }

  test("dupNgramCoverage: overlapping intervals merge, never double-count") {
    // 9 identical tokens: grams at pos 1 and 2 are both "t ×8" (corpus
    // count 2 ≥ minCount) — intervals [1,8] and [2,9] must union to 9
    val docs = Seq((1L, Seq.fill(9)("t").mkString(" "))).toDF("doc_id", "text")
    val r = SubstringDup.dupNgramCoverage(docs, "doc_id", "text", n = 8).collect()(0)
    assert(r.getAs[Long]("n_tokens") == 9L)
    assert(r.getAs[Long]("n_dup_grams") == 2L)
    assert(r.getAs[Long]("dup_tokens") == 9L) // merged, not 16
    assert(r.getAs[Long]("cov_micro") == 1000000L)
  }

  test("dupNgramCoverage: unique text has zero coverage; empty text is 0/0") {
    val docs = Seq(
      (1L, (1 to 20).map(i => s"w$i").mkString(" ")),
      (2L, "")).toDF("doc_id", "text")
    val r = SubstringDup.dupNgramCoverage(docs, "doc_id", "text", n = 8)
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("n_tokens") == 20L && r(0).getAs[Long]("dup_tokens") == 0L)
    assert(r(1).getAs[Long]("n_tokens") == 0L && r(1).getAs[Long]("cov_micro") == 0L)
  }

  // ---------- IntervalJoin ----------

  test("overlapJoin matches the brute-force non-equi join, once per pair") {
    // deterministic pseudo-random intervals spanning many 10-unit buckets
    val left = (0 until 60).map { i =>
      val s = (i * 37) % 400; (s"L$i", s.toLong, (s + (i * 13) % 45).toLong)
    }.toDF("lid", "ls", "le")
    val right = (0 until 25).map { j =>
      val s = (j * 91) % 380; (s"R$j", s.toLong, (s + (j * 7) % 60).toLong)
    }.toDF("rid", "rs", "re")
    val got = IntervalJoin.overlapJoin(left, "ls", "le", right, "rs", "re", grain = 10L)
      .select("lid", "rid").as[(String, String)].collect().sorted
    val want = left.crossJoin(right)
      .filter(greatest($"ls", $"rs") <= least($"le", $"re"))
      .select("lid", "rid").as[(String, String)].collect().sorted
    assert(want.nonEmpty, "fixture must produce overlaps")
    assert(got.toSeq == want.toSeq) // exact pairs, no dupes from shared buckets
  }

  test("overlapJoin: salted hot-bucket guard emits identical pairs") {
    // same fixture as the brute-force test; saltBuckets only widens the
    // join key (bucket, content salt) — the output set must not change
    val left = (0 until 60).map { i =>
      val s = (i * 37) % 400; (s"L$i", s.toLong, (s + (i * 13) % 45).toLong)
    }.toDF("lid", "ls", "le")
    val right = (0 until 25).map { j =>
      val s = (j * 91) % 380; (s"R$j", s.toLong, (s + (j * 7) % 60).toLong)
    }.toDF("rid", "rs", "re")
    val plain = IntervalJoin.overlapJoin(left, "ls", "le", right, "rs", "re", grain = 10L)
      .select("lid", "rid").as[(String, String)].collect().sorted
    val salted = IntervalJoin
      .overlapJoin(left, "ls", "le", right, "rs", "re", grain = 10L, saltBuckets = 7)
      .select("lid", "rid").as[(String, String)].collect().sorted
    assert(salted.toSeq == plain.toSeq)
    // reserved-name guard covers the salt columns too
    intercept[IllegalArgumentException] {
      IntervalJoin.overlapJoin(
        left.withColumnRenamed("lid", "_salt"), "ls", "le", right, "rs", "re", 10L)
    }
  }

  test("overlapJoin: degenerate intervals never match; touching endpoints do") {
    val left = Seq(("a", 5L, 10L), ("bad", 9L, 3L)).toDF("lid", "ls", "le")
    val right = Seq(("t", 10L, 20L), ("apart", 11L, 12L)).toDF("rid", "rs", "re")
    val got = IntervalJoin.overlapJoin(left, "ls", "le", right, "rs", "re", grain = 4L)
      .select("lid", "rid").as[(String, String)].collect().toSet
    assert(got == Set(("a", "t"))) // inclusive ends touch at 10; [9,3] dropped
  }

  // ---------- Eval.recallAtK ----------

  test("recallAtK: hand case with two cutoffs and an n_rel=0 query") {
    val ranked = Seq(
      ("q1", "d1", 1L), ("q1", "d2", 2L), ("q1", "d3", 6L),
      ("q2", "d9", 1L), ("q2", "d8", 2L)).toDF("query", "doc", "rank")
    val rel = Seq(("q1", "d2"), ("q1", "d3"), ("q1", "dX")).toDF("query", "doc")
    val rt = Seq(("q1", 3L), ("q2", 0L)).toDF("query", "n_rel")
    val r = Eval.recallAtK(ranked, rel, rt, "query", "doc", ks = Seq(2, 10))
      .orderBy("query").collect()
    val q1 = r(0)
    assert(q1.getAs[Long]("hits_at_2") == 1L)  // only d2 within rank 2
    assert(q1.getAs[Long]("hits_at_10") == 2L) // d2 + d3 (rank 6)
    assert(math.abs(q1.getAs[Double]("recall_at_2") - 1.0 / 3) < 1e-12)
    assert(math.abs(q1.getAs[Double]("recall_at_10") - 2.0 / 3) < 1e-12)
    val q2 = r(1)
    assert(q2.getAs[Long]("hits_at_2") == 0L)
    assert(q2.isNullAt(q2.fieldIndex("recall_at_2"))) // undefined, not 0
  }

  // ---------- Splits.groupKFold ----------

  test("groupKFold: same group always lands in the same fold, folds in [0,k)") {
    val df = (1 to 300).map(i => (i.toLong % 17, i)).toDF("g", "v")
    val folded = Splits.groupKFold(df, $"g", k = 5)
    val perGroup = folded.groupBy("g").agg(countDistinct("fold").as("nf"))
      .agg(max("nf")).as[Long].collect()(0)
    assert(perGroup == 1L)
    val range = folded.agg(min("fold"), max("fold")).as[(Long, Long)].collect()(0)
    assert(range._1 >= 0L && range._2 <= 4L)
    // md5-pinned: fold of group 0 is reproducible across engines/runs
    val f0 = folded.filter($"g" === 0L).select("fold").distinct().as[Long].collect()(0)
    val f0again = Splits.groupKFold(df, $"g", k = 5)
      .filter($"g" === 0L).select("fold").distinct().as[Long].collect()(0)
    assert(f0 == f0again)
  }

  // ---------- HistogramSketch ----------

  test("quantileEdges: known distribution reads exact bin edges") {
    // 100 values 0..99, width 10 → bins 0..9 of 10 each; p50 target
    // ceil(0.5·100)=50 → first bin with cum ≥ 50 is bin 4 (cum 50)
    val df = (0L until 100L).toDF("v")
    val r = HistogramSketch.quantileEdges(df, "v", width = 10L,
      quantilesPermille = Seq(500, 950, 990)).orderBy("q_permille").collect()
    assert(r.map(_.getAs[Int]("q_permille")).toSeq == Seq(500, 950, 990))
    val p50 = r(0)
    assert(p50.getAs[Long]("bin") == 4L && p50.getAs[Long]("lo") == 40L &&
      p50.getAs[Long]("hi") == 49L && p50.getAs[Long]("cum_le") == 50L &&
      p50.getAs[Long]("n") == 100L)
    assert(r(1).getAs[Long]("bin") == 9L) // p95 → cum 95 ≥ 95 first at bin 9
    assert(r(2).getAs[Long]("bin") == 9L)
  }

  // ---------- DupClusters.keepBest ----------

  test("keepBest: highest quality survives, ties break to smallest id, outsiders pass") {
    val corpus = Seq((1L, 5L), (2L, 9L), (3L, 9L), (4L, 1L))
      .toDF("doc_id", "quality")
    val comp = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("node", "component")
    val kept = graft.dedup.DupClusters.keepBest(corpus, "doc_id", "quality", comp)
      .select("doc_id").as[Long].collect().sorted
    // cluster {1,2,3}: max quality 9 held by 2 and 3 → smallest id 2; 4 untouched
    assert(kept.toSeq == Seq(2L, 4L))
  }

  test("keepBest: NULL quality loses to any real score; all-null falls back to min id") {
    val corpus = Seq(
      (1L, Some(3L)), (2L, None),           // cluster A: real 3 beats null
      (5L, Option.empty[Long]), (6L, None)) // cluster B: all null → min id 5
      .toDF("doc_id", "quality")
    val comp = Seq((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L)).toDF("node", "component")
    val kept = graft.dedup.DupClusters.keepBest(corpus, "doc_id", "quality", comp)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 5L))
  }

  // ---------- TextAnalysis.tokenEntropy ----------

  test("tokenEntropy: uniform distribution hits ln(n), constant hits zero") {
    val docs = Seq((1L, "a b c d"), (2L, "a a a a"), (3L, "")).toDF("doc_id", "text")
    val r = graft.text.TextAnalysis.tokenEntropy(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val uni = r(0) // 4 singleton types: Σ c·lnµ(c) = 0 → H = lnµ(4)
    assert(uni.getAs[Long]("n_tokens") == 4L && uni.getAs[Long]("n_types") == 4L)
    assert(uni.getAs[Long]("h_micro") == math.floor(math.log(4.0) * 1e6 + 0.5).toLong)
    assert(math.abs(uni.getAs[Double]("h_norm") - 1.0) < 1e-12)
    val const = r(1) // one type: H = lnµ(4) − (4·lnµ(4)) div 4 = 0
    assert(const.getAs[Long]("n_types") == 1L && const.getAs[Long]("h_micro") == 0L)
    assert(const.getAs[Double]("h_norm") == 0.0)
    val empty = r(2)
    assert(empty.getAs[Long]("n_tokens") == 0L && empty.getAs[Long]("h_micro") == 0L)
    assert(empty.isNullAt(empty.fieldIndex("h_norm")))
  }

  test("quantileEdges: bin counts merge by addition (sketch mergeability)") {
    val a = (0L until 50L).toDF("v")
    val b = (50L until 100L).toDF("v")
    val merged = HistogramSketch.quantileEdges(a.union(b), "v", 10L, Seq(500))
      .collect()(0)
    val direct = HistogramSketch.quantileEdges((0L until 100L).toDF("v"), "v", 10L, Seq(500))
      .collect()(0)
    assert(merged.getAs[Long]("bin") == direct.getAs[Long]("bin") &&
      merged.getAs[Long]("cum_le") == direct.getAs[Long]("cum_le"))
  }

  // ---------- Splits.timeSeriesFolds ----------

  test("timeSeriesFolds: rolling-origin boundaries over equal-count chunks") {
    val df = (1L to 12L).map(t => (t, t * 10)).toDF("t", "id")
    val r = graft.operators.Splits.timeSeriesFolds(df, Seq("t", "id"), k = 2)
      .orderBy("fold").collect()
    assert(r.length == 2)
    assert(r(0).getAs[Long]("n_train") == 4L && r(0).getAs[Long]("train_end") == 4L)
    assert(r(0).getAs[Long]("n_test") == 4L && r(0).getAs[Long]("test_start") == 5L)
    assert(r(0).getAs[Long]("test_end") == 8L)
    assert(r(0).getAs[Long]("n_boundary_ties") == 0L)
    assert(r(1).getAs[Long]("n_train") == 8L && r(1).getAs[Long]("train_end") == 8L)
    assert(r(1).getAs[Long]("n_test") == 4L && r(1).getAs[Long]("test_end") == 12L)
  }

  test("timeSeriesFolds: a test row tied to train_end is counted as a leak") {
    // order (t, id): chunk 1 = (1,1)..(1,4), chunk 2 = (1,5),(2,6),(2,7),(2,8)
    val df = Seq((1L, 1L), (1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L),
      (2L, 6L), (2L, 7L), (2L, 8L)).toDF("t", "id")
    val r = graft.operators.Splits.timeSeriesFolds(df, Seq("t", "id"), k = 1)
      .collect()(0)
    assert(r.getAs[Long]("train_end") == 1L && r.getAs[Long]("test_start") == 1L)
    assert(r.getAs[Long]("n_boundary_ties") == 1L)
  }

  // ---------- Conformal.splitConformal ----------

  test("splitConformal: constant series gives qhat 0 and full coverage") {
    val df = (1L to 400L).map(i => ("g", 7L, i)).toDF("grp", "y", "id")
    val r = graft.operators.Conformal
      .splitConformal(df, Seq("grp"), "y", "id", alphaPermille = 100)
      .collect()(0)
    assert(r.getAs[Long]("n_train") + r.getAs[Long]("n_cal") +
      r.getAs[Long]("n_test") == 400L)
    assert(r.getAs[Long]("mu_micro") == 7000000L)
    val nCal = r.getAs[Long]("n_cal")
    assert(r.getAs[Long]("k_idx") == ((nCal + 1) * 900 + 999) / 1000)
    assert(r.getAs[Long]("qhat") == 0L)
    assert(r.getAs[Long]("n_covered") == r.getAs[Long]("n_test"))
    assert(r.getAs[Double]("coverage") == 1.0)
  }

  test("splitConformal: qhat is the exact k-th smallest calibration residual") {
    import graft.load.{Splits => LSplits}
    val df = (1L to 600L).map(i => ("g", i % 13, i)).toDF("grp", "y", "id")
    val r = graft.operators.Conformal
      .splitConformal(df, Seq("grp"), "y", "id", alphaPermille = 200)
      .collect()(0)
    // recompute from the public split + emitted mu: the op's qhat must be
    // the k_idx-th smallest |10⁶·y − mu| among the calibration rows
    val mu = r.getAs[Long]("mu_micro")
    val res = df
      .withColumn("_s", LSplits.assignSplit(col("id"),
        Seq("train" -> 2, "cal" -> 1, "test" -> 1)))
      .filter(col("_s") === "cal")
      .select(abs(col("y") * 1000000L - lit(mu)).as("r"))
      .collect().map(_.getLong(0)).sorted
    assert(r.getAs[Long]("n_cal") == res.length.toLong)
    val k = r.getAs[Long]("k_idx").toInt
    assert(r.getAs[Long]("qhat") == res(k - 1))
  }

  test("splitConformal: tiny calibration set leaves the interval unbounded (NULLs)") {
    val df = (1L to 20L).map(i => ("g", i, i)).toDF("grp", "y", "id")
    val r = graft.operators.Conformal
      .splitConformal(df, Seq("grp"), "y", "id", alphaPermille = 100)
      .collect()(0)
    assert(r.getAs[Long]("k_idx") > r.getAs[Long]("n_cal"))
    assert(r.isNullAt(r.fieldIndex("qhat")))
    assert(r.isNullAt(r.fieldIndex("n_covered")))
    assert(r.isNullAt(r.fieldIndex("coverage")))
  }

  test("splitConformal: a NULL group key keeps its own row (null-safe join-backs)") {
    val df = (1L to 300L).map(i => (if (i % 2 == 0) "g" else null, 5L, i))
      .toDF("grp", "y", "id")
    val r = graft.operators.Conformal
      .splitConformal(df, Seq("grp"), "y", "id")
      .collect()
    assert(r.length == 2)
    assert(r.exists(_.isNullAt(0)) && r.exists(row => row.getString(0) == "g"))
  }

  // ---------- TimeSeries.changepointBss ----------

  test("changepointBss: planted mean shift found with exact BSS") {
    val df = (1L to 8L).map(t => ("a", t, if (t <= 4) 0L else 10L))
      .toDF("grp", "t", "y")
    val r = graft.operators.TimeSeries
      .changepointBss(df, Seq("grp"), "t", "y").collect()(0)
    assert(r.getAs[Long]("n") == 8L)
    assert(r.getAs[Long]("t_star") == 4L && r.getAs[Long]("at_order") == 4L)
    // d = 8·0 − 4·40 = −160; bss = 160² div (4·4) = 1600
    assert(r.getAs[Long]("bss") == 1600L)
    assert(r.getAs[Long]("mean_left_micro") == 0L)
    assert(r.getAs[Long]("mean_right_micro") == 10000000L)
  }

  test("changepointBss: tied splits break to the earliest t") {
    // y = (0, 10, 0): t=1 and t=2 both score d²/den = 100/2 = 50
    val df = Seq(("a", 1L, 0L), ("a", 2L, 10L), ("a", 3L, 0L)).toDF("grp", "t", "y")
    val r = graft.operators.TimeSeries
      .changepointBss(df, Seq("grp"), "t", "y").collect()(0)
    assert(r.getAs[Long]("bss") == 50L && r.getAs[Long]("t_star") == 1L)
  }

  test("changepointBss: a 1-point series has no split — NULL payload, row kept") {
    val df = Seq(("a", 1L, 5L)).toDF("grp", "t", "y")
    val r = graft.operators.TimeSeries
      .changepointBss(df, Seq("grp"), "t", "y").collect()(0)
    assert(r.getAs[Long]("n") == 1L)
    assert(r.isNullAt(r.fieldIndex("t_star")) && r.isNullAt(r.fieldIndex("bss")))
  }

  test("changepointBss: argmax survives scores past Long.MaxValue (decimal path)") {
    // nine zeros then Y = 2e9: score(t) = t·Y²/(10−t) peaks at t=9 with
    // 9·4e18 ≈ 3.6e19 > Long.MaxValue. A long-valued score would NULL at
    // t ≥ 7 and silently hand the argmax to t=6; the decimal argmax must
    // keep t_star = 9 and only the EMITTED bss goes NULL (doesn't fit).
    val df = ((1L to 9L).map(t => ("a", t, 0L)) :+ (("a", 10L, 2000000000L)))
      .toDF("grp", "t", "y")
    val r = graft.operators.TimeSeries
      .changepointBss(df, Seq("grp"), "t", "y").collect()(0)
    assert(r.getAs[Long]("n") == 10L)
    assert(r.getAs[Long]("t_star") == 9L, s"argmax shifted: $r")
    assert(r.isNullAt(r.fieldIndex("bss")), "winning score exceeds long — explicit NULL")
    assert(r.getAs[Long]("mean_left_micro") == 0L)
    assert(r.getAs[Long]("mean_right_micro") == 2000000000000000L)
  }

  test("splitConformal: fractional y quantizes once via floor(1e6·y + 0.5)") {
    // constant y = 2.5: a cast-then-scale path would floor every y to 2
    // and compute the guarantee on a different statistic — the pin recipe
    // must land mu at exactly 2.5e6 micro-units with zero residuals
    val df = (1L to 400L).map(i => ("g", 2.5, i)).toDF("grp", "y", "id")
    val r = graft.operators.Conformal
      .splitConformal(df, Seq("grp"), "y", "id", alphaPermille = 100)
      .collect()(0)
    assert(r.getAs[Long]("mu_micro") == 2500000L)
    assert(r.getAs[Long]("qhat") == 0L)
    assert(r.getAs[Double]("coverage") == 1.0)
  }
}
