package graft

import graft.operators.{Drift, Eval, Hits, RankStats, TimeSeries}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Brute-force oracles for the round-7 rank-stat / drift batch: every
  * operator's distributed formulation is replayed as a naive O(n²) (or
  * direct-formula) computation on the collected rows — the
  * PropertySpec pattern. Generated data with fixed seeds.
  */
class RankStatsSpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(1042L + i)))

  private val scoredGen: Gen[List[(Long, Int)]] =
    Gen.listOfN(60, Gen.zip(Gen.choose(0L, 20L), Gen.oneOf(0, 1)))

  test("aucFromScores equals the pairwise-comparison AUC (ties = half)") {
    for (rows <- samples(scoredGen, 5)) {
      val pos = rows.filter(_._2 == 1).map(_._1)
      val neg = rows.filter(_._2 == 0).map(_._1)
      if (pos.nonEmpty && neg.nonEmpty) {
        val brute = pos.iterator.map { p =>
          neg.iterator.map { n =>
            if (p > n) 1.0 else if (p == n) 0.5 else 0.0
          }.sum
        }.sum / (pos.size.toDouble * neg.size.toDouble)
        val got = RankStats.aucFromScores(rows.toDF("score", "label"), "score", "label")
          .select("n_pos", "n_neg", "auc").head()
        assert(got.getLong(0) == pos.size && got.getLong(1) == neg.size)
        assert(math.abs(got.getDouble(2) - brute) < 1e-12,
          s"auc ${got.getDouble(2)} vs brute $brute")
      }
    }
  }

  test("mannWhitney u2 equals twice the pairwise U; z matches the tie-corrected formula") {
    for (rows <- samples(scoredGen, 5)) {
      val a = rows.filter(_._2 == 1).map(_._1) // treatment
      val b = rows.filter(_._2 == 0).map(_._1)
      if (a.size >= 2 && b.size >= 2) {
        // 2U = Σ over (a,b) pairs of 2·[a>b] + 1·[a==b]
        val u2 = a.iterator.map { x =>
          b.iterator.map(y => if (x > y) 2L else if (x == y) 1L else 0L).sum
        }.sum
        val got = RankStats.mannWhitney(rows.toDF("score", "variant"), "score", "variant")
          .select("n1", "n0", "u2", "z").head()
        assert(got.getLong(2) == u2, s"u2 ${got.getLong(2)} vs brute $u2")
        val n1 = a.size.toDouble; val n0 = b.size.toDouble; val n = n1 + n0
        val t3t = rows.groupBy(_._1).map { case (_, g) =>
          val t = g.size.toDouble; t * t * t - t
        }.sum
        val sigma2 = n1 * n0 / 12.0 * ((n + 1) - t3t / (n * (n - 1)))
        if (sigma2 > 0) {
          val zBrute = (u2 / 2.0 - n1 * n0 / 2.0) / math.sqrt(sigma2)
          assert(math.abs(got.getDouble(3) - zBrute) < 1e-9)
        }
      }
    }
  }

  test("spearmanByGroup equals Pearson over mid-ranks computed by hand") {
    val gen: Gen[List[(String, Long, Long)]] = Gen.listOfN(50,
      Gen.zip(Gen.oneOf("g1", "g2"), Gen.choose(0L, 9L), Gen.choose(0L, 9L)))
    def midRanks(vs: Seq[Long]): Map[Long, Double] = {
      val sorted = vs.sorted
      vs.distinct.map { v =>
        val lo = sorted.indexOf(v) + 1
        val hi = sorted.lastIndexOf(v) + 1
        v -> (lo + hi) / 2.0
      }.toMap
    }
    for (rows <- samples(gen, 5); g <- Seq("g1", "g2")) {
      val grp = rows.filter(_._1 == g)
      if (grp.size >= 3) {
        val rx = midRanks(grp.map(_._2)); val ry = midRanks(grp.map(_._3))
        val xs = grp.map(r => rx(r._2)); val ys = grp.map(r => ry(r._3))
        val n = grp.size.toDouble
        val num = n * xs.zip(ys).map { case (x, y) => x * y }.sum - xs.sum * ys.sum
        val dx = n * xs.map(x => x * x).sum - xs.sum * xs.sum
        val dy = n * ys.map(y => y * y).sum - ys.sum * ys.sum
        val out = RankStats.spearmanByGroup(rows.toDF("g", "x", "y"), Seq("g"), "x", "y")
          .filter(col("g") === g).select("n", "rho").head()
        assert(out.getLong(0) == grp.size)
        if (dx != 0 && dy != 0) {
          val brute = num / (math.sqrt(dx) * math.sqrt(dy))
          assert(math.abs(out.getDouble(1) - brute) < 1e-9,
            s"rho ${out.getDouble(1)} vs brute $brute in $g")
        } else assert(out.isNullAt(1))
      }
    }
  }

  test("kendallTauByGroup matches the O(n²) concordance count") {
    val gen: Gen[List[(Long, Long, Long)]] = Gen.listOfN(25,
      Gen.zip(Gen.choose(0L, 1000L), Gen.choose(0L, 5L), Gen.choose(0L, 5L)))
    for (raw <- samples(gen, 5)) {
      val rows = raw.groupBy(_._1).map(_._2.head).toList // unique ord key
      if (rows.size >= 3) {
        val pairs = for {
          i <- rows.indices; j <- rows.indices
          if rows(i)._1 < rows(j)._1
        } yield (rows(i), rows(j))
        val c = pairs.count { case (a, b) =>
          math.signum((b._2 - a._2).toDouble) * math.signum((b._3 - a._3).toDouble) > 0 }
        val d = pairs.count { case (a, b) =>
          math.signum((b._2 - a._2).toDouble) * math.signum((b._3 - a._3).toDouble) < 0 }
        val df = rows.map(r => ("k", r._1, r._2, r._3)).toDF("g", "t", "x", "y")
        val out = RankStats.kendallTauByGroup(df, Seq("g"), "t", "x", "y")
          .select("n_pairs", "concordant", "discordant", "tau_b").head()
        assert(out.getLong(0) == pairs.size)
        assert(out.getLong(1) == c && out.getLong(2) == d)
      }
    }
  }

  test("hitsCounts on a hand-checked graph: a→c, b→c, c→d") {
    val edges = Seq(("a", "c"), ("b", "c"), ("c", "d")).toDF("s", "d")
    val got = Hits.hitsCounts(edges, "s", "d")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // a1: c=2, d=1. h1: a=2, b=2, c=1. a2: c=4 (from a,b), d=1 (from c).
    assert(got("a") == ((2L, 0L)))
    assert(got("b") == ((2L, 0L)))
    assert(got("c") == ((1L, 4L)))
    assert(got("d") == ((0L, 1L)))
  }

  test("seasonalIndex: idx_micro is the exact floor of (season mean / overall mean)·1e6") {
    val rows = Seq(("k", 1L, 10L), ("k", 1L, 20L), ("k", 2L, 40L), ("k", 2L, 20L),
      ("k", 3L, 30L)).toDF("k", "season", "v")
    val got = TimeSeries.seasonalIndex(rows, Seq("k"), "season", "v")
      .collect().map(r => r.getLong(1) -> r.getLong(4)).toMap
    // overall mean = 120/5 = 24; season means: 15, 30, 30
    assert(got(1L) == 625000L) // 15/24
    assert(got(2L) == 1250000L)
    assert(got(3L) == 1250000L)
  }

  test("seasonalIndex: a NULL key is a key, not dropped rows") {
    val rows = Seq((null: String, 1L, 10L), (null, 2L, 30L), ("k", 1L, 5L))
      .toDF("k", "season", "v")
    val out = TimeSeries.seasonalIndex(rows, Seq("k"), "season", "v").collect()
    assert(out.length == 3, "NULL-keyed seasons must appear (null-safe join-back)")
    val n1 = out.find(r => r.isNullAt(0) && r.getLong(1) == 1L).get
    assert(n1.getLong(4) == 500000L) // 10 vs overall mean 20
  }

  test("theilSenSlope: median pairwise slope, negative slopes floor consistently") {
    // series: (1,100),(2,90),(3,60) → slopes -10, -20, -30 → median -20
    val rows = Seq(("k", 1L, 100L), ("k", 2L, 90L), ("k", 3L, 60L)).toDF("k", "t", "v")
    val got = TimeSeries.theilSenSlope(rows, Seq("k"), "t", "v").head()
    assert(got.getLong(1) == 3L)
    assert(got.getDouble(2) == -20000000.0)
  }

  test("psiTerms: zero drift on identical slices; hhi: uniform vs concentrated") {
    val same = (1 to 100).flatMap(i => Seq((i % 5, 0), (i % 5, 1))).toDF("b", "sl")
    val terms = Drift.psiTerms(same, "b", "sl").agg(sum("psi_micro")).head().getLong(0)
    assert(terms == 0L)
    val conc = Seq(("g", 100L), ("g", 0L), ("g", 0L), ("g", 0L)).toDF("k", "m")
    assert(Drift.hhi(conc, Seq("k"), "m").head().getDouble(3) == 1.0)
    val unif = Seq(("g", 10L), ("g", 10L), ("g", 10L), ("g", 10L)).toDF("k", "m")
    assert(Drift.hhi(unif, Seq("k"), "m").head().getDouble(3) == 0.25)
  }

  test("calibrationBins: perfectly calibrated buckets have mean_p ≈ frac_pos and small brier") {
    val rows = (1 to 10).flatMap { b =>
      val p = (2 * b - 1) * 50000L
      (1 to 20).map(i => (b.toLong, p, if (i * 100000L <= p * 2) 1 else 0))
    }.toDF("bucket", "p_micro", "label")
    val out = Eval.calibrationBins(rows, "bucket", "p_micro", "label").collect()
    assert(out.length == 10)
    out.foreach { r =>
      assert(r.getLong(1) == 20L)
      assert(r.getLong(3) == (2 * r.getLong(0) - 1) * 50000L) // constant p per bucket
      assert(r.getLong(5) >= 0L && r.getLong(5) <= 1000000L)
    }
  }

  test("noveltyRatios: disjoint docs fully novel; exact repeat fully stale") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"), // exact repeat of doc 1 → zero novelty
      (3L, "epsilon zeta eta theta") // disjoint → fully novel
    ).toDF("doc_id", "text")
    val got = graft.text.Vocab.noveltyRatios(docs, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got(1L) == 1000000L)
    assert(got(2L) == 0L)
    assert(got(3L) == 1000000L)
  }

  test("aucByGroup matches the global aucFromScores applied per group") {
    for (rows <- samples(scoredGen, 3)) {
      val tagged = rows.zipWithIndex.map { case ((s, l), i) => (s"g${i % 2}", s, l) }
      val grouped = RankStats.aucByGroup(tagged.toDF("g", "score", "label"),
        Seq("g"), "score", "label")
        .collect().map(r => r.getString(0) -> r).toMap
      for (g <- Seq("g0", "g1")) {
        val sub = tagged.filter(_._1 == g).map(t => (t._2, t._3))
        val want = RankStats.aucFromScores(sub.toDF("score", "label"), "score", "label")
          .head()
        val got = grouped(g)
        assert(got.getLong(1) == want.getLong(0) && got.getLong(2) == want.getLong(1))
        if (!want.isNullAt(2))
          assert(math.abs(got.getDouble(3) - want.getDouble(2)) < 1e-12)
      }
    }
  }

  test("twoProportionZ: hand-checked arms and symmetry under arm swap") {
    // control 100 @ 20%, treatment 100 @ 30%
    val rows = (1 to 100).map(i => ("s", 0, if (i <= 20) 1 else 0)) ++
      (1 to 100).map(i => ("s", 1, if (i <= 30) 1 else 0))
    val out = graft.operators.Experiment
      .twoProportionZ(rows.toDF("k", "v", "c"), Seq("k"), "v", "c").head()
    assert(out.getLong(1) == 100L && out.getLong(2) == 100L)
    assert(out.getLong(3) == 20L && out.getLong(4) == 30L)
    val p = 50.0 / 200.0
    val zBrute = (0.30 - 0.20) / math.sqrt(p * (1 - p) * (1.0 / 100 + 1.0 / 100))
    assert(math.abs(out.getDouble(7) - zBrute) < 1e-12)
    // swapping arms flips the sign exactly
    val sw = rows.map { case (k, v, c) => (k, 1 - v, c) }
    val out2 = graft.operators.Experiment
      .twoProportionZ(sw.toDF("k", "v", "c"), Seq("k"), "v", "c").head()
    assert(math.abs(out.getDouble(7) + out2.getDouble(7)) < 1e-12)
  }

  test("bhFdr: step-up adjusted p is monotone, clamped at 1, and matches brute force") {
    val ps = Seq(("a", 1000L), ("b", 8000L), ("c", 30000L), ("d", 31000L), ("e", 900000L))
    val out = graft.operators.Experiment.bhFdr(ps.toDF("id", "p"), "id", "p")
      .orderBy("rank").collect()
    val m = ps.size
    // brute: candidates p·m/rank then suffix min
    val sorted = ps.sortBy(_._2)
    val cands = sorted.zipWithIndex.map { case ((_, p), i) =>
      math.min(p * m / (i + 1), 1000000L) }
    val brute = cands.indices.map(i => cands.drop(i).min)
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(3) == brute(i), s"rank ${i + 1}")
    }
    // monotone non-decreasing in rank
    out.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(3) <= b.getLong(3))
      case _ =>
    }
  }

  test("entropy: uniform k-way = ln(k) micro-nats; single category = 0") {
    val uni = (1 to 4).flatMap(c => (1 to 25).map(_ => ("k", s"c$c"))).toDF("k", "cat")
    val h = graft.operators.Experiment.entropy(uni, Seq("k"), "cat").head()
    assert(math.abs(h.getLong(3) - math.round(math.log(4) * 1e6)) <= 4) // 4 · term-rounding
    val mono = (1 to 100).map(_ => ("k", "only")).toDF("k", "cat")
    assert(graft.operators.Experiment.entropy(mono, Seq("k"), "cat").head().getLong(3) == 0L)
  }

  test("mutualInformation: independent columns ≈ 0; identical columns = entropy") {
    val indep = (0 until 400).map(i => (s"x${i % 4}", s"y${i / 4 % 4}")).toDF("x", "y")
    val mi0 = graft.operators.Experiment.mutualInformation(indep, "x", "y").head().getLong(3)
    assert(math.abs(mi0) <= 16L) // per-cell rounding only
    val ident = (0 until 400).map(i => (s"v${i % 4}", s"v${i % 4}")).toDF("x", "y")
    val mi1 = graft.operators.Experiment.mutualInformation(ident, "x", "y").head().getLong(3)
    assert(math.abs(mi1 - math.round(math.log(4) * 1e6)) <= 16L)
  }

  test("trimmedMean: drops exactly the k outer values each side") {
    val vals = (1L to 10L) :+ 1000000L // one wild outlier
    val df = vals.zipWithIndex.map { case (v, i) => (v, i.toLong) }.toDF("v", "id")
    val out = graft.operators.RobustStats.trimmedMean(df, "v", Seq("id"), 1, 10).head()
    assert(out.getLong(0) == 11L && out.getLong(1) == 2L)
    // keep ranks 2..10 → values 2..10, mean = 54/9 = 6 exactly
    assert(out.getLong(2) == 6000000L)
  }

  test("weightedQuantile: p95 lands on the smallest value covering 95% of mass") {
    val df = Seq((1L, 90L, 1L), (2L, 5L, 2L), (3L, 5L, 3L)).toDF("v", "w", "id")
    // W=100, target p95 = 95 → cum: v1:90, v2:95 → v2 is the p95
    assert(graft.operators.RobustStats
      .weightedQuantile(df, "v", "w", Seq("id"), 95L, 100L).head().getLong(0) == 2L)
    // p50 → v1 (cum 90 ≥ 50)
    assert(graft.operators.RobustStats
      .weightedQuantile(df, "v", "w", Seq("id"), 1L, 2L).head().getLong(0) == 1L)
  }

  test("personalizedRanks: hand-computed 2-iter chain; unreachable nodes stay at 0") {
    // chain a→b→c→d plus disconnected x→y; seed = a, scale 1e12.
    // iter1: a=1.5e11 (restart only), b=17·1e12/20=8.5e11, c=d=0
    // iter2: a=1.5e11, b=17·1.5e11/20=1.275e11, c=17·8.5e11/20=7.225e11, d=0
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")).toDF("src", "dst")
    val seed = Seq("a").toDF("node")
    val r = graft.operators.PageRank.personalizedRanks(edges, seed, iters = 2)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r("a") == 150000000000L)
    assert(r("b") == 127500000000L)
    assert(r("c") == 722500000000L)
    assert(r("d") == 0L)
    assert(r("x") == 0L && r("y") == 0L) // no path from the seed
  }

  test("personalizedRanks sparse: dense values on every emitted node; zeros absent") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")).toDF("src", "dst")
    val seed = Seq("a").toDF("node")
    val dense = graft.operators.PageRank.personalizedRanks(edges, seed, iters = 2)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    val sparse = graft.operators.PageRank
      .personalizedRanks(edges, seed, iters = 2, sparse = true)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    // every sparse node carries the dense value bit-identically
    sparse.foreach { case (n, v) => assert(dense(n) == v, n) }
    // every dense nonzero node is present; unreached nodes are absent
    dense.filter(_._2 > 0).keys.foreach(n => assert(sparse.contains(n), n))
    assert(!sparse.contains("x") && !sparse.contains("y"))
    // d was REACHED with a truncated-to-zero rank path? no — 2 iters stop
    // at c, so d is absent in sparse and 0 in dense
    assert(!sparse.contains("d"))
  }

  test("kaplanMeier matches the hand-computed product-limit curve with censoring") {
    // k: durations 1(event) 2(censor) 3(event) 3(event) 5(censor)
    // t=1: n=5 d=1 → S=4/5;  t=2: censor only → S unchanged
    // t=3: n=3 d=2 → S=4/5·1/3;  t=5: censor → unchanged
    val rows = Seq(("k", 1L, 1), ("k", 2L, 0), ("k", 3L, 1), ("k", 3L, 1), ("k", 5L, 0))
    val out = graft.operators.Survival
      .kaplanMeier(rows.toDF("k", "d", "e"), Seq("k"), "d", "e")
      .orderBy("t").collect()
    assert(out.map(_.getLong(1)) === Array(1L, 2L, 3L, 5L))
    assert(out.map(_.getLong(2)) === Array(5L, 4L, 3L, 1L)) // at-risk
    def s(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    val got = out.map(_.getLong(5))
    assert(math.abs(got(0) - s(0.8)) <= 1)
    assert(got(1) == got(0)) // censoring never moves the curve
    assert(math.abs(got(2) - s(0.8 * (1.0 / 3))) <= 2)
    assert(got(3) == got(2))
    // exhausted risk set → exact 0 from that step on
    val wipe = Seq(("w", 1L, 1), ("w", 1L, 1)).toDF("k", "d", "e")
    val w = graft.operators.Survival.kaplanMeier(wipe, Seq("k"), "d", "e").head()
    assert(w.getLong(5) == 0L)
  }

  test("compaction plan: next-fit bins are contiguous, sizes add up, bins start at 0") {
    val files = (1 to 20).map(i => ("p", i.toLong, 100L * (i % 4 + 1))).toDF("p", "id", "sz")
    val plan = graft.load.Compaction.plan(files, Seq("p"), "id", "sz", 1000L)
      .orderBy("bin").collect()
    assert(plan.map(_.getLong(2)).sum == 20L) // all files placed
    assert(plan.map(_.getLong(3)).sum == (1 to 20).map(i => 100L * (i % 4 + 1)).sum)
    assert(plan.head.getLong(1) == 0L)
    // bins are contiguous ranges in file-id order
    val ordered = plan.sortBy(_.getLong(1))
    ordered.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(5) < b.getLong(4))
      case _ =>
    }
  }
}
