package graft

import graft.load.Encoders
import graft.operators.{Communities, Experiment, MarketBasket, TimeSeries}
import org.apache.spark.sql.functions._

/** Unit gates for the experimentation / feature-prep operators: CUPED,
  * chi-squared + Cramér's V, KS, CUSUM change-point, LOO target encoding,
  * quantile binning, label propagation, association rules. Hand-computed
  * expectations on tiny inputs; the q199–q206 oracles gate the same ops at
  * data scale.
  */
class ExperimentSpec extends SparkSpec {
  import spark.implicits._

  // ---- CUPED ----

  test("cuped: perfectly correlated covariate removes all variance (rho2=1)") {
    // y = 2x exactly: theta = 2, rho2 = 1, and both adjusted means collapse
    // to the pooled mean of y
    val df = Seq((0, 10L, 5L), (0, 20L, 10L), (1, 30L, 15L), (1, 40L, 20L))
      .toDF("variant", "y", "x")
    val r = Experiment.cuped(df, "variant", "y", "x", scale = 1)
      .orderBy("variant").collect()
    assert(r.map(_.getAs[Double]("theta")).toSeq == Seq(2.0, 2.0))
    assert(r.map(_.getAs[Double]("rho2")).toSeq == Seq(1.0, 1.0))
    // pooled mean y = 25; adjusted means are exactly that for both variants
    assert(r.map(_.getAs[Double]("mean_y_adj")).toSeq == Seq(25.0, 25.0))
    assert(r.map(_.getAs[Double]("mean_y")).toSeq == Seq(15.0, 35.0))
  }

  test("cuped: constant covariate yields null theta/rho2, means intact") {
    val df = Seq((0, 10L, 7L), (0, 20L, 7L), (1, 40L, 7L)).toDF("variant", "y", "x")
    val r = Experiment.cuped(df, "variant", "y", "x", scale = 1)
      .orderBy("variant").collect()
    assert(r.forall(_.isNullAt(r.head.fieldIndex("theta"))))
    assert(r.forall(_.isNullAt(r.head.fieldIndex("rho2"))))
    assert(r.map(_.getAs[Double]("mean_y")).toSeq == Seq(15.0, 40.0))
  }

  // ---- chi-squared ----

  test("chiSquared: independent 2x2 table gives chi2=0, V=0") {
    // perfectly proportional: (a,c)=20/10, (b,c)=40/20 — expected == observed
    val rows = Seq.fill(20)(("a", "x")) ++ Seq.fill(10)(("a", "y")) ++
      Seq.fill(40)(("b", "x")) ++ Seq.fill(20)(("b", "y"))
    val r = Experiment.chiSquared(rows.toDF("u", "v"), "u", "v").head()
    assert(r.getAs[Long]("n") == 90L)
    assert(r.getAs[Long]("dof") == 1L)
    assert(r.getAs[Double]("chi2") == 0.0)
    assert(r.getAs[Double]("cramers_v") == 0.0)
  }

  test("chiSquared: fully dependent 2x2 table gives V=1") {
    // u determines v: chi2 = N, V = sqrt(N/(N·1)) = 1
    val rows = Seq.fill(30)(("a", "x")) ++ Seq.fill(50)(("b", "y"))
    val r = Experiment.chiSquared(rows.toDF("u", "v"), "u", "v").head()
    assert(r.getAs[Double]("chi2") == 80.0)
    assert(r.getAs[Double]("cramers_v") == 1.0)
  }

  // ---- KS ----

  test("ksStatistic: disjoint score ranges separate perfectly (ks=1)") {
    // positives all score <= 3, negatives all >= 10
    val df = Seq((true, 1L), (true, 2L), (true, 3L), (false, 10L), (false, 11L))
      .toDF("lbl", "sc")
    val r = Experiment.ksStatistic(df, "lbl", "sc").head()
    assert(r.getAs[Long]("n_pos") == 3L && r.getAs[Long]("n_neg") == 2L)
    assert(r.getAs[Double]("ks") == 1.0)
    assert(r.getAs[Long]("ks_score") == 3L) // earliest threshold achieving max
  }

  test("ksStatistic: identical distributions give ks=0 at the smallest score") {
    val df = Seq((true, 5L), (false, 5L), (true, 9L), (false, 9L)).toDF("lbl", "sc")
    val r = Experiment.ksStatistic(df, "lbl", "sc").head()
    assert(r.getAs[Double]("ks") == 0.0)
    assert(r.getAs[Long]("ks_score") == 5L)
  }

  // ---- CUSUM ----

  test("cusumChangePoint: finds the level shift, ties break earliest") {
    // series 0,0,0,10,10: mean 4; |D_t| = |5*C_t - t*20| peaks at t=3 (|0-60|=60)
    val df = Seq(("k", 1L, 0L), ("k", 2L, 0L), ("k", 3L, 0L), ("k", 4L, 10L), ("k", 5L, 10L))
      .toDF("k", "o", "v")
    val r = TimeSeries.cusumChangePoint(df, Seq("k"), "o", "v").head()
    assert(r.getAs[Long]("n") == 5L)
    assert(r.getAs[Long]("t_star") == 3L)
    assert(r.getAs[Long]("at_order") == 3L)
    assert(r.getAs[Long]("d_abs") == 60L)
    // shift_norm = 60/25 = 2.4 -> 2400000 micro
    assert(r.getAs[Long]("shift_norm_micro") == 2400000L)
  }

  test("cusumChangePoint: constant series peaks at t=1 with D=0") {
    val df = Seq(("k", 1L, 5L), ("k", 2L, 5L), ("k", 3L, 5L)).toDF("k", "o", "v")
    val r = TimeSeries.cusumChangePoint(df, Seq("k"), "o", "v").head()
    assert(r.getAs[Long]("d_abs") == 0L && r.getAs[Long]("t_star") == 1L)
  }

  test("cusumChangePoint: a NULL series key still yields its changepoint") {
    val df = Seq((null: String, 1L, 0L), (null, 2L, 0L), (null, 3L, 10L),
      ("k", 1L, 5L), ("k", 2L, 5L)).toDF("k", "o", "v")
    val out = TimeSeries.cusumChangePoint(df, Seq("k"), "o", "v").collect()
    assert(out.length == 2, "NULL-keyed series must not vanish (null-safe join-back)")
    val n = out.find(_.isNullAt(0)).get
    assert(n.getAs[Long]("n") == 3L && n.getAs[Long]("t_star") == 2L)
  }

  // ---- LOO target encoding ----

  test("looTargetEncode: excludes own row; singleton falls back to global mean") {
    val df = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L), (4L, "b", 100L))
      .toDF("id", "cat", "y")
    val r = Encoders.looTargetEncode(df, "cat", "y").orderBy("id")
      .select("id", "loo_enc_micro").as[(Long, Long)].collect()
    assert(r.toSeq == Seq(
      1L -> 25000000L, // (20+30)/2
      2L -> 20000000L, // (10+30)/2
      3L -> 15000000L, // (10+20)/2
      4L -> 40000000L)) // singleton: global mean 160/4
  }

  test("looTargetEncode: rejects a colliding output column") {
    val df = Seq((1L, "a", 10L)).toDF("id", "cat", "loo_enc_micro")
    assertThrows[IllegalArgumentException] {
      Encoders.looTargetEncode(df, "cat", "loo_enc_micro")
    }
  }

  // ---- quantile binning ----

  test("quantileBin: SQL ntile fill — first N mod k bins take the extra row") {
    val df = (1L to 7L).map(i => (i, i * 10L)).toDF("id", "v")
    val bins = Encoders.quantileBin(df, "v", Seq("id"), buckets = 3)
      .groupBy("bin").agg(count(lit(1)).as("n"))
      .orderBy("bin").as[(Long, Long)].collect()
    assert(bins.toSeq == Seq(1L -> 3L, 2L -> 2L, 3L -> 2L))
  }

  test("quantileBin: duplicate order keys fail loudly (total-order contract)") {
    val df = Seq((1L, 10L), (1L, 10L)).toDF("id", "v")
    assertThrows[org.apache.spark.SparkException] {
      Encoders.quantileBin(df, "v", Seq("id"), buckets = 2).collect()
    }
  }

  // ---- label propagation ----

  test("labelPropagate: two cliques with a bridge settle into two communities") {
    // clique {1,2,3}, clique {7,8,9}, bridge 3-7
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (7L, 8L), (7L, 9L), (8L, 9L), (3L, 7L))
      .toDF("a", "b")
    val r = Communities.labelPropagate(edges, "a", "b", rounds = 3)
      .orderBy("node").as[(Long, Long)].collect().toMap
    // min-label tie-breaking pulls each clique onto its smallest member's label
    assert(Set(r(1L), r(2L), r(3L)).size == 1)
    assert(Set(r(7L), r(8L), r(9L)).size == 1)
  }

  test("labelPropagate: round 1 adopts the smallest neighbor label (all-ties)") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val r = Communities.labelPropagate(edges, "a", "b", rounds = 1)
      .orderBy("node").as[(Long, Long)].collect()
    // node 1 sees {2}; node 2 sees {1,3} -> min 1; node 3 sees {2}
    assert(r.toSeq == Seq(1L -> 2L, 2L -> 1L, 3L -> 2L))
  }

  test("labelPropagate: self-loops ignored; synchronous star oscillation is deterministic") {
    // star 1-(2,3,4): L1 = {1→2 (min of all-tied nbrs), leaves→1}; L2 swaps
    // back — 1 sees three '1' votes (plurality), leaves see '2'. The known
    // synchronous-LPA oscillation, pinned here as the documented contract.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (5L, 5L)).toDF("a", "b")
    val r = Communities.labelPropagate(edges, "a", "b", rounds = 2)
      .orderBy("node").as[(Long, Long)].collect().toMap
    assert(!r.contains(5L)) // self-loop-only node never enters the graph
    assert(r(1L) == 1L && r(2L) == 2L && r(3L) == 2L && r(4L) == 2L)
  }

  // ---- Markov transitions ----

  test("transitionMatrix: per-key adjacencies, exact row-normalized micro probs") {
    // user 1: a->b->a ; user 2: a->c  => from a: b once, c once; from b: a once
    val ev = Seq((1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (2L, 1L, "a"), (2L, 2L, "c"))
      .toDF("u", "t", "e")
    val r = graft.operators.Sessionize.transitionMatrix(ev, "u", Seq("t"), "e")
      .orderBy("src", "dst")
      .as[(String, String, Long, Long)].collect()
    assert(r.toSeq == Seq(
      ("a", "b", 1L, 500000L), ("a", "c", 1L, 500000L), ("b", "a", 1L, 1000000L)))
  }

  test("transitionMatrix: sequence boundaries don't leak across keys") {
    // last event of user 1 must NOT chain into user 2's first event
    val ev = Seq((1L, 1L, "x"), (2L, 2L, "y")).toDF("u", "t", "e")
    assert(graft.operators.Sessionize.transitionMatrix(ev, "u", Seq("t"), "e").count() == 0L)
  }

  // ---- association rules ----

  test("associationRules: exact support/confidence/lift micro-units") {
    // baskets: {A,B}, {A,B}, {A,C}, {B} -> N=4, nA=3, nB=3, nAB=2
    val df = Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"), (3L, "A"), (3L, "C"), (4L, "B"))
      .toDF("bk", "it")
    val r = MarketBasket.associationRules(df, "bk", "it", minPairCount = 2L)
      .orderBy("ante", "cons").collect()
    // only A->B and B->A survive minPairCount=2
    assert(r.map(x => (x.getAs[String]("ante"), x.getAs[String]("cons"))).toSeq ==
      Seq("A" -> "B", "B" -> "A"))
    val ab = r.head
    assert(ab.getAs[Long]("n_ab") == 2L)
    assert(ab.getAs[Long]("support_micro") == 500000L) // 2/4
    assert(ab.getAs[Long]("confidence_micro") == 666667L) // 2/3 rounded
    assert(ab.getAs[Long]("lift_micro") == 888889L) // 2*4/(3*3)
  }

  // ---- BFS levels ----

  test("bfsLevels: exact hop distances, bounded rounds truncate the horizon") {
    // path 1-2-3-4-5 plus shortcut 1-4
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L)).toDF("a", "b")
    val src = Seq(1L).toDF("node")
    val r = graft.operators.ShortestPath.bfsLevels(edges, "a", "b", src, rounds = 2)
      .orderBy("node").as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 2L))
    // rounds=1 can't see nodes 3 (via 2) or 5 (via 4)
    val r1 = graft.operators.ShortestPath.bfsLevels(edges, "a", "b", src, rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1 == Map(1L -> 0L, 2L -> 1L, 4L -> 1L))
  }

  test("bfsLevels: multi-source takes the nearest seed") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val src = Seq(1L, 4L).toDF("node")
    val r = graft.operators.ShortestPath.bfsLevels(edges, "a", "b", src, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 0L))
  }

  // ---- Kneser-Ney ----

  test("kneserNeyBigrams: hand-computed interpolated-KN on a toy corpus") {
    // corpus: "a b", "a b", "a c" -> bigram types: (a,b) c=2, (a,c) c=1
    // c(a)=3, N1+(a·)=2, N1+(·b)=1, N1+(·c)=1, T=2
    // p(b|a) = (2-.75)/3 + .75·2/3 · (1/2) = 1.25/3 + .25 = 0.666667
    // p(c|a) = (1-.75)/3 + .25 = 0.083333 + .25 = 0.333333
    val docs = Seq("a b", "a b", "a c").toDF("text")
    val r = graft.text.NgramLm.kneserNeyBigrams(docs, "text")
      .orderBy("w").collect()
    val pb = r.find(_.getAs[String]("w") == "b").get.getAs[Double]("p_kn")
    val pc = r.find(_.getAs[String]("w") == "c").get.getAs[Double]("p_kn")
    assert(math.abs(pb - 2.0 / 3.0) < 1e-12)
    assert(math.abs(pc - 1.0 / 3.0) < 1e-12)
    // a proper conditional: the two continuations sum to 1 (all of a's mass)
    assert(math.abs(pb + pc - 1.0) < 1e-12)
  }

  test("kneserNeyBigrams: continuation count beats raw frequency (francisco effect)") {
    // "y" is frequent but ALWAYS follows "x"; "z" is rarer but follows many
    // contexts -> unseen-context mass favors z via N1+(·z)
    val docs = Seq("x y", "x y", "x y", "a z", "b z", "c z").toDF("text")
    val r = graft.text.NgramLm.kneserNeyBigrams(docs, "text").collect()
    val n1bY = 1L // y follows only x
    val n1bZ = 3L // z follows a, b, c
    // continuation share is the second addend's n1b factor; check via the
    // model's own columns: lambda-weighted term for (a,z) must exceed the
    // same term would for a hypothetical (a,y): directly assert p(z|a) >
    // the discounted-count-only floor
    val paz = r.find(x => x.getAs[String]("v") == "a" && x.getAs[String]("w") == "z")
      .get.getAs[Double]("p_kn")
    // c(az)=1, c(a)=1, T=4 bigram TYPES: discount term = 0.25/1;
    // continuation term = .75·1·(3/4) = .5625 -> total .8125
    assert(math.abs(paz - 0.8125) < 1e-12)
    assert(n1bY < n1bZ)
  }

  // ---- rolling z-score ----

  test("rollingZScore: strictly-preceding frame, full-window gate, exact z") {
    // series 10,14,16 with window=2: rows 1-2 have partial frames -> null;
    // row 3's baseline {10,14}: mean 12, var = (2·296−24²)/(2·1) = 8,
    // z = (16−12)/√8
    val dfk = Seq(("k", 1L, 10L), ("k", 2L, 14L), ("k", 3L, 16L)).toDF("g", "t", "v")
    val rows = graft.operators.TimeSeries
      .rollingZScore(dfk, Seq("g"), "t", "v", window = 2)
      .orderBy("t").select("z").collect()
    assert(rows(0).isNullAt(0) && rows(1).isNullAt(0)) // partial frames
    val z = rows(2).getDouble(0)
    assert(math.abs(z - (16.0 - 12.0) / math.sqrt(8.0)) < 1e-12)
  }

  test("rollingZScore: constant baseline yields null, not infinity") {
    val dfk = Seq(("k", 1L, 5L), ("k", 2L, 5L), ("k", 3L, 99L)).toDF("g", "t", "v")
    val rows = graft.operators.TimeSeries
      .rollingZScore(dfk, Seq("g"), "t", "v", window = 2)
      .orderBy("t").select("z").collect()
    assert(rows.forall(_.isNullAt(0)))
  }

  test("associationRules: duplicate items in a basket count once") {
    val df = Seq((1L, "A"), (1L, "A"), (1L, "B"), (2L, "A"), (2L, "B")).toDF("bk", "it")
    val r = MarketBasket.associationRules(df, "bk", "it", minPairCount = 2L)
      .filter(col("ante") === "A").head()
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_ab") == 2L)
    assert(r.getAs[Long]("confidence_micro") == 1000000L)
  }

  test("capBaskets: trims a mega-basket to its rarest items, leaves small baskets") {
    // basket 1 holds 10 items; items i1..i3 also appear in many other
    // baskets (frequent), i4..i10 are basket-1-only (rare). Cap at 4 must
    // keep the 4 RAREST (i10..i4 by freq-asc then id-asc → i4,i5,i6,i7)
    // and leave the 2-item basket 99 untouched.
    val mega = (1 to 10).map(i => (1L, f"i$i%02d"))
    val common = (2L to 21L).flatMap(b => Seq((b, "i01"), (b, "i02"), (b, "i03")))
    val small = Seq((99L, "i01"), (99L, "x"))
    val df = (mega ++ common ++ small).toDF("bk", "it")
    val out = MarketBasket.capBaskets(df, "bk", "it", maxBasket = 4)
    val b1 = out.filter(col("bk") === 1L).select("it").as[String].collect().sorted
    assert(b1.toSeq == Seq("i04", "i05", "i06", "i07")) // rarest 4, id-tiebreak
    assert(out.filter(col("bk") === 99L).count() == 2L) // under-cap basket intact
    // a cap above every basket size is the identity on distinct pairs
    val id = MarketBasket.capBaskets(df, "bk", "it", maxBasket = 100)
    assert(id.count() == df.distinct().count())
  }

  test("capBaskets bounds the downstream pair explosion") {
    // one 40-item basket: uncapped self-join yields C(40,2)=780 pairs;
    // capped at 8 it contributes C(8,2)=28 — the hot-key guard
    val df = (1 to 40).map(i => (7L, i.toLong)).toDF("bk", "it")
    def pairs(src: org.apache.spark.sql.DataFrame): Long = src
      .select(col("bk"), col("it").as("a"))
      .join(src.select(col("bk"), col("it").as("b")), "bk")
      .filter(col("a") < col("b")).count()
    assert(pairs(df) == 780L)
    assert(pairs(MarketBasket.capBaskets(df, "bk", "it", maxBasket = 8)) == 28L)
  }
}
