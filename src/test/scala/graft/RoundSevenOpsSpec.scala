package graft

import graft.operators.{RobustStats, TimeSeries, Triangles, ZOrder}
import org.apache.spark.sql.functions._

class RoundSevenOpsSpec extends SparkSpec {
  import spark.implicits._

  test("anovaF: hand-computed two-group example") {
    // groups: a = {1, 2, 3}, b = {5, 6, 7} (scale=1 → units are the values)
    // means 2 and 6, grand 4; SSB = 3·4 + 3·4 = 24; SSW = 2 + 2 = 4
    // F = (24/1)/(4/4) = 24; eta² = 24/28
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 5.0), ("b", 6.0), ("b", 7.0)).toDF("g", "v")
    val r = RobustStats.anovaF(df, "g", "v", scale = 1).collect()(0)
    assert(r.getAs[Long]("k") == 2L && r.getAs[Long]("n") == 6L)
    assert(r.getAs[Long]("df_between") == 1L && r.getAs[Long]("df_within") == 4L)
    assert(r.getAs[Long]("ssb_u") == 24L)
    assert(r.getAs[Long]("ssw_u") == 4L)
    assert(math.abs(r.getAs[Double]("f_stat") - 24.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("eta_sq") - 24.0 / 28.0) < 1e-9)
  }

  test("anovaF: identical group means give ssb 0 and null F on zero ssw") {
    val df = Seq(("a", 2.0), ("a", 2.0), ("b", 2.0), ("b", 2.0)).toDF("g", "v")
    val r = RobustStats.anovaF(df, "g", "v", scale = 1).collect()(0)
    assert(r.getAs[Long]("ssb_u") == 0L && r.getAs[Long]("ssw_u") == 0L)
    assert(r.isNullAt(r.fieldIndex("f_stat"))) // 0/0 guarded, not NaN
  }

  test("localClustering: K4 is all-1, a path is all-0") {
    val k4 = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
      ("c", "d")).toDF("a", "b")
    val out = Triangles.localClustering(k4).collect()
    assert(out.length == 4)
    out.foreach { r =>
      assert(r.getAs[Long]("degree") == 3L)
      assert(r.getAs[Long]("n_triangles") == 3L)
      assert(r.getAs[Long]("coef_micro") == 1000000L)
    }
    val path = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("a", "b")
    val p = Triangles.localClustering(path).collect()
    assert(p.forall(_.getAs[Long]("coef_micro") == 0L))
    // middle nodes have degree 2, no triangle
    assert(p.filter(_.getAs[String]("node") == "b")
      .head.getAs[Long]("degree") == 2L)
  }

  test("brownDouble: linear series recovers level=y exactly, trend=11/15") {
    // y_t = t: truncated dyadic s1 = t − 11/15, s2 = t − 22/15 →
    // level = t, trend = 11/15, forecast(2) = t + 22/15
    val df = (1 to 12).map(t => ("k", t, t.toDouble)).toDF("k", "t", "y")
    val out = TimeSeries.brownDouble(df, Seq("k"), Seq(col("t")), "y",
        horizon = 2, scale = 1)
      .orderBy("t").collect()
    // first 6 rows lack the 6 prior lags → null level; row index 6
    // (t = 7) is the FIRST complete estimate
    assert((0 until 6).forall(i => out(i).isNullAt(out(i).fieldIndex("level"))))
    assert(!out(6).isNullAt(out(6).fieldIndex("level")))
    (6 until 12).foreach { i =>
      val t = out(i).getAs[Int]("t").toDouble
      assert(math.abs(out(i).getAs[Double]("level") - t) < 1e-9)
      assert(math.abs(out(i).getAs[Double]("trend") - 11.0 / 15.0) < 1e-9)
      assert(math.abs(out(i).getAs[Double]("forecast") - (t + 22.0 / 15.0)) < 1e-9)
    }
  }

  test("brownDouble: constant series has zero trend and flat forecast") {
    val df = (1 to 10).map(t => ("k", t, 5.0)).toDF("k", "t", "y")
    val out = TimeSeries.brownDouble(df, Seq("k"), Seq(col("t")), "y",
        horizon = 7, scale = 100)
      .filter(col("level").isNotNull).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("level") - 5.0) < 1e-9)
      assert(math.abs(r.getAs[Double]("trend")) < 1e-9)
      assert(math.abs(r.getAs[Double]("forecast") - 5.0) < 1e-9)
    }
  }

  test("skippingDepth: sorted layout is depth 1, interleaved layout is depth n") {
    // key == physical order → chunk zone maps are disjoint → depth 1
    val sorted = (1 to 400).map(i => (i, i)).toDF("ord", "key")
    val d1 = ZOrder.skippingDepth(sorted, Seq("ord"), "key", chunks = 4).collect()
    assert(d1.length == 4)
    assert(d1.forall(_.getAs[Long]("depth") == 1L))
    assert(d1.forall(_.getAs[Long]("n_rows") == 100L))
    // key striped across the physical order → every chunk spans the whole
    // key range → depth = chunks
    val striped = (1 to 400).map(i => (i, i % 7)).toDF("ord", "key")
    val d4 = ZOrder.skippingDepth(striped, Seq("ord"), "key", 4).collect()
    assert(d4.forall(_.getAs[Long]("depth") == 4L))
  }

  test("workloadSkipScore: sorted layout scans ~1 chunk per narrow range") {
    val sorted = (1L to 400L).map(i => (i, i)).toDF("ord", "key")
    // keys 1..400 in 4 chunks of 100; predicate [150,160] touches chunk 2 only
    val out = ZOrder.workloadSkipScore(sorted, Seq("ord"), "key", 4,
      Seq((150L, 160L), (1L, 400L), (95L, 105L), (1000L, 2000L))).orderBy("pred_id").collect()
    assert(out(0).getAs[Long]("n_scanned") == 1L)
    assert(out(0).getAs[Long]("scan_frac_micro") == 250000L)
    assert(out(1).getAs[Long]("n_scanned") == 4L) // full-range scan
    assert(out(2).getAs[Long]("n_scanned") == 2L) // straddles a boundary
    assert(out(3).getAs[Long]("n_scanned") == 0L) // out-of-domain predicate
  }

  test("ols2: recovers an exact planted linear model") {
    // y = 3 + 2·x1 − 1·x2 on a non-degenerate grid → residual-free fit
    val rows = for (x1 <- 0 to 9; x2 <- 0 to 4)
      yield ("g", x1, x2, 3.0 + 2.0 * x1 - 1.0 * x2)
    val df = rows.toDF("g", "x1", "x2", "y")
    val r = graft.operators.Regression
      .ols2(df, Seq("g"), "y", "x1", "x2", yScale = 100).collect()(0)
    assert(r.getAs[Long]("n") == 50L)
    assert(math.abs(r.getAs[Double]("beta0") - 3.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("beta1") - 2.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("beta2") + 1.0) < 1e-9)
  }

  test("ols2: collinear regressors yield null betas, not garbage") {
    val df = (1 to 20).map(i => ("g", i, 2 * i, i.toDouble)).toDF("g", "x1", "x2", "y")
    val r = graft.operators.Regression
      .ols2(df, Seq("g"), "y", "x1", "x2", yScale = 100).collect()(0)
    assert(r.isNullAt(r.fieldIndex("beta1")))
  }

  test("rboDyadic: identical rankings hit the truncated-dyadic maximum") {
    import graft.operators.RankStats
    val a = (1 to 8).map(i => (s"t$i", i)).toDF("item", "rank")
    // identical lists: overlap(d) = d → term = 1e6 div 2^d; Σ_{1..8}
    val expect = (1 to 8).map(d => 1000000L >> d).sum
    val r = RankStats.rboDyadic(a, a, "item", "rank", depth = 8).collect()(0)
    assert(r.getAs[Long]("rbo_micro") == expect)
    // disjoint lists → 0
    val b = (1 to 8).map(i => (s"u$i", i)).toDF("item", "rank")
    assert(RankStats.rboDyadic(a, b, "item", "rank", 8)
      .collect()(0).getAs[Long]("rbo_micro") == 0L)
    // reversed top-2 of a 2-deep list: overlap(1)=0, overlap(2)=2 →
    // 0 + (2·1e6) div (2·4) = 250000
    val x = Seq(("p", 1), ("q", 2)).toDF("item", "rank")
    val y = Seq(("q", 1), ("p", 2)).toDF("item", "rank")
    assert(RankStats.rboDyadic(x, y, "item", "rank", 2)
      .collect()(0).getAs[Long]("rbo_micro") == 250000L)
  }

  test("anovaF matches the naive two-pass ANOVA on random grouped data") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 300).map { _ =>
      val g = "g" + rnd.nextInt(4)
      (g, math.floor(rnd.nextDouble() * 2000) / 100.0 + rnd.nextInt(3) * 5.0)
    }
    val df = rows.toDF("g", "v")
    val r = RobustStats.anovaF(df, "g", "v", scale = 100).collect()(0)
    // naive reference in cents (matching the operator's integerization)
    val cents = rows.map { case (g, v) => (g, math.round(v * 100)) }
    val byG = cents.groupBy(_._1).view.mapValues(_.map(_._2.toDouble)).toMap
    val all = cents.map(_._2.toDouble)
    val gm = all.sum / all.size
    val ssb = byG.values.map(vs => vs.size * math.pow(vs.sum / vs.size - gm, 2)).sum
    val ssw = byG.values.map(vs => { val m = vs.sum / vs.size; vs.map(x => math.pow(x - m, 2)).sum }).sum
    val fRef = (ssb / (byG.size - 1)) / (ssw / (all.size - byG.size))
    assert(math.abs(r.getAs[Double]("f_stat") - fRef) / fRef < 1e-6,
      s"F ${r.getAs[Double]("f_stat")} vs naive $fRef")
    assert(math.abs(r.getAs[Long]("ssb_u") - ssb) <= byG.size + 1) // per-group floor slack
  }

  test("ols2 residuals are orthogonal to the design on random data") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 200).map { _ =>
      val x1 = rnd.nextInt(20); val x2 = rnd.nextInt(10)
      ("g", x1, x2, math.floor((1.5 + 0.7 * x1 - 0.3 * x2 + rnd.nextGaussian()) * 100) / 100.0)
    }
    val df = rows.toDF("g", "x1", "x2", "y")
    val r = graft.operators.Regression.ols2(df, Seq("g"), "y", "x1", "x2").collect()(0)
    val (b0, b1, b2) =
      (r.getAs[Double]("beta0"), r.getAs[Double]("beta1"), r.getAs[Double]("beta2"))
    // normal equations: residuals sum ~0 and are uncorrelated with x1, x2
    val res = rows.map { case (_, x1, x2, y) => (x1, x2, y - b0 - b1 * x1 - b2 * x2) }
    val scale = rows.map(_._4).map(math.abs).max * rows.size
    assert(math.abs(res.map(_._3).sum) / scale < 1e-6)
    assert(math.abs(res.map(t => t._1 * t._3).sum) / (scale * 20) < 1e-6)
    assert(math.abs(res.map(t => t._2 * t._3).sum) / (scale * 10) < 1e-6)
  }

  test("bfsLevelsFrom == one bfsLevels per seed, on a branchy graph") {
    import graft.operators.ShortestPath
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("a", "e"), ("e", "d"),
      ("x", "y")).toDF("a", "b")
    val seeds = Seq("a", "x", "d").toDF("seed")
    val multi = ShortestPath.bfsLevelsFrom(edges, "a", "b", seeds, rounds = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val single = Seq("a", "x", "d").flatMap { s =>
      ShortestPath.bfsLevels(edges, "a", "b", Seq(s).toDF("node"), rounds = 3)
        .collect().map(r => (s, r.getString(0), r.getLong(1)))
    }.toSet
    assert(multi == single)
    // spot-check: from "a", d is 2 hops (a-e-d); y unreachable from a
    assert(multi.contains(("a", "d", 2L)))
    assert(!multi.exists(t => t._1 == "a" && t._2 == "y"))
  }

  test("sortedIntersectSize == size(array_intersect) on random sorted sets") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { i =>
      def set() = rnd.shuffle((0 until 60).toList).take(rnd.nextInt(25) + 1)
        .map(j => s"s$j").distinct.sorted
      (i, set(), set())
    }
    val df = rows.toDF("i", "a", "b")
    val bad = df.select(
      graft.functions.ArrayFunctions.sortedIntersectSize(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(bad == 0L)
    // empty + disjoint edges
    val edge = Seq((Seq[String](), Seq("x")), (Seq("a", "b"), Seq("c", "d")))
      .toDF("a", "b")
    val vals = edge.select(
      graft.functions.ArrayFunctions.sortedIntersectSize(col("a"), col("b")))
      .collect().map(_.getLong(0))
    assert(vals.toSeq == Seq(0L, 0L))
  }
}
