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
    // first 7 rows have incomplete history → null level
    assert((0 until 6).forall(i => out(i).isNullAt(out(i).fieldIndex("level"))))
    (7 until 12).foreach { i =>
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
}
