package graft

import graft.operators.{Allocation, KCore, RobustStats, Scd, TimeSeries}
import org.apache.spark.sql.functions._

/** Unit gates for the round-7 warehouse-lifecycle batch (q179–q188):
  * SCD2 versioning, point-in-time joins, exact proration, k-core peeling,
  * Welch's t, autocorrelation, surprisal, Benford.
  */
class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  // ---- SCD2 ----

  test("scd2 build: runs collapse, intervals chain, versions number from 1") {
    val log = Seq(
      (1, 10L, 100L, "a"), (1, 20L, 101L, "a"), (1, 30L, 102L, "b"),
      (1, 40L, 103L, "a"), (2, 5L, 104L, "x"))
      .toDF("k", "t", "eid", "st")
    val out = Scd.buildVersions(log, Seq("k"), "t", Seq("eid"), "st")
      .orderBy("k", "version")
      .select("k", "version", "state", "valid_from", "valid_to", "is_current")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4), r.getBoolean(5)))
    assert(out.toSeq == Seq(
      (1, 1L, "a", 10L, 30L, false), // the t=20 'a' row collapsed into v1
      (1, 2L, "b", 30L, 40L, false),
      (1, 3L, "a", 40L, -1L, true), // state may RETURN; still a new version
      (2, 1L, "x", 5L, -1L, true)))
  }

  test("scd2 build: null states form runs under null-safe comparison") {
    val log = Seq((1, 1L, 1L, null), (1, 2L, 2L, null), (1, 3L, 3L, "a"))
      .toDF("k", "t", "eid", "st")
    val vs = Scd.buildVersions(log, Seq("k"), "t", Seq("eid"), "st")
      .orderBy("version").select("version", "state").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)))
    assert(vs.toSeq == Seq(1L -> None, 2L -> Some("a")))
  }

  test("scd2 point-in-time: facts pick the version current at fact time") {
    val log = Seq((1, 10L, 1L, "a"), (1, 30L, 2L, "b")).toDF("k", "t", "eid", "st")
    val dim = Scd.buildVersions(log, Seq("k"), "t", Seq("eid"), "st")
    val facts = Seq((1, 5L, "before"), (1, 10L, "at_start"), (1, 29L, "in_v1"),
      (1, 30L, "at_change"), (1, 99L, "current"), (2, 50L, "no_dim"))
      .toDF("k", "ft", "tag")
    val got = Scd.pointInTime(facts, dim, Seq("k"), "ft", Seq("state"))
      .select("tag", "asof_state").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got == Map(
      "before" -> None, "at_start" -> Some("a"), "in_v1" -> Some("a"),
      "at_change" -> Some("b"), "current" -> Some("b"), "no_dim" -> None))
  }

  // ---- Allocation ----

  test("largest remainder: allocations sum exactly to total, proportions hold") {
    val df = Seq(("a", 5L), ("b", 3L), ("c", 2L), ("d", 1L)).toDF("k", "w")
    val out = Allocation.largestRemainder(df, "w", 100L, Seq("k"))
      .select("k", "alloc").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.values.sum == 100L)
    // 100·5/11 = 45.45…, 27.27…, 18.18…, 9.09… → remainders rank a > b > c > d
    assert(out == Map("a" -> 46L, "b" -> 27L, "c" -> 18L, "d" -> 9L))
  }

  test("largest remainder: zero weights get zero, total still exact") {
    val df = Seq(("a", 0L), ("b", 7L), ("c", 0L)).toDF("k", "w")
    val out = Allocation.largestRemainder(df, "w", 13L, Seq("k"))
      .select("k", "alloc").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 0L, "b" -> 13L, "c" -> 0L))
  }

  test("largest remainder: remainder ties split by tieCols ascending") {
    // equal weights, total 3 across 2 rows: base 1 each, one +1 → 'a' wins
    val df = Seq(("b", 1L), ("a", 1L)).toDF("k", "w")
    val out = Allocation.largestRemainder(df, "w", 3L, Seq("k"))
      .select("k", "alloc").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 2L, "b" -> 1L))
  }

  test("largest remainder: negative weight fails loudly") {
    val df = Seq(("a", -1L), ("b", 2L)).toDF("k", "w")
    val ex = intercept[Exception] {
      Allocation.largestRemainder(df, "w", 10L, Seq("k")).collect()
    }
    assert(ex.getMessage.contains("negative weight") ||
      Option(ex.getCause).exists(_.getMessage.contains("negative weight")))
  }

  // ---- KCore ----

  test("k-core: cascade deletion needs the second round") {
    // triangle a-b-c (2-core) + pendant chain c-d, d-e: round 1 kills e
    // (deg 1) and d drops to 1 — only round 2 removes d
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e"))
      .toDF("a", "b")
    val r1 = KCore.peel(edges, k = 2, rounds = 1)
      .select("node").as[String].collect().toSet
    val r2 = KCore.peel(edges, k = 2, rounds = 2)
      .select("node").as[String].collect().toSet
    assert(r1 == Set("a", "b", "c", "d")) // d survives round 1 (deg was 2)
    assert(r2 == Set("a", "b", "c"))
    val degs = KCore.peel(edges, k = 2, rounds = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(degs == Map("a" -> 2L, "b" -> 2L, "c" -> 2L)) // induced degrees
  }

  test("k-core: k above max degree empties the graph") {
    val edges = Seq(("a", "b"), ("b", "c")).toDF("a", "b")
    assert(KCore.peel(edges, k = 3, rounds = 1).count() == 0L)
  }

  // ---- Welch t ----

  test("welch t: matches the closed form on a known pair") {
    // a = [1,2,3], b = [2,4,6,8]: ma=2 va=1, mb=5 vb=20/3
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 2.0), ("b", 4.0), ("b", 6.0), ("b", 8.0))
      .toDF("g", "v")
    val row = RobustStats.welchT(df, "g", "v", scale = 1).collect()
    assert(row.length == 1)
    val r = row.head
    assert(r.getString(0) == "a" && r.getString(1) == "b")
    assert(r.getLong(2) == 3L && r.getLong(3) == 4L)
    val expected = (2.0 - 5.0) / math.sqrt(1.0 / 3 + (20.0 / 3) / 4)
    assert(math.abs(r.getDouble(4) - expected) < 1e-12)
  }

  test("welch t: degenerate groups (n<2 or zero variance) yield null") {
    val df = Seq(("a", 1.0), ("b", 3.0), ("b", 3.0)).toDF("g", "v")
    val r = RobustStats.welchT(df, "g", "v").collect().head
    assert(r.isNullAt(4)) // n_a = 1 and vb = 0 → se guard
  }

  // ---- autocorr ----

  test("autocorr: perfectly linear series correlates at 1") {
    val df = (1 to 10).map(i => ("k", i, i.toDouble)).toDF("k", "o", "v")
    val r = TimeSeries.autoCorrLag(df, Seq("k"), Seq(col("o").asc), "v")
      .collect().head
    assert(r.getAs[Long]("n") == 9L)
    assert(math.abs(r.getAs[Double]("autocorr") - 1.0) < 1e-12)
  }

  test("autocorr: alternating series is perfectly anti-correlated at lag 1") {
    val df = (1 to 8).map(i => ("k", i, if (i % 2 == 0) 1.0 else 0.0))
      .toDF("k", "o", "v")
    val r = TimeSeries.autoCorrLag(df, Seq("k"), Seq(col("o").asc), "v", lagN = 1)
      .collect().head
    assert(math.abs(r.getAs[Double]("autocorr") + 1.0) < 1e-12)
    val r2 = TimeSeries.autoCorrLag(df, Seq("k"), Seq(col("o").asc), "v", lagN = 2)
      .collect().head
    assert(math.abs(r2.getAs[Double]("autocorr") - 1.0) < 1e-12) // period 2
  }

  test("autocorr: constant series yields null (zero variance)") {
    val df = (1 to 5).map(i => ("k", i, 7.0)).toDF("k", "o", "v")
    val r = TimeSeries.autoCorrLag(df, Seq("k"), Seq(col("o").asc), "v")
      .collect().head
    assert(r.isNullAt(r.fieldIndex("autocorr")))
  }

  // ---- surprisal ----

  test("surprisal: rare tokens score higher; integer micro-nat math") {
    val docs = Seq((1L, "the the the the"), (2L, "the zyx"), (3L, ""))
      .toDF("doc_id", "text")
    val out = graft.text.Vocab.surprisalScores(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // corpus: the×5, zyx×1, N=6 → micro-nat weights rounded once per token
    assert(out(3L) == (0L, 0L)) // empty doc: zero tokens, zero score
    val sThe = math.floor(math.log(6.0 / 5.0) * 1e6 + 0.5).toLong
    val sZyx = math.floor(math.log(6.0) * 1e6 + 0.5).toLong
    assert(out(1L) == (4L, (4 * sThe) / 4))
    assert(out(2L) == (2L, (sThe + sZyx) / 2))
    assert(out(2L)._2 > out(1L)._2) // the rare-token doc scores higher
  }

  // ---- benford ----

  test("benford: digits counted from exact cents, all nine rows emitted") {
    val df = Seq(1.00, 1.50, 19.99, 2.00, 0.0, -5.0, 900.0)
      .toDF("v") // cents: 100,150,1999,200,(dropped),(dropped),90000
    val out = graft.load.Quality.benfordAudit(df, "v")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out == Map(1 -> 3L, 2 -> 1L, 3 -> 0L, 4 -> 0L, 5 -> 0L,
      6 -> 0L, 7 -> 0L, 8 -> 0L, 9 -> 1L))
    val ps = graft.load.Quality.benfordAudit(df, "v")
      .agg(sum("expected_p")).head().getDouble(0)
    assert(math.abs(ps - 1.0) < 1e-6) // Benford shares sum to 1
  }
}
