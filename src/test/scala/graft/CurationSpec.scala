package graft

import graft.dedup.Decontaminate
import graft.load.Splits
import graft.operators.{Funnel, Sessionize}
import graft.text.Vocab
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // ---- sessionize ---------------------------------------------------------

  private lazy val ev = Seq(
    (1L, 1L, ts("2024-01-01 10:00:00")),
    (2L, 1L, ts("2024-01-01 10:29:00")), // 29 min gap → same session
    (3L, 1L, ts("2024-01-01 10:59:00")), // exactly 30 min → same (gap must EXCEED)
    (4L, 1L, ts("2024-01-01 11:29:01")), // 30 min 1 s → new session
    (5L, 2L, ts("2024-01-01 00:00:00")))
    .toDF("event_id", "user_id", "ts")

  test("sessionize: gap must strictly exceed the threshold; ordinals are per-key") {
    val out = Sessionize.sessionize(ev, "user_id", "ts", "event_id", 1800L)
      .select("event_id", "session_id").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 1L))
  }

  test("sessionStats: counts, start, duration") {
    val stats = Sessionize.sessionStats(ev, "user_id", "ts", "event_id", 1800L)
      .orderBy("user_id", "session_id")
      .as[(Long, Long, Long, String, Long)].collect()
    assert(stats(0) == ((1L, 1L, 3L, "2024-01-01 10:00:00", 3540L * 1000000)))
    assert(stats(1) == ((1L, 2L, 1L, "2024-01-01 11:29:01", 0L)))
    assert(stats(2) == ((2L, 1L, 1L, "2024-01-01 00:00:00", 0L)))
  }

  // ---- funnel -------------------------------------------------------------

  test("funnel: out-of-order steps do not count") {
    // user 1: view→click→buy (full). user 2: click before view (click never
    // qualifies). user 3: view only.
    val f = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:01:00"), "click"),
      (1L, ts("2024-01-01 10:02:00"), "purchase"),
      (2L, ts("2024-01-01 09:00:00"), "click"),
      (2L, ts("2024-01-01 09:30:00"), "view"),
      (3L, ts("2024-01-01 08:00:00"), "view"))
      .toDF("user_id", "ts", "event_type")
    val out = Funnel.completionCounts(f, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
      .as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((1L, "view", 3L), (2L, "click", 1L), (3L, "purchase", 1L)))
  }

  test("funnel: same-timestamp step qualifies (at-or-after)") {
    val f = Seq((1L, ts("2024-01-01 10:00:00"), "view"), (1L, ts("2024-01-01 10:00:00"), "click"))
      .toDF("user_id", "ts", "event_type")
    val out = Funnel.completionCounts(f, "user_id", "ts", "event_type", Seq("view", "click"))
      .as[(Long, String, Long)].collect().toSeq
    assert(out.map(_._3) == Seq(1L, 1L))
  }

  test("windowed funnel: strict order, cap measured from step 0") {
    // user 1: full funnel inside the window. user 2: click at the SAME ts as
    // view (strict > → never qualifies). user 3: purchase lands past the
    // 1-hour cap from first view. user 4: purchase exactly AT the cap (<=
    // qualifies).
    val f = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:01:00"), "click"),
      (1L, ts("2024-01-01 10:02:00"), "purchase"),
      (2L, ts("2024-01-01 09:00:00"), "view"),
      (2L, ts("2024-01-01 09:00:00"), "click"),
      (3L, ts("2024-01-01 08:00:00"), "view"),
      (3L, ts("2024-01-01 08:01:00"), "click"),
      (3L, ts("2024-01-01 09:00:01"), "purchase"),
      (4L, ts("2024-01-01 07:00:00"), "view"),
      (4L, ts("2024-01-01 07:30:00"), "click"),
      (4L, ts("2024-01-01 08:00:00"), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val out = Funnel.windowedCounts(f, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"), windowSec = 3600L)
      .orderBy("step").as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((0L, "view", 4L), (1L, "click", 3L), (2L, "purchase", 2L)))
  }

  test("bpePairCounts: frequency-weighted adjacent char pairs over distinct words") {
    // "aab" ×3, "ab" ×1 → aa:3, ab:3+1=4; single-char words contribute none
    val docs = Seq((1L, "aab aab ab a"), (2L, "aab")).toDF("doc_id", "text")
    val got = Vocab.bpePairCounts(docs, "text").as[(String, Long)].collect().toMap
    assert(got == Map("aa" -> 3L, "ab" -> 4L))
  }

  test("Quality.checkRules: one-scan ledger, null predicate is not a violation") {
    import graft.load.Quality
    val df = Seq(
      (1L, Some(10.0)), (2L, Some(-5.0)), (3L, None), (4L, Some(200.0)))
      .toDF("id", "v")
    val got = Quality.checkRules(df, Seq(
      "v_null" -> col("v").isNull,
      "v_neg" -> (col("v") < 0), // NULL v → null predicate → NOT a violation
      "v_cap" -> (col("v") > 100)))
      .orderBy("rule")
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      ("v_cap", 4L, 1L, false),
      ("v_neg", 4L, 1L, false),
      ("v_null", 4L, 1L, false)))
    val clean = Quality.checkRules(df, Seq("id_null" -> col("id").isNull))
      .as[(String, Long, Long, Boolean)].collect().head
    assert(clean == (("id_null", 4L, 0L, true)))
    intercept[IllegalArgumentException] {
      Quality.checkRules(df, Seq("a" -> col("id").isNull, "a" -> col("v").isNull))
    }
  }

  test("applyChangeFeed: latest op wins, tombstones retract, new keys insert") {
    import graft.load.Snapshot
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq(
      (1L, "a2", 10L, "U"), (1L, "a3", 20L, "U"), // two updates: seq 20 wins
      (2L, "x", 5L, "D"), // retraction: key 2 gone
      (3L, "c2", 7L, "U"), (3L, "x", 9L, "D"), (3L, "c3", 11L, "U"), // U after D: alive
      (4L, "new", 1L, "U")) // insert of an unseen key
      .toDF("k", "v", "seq", "op")
    val got = Snapshot.applyChangeFeed(base, changes, Seq("k"), "seq", "op")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a3", 3L -> "c3", 4L -> "new"))
  }

  test("tombstone purge: anti-join removal, null keys survive, counts reconcile") {
    import graft.load.Tombstone
    val events = Seq(
      (1L, Some(10L)), (2L, Some(20L)), (3L, Some(10L)), (4L, None), (5L, Some(30L)))
      .toDF("event_id", "user_id")
    val tomb = Seq(10L, 10L, 99L).toDF("id") // dup + no-match ids are harmless
    val purged = Tombstone.purge(events, col("user_id"), tomb, "id")
      .select("event_id").as[Long].collect().toSet
    assert(purged == Set(2L, 4L, 5L), "rows of subject 10 gone; null-key row survives")
    val counts = Tombstone.purgeCounts(
      Seq(("events", events, col("user_id"))), tomb, "id")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(counts == Seq(("events", 5L, 2L, 3L)))
  }

  test("weightedSample: matches the md5-priority formula; zero weights excluded") {
    val docs = Seq((1L, 10L), (2L, 1000L), (3L, 10L), (4L, 0L), (5L, 500L))
      .toDF("id", "w")
    val got = Splits.weightedSample(docs, col("id"), col("w"), 3)
      .select("id").as[Long].collect().toSet
    // replicate ξ = (24-bit md5 uniform)/w on the driver
    def u(id: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(6), 16).toDouble / 16777216.0
    }
    val expect = Seq(1L -> 10L, 2L -> 1000L, 3L -> 10L, 5L -> 500L)
      .sortBy { case (id, w) => (u(id) / w, id) }.take(3).map(_._1).toSet
    assert(got == expect)
    assert(!got.contains(4L), "zero-weight rows can never be sampled")
  }

  // ---- splits -------------------------------------------------------------

  test("hash split: deterministic, total, respects weight ranges") {
    val ids = spark.range(1000).select($"id")
    val split = Splits.assignSplit($"id", Seq("train" -> 8, "val" -> 1, "test" -> 1))
    val counts = ids.select(split.as("s")).groupBy("s").count()
      .as[(String, Long)].collect().toMap
    assert(counts.values.sum == 1000)
    assert(counts("train") > counts("val") && counts("train") > counts("test"))
    // stable across evaluations / partitionings
    val again = ids.repartition(7).select(split.as("s")).groupBy("s").count()
      .as[(String, Long)].collect().toMap
    assert(counts == again)
  }

  test("hashSample keeps a stable subset of about num/den") {
    val n = Splits.hashSample(spark.range(1000).toDF(), $"id", 1, 10).count()
    assert(n > 50 && n < 200)
  }

  test("quotaPerKey keeps top-n per key by the given order") {
    val df = Seq(("a", 1L, 5L), ("a", 2L, 9L), ("a", 3L, 7L), ("b", 4L, 1L))
      .toDF("k", "id", "score")
    val kept = Splits.quotaPerKey(df, "k", Seq($"score".desc, $"id"), 2)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L, 4L))
  }

  // ---- vocab --------------------------------------------------------------

  test("term/doc frequencies and rational tf-idf") {
    val docs = Seq((1L, "spark spark join"), (2L, "join scan"), (3L, ""))
      .toDF("doc_id", "text")
    val tdf = Vocab.termDocFrequencies(docs, "doc_id", "text")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(tdf == Map("spark" -> (2L, 1L), "join" -> (2L, 2L), "scan" -> (1L, 1L)))
    val scores = Vocab.tfIdf(docs, "doc_id", "text", 3L)
      .select("token", "score").as[(String, Double)].collect().toMap
    assert(scores("spark") == 4.0) // 2 * (3+1)/(1+1)
    assert(math.abs(scores("join") - 2.6667) < 1e-9) // 8/3 rounded to 4 dp
  }

  test("gini diversity: uniform tokens high, single repeated token zero") {
    val docs = Seq(
      (1L, "a b c d"), // uniform: 1 - 4*(1/16) = 0.75
      (2L, "a a a a"), // single token: 0.0
      (3L, "")) // token-less: omitted
      .toDF("doc_id", "text")
    val g = Vocab.giniDiversity(docs, "doc_id", "text")
      .as[(Long, Double)].collect().toMap
    assert(g.keySet == Set(1L, 2L))
    assert(math.abs(g(1L) - 0.75) < 1e-12 && g(2L) == 0.0)
  }

  test("temperature rebalance: alpha=1 is the natural mix; sqrt variant flattens toward the smallest stratum") {
    import graft.load.Splits
    // skewed strata: 40 'big' rows vs 5 'small' rows
    val rows = ((0 until 40).map(i => (i.toLong, "big")) ++
      (100 until 105).map(i => (i.toLong, "small"))).toDF("id", "s")
    // alpha = 1: keep_frac = 1 everywhere
    assert(Splits.temperatureRebalance(rows, "s", col("id"), alpha = 1.0).count() == 45)
    val kept = Splits.temperatureRebalanceSqrt(rows, "s", col("id"))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    // smallest stratum is kept whole by construction (h^2 < 2^24 always)
    assert(kept("small") == 5L)
    // dominant stratum downsamples toward sqrt(5/40) ~ 0.35 of its rows
    assert(kept("big") < 40L && kept("big") > 0L)
    // determinism: same rows kept under a different partitioning
    val again = Splits.temperatureRebalanceSqrt(rows.repartition(7), "s", col("id"))
      .select("id").as[Long].collect().toSet
    val first = Splits.temperatureRebalanceSqrt(rows, "s", col("id"))
      .select("id").as[Long].collect().toSet
    assert(again == first)
  }

  test("oov ratio against the corpus's own frequent-token vocabulary") {
    // "common" appears 3x (>= minCount 2) -> in-vocab; everything else OOV
    val docs = Seq(
      (1L, "common common rare1"), // 1/3 oov
      (2L, "common rare2 rare3"), // 2/3 oov
      (3L, "")) // token-less: ratio 0, counts 0
      .toDF("doc_id", "text")
    val got = Vocab.oovRatios(docs, "doc_id", "text", minCount = 2L)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((3L, 1L, 1.0 / 3)))
    assert(got(2L) == ((3L, 2L, 2.0 / 3)))
    assert(got(3L) == ((0L, 0L, 0.0)))
  }

  test("ngram counts slide over token runs") {
    val docs = Seq((1L, "a b c a b")).toDF("doc_id", "text")
    val grams = Vocab.ngramCounts(docs, "text", 2).as[(String, Long)].collect().toMap
    assert(grams == Map("a b" -> 2L, "b c" -> 1L, "c a" -> 1L))
    assert(Vocab.ngramCounts(Seq((1L, "a")).toDF("doc_id", "text"), "text", 2).count() == 0)
  }

  // ---- fuzzy join ---------------------------------------------------------

  test("FuzzyJoin.pairsWithinOne matches the brute-force definition") {
    import graft.operators.FuzzyJoin
    // covers substitution / insertion / deletion at prefix, middle, suffix
    val rows = Seq(
      (1L, "abcdef"), (2L, "abcdXf"), (3L, "abdef"), (4L, "abXcdef"),
      (5L, "Xbcdef"), (6L, "abcdeX"), (7L, "zzzzzz"), (8L, "abcdef"))
      .map { case (id, s) => (id, s, 0) }
    val df = rows.toDF("id", "s", "blk")
    val got = FuzzyJoin.pairsWithinOne(df, "id", "s", Seq("blk"), prefixLen = 3, suffixLen = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val brute = (for {
      (i, a, _) <- rows; (j, b, _) <- rows if i < j
      if levenshteinDist(a, b) <= 1
    } yield (i, j)).toSet
    assert(got == brute)
    assert(got.contains((1L, 8L))) // identical strings (distance 0)
  }

  private def levenshteinDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  // ---- upsert / salted join ----------------------------------------------

  test("upsertLatestWins: higher version wins, ties prefer updates, new keys insert") {
    import graft.load.Snapshot
    val current = Seq((1L, "a", 10L), (2L, "b", 10L), (3L, "c", 10L)).toDF("k", "v", "ver")
    val updates = Seq((2L, "b2", 11L), (3L, "c2", 10L), (4L, "d", 5L)).toDF("k", "v", "ver")
    val out = Snapshot.upsertLatestWins(current, updates, Seq("k"), "ver")
      .select("k", "v").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "a", 2L -> "b2", 3L -> "c2", 4L -> "d"))
  }

  test("upsertScd2: closes the open row, appends the new one, keeps history") {
    import graft.load.Snapshot
    // key 1 has history already (a closed row at v5 + an open row); key 2 open
    val current = Seq(
      (1L, "a0", 0L, Option(5L)), (1L, "a1", 5L, None: Option[Long]),
      (2L, "b0", 0L, None: Option[Long]))
      .toDF("k", "v", "valid_from", "valid_to")
    val updates = Seq((1L, "a2", 9L)).toDF("k", "v", "ver")
    val out = Snapshot.upsertScd2(current, updates, Seq("k"), "ver")
      .select("k", "v", "valid_from", "valid_to")
      .as[(Long, String, Long, Option[Long])].collect().toSet
    assert(out == Set(
      (1L, "a0", 0L, Some(5L)), // closed history untouched
      (1L, "a1", 5L, Some(9L)), // open row closed at the update version
      (1L, "a2", 9L, None), // new open row
      (2L, "b0", 0L, None))) // unrelated key untouched
  }

  test("stratifiedSample: per-stratum rates, deterministic, 0/1 extremes exact") {
    import graft.load.Splits
    val df = (1L to 2000L).map(i => (i, if (i % 2 == 0) "big" else "rare")).toDF("id", "s")
    val out = Splits.stratifiedSample(df, "s", col("id"), Map("big" -> 0.25))
    val counts = out.groupBy("s").count().as[(String, Long)].collect().toMap
    assert(counts("rare") == 1000L) // default rate 1.0 keeps the stratum whole
    assert(counts("big") > 150 && counts("big") < 350) // ~25% of 1000
    // deterministic: same rows on a rerun
    val a = out.select("id").as[Long].collect().toSet
    val b = Splits.stratifiedSample(df, "s", col("id"), Map("big" -> 0.25))
      .select("id").as[Long].collect().toSet
    assert(a == b)
    assert(Splits.stratifiedSample(df, "s", col("id"), Map("big" -> 0.0))
      .filter(col("s") === "big").count() == 0)
    // NULL keys: kept by any positive rate (uniform 0.0), dropped by rate 0
    val withNull = Seq((Some(1L), "big"), (None: Option[Long], "big")).toDF("id", "s")
    assert(Splits.stratifiedSample(withNull, "s", col("id"), Map("big" -> 0.25))
      .filter(col("id").isNull).count() == 1)
    assert(Splits.stratifiedSample(withNull, "s", col("id"), Map("big" -> 0.0)).count() == 0)
  }

  test("upsertScd2: non-monotonic update version fails loudly") {
    import graft.load.Snapshot
    val current = Seq((1L, "a1", 5L, None: Option[Long]))
      .toDF("k", "v", "valid_from", "valid_to")
    val late = Seq((1L, "a0", 3L)).toDF("k", "v", "ver")
    val ex = intercept[Exception] {
      Snapshot.upsertScd2(current, late, Seq("k"), "ver").collect()
    }
    assert(ex.getMessage.contains("non-monotonic") ||
      Option(ex.getCause).exists(_.getMessage.contains("non-monotonic")))
  }

  test("upsertLatestWins tolerates map-typed payload columns") {
    import graft.load.Snapshot
    val current = Seq((1L, Map("a" -> "1"), 1L)).toDF("k", "m", "ver")
    val updates = Seq((1L, Map("a" -> "2"), 2L)).toDF("k", "m", "ver")
    val out = Snapshot.upsertLatestWins(current, updates, Seq("k"), "ver")
      .select("m").as[Map[String, String]].collect()
    assert(out.toSeq == Seq(Map("a" -> "2")))
  }

  test("diffTables: added/removed/changed keys, unchanged rows dropped") {
    import graft.load.Snapshot
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "v")
    val b = Seq((2L, "y"), (3L, "z2"), (4L, "w")).toDF("k", "v")
    val out = Snapshot.diffTables(a, b, Seq("k"), Seq("v"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
  }

  test("saltedJoin is row-identical to the plain join (inner and left)") {
    import graft.load.Skew
    val big = Seq((1L, 10.0), (1L, 20.0), (2L, 5.0), (9L, 1.0)).toDF("k", "x")
    val small = Seq((1L, "a"), (2L, "b"), (7L, "unmatched")).toDF("k", "t")
    for (jt <- Seq("inner", "left")) {
      val salted = Skew.saltedJoin(big, small, Seq("k"), saltBuckets = 4, joinType = jt)
        .select("k", "x", "t").collect().map(r => (r.getLong(0), r.getDouble(1), r.get(2)))
      val plain = big.join(small, Seq("k"), jt)
        .select("k", "x", "t").collect().map(r => (r.getLong(0), r.getDouble(1), r.get(2)))
      assert(salted.sortBy(_.toString).toSeq == plain.sortBy(_.toString).toSeq, jt)
    }
    assertThrows[IllegalArgumentException] {
      Skew.saltedJoin(big, small, Seq("k"), 4, "full_outer")
    }
  }

  test("tfIdf in-plan count matches the explicit-count overload") {
    val docs = Seq((1L, "spark spark join"), (2L, "join scan")).toDF("doc_id", "text")
    val a = Vocab.tfIdf(docs, "doc_id", "text", 2L)
      .select("token", "score").as[(String, Double)].collect().toMap
    val b = Vocab.tfIdf(docs, "doc_id", "text")
      .select("token", "score").as[(String, Double)].collect().toMap
    assert(a == b)
  }

  // ---- checksum / profile -------------------------------------------------

  test("tableChecksum: order- and partitioning-independent, content-sensitive") {
    import graft.load.Snapshot
    val rows = Seq((1L, "a"), (2L, "b"), (3L, "c"))
    val a = Snapshot.tableChecksum(rows.toDF("id", "v"), Seq("id", "v")).head()
    val b = Snapshot.tableChecksum(rows.reverse.toDF("id", "v").repartition(3), Seq("id", "v")).head()
    assert(a == b)
    val c = Snapshot.tableChecksum(
      (rows :+ (4L, "d")).toDF("id", "v"), Seq("id", "v")).head()
    assert(a.getString(0) != c.getString(0) && c.getLong(1) == 4L)
    assert(a.getString(0).forall(_.isDigit)) // decimal digits, engine-portable
  }

  test("checksum and profile on an empty table: zeros, not nulls") {
    import graft.load.{Profile, Snapshot}
    val empty = Seq.empty[(Long, String)].toDF("id", "v")
    val ck = Snapshot.tableChecksum(empty, Seq("id", "v")).head()
    assert(ck.getString(0) == "0" && ck.getLong(1) == 0L)
    val pr = Profile.profile(empty, Seq("id", "v")).collect()
    assert(pr.length == 2 && pr.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L))
  }

  test("profile: nulls, distincts, string min/max per column in long format") {
    import graft.load.Profile
    val df = Seq(
      (Some(1), Some("x")), (Some(2), None), (None, Some("y")), (Some(2), Some("x")))
      .toDF("a", "b")
    val out = Profile.profile(df, Seq("a", "b"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))).toMap
    assert(out("a") == ((1L, 2L, "1", "2")))
    assert(out("b") == ((1L, 2L, "x", "y")))
  }

  // ---- dup clusters -------------------------------------------------------

  test("components: chains collapse to min label, disjoint clusters stay apart") {
    import graft.dedup.DupClusters
    // path 1-2-3-4-5 (diameter forces multiple propagation rounds) + pair 8-9
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (8L, 9L)).toDF("id_a", "id_b")
    val comp = DupClusters.components(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L, 8L -> 8L, 9L -> 8L))
  }

  test("keepCanonical keeps cluster minima and untouched docs") {
    import graft.dedup.DupClusters
    val docs = (1L to 10L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val pairs = Seq((2L, 6L), (6L, 7L)).toDF("id_a", "id_b")
    val comp = DupClusters.components(pairs, "id_a", "id_b")
    val kept = DupClusters.keepCanonical(docs, "doc_id", comp)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L, 4L, 5L, 8L, 9L, 10L)) // 6,7 fold into 2
  }

  test("components: unconverged fixpoint fails loudly instead of returning split clusters") {
    import graft.dedup.DupClusters
    // a path of diameter 5 cannot converge in 2 rounds (distributed path;
    // the public components() routes a graph this small to the exact
    // driver fast path, pinned in the sibling test below)
    val pairs = (1L to 6L).sliding(2).map(s => (s(0), s(1))).toSeq.toDF("id_a", "id_b")
    assertThrows[IllegalStateException] {
      DupClusters.componentsDistributed(pairs, "id_a", "id_b", maxIter = 2).collect()
    }
  }

  test("components: bounded graphs take the exact driver fast path regardless of maxIter") {
    import graft.dedup.DupClusters
    // same diameter-5 path: the driver union-find is exact in one pass, so
    // maxIter never applies below the small-graph threshold — and the
    // labels equal the distributed answer (min-id components)
    val pairs = (1L to 6L).sliding(2).map(s => (s(0), s(1))).toSeq.toDF("id_a", "id_b")
    val got = DupClusters.components(pairs, "id_a", "id_b", maxIter = 2)
      .as[(Long, Long)].collect().toSet
    assert(got == (1L to 6L).map(_ -> 1L).toSet)
  }

  test("FuzzyJoin: short strings (segments would overlap) still pair correctly") {
    import graft.operators.FuzzyJoin
    // prefix 3 + suffix 2 = 5 > these lengths: the pigeonhole alone would
    // miss ("ab","abc"); the short bucket must catch it
    val rows = Seq((1L, "ab", 0), (2L, "abc", 0), (3L, "xy", 0), (4L, "abcdef", 0))
    val got = FuzzyJoin.pairsWithinOne(rows.toDF("id", "s", "blk"), "id", "s", Seq("blk"), 3, 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L))) // ab~abc at distance 1; xy and abcdef match nothing
  }

  test("components of an empty pair set is empty") {
    import graft.dedup.DupClusters
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(DupClusters.components(pairs, "id_a", "id_b").count() == 0)
  }

  test("components: star alternation converges in O(log diameter) rounds on a chain") {
    import graft.dedup.DupClusters
    // worst-case shape: a path of 129 nodes (diameter 128). Plain min-label
    // propagation needs ~128 rounds; the large-star/small-star alternation
    // over hash-remapped ids is O(log n) expected — pin a cushion over
    // log2(128)=7. (The id order is IRRELEVANT post-remap: the round-8
    // pointer-doubling loop measured 41 rounds here under hash order.)
    val pairs = (0L to 127L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val rounds = DupClusters.convergenceRounds(pairs, "id_a", "id_b")
    assert(rounds <= 9, s"expected <= 9 rounds (log2 + cushion) on a 128-diameter chain, got $rounds")
    // and the labels are still exact
    val comp = DupClusters.components(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect()
    assert(comp.length == 129 && comp.forall(_._2 == 0L))
  }

  // ---- per-session memoization lifecycle ----------------------------------

  test("minhashComponents memoizes per (session, dir) and evictMemos drops the handle") {
    import graft.queries.CurationQueries
    CurationQueries.evictMemos(spark) // clean slate regardless of test order
    val a = CurationQueries.minhashComponents(spark, sf)
    val b = CurationQueries.minhashComponents(spark, sf)
    assert(a eq b, "second call must return the memoized handle, not re-mine")
    CurationQueries.evictMemos(spark)
    val c = CurationQueries.minhashComponents(spark, sf)
    assert(!(a eq c), "eviction must force a fresh computation")
    assert(c.count() == a.count()) // and the recompute agrees
    CurationQueries.evictMemos(spark)
  }

  test("Memo.truncate upgrades to a reliable checkpoint when a dir is configured") {
    import graft.queries.Memo
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    if (spark.sparkContext.getCheckpointDir.isEmpty) {
      // default mode: local fallback still round-trips the values
      val local = Memo.truncate(df)
      assert(local.as[(Long, String)].collect().sortBy(_._1).toSeq ==
        Seq((1L, "a"), (2L, "b"), (3L, "c")))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toFile
    spark.sparkContext.setCheckpointDir(dir.toString)
    val rel = Memo.truncate(df)
    // values survive the round-trip AND the blocks are in fault-tolerant
    // storage (rdd-* files under the checkpoint dir), not the block manager
    assert(rel.as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val ckptFiles = walk(dir).filter(_.getPath.contains("rdd-"))
    assert(ckptFiles.nonEmpty, "reliable checkpoint must write rdd-* files")
  }

  // ---- decontaminate ------------------------------------------------------

  test("decontaminate flags shingle overlap and removeContaminated drops it") {
    val bench = Seq((100L, "the quick brown fox jumps over lazy dogs")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "prefix the quick brown fox suffix words here"), // shares a 4-shingle
      (2L, "completely different content with no overlap at all"))
      .toDF("doc_id", "text")
    val flagged = Decontaminate.contaminatedIds(corpus, "doc_id", "text", bench, "text", k = 4)
      .as[Long].collect().toSeq
    assert(flagged == Seq(1L))
    val clean = Decontaminate.removeContaminated(corpus, "doc_id", "text", bench, "text", k = 4)
      .select("doc_id").as[Long].collect().toSeq
    assert(clean == Seq(2L))
  }
}
