package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Rank statistics, drift, and corpus-health operators (round 7, third
  * batch): Spearman/Kendall monotone association, Mann-Whitney U, ROC
  * AUC, probability calibration + Brier, day-of-week seasonal indices,
  * Theil-Sen robust trend, n-gram novelty, readability scoring,
  * small-file compaction planning, HITS hubs/authorities, HHI source
  * concentration, and PSI score drift. Determinism rules as elsewhere:
  * exact integer/decimal reductions, mid-ranks kept doubled (never .5),
  * closed-form doubles only at the end, pinned to 6 dp or emitted as
  * exact integer micro-units.
  */
object StatQueries {

  private val pin6 = (c: org.apache.spark.sql.Column) =>
    (floor(c * lit(1000000.0) + lit(0.5)).cast("double") / lit(1000000.0))

  /** Per-customer lifetime spend in cents (exact long), LEFT-joined onto
    * customers — the shared unit table of the rank-stat gates.
    */
  private val SpendCte =
    """sp AS (SELECT o_custkey,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend
      |  FROM orders GROUP BY 1)""".stripMargin

  private def spendUnits(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val spend = Tables.load(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("_spend"))
    Tables.load(s, dir, "customer")
      .join(spend, col("c_custkey") === col("o_custkey"), "left")
  }

  def all: Seq[Q] = Seq(

    // Spearman rank correlation per market segment between account balance
    // and lifetime spend (RankStats.spearmanByGroup): mid-ranks for ties
    // kept DOUBLED so they stay integral, Pearson over the rank integers
    // via exact decimal cross-moments, one closed-form rho pinned at 6 dp.
    Q(
      "q214_spearman",
      s"""WITH $SpendCte,
        |u AS (SELECT c_mktsegment AS seg,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS x,
        |    COALESCE(sp.spend, 0) AS y
        |  FROM customer LEFT JOIN sp ON c_custkey = o_custkey),
        |r AS (SELECT seg,
        |    CAST(2 * rank() OVER (PARTITION BY seg ORDER BY x)
        |         + count(*) OVER (PARTITION BY seg, x) - 1 AS BIGINT) AS rx,
        |    CAST(2 * rank() OVER (PARTITION BY seg ORDER BY y)
        |         + count(*) OVER (PARTITION BY seg, y) - 1 AS BIGINT) AS ry
        |  FROM u),
        |g AS (SELECT seg, CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(CAST(rx AS HUGEINT)) AS HUGEINT) AS sx,
        |    CAST(sum(CAST(ry AS HUGEINT)) AS HUGEINT) AS sy,
        |    CAST(sum(CAST(rx AS HUGEINT) * ry) AS HUGEINT) AS sxy,
        |    CAST(sum(CAST(rx AS HUGEINT) * rx) AS HUGEINT) AS sxx,
        |    CAST(sum(CAST(ry AS HUGEINT) * ry) AS HUGEINT) AS syy
        |  FROM r GROUP BY 1)
        |SELECT seg, CAST(n AS BIGINT) AS n,
        |  floor(CAST(n * sxy - sx * sy AS DOUBLE)
        |      / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
        |         * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
        |    * 1000000.0 + 0.5) / 1000000.0 AS rho
        |FROM g ORDER BY seg""".stripMargin) { (s, dir) =>
      val units = spendUnits(s, dir).select(
        col("c_mktsegment").as("seg"),
        round(col("c_acctbal") * 100, 0).cast("long").as("x"),
        coalesce(col("_spend"), lit(0L)).as("y"))
      graft.operators.RankStats.spearmanByGroup(units, Seq("seg"), "x", "y")
        .select(col("seg"), col("n"), pin6(col("rho")).as("rho"))
        .orderBy("seg")
    },

    // Mann-Whitney U between the two md5-bit variants (the q199 fold) on
    // lifetime spend (RankStats.mannWhitney): ranks reconstructed from the
    // distinct-score tie table + a distributed exclusive prefix sum —
    // never a global rank window; exact tie correction in the z.
    Q(
      "q215_mannwhitney",
      s"""WITH $SpendCte,
        |u AS (SELECT
        |    CAST(CAST('0x' || substr(md5(c_custkey::VARCHAR), 1, 4) AS INT) % 2 AS INT)
        |      AS variant,
        |    COALESCE(sp.spend, 0) AS score
        |  FROM customer LEFT JOIN sp ON c_custkey = o_custkey),
        |t AS (SELECT score, CAST(count(*) AS BIGINT) AS tn,
        |    CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS np
        |  FROM u GROUP BY 1),
        |w AS (SELECT tn, np,
        |    CAST(2 * (sum(tn) OVER (ORDER BY score) - tn) + tn + 1 AS BIGINT) AS r2
        |  FROM t),
        |g AS (SELECT CAST(sum(np) AS HUGEINT) AS n1,
        |    CAST(sum(tn - np) AS HUGEINT) AS n0,
        |    CAST(sum(CAST(np AS HUGEINT) * r2) AS HUGEINT) AS rs2,
        |    CAST(sum(CAST(tn AS HUGEINT) * tn * tn - tn) AS HUGEINT) AS t3t
        |  FROM w)
        |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n0 AS BIGINT) AS n0,
        |  CAST(rs2 - n1 * (n1 + 1) AS BIGINT) AS u2,
        |  floor((CAST(rs2 - n1 * (n1 + 1) AS DOUBLE) / 2.0
        |       - CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE) / 2.0)
        |      / sqrt(CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE) / 12.0
        |             * (CAST(n1 + n0 + 1 AS DOUBLE)
        |                - CAST(t3t AS DOUBLE)
        |                  / (CAST(n1 + n0 AS DOUBLE) * CAST(n1 + n0 - 1 AS DOUBLE))))
        |    * 1000000.0 + 0.5) / 1000000.0 AS z
        |FROM g""".stripMargin) { (s, dir) =>
      val units = spendUnits(s, dir).select(
        (conv(substring(md5(col("c_custkey").cast("string")), 1, 4), 16, 10)
          .cast("int") % 2).as("variant"),
        coalesce(col("_spend"), lit(0L)).as("score"))
      graft.operators.RankStats.mannWhitney(units, "score", "variant")
        .select(col("n1"), col("n0"), col("u2"), pin6(col("z")).as("z"))
    },

    // ROC AUC of account balance as a "will this customer order?"
    // score (RankStats.aucFromScores): the Mann-Whitney estimator with
    // exact mid-rank tie handling — one division of exact integers.
    Q(
      "q216_roc_auc",
      """WITH hc AS (SELECT DISTINCT o_custkey FROM orders),
        |u AS (SELECT CAST(round(c_acctbal * 100) AS BIGINT) AS score,
        |    CASE WHEN hc.o_custkey IS NULL THEN 0 ELSE 1 END AS label
        |  FROM customer LEFT JOIN hc ON c_custkey = o_custkey),
        |t AS (SELECT score, CAST(count(*) AS BIGINT) AS tn,
        |    CAST(sum(label) AS BIGINT) AS np
        |  FROM u GROUP BY 1),
        |w AS (SELECT tn, np,
        |    CAST(2 * (sum(tn) OVER (ORDER BY score) - tn) + tn + 1 AS BIGINT) AS r2
        |  FROM t),
        |g AS (SELECT CAST(sum(np) AS HUGEINT) AS n_pos,
        |    CAST(sum(tn - np) AS HUGEINT) AS n_neg,
        |    CAST(sum(CAST(np AS HUGEINT) * r2) AS HUGEINT) AS rs2
        |  FROM w)
        |SELECT CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
        |  floor(CAST(rs2 - n_pos * (n_pos + 1) AS DOUBLE)
        |      / CAST(2 * n_pos * n_neg AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS auc
        |FROM g""".stripMargin) { (s, dir) =>
      val hasOrder = Tables.load(s, dir, "orders").select(col("o_custkey")).distinct()
      val units = Tables.load(s, dir, "customer")
        .join(hasOrder, col("c_custkey") === col("o_custkey"), "left")
        .select(
          round(col("c_acctbal") * 100, 0).cast("long").as("score"),
          when(col("o_custkey").isNull, 0).otherwise(1).as("label"))
      graft.operators.RankStats.aucFromScores(units, "score", "label")
        .select(col("n_pos"), col("n_neg"), pin6(col("auc")).as("auc"))
    },

    // Probability calibration by balance decile (GlobalRank.ntile — the
    // distributed ntile, no single-partition window — then
    // Eval.calibrationBins): decile midpoint (2d−1)/20 as the predicted
    // probability in exact micro units, reliability read as mean_p vs
    // frac_pos, per-bin Brier as an exact integer floor quotient.
    Q(
      "q217_calibration",
      """WITH hc AS (SELECT DISTINCT o_custkey FROM orders),
        |u AS (SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) AS x,
        |    CASE WHEN hc.o_custkey IS NULL THEN 0 ELSE 1 END AS label
        |  FROM customer LEFT JOIN hc ON c_custkey = o_custkey),
        |d AS (SELECT CAST(ntile(10) OVER (ORDER BY x, c_custkey) AS BIGINT) AS bucket,
        |    label FROM u),
        |p AS (SELECT bucket, (2 * bucket - 1) * 50000 AS pm, label FROM d)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(label) AS BIGINT) AS n_pos,
        |  CAST(sum(CAST(pm AS HUGEINT)) // CAST(count(*) AS HUGEINT) AS BIGINT)
        |    AS mean_p_micro,
        |  floor(CAST(sum(label) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |    * 1000000.0 + 0.5) / 1000000.0 AS frac_pos,
        |  CAST(sum(CAST(pm - 1000000 * label AS HUGEINT) * (pm - 1000000 * label))
        |    // (CAST(count(*) AS HUGEINT) * 1000000) AS BIGINT) AS brier_micro
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val hasOrder = Tables.load(s, dir, "orders").select(col("o_custkey")).distinct()
      val units = Tables.load(s, dir, "customer")
        .join(hasOrder, col("c_custkey") === col("o_custkey"), "left")
        .select(
          col("c_custkey"),
          round(col("c_acctbal") * 100, 0).cast("long").as("x"),
          when(col("o_custkey").isNull, 0).otherwise(1).as("label"))
      val deciled = graft.operators.GlobalRank
        .ntile(units, Seq("x", "c_custkey"), 10, "bucket")
        .withColumn("p_micro", (lit(2L) * col("bucket") - 1) * lit(50000L))
      graft.operators.Eval.calibrationBins(deciled, "bucket", "p_micro", "label")
        .select(col("bucket"), col("n"), col("n_pos"), col("mean_p_micro"),
          pin6(col("frac_pos")).as("frac_pos"), col("brier_micro"))
        .orderBy("bucket")
    },

    // Day-of-week seasonal index of daily revenue per priority
    // (TimeSeries.seasonalIndex): season mean over key mean as the exact
    // integer quotient (s·n_all·10⁶) div (n·s_all) — no fp at all. The
    // dow convention follows q47: DuckDB dayofweek()+1 == Spark dayofweek.
    Q(
      "q218_seasonal_dow",
      """WITH d AS (SELECT o_orderpriority AS priority, o_orderdate AS dt,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
        |  FROM orders GROUP BY 1, 2),
        |s AS (SELECT priority, CAST(dayofweek(dt) + 1 AS BIGINT) AS season,
        |    CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS s
        |  FROM d GROUP BY 1, 2),
        |k AS (SELECT priority, CAST(sum(n) AS BIGINT) AS na,
        |    CAST(sum(s) AS BIGINT) AS sa FROM s GROUP BY 1)
        |SELECT s.priority, s.season, s.n, s.s,
        |  CAST(CAST(s.s AS HUGEINT) * na * 1000000
        |    // (CAST(s.n AS HUGEINT) * sa) AS BIGINT) AS idx_micro
        |FROM s JOIN k USING (priority) ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      val daily = Tables.load(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("priority"), col("o_orderdate").as("dt"))
        .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("v"))
        .select(col("priority"), dayofweek(col("dt")).cast("long").as("dow"), col("v"))
      graft.operators.TimeSeries
        .seasonalIndex(daily, Seq("priority"), "dow", "v")
        .orderBy("priority", "season")
    },

    // Theil-Sen robust slope of monthly revenue per priority
    // (TimeSeries.theilSenSlope): median of all pairwise slopes, each
    // pinned ONCE to integer micro-units via a positive-offset floor
    // division (floor-vs-truncate can never disagree), median as the
    // exact two-middle average.
    Q(
      "q219_theil_sen",
      """WITH m AS (SELECT o_orderpriority AS priority,
        |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS t,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
        |  FROM orders GROUP BY 1, 2),
        |p AS (SELECT a.priority,
        |    ((b.v - a.v) * 1000000 + 1000000000000 * (b.t - a.t)) // (b.t - a.t)
        |      - 1000000000000 AS slope
        |  FROM m a JOIN m b ON a.priority = b.priority AND a.t < b.t),
        |r AS (SELECT priority, slope,
        |    row_number() OVER (PARTITION BY priority ORDER BY slope) AS rn,
        |    count(*) OVER (PARTITION BY priority) AS n
        |  FROM p)
        |SELECT priority, CAST(min(n) AS BIGINT) AS n_pairs, avg(slope) AS slope_micro
        |FROM r WHERE rn IN ((n + 1) // 2, (n + 2) // 2)
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val monthly = Tables.load(s, dir, "orders")
        .groupBy(
          col("o_orderpriority").as("priority"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
            .cast("long").as("t"))
        .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("v"))
      graft.operators.TimeSeries
        .theilSenSlope(monthly, Seq("priority"), "t", "v")
        .orderBy("priority")
    },

    // Per-document 3-gram novelty against all earlier documents
    // (Vocab.noveltyRatios): share of the doc's distinct shingles whose
    // first corpus occurrence is this doc — the fresh-content signal.
    Q(
      "q220_novelty",
      """WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
        |             FROM documents),
        |g AS (SELECT DISTINCT doc_id,
        |    t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
        |  FROM tok, unnest(generate_series(1, len(t) - 2)) AS u(i)),
        |f AS (SELECT gram, min(doc_id) AS fd FROM g GROUP BY 1),
        |p AS (SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |    CAST(sum(CASE WHEN f.fd = g.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
        |  FROM g JOIN f USING (gram) GROUP BY 1)
        |SELECT d.doc_id, COALESCE(p.n_grams, 0) AS n_grams,
        |  COALESCE(p.n_novel, 0) AS n_novel,
        |  CASE WHEN COALESCE(p.n_grams, 0) > 0
        |       THEN p.n_novel * 1000000 // p.n_grams ELSE 0 END AS novelty_micro
        |FROM documents d LEFT JOIN p USING (doc_id) ORDER BY d.doc_id""".stripMargin) {
      (s, dir) =>
        graft.text.Vocab
          .noveltyRatios(Tables.load(s, dir, "documents"), "doc_id", "text", 3)
          .orderBy("doc_id")
    },

    // Flesch-style readability per document (TextAnalysis word/sentence/
    // vowel-group counts): three exact regex counts shared verbatim with
    // the oracle; the score is one closed-form double pinned to micro.
    Q(
      "q221_readability",
      """WITH c AS (SELECT doc_id,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_words,
        |    CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT) AS n_sents,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_vgrp
        |  FROM documents)
        |SELECT doc_id, n_words, n_sents, n_vgrp,
        |  CASE WHEN n_words > 0 THEN CAST(floor((206.835
        |    - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sents AS DOUBLE))
        |    - 84.6 * (CAST(n_vgrp AS DOUBLE) / CAST(n_words AS DOUBLE)))
        |    * 1000000.0 + 0.5) AS BIGINT) END AS flesch_micro
        |FROM c ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import graft.text.TextAnalysis
      Tables.load(s, dir, "documents")
        .select(
          col("doc_id"),
          TextAnalysis.wordCount(col("text")).cast("long").as("n_words"),
          TextAnalysis.sentenceCount(col("text")).cast("long").as("n_sents"),
          TextAnalysis.vowelGroupCount(col("text")).cast("long").as("n_vgrp"))
        .withColumn(
          "flesch_micro",
          when(col("n_words") > 0,
            floor((lit(206.835)
              - lit(1.015) * (col("n_words").cast("double") / col("n_sents").cast("double"))
              - lit(84.6) * (col("n_vgrp").cast("double") / col("n_words").cast("double")))
              * lit(1000000.0) + lit(0.5)).cast("long")))
        .orderBy("doc_id")
    },

    // Small-file compaction plan per language partition (Compaction.plan):
    // next-fit bin packing via a PARTITIONED window prefix sum — files
    // ordered by id, bin = cum div target, per-bin rollups. The global
    // (unpartitioned) variant is the q113 GlobalRank manifest.
    Q(
      "q222_compaction_plan",
      """WITH b AS (SELECT lang, doc_id, n_chars,
        |    COALESCE(CAST(sum(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cum
        |  FROM documents)
        |SELECT lang, cum // 8192 AS bin, CAST(count(*) AS BIGINT) AS n_files,
        |  CAST(sum(n_chars) AS BIGINT) AS bytes,
        |  CAST(min(doc_id) AS BIGINT) AS first_file,
        |  CAST(max(doc_id) AS BIGINT) AS last_file,
        |  CAST(sum(n_chars) AS BIGINT) * 1000000 // 8192 AS fill_micro
        |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      graft.load.Compaction
        .plan(Tables.load(s, dir, "documents"), Seq("lang"), "doc_id", "n_chars", 8192L)
        .orderBy("lang", "bin")
    },

    // HITS hubs/authorities on the DIRECTED bigram graph (Hits.hitsCounts,
    // two exact-integer power-iteration rounds — unnormalized, so the
    // ranking matches the classic iterate with zero fp): which words feed
    // into (hub) / are fed by (authority) the corpus's collocation flow.
    Q(
      "q223_hits",
      """WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
        |             FROM documents),
        |bg AS (SELECT t[i] || ' ' || t[i+1] AS gram
        |       FROM tok, unnest(generate_series(1, len(t) - 1)) AS g(i)),
        |pc AS (SELECT gram, count(*) AS n FROM bg GROUP BY gram),
        |ed AS (SELECT DISTINCT split_part(gram, ' ', 1) AS s, split_part(gram, ' ', 2) AS d
        |       FROM pc
        |       WHERE n >= 5 AND split_part(gram, ' ', 1) != split_part(gram, ' ', 2)),
        |a1 AS (SELECT d AS node, CAST(count(*) AS BIGINT) AS a FROM ed GROUP BY 1),
        |h1 AS (SELECT ed.s AS node, CAST(sum(a1.a) AS BIGINT) AS h
        |       FROM ed JOIN a1 ON ed.d = a1.node GROUP BY 1),
        |a2 AS (SELECT ed.d AS node, CAST(sum(h1.h) AS BIGINT) AS a
        |       FROM ed JOIN h1 ON ed.s = h1.node GROUP BY 1)
        |SELECT COALESCE(h1.node, a2.node) AS node, COALESCE(h1.h, 0) AS hub,
        |  COALESCE(a2.a, 0) AS authority
        |FROM h1 FULL OUTER JOIN a2 ON h1.node = a2.node
        |ORDER BY authority DESC, hub DESC, node LIMIT 100""".stripMargin) { (s, dir) =>
      val sp = split(col("gram"), " ")
      val edges = SharedFrames.bigramCounts(s, dir)
        .filter(col("n") >= 5)
        .select(sp.getItem(0).as("src"), sp.getItem(1).as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      graft.operators.Hits.hitsCounts(edges, "src", "dst")
        .orderBy(col("authority").desc, col("hub").desc, col("node"))
        .limit(100)
    },

    // Kendall τ-b per priority between monthly order count and monthly
    // revenue (RankStats.kendallTauByGroup): concordant/discordant pair
    // counts over the bounded series grain, exact tie terms, one
    // closed-form τ pinned at 6 dp.
    Q(
      "q224_kendall",
      """WITH m AS (SELECT o_orderpriority AS priority,
        |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS t,
        |    CAST(count(*) AS BIGINT) AS x,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
        |  FROM orders GROUP BY 1, 2),
        |p AS (SELECT a.priority,
        |    (CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END)
        |    * (CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END) AS sg,
        |    CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tx,
        |    CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS ty
        |  FROM m a JOIN m b ON a.priority = b.priority AND a.t < b.t),
        |g AS (SELECT priority, CAST(count(*) AS BIGINT) AS pairs,
        |    CAST(sum(CASE WHEN sg > 0 THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN sg < 0 THEN 1 ELSE 0 END) AS BIGINT) AS d,
        |    CAST(sum(tx) AS BIGINT) AS tx, CAST(sum(ty) AS BIGINT) AS ty
        |  FROM p GROUP BY 1)
        |SELECT priority, pairs AS n_pairs, c AS concordant, d AS discordant,
        |  CASE WHEN pairs - tx > 0 AND pairs - ty > 0 THEN
        |    floor(CAST(c - d AS DOUBLE)
        |        / sqrt(CAST(pairs - tx AS DOUBLE) * CAST(pairs - ty AS DOUBLE))
        |      * 1000000.0 + 0.5) / 1000000.0 END AS tau_b
        |FROM g ORDER BY priority""".stripMargin) { (s, dir) =>
      val monthly = Tables.load(s, dir, "orders")
        .groupBy(
          col("o_orderpriority").as("priority"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
            .cast("long").as("t"))
        .agg(
          count(lit(1)).as("x"),
          sum(round(col("o_totalprice") * 100, 0).cast("long")).as("y"))
      graft.operators.RankStats
        .kendallTauByGroup(monthly, Seq("priority"), "t", "x", "y")
        .select(col("priority"), col("n_pairs"), col("concordant"),
          col("discordant"), pin6(col("tau_b")).as("tau_b"))
        .orderBy("priority")
    },

    // Herfindahl-Hirschman spend concentration per market segment
    // (Drift.hhi): Σ share² as one division of exact decimal sums — the
    // "is one customer the whole segment?" audit.
    Q(
      "q225_hhi",
      s"""WITH $SpendCte,
        |u AS (SELECT c_mktsegment AS seg, COALESCE(sp.spend, 0) AS m
        |  FROM customer LEFT JOIN sp ON c_custkey = o_custkey),
        |g AS (SELECT seg, CAST(count(*) AS BIGINT) AS n_members,
        |    CAST(sum(CAST(m AS HUGEINT)) AS HUGEINT) AS sm,
        |    CAST(sum(CAST(m AS HUGEINT) * m) AS HUGEINT) AS sm2
        |  FROM u GROUP BY 1)
        |SELECT seg, n_members, CAST(sm AS BIGINT) AS total_mass,
        |  floor(CAST(sm2 AS DOUBLE) / (CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE))
        |    * 1000000.0 + 0.5) / 1000000.0 AS hhi
        |FROM g ORDER BY seg""".stripMargin) { (s, dir) =>
      val units = spendUnits(s, dir).select(
        col("c_mktsegment").as("seg"),
        coalesce(col("_spend"), lit(0L)).as("m"))
      graft.operators.Drift.hhi(units, Seq("seg"), "m")
        .select(col("seg"), col("n_members"), col("total_mass"),
          pin6(col("hhi")).as("hhi"))
        .orderBy("seg")
    },

    // PSI score drift of order value between the ≤1997 and later eras
    // (Drift.psiTerms over Drift.widthBucket): Laplace-smoothed bucket
    // shares, one ln per bucket pinned to micro-nats — the
    // deployed-model drift alarm.
    Q(
      "q226_psi",
      """WITH u AS (SELECT
        |    least(greatest(CAST(floor(CAST(round(o_totalprice * 100) AS BIGINT)
        |      / 2500000) AS BIGINT), 0), 19) AS bucket,
        |    CASE WHEN year(o_orderdate) <= 1997 THEN 0 ELSE 1 END AS sl
        |  FROM orders),
        |c AS (SELECT bucket,
        |    CAST(sum(CASE WHEN sl = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
        |    CAST(sum(CASE WHEN sl = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
        |  FROM u GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS b, CAST(sum(n_ref) AS BIGINT) AS tr,
        |    CAST(sum(n_cur) AS BIGINT) AS tc FROM c)
        |SELECT bucket, n_ref, n_cur,
        |  CAST(floor((CAST(n_cur + 1 AS DOUBLE) / CAST(tc + b AS DOUBLE)
        |       - CAST(n_ref + 1 AS DOUBLE) / CAST(tr + b AS DOUBLE))
        |      * ln((CAST(n_cur + 1 AS DOUBLE) / CAST(tc + b AS DOUBLE))
        |            / (CAST(n_ref + 1 AS DOUBLE) / CAST(tr + b AS DOUBLE)))
        |      * 1000000.0 + 0.5) AS BIGINT) AS psi_micro
        |FROM c, t ORDER BY bucket""".stripMargin) { (s, dir) =>
      val u = Tables.load(s, dir, "orders")
        .select(
          graft.operators.Drift.widthBucket(
            round(col("o_totalprice") * 100, 0).cast("long"), 0L, 2500000L, 20)
            .as("bucket"),
          when(year(col("o_orderdate")) <= 1997, 0).otherwise(1).as("sl"))
      graft.operators.Drift.psiTerms(u, "bucket", "sl")
        .orderBy("bucket")
    },

    // Benjamini-Hochberg FDR step-up over a 100-hypothesis table
    // (Experiment.bhFdr): p·m div rank floor quotients, suffix running
    // min, clamp at 1. The p column is the library's deterministic md5
    // stand-in (the q199 fold recipe) — the gate pins the CORRECTION
    // mechanics; any upstream test statistic feeds the same table shape.
    Q(
      "q227_bh_fdr",
      """WITH h AS (SELECT s_suppkey,
        |    CAST(CAST('0x' || substr(md5(s_suppkey::VARCHAR), 1, 6) AS BIGINT)
        |      % 1000000 AS BIGINT) AS p_micro
        |  FROM supplier),
        |r AS (SELECT s_suppkey, p_micro,
        |    CAST(row_number() OVER (ORDER BY p_micro, s_suppkey) AS BIGINT) AS rank,
        |    CAST(count(*) OVER () AS BIGINT) AS m
        |  FROM h),
        |c AS (SELECT s_suppkey, p_micro, rank,
        |    least(p_micro * m // rank, 1000000) AS cand FROM r)
        |SELECT s_suppkey, p_micro, rank,
        |  CAST(min(cand) OVER (ORDER BY rank DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS p_adj_micro
        |FROM c ORDER BY rank""".stripMargin) { (s, dir) =>
      val hyp = Tables.load(s, dir, "supplier").select(
        col("s_suppkey"),
        (conv(substring(md5(col("s_suppkey").cast("string")), 1, 6), 16, 10)
          .cast("long") % 1000000L).as("p_micro"))
      graft.operators.Experiment.bhFdr(hyp, "s_suppkey", "p_micro")
        .orderBy("rank")
    },

    // Shannon entropy of the language mix per source (Experiment.entropy):
    // one ln per (source, lang) cell pinned to micro-nats BEFORE the sum —
    // the order-free-total recipe — 0 for monolingual sources.
    Q(
      "q228_entropy",
      """WITH c AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS n
        |           FROM documents GROUP BY 1, 2),
        |t AS (SELECT source, CAST(count(*) AS BIGINT) AS n_cats,
        |    CAST(sum(n) AS BIGINT) AS n_rows FROM c GROUP BY 1)
        |SELECT t.source, t.n_cats, t.n_rows,
        |  CAST(sum(CAST(floor(-(CAST(n AS DOUBLE) / CAST(n_rows AS DOUBLE))
        |    * ln(CAST(n AS DOUBLE) / CAST(n_rows AS DOUBLE))
        |    * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS entropy_micro
        |FROM c JOIN t USING (source) GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin) {
      (s, dir) =>
        graft.operators.Experiment
          .entropy(Tables.load(s, dir, "documents"), Seq("source"), "lang")
          .orderBy("source")
    },

    // Mutual information between market segment and order priority
    // (Experiment.mutualInformation): the dependence-strength companion to
    // q201's chi-squared, same one-fact-pass cell/marginal shape; only
    // observed cells contribute (p·ln p → 0).
    Q(
      "q229_mutual_info",
      """WITH f AS (SELECT c_mktsegment AS seg, o_orderpriority AS pri
        |           FROM orders JOIN customer ON o_custkey = c_custkey),
        |cl AS (SELECT seg, pri, CAST(count(*) AS BIGINT) AS nxy FROM f GROUP BY 1, 2),
        |r AS (SELECT seg, CAST(sum(nxy) AS BIGINT) AS nr FROM cl GROUP BY 1),
        |c AS (SELECT pri, CAST(sum(nxy) AS BIGINT) AS nc FROM cl GROUP BY 1),
        |t AS (SELECT CAST(sum(nxy) AS BIGINT) AS n,
        |    CAST(count(DISTINCT seg) AS BIGINT) AS n_rows,
        |    CAST(count(DISTINCT pri) AS BIGINT) AS n_cols FROM cl)
        |SELECT t.n, t.n_rows, t.n_cols,
        |  CAST(sum(CAST(floor((CAST(nxy AS DOUBLE) / CAST(t.n AS DOUBLE))
        |    * ln(CAST(CAST(nxy AS HUGEINT) * t.n AS DOUBLE)
        |         / CAST(CAST(nr AS HUGEINT) * nc AS DOUBLE))
        |    * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS mi_micro
        |FROM cl JOIN r USING (seg) JOIN c USING (pri) CROSS JOIN t
        |GROUP BY 1, 2, 3""".stripMargin) { (s, dir) =>
      val f = Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("seg"), col("o_orderpriority").as("pri"))
      graft.operators.Experiment.mutualInformation(f, "seg", "pri")
    },

    // Personalized PageRank from the alphabetically-first collocation node
    // (PageRank.personalizedRanks, 2 scaled-integer iterations): restart
    // mass lands only at the seed, so rank decays with distance — the
    // seed-expansion relevance spreader, bit-exact (all integer div/sums).
    Q(
      "q230_ppr",
      """WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
        |             FROM documents),
        |bg AS (SELECT t[i] || ' ' || t[i+1] AS gram
        |       FROM tok, unnest(generate_series(1, len(t) - 1)) AS g(i)),
        |pc AS (SELECT gram, count(*) AS n FROM bg GROUP BY gram),
        |ed AS (SELECT DISTINCT split_part(gram, ' ', 1) AS s, split_part(gram, ' ', 2) AS d
        |       FROM pc
        |       WHERE n >= 5 AND split_part(gram, ' ', 1) != split_part(gram, ' ', 2)),
        |deg AS (SELECT s, CAST(count(*) AS BIGINT) AS dg FROM ed GROUP BY 1),
        |nodes AS (SELECT DISTINCT node FROM
        |  (SELECT s AS node FROM ed UNION ALL SELECT d FROM ed)),
        |sv AS (SELECT min(s) AS sn FROM ed),
        |r0 AS (SELECT node, CASE WHEN node = sn THEN 1000000000000 ELSE 0 END AS rk
        |       FROM nodes, sv),
        |c1 AS (SELECT ed.d AS node, CAST(sum(r0.rk // deg.dg) AS BIGINT) AS cin
        |       FROM ed JOIN r0 ON ed.s = r0.node JOIN deg ON ed.s = deg.s GROUP BY 1),
        |r1 AS (SELECT n.node,
        |    CASE WHEN n.node = sv.sn THEN 150000000000 ELSE 0 END
        |      + (17 * COALESCE(c1.cin, 0)) // 20 AS rk
        |  FROM nodes n LEFT JOIN c1 USING (node) CROSS JOIN sv),
        |c2 AS (SELECT ed.d AS node, CAST(sum(r1.rk // deg.dg) AS BIGINT) AS cin
        |       FROM ed JOIN r1 ON ed.s = r1.node JOIN deg ON ed.s = deg.s GROUP BY 1),
        |r2 AS (SELECT n.node,
        |    CASE WHEN n.node = sv.sn THEN 150000000000 ELSE 0 END
        |      + (17 * COALESCE(c2.cin, 0)) // 20 AS rk
        |  FROM nodes n LEFT JOIN c2 USING (node) CROSS JOIN sv)
        |SELECT node, CAST(rk AS BIGINT) AS rank FROM r2 WHERE rk > 0
        |ORDER BY rank DESC, node LIMIT 100""".stripMargin) { (s, dir) =>
      val sp = split(col("gram"), " ")
      val edges = SharedFrames.bigramCounts(s, dir)
        .filter(col("n") >= 5)
        .select(sp.getItem(0).as("src"), sp.getItem(1).as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      val seed = edges.agg(min(col("src")).as("node"))
      // sparse: the gate filters rank > 0, so only the seed's 2-hop
      // neighborhood need ever materialize — no nodes-distinct shuffle
      graft.operators.PageRank.personalizedRanks(edges, seed, iters = 2, sparse = true)
        .filter(col("rank") > 0)
        .orderBy(col("rank").desc, col("node"))
        .limit(100)
    },

    // Exact 10%-symmetric trimmed mean of line-item price
    // (RobustStats.trimmedMean): GlobalRank stamp + rank filter + one
    // exact decimal sum — the robust center without a single-partition
    // sort anywhere.
    Q(
      "q231_trimmed_mean",
      """WITH r AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
        |    row_number() OVER (ORDER BY CAST(round(l_extendedprice * 100) AS BIGINT),
        |      l_orderkey, l_linenumber) AS rn,
        |    count(*) OVER () AS n
        |  FROM lineitem)
        |SELECT CAST(min(n) AS BIGINT) AS n,
        |  CAST(2 * (min(n) // 10) AS BIGINT) AS n_trimmed,
        |  CAST(sum(CAST(v AS HUGEINT)) * 1000000 // count(*) AS BIGINT)
        |    AS trimmed_mean_micro
        |FROM r WHERE rn > n // 10 AND rn <= n - n // 10""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem").select(
        round(col("l_extendedprice") * 100, 0).cast("long").as("cents"),
        col("l_orderkey"), col("l_linenumber"))
      graft.operators.RobustStats
        .trimmedMean(li, "cents", Seq("l_orderkey", "l_linenumber"), 1, 10)
    },

    // Weighted p95 of price weighted by quantity
    // (RobustStats.weightedQuantile): the weightedMedian generalization —
    // smallest value whose inclusive cumulative weight reaches ⌈0.95·W⌉,
    // via the GlobalRank two-pass running total.
    Q(
      "q232_weighted_quantile",
      """WITH w AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
        |    CAST(l_quantity AS BIGINT) AS wt, l_orderkey, l_linenumber FROM lineitem),
        |t AS (SELECT CAST(sum(wt) AS BIGINT) AS tot FROM w),
        |c AS (SELECT v, wt,
        |    CAST(sum(wt) OVER (ORDER BY v, l_orderkey, l_linenumber) AS BIGINT) AS cum
        |  FROM w)
        |SELECT CAST(min(v) AS BIGINT) AS weighted_quantile
        |FROM c, t WHERE cum >= (tot * 95 + 99) // 100 AND wt > 0""".stripMargin) {
      (s, dir) =>
        val li = Tables.load(s, dir, "lineitem").select(
          round(col("l_extendedprice") * 100, 0).cast("long").as("cents"),
          col("l_quantity").cast("long").as("qty"),
          col("l_orderkey"), col("l_linenumber"))
        graft.operators.RobustStats.weightedQuantile(
          li, "cents", "qty", Seq("l_orderkey", "l_linenumber"), 95L, 100L)
    },

    // Partition-skew audit: per-nation data mass, share of total, a hot
    // flag at 6%, and the fleet-wide HHI (Drift.hhi keyed constant) as
    // the one-number concentration readout — the "will one partition
    // dominate the stage?" pre-flight every 100 TB job wants.
    Q(
      "q233_skew_audit",
      """WITH m AS (SELECT c_nationkey AS nk, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS mass
        |  FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1),
        |t AS (SELECT CAST(sum(mass) AS BIGINT) AS tot,
        |    CAST(count(*) AS BIGINT) AS n_parts,
        |    CAST(sum(CAST(mass AS HUGEINT) * mass) AS HUGEINT) AS sm2 FROM m)
        |SELECT nk, n_rows, mass,
        |  CAST(CAST(mass AS HUGEINT) * 1000000 // tot AS BIGINT) AS share_micro,
        |  CAST(CAST(mass AS HUGEINT) * 1000000 // tot >= 60000 AS BOOLEAN) AS hot,
        |  floor(CAST(sm2 AS DOUBLE) / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE))
        |    * 1000000.0 + 0.5) / 1000000.0 AS hhi
        |FROM m, t ORDER BY nk""".stripMargin) { (s, dir) =>
      val masses = Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nk"))
        .agg(
          count(lit(1)).as("n_rows"),
          sum(round(col("o_totalprice") * 100, 0).cast("long")).as("mass"))
      val hhiRow = graft.operators.Drift
        .hhi(masses.withColumn("_one", lit(1)), Seq("_one"), "mass")
        .select(col("total_mass").as("_tot"), col("hhi").as("_hhi"))
      masses.crossJoin(broadcast(hhiRow))
        .select(
          col("nk"), col("n_rows"), col("mass"),
          expr("(cast(mass as decimal(38,0)) * 1000000) div _tot").as("share_micro"),
          (expr("(cast(mass as decimal(38,0)) * 1000000) div _tot") >= 60000L).as("hot"),
          pin6(col("_hhi")).as("hhi"))
        .orderBy("nk")
    },

    // Seasonally-adjusted daily revenue (q218's index applied back):
    // v_adj = v·10⁶ div idx_micro — divide the day-of-week effect out of
    // each observation, all exact integers; the detrended series anomaly
    // detectors should consume.
    Q(
      "q234_seasonal_adjust",
      """WITH d AS (SELECT o_orderpriority AS priority, o_orderdate AS dt,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
        |  FROM orders GROUP BY 1, 2),
        |s AS (SELECT priority, CAST(dayofweek(dt) + 1 AS BIGINT) AS season,
        |    CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS sv
        |  FROM d GROUP BY 1, 2),
        |k AS (SELECT priority, CAST(sum(n) AS BIGINT) AS na,
        |    CAST(sum(sv) AS BIGINT) AS sa FROM s GROUP BY 1),
        |ix AS (SELECT s.priority, s.season,
        |    CAST(CAST(s.sv AS HUGEINT) * na * 1000000
        |      // (CAST(s.n AS HUGEINT) * sa) AS BIGINT) AS idx_micro
        |  FROM s JOIN k USING (priority))
        |SELECT d.priority, CAST(d.dt AS VARCHAR) AS dt, d.v, ix.idx_micro,
        |  CAST(CAST(d.v AS HUGEINT) * 1000000 // ix.idx_micro AS BIGINT) AS v_adj
        |FROM d JOIN ix ON d.priority = ix.priority
        |  AND CAST(dayofweek(d.dt) + 1 AS BIGINT) = ix.season
        |ORDER BY d.priority, d.dt""".stripMargin) { (s, dir) =>
      val daily = Tables.load(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("priority"), col("o_orderdate").as("dt"))
        .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("v"))
        .withColumn("dow", dayofweek(col("dt")).cast("long"))
      // derived-from-self join: re-alias the index side so Spark's
      // ambiguous-self-join check can tell the two lineages apart
      val idx = graft.operators.TimeSeries
        .seasonalIndex(daily.select(col("priority"), col("dow"), col("v")),
          Seq("priority"), "dow", "v")
        .select(col("priority").as("_ip"), col("season").as("_is"), col("idx_micro"))
      daily.join(idx, col("priority") === col("_ip") && col("dow") === col("_is"))
        .select(col("priority"), col("dt").cast("string").as("dt"), col("v"),
          col("idx_micro"),
          expr("(cast(v as decimal(38,0)) * 1000000) div idx_micro").as("v_adj"))
        .orderBy("priority", "dt")
    },

    // Per-segment ROC AUC (RankStats.aucByGroup): the per-language /
    // per-segment model readout — tie table keyed (group, score), prefix
    // sum windowed BY GROUP (groups are the parallelism unit).
    Q(
      "q235_group_auc",
      """WITH hc AS (SELECT DISTINCT o_custkey FROM orders),
        |u AS (SELECT c_mktsegment AS seg, CAST(round(c_acctbal * 100) AS BIGINT) AS score,
        |    CASE WHEN hc.o_custkey IS NULL THEN 0 ELSE 1 END AS label
        |  FROM customer LEFT JOIN hc ON c_custkey = o_custkey),
        |t AS (SELECT seg, score, CAST(count(*) AS BIGINT) AS tn,
        |    CAST(sum(label) AS BIGINT) AS np FROM u GROUP BY 1, 2),
        |w AS (SELECT seg, tn, np,
        |    CAST(2 * (sum(tn) OVER (PARTITION BY seg ORDER BY score) - tn)
        |      + tn + 1 AS BIGINT) AS r2
        |  FROM t),
        |g AS (SELECT seg, CAST(sum(np) AS HUGEINT) AS n_pos,
        |    CAST(sum(tn - np) AS HUGEINT) AS n_neg,
        |    CAST(sum(CAST(np AS HUGEINT) * r2) AS HUGEINT) AS rs2
        |  FROM w GROUP BY 1)
        |SELECT seg, CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
        |  floor(CAST(rs2 - n_pos * (n_pos + 1) AS DOUBLE)
        |      / CAST(2 * n_pos * n_neg AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS auc
        |FROM g ORDER BY seg""".stripMargin) { (s, dir) =>
      val hasOrder = Tables.load(s, dir, "orders").select(col("o_custkey")).distinct()
      val units = Tables.load(s, dir, "customer")
        .join(hasOrder, col("c_custkey") === col("o_custkey"), "left")
        .select(
          col("c_mktsegment").as("seg"),
          round(col("c_acctbal") * 100, 0).cast("long").as("score"),
          when(col("o_custkey").isNull, 0).otherwise(1).as("label"))
      graft.operators.RankStats.aucByGroup(units, Seq("seg"), "score", "label")
        .select(col("seg"), col("n_pos"), col("n_neg"), pin6(col("auc")).as("auc"))
        .orderBy("seg")
    },

    // Two-proportion z per segment (Experiment.twoProportionZ): conversion
    // lift between the md5-bit variants — the categorical A/B readout,
    // pooled-variance z over exactly-agreed operands.
    Q(
      "q236_two_proportion",
      """WITH hc AS (SELECT DISTINCT o_custkey FROM orders),
        |u AS (SELECT c_mktsegment AS seg,
        |    CAST(CAST('0x' || substr(md5(c_custkey::VARCHAR), 1, 4) AS INT) % 2 AS INT)
        |      AS variant,
        |    CASE WHEN hc.o_custkey IS NULL THEN 0 ELSE 1 END AS conv
        |  FROM customer LEFT JOIN hc ON c_custkey = o_custkey),
        |g AS (SELECT seg,
        |    CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |    CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS BIGINT) AS conv0,
        |    CAST(sum(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS BIGINT) AS conv1
        |  FROM u GROUP BY 1)
        |SELECT seg, n0, n1, conv0, conv1,
        |  floor(CAST(conv0 AS DOUBLE) / CAST(n0 AS DOUBLE) * 1000000.0 + 0.5)
        |    / 1000000.0 AS p0,
        |  floor(CAST(conv1 AS DOUBLE) / CAST(n1 AS DOUBLE) * 1000000.0 + 0.5)
        |    / 1000000.0 AS p1,
        |  floor((CAST(conv1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |       - CAST(conv0 AS DOUBLE) / CAST(n0 AS DOUBLE))
        |      / sqrt((CAST(conv0 + conv1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
        |           * (1.0 - CAST(conv0 + conv1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
        |           * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE)))
        |    * 1000000.0 + 0.5) / 1000000.0 AS z
        |FROM g ORDER BY seg""".stripMargin) { (s, dir) =>
      val hasOrder = Tables.load(s, dir, "orders").select(col("o_custkey")).distinct()
      val units = Tables.load(s, dir, "customer")
        .join(hasOrder, col("c_custkey") === col("o_custkey"), "left")
        .select(
          col("c_mktsegment").as("seg"),
          (conv(substring(md5(col("c_custkey").cast("string")), 1, 4), 16, 10)
            .cast("int") % 2).as("variant"),
          when(col("o_custkey").isNull, 0).otherwise(1).as("conv"))
      graft.operators.Experiment.twoProportionZ(units, Seq("seg"), "variant", "conv")
        .select(col("seg"), col("n0"), col("n1"), col("conv0"), col("conv1"),
          pin6(col("p0")).as("p0"), pin6(col("p1")).as("p1"), pin6(col("z")).as("z"))
        .orderBy("seg")
    },

    // Dup-cluster audit over the q81 MinHash components: cluster-size
    // histogram + the projected dedup win (redundant docs / corpus) — the
    // "how much will dedup save?" readout, riding the shared component
    // memo so the gate measures the AUDIT, not re-mining.
    Q(
      "q237_dup_stats",
      s"""WITH RECURSIVE ${CurationQueries.MinhashComponentCtes},
        |sz AS (SELECT component, CAST(count(*) AS BIGINT) AS cs FROM comp GROUP BY 1),
        |h AS (SELECT cs AS clust_size, CAST(count(*) AS BIGINT) AS n_clusters
        |      FROM sz GROUP BY 1),
        |tt AS (SELECT CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_docs_total,
        |    CAST(sum(cs - 1) AS BIGINT) AS n_redundant FROM sz)
        |SELECT clust_size, n_clusters, n_docs_total, n_redundant,
        |  n_redundant * 1000000 // n_docs_total AS dedup_micro
        |FROM h, tt ORDER BY clust_size""".stripMargin) { (s, dir) =>
      val comp = CurationQueries.minhashComponents(s, dir)
      val sz = comp.groupBy("component").agg(count(lit(1)).as("cs"))
      val h = sz.groupBy(col("cs").as("clust_size")).agg(count(lit(1)).as("n_clusters"))
      val tots = sz.agg(sum(col("cs") - 1).as("n_redundant"))
        .crossJoin(Tables.load(s, dir, "documents").agg(count(lit(1)).as("n_docs_total")))
      h.crossJoin(broadcast(tots))
        .select(col("clust_size"), col("n_clusters"), col("n_docs_total"),
          col("n_redundant"),
          expr("n_redundant * 1000000 div n_docs_total").as("dedup_micro"))
        .orderBy("clust_size")
    },

    // Incremental aggregate maintenance: per-customer (n, spend) state
    // from the pre-2000 history, a signed delta batch (2000+ inserts,
    // 1999 5-LOW retro-corrections as deletes) folded in WITHOUT
    // rescanning history — the materialized-view maintenance pattern; at
    // 100 TB the state table is keyed storage and only the delta scans.
    Q(
      "q238_agg_maintain",
      """WITH state AS (SELECT o_custkey AS ck, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend
        |  FROM orders WHERE year(o_orderdate) < 2000 GROUP BY 1),
        |delta AS (SELECT o_custkey AS ck,
        |    CAST(sum(CASE WHEN year(o_orderdate) >= 2000 THEN 1 ELSE -1 END) AS BIGINT)
        |      AS dn,
        |    CAST(sum(CASE WHEN year(o_orderdate) >= 2000
        |      THEN CAST(round(o_totalprice * 100) AS BIGINT)
        |      ELSE -CAST(round(o_totalprice * 100) AS BIGINT) END) AS BIGINT) AS ds
        |  FROM orders
        |  WHERE year(o_orderdate) >= 2000
        |     OR (year(o_orderdate) = 1999 AND o_orderpriority = '5-LOW')
        |  GROUP BY 1)
        |SELECT COALESCE(state.ck, delta.ck) AS ck,
        |  COALESCE(state.n, 0) + COALESCE(dn, 0) AS n,
        |  COALESCE(state.spend, 0) + COALESCE(ds, 0) AS spend
        |FROM state FULL OUTER JOIN delta ON state.ck = delta.ck
        |WHERE COALESCE(state.n, 0) + COALESCE(dn, 0) > 0
        |ORDER BY ck""".stripMargin) { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val cents = round(col("o_totalprice") * 100, 0).cast("long")
      val state = o.filter(year(col("o_orderdate")) < 2000)
        .groupBy(col("o_custkey").as("ck"))
        .agg(count(lit(1)).as("n"), sum(cents).as("spend"))
      val isIns = year(col("o_orderdate")) >= 2000
      val delta = o
        .filter(isIns ||
          (year(col("o_orderdate")) === 1999 && col("o_orderpriority") === "5-LOW"))
        .groupBy(col("o_custkey").as("_dck"))
        .agg(
          sum(when(isIns, 1L).otherwise(-1L)).as("dn"),
          sum(when(isIns, cents).otherwise(-cents)).as("ds"))
      state.join(delta, col("ck") === col("_dck"), "full_outer")
        .select(
          coalesce(col("ck"), col("_dck")).as("ck"),
          (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
          (coalesce(col("spend"), lit(0L)) + coalesce(col("ds"), lit(0L))).as("spend"))
        .filter(col("n") > 0)
        .orderBy("ck")
    },

    // Model lift/gains table by score decile (GlobalRank.ntile on the
    // DESCENDING score): per-decile response rate, cumulative positive
    // share (gains), and lift vs the base rate — all exact integer floor
    // quotients; the 10-row cumulative window is decile grain by
    // construction.
    Q(
      "q239_lift_table",
      """WITH hc AS (SELECT DISTINCT o_custkey FROM orders),
        |u AS (SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) AS x,
        |    CASE WHEN hc.o_custkey IS NULL THEN 0 ELSE 1 END AS label
        |  FROM customer LEFT JOIN hc ON c_custkey = o_custkey),
        |d AS (SELECT CAST(ntile(10) OVER (ORDER BY -x, c_custkey) AS BIGINT) AS decile,
        |    label FROM u),
        |g AS (SELECT decile, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(label) AS BIGINT) AS n_pos FROM d GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS tn, CAST(sum(n_pos) AS BIGINT) AS tp
        |      FROM g),
        |c AS (SELECT decile, n, n_pos,
        |    CAST(sum(n_pos) OVER (ORDER BY decile) AS BIGINT) AS cum_pos FROM g)
        |SELECT c.decile, c.n, c.n_pos, c.cum_pos,
        |  CAST(CAST(c.n_pos AS HUGEINT) * 1000000 // c.n AS BIGINT) AS resp_micro,
        |  CAST(CAST(c.cum_pos AS HUGEINT) * 1000000 // tp AS BIGINT) AS gain_micro,
        |  CAST(CAST(c.n_pos AS HUGEINT) * tn * 1000000
        |    // (CAST(c.n AS HUGEINT) * tp) AS BIGINT) AS lift_micro
        |FROM c, t ORDER BY c.decile""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val hasOrder = Tables.load(s, dir, "orders").select(col("o_custkey")).distinct()
      val units = Tables.load(s, dir, "customer")
        .join(hasOrder, col("c_custkey") === col("o_custkey"), "left")
        .select(
          col("c_custkey"),
          (-round(col("c_acctbal") * 100, 0).cast("long")).as("xneg"),
          when(col("o_custkey").isNull, 0).otherwise(1).as("label"))
      val g = graft.operators.GlobalRank
        .ntile(units, Seq("xneg", "c_custkey"), 10, "decile")
        .groupBy("decile")
        .agg(count(lit(1)).as("n"), sum("label").as("n_pos"))
      val t = g.agg(sum("n").as("_tn"), sum("n_pos").as("_tp"))
      // decile grain: the cumulative window runs over exactly 10 rows
      val c = g.withColumn("cum_pos",
        sum("n_pos").over(Window.orderBy("decile")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      c.crossJoin(broadcast(t))
        .select(col("decile"), col("n"), col("n_pos"), col("cum_pos"),
          expr("(cast(n_pos as decimal(38,0)) * 1000000) div n").as("resp_micro"),
          expr("(cast(cum_pos as decimal(38,0)) * 1000000) div _tp").as("gain_micro"),
          expr("(cast(n_pos as decimal(38,0)) * _tn * 1000000) div " +
            "(cast(n as decimal(38,0)) * _tp)").as("lift_micro"))
        .orderBy("decile")
    },

    // Kaplan-Meier churn curve per segment (Survival.kaplanMeier):
    // duration = first→last order days, event = churned (last order
    // before 2001). The product limit is reassociated as a SUM of
    // per-step ln terms pinned to micro-nats at distinct-time grain —
    // order-free, engine-exact; exhausted-risk steps drop survival to 0.
    Q(
      "q240_kaplan_meier",
      """WITH fl AS (SELECT o_custkey, min(o_orderdate) AS f, max(o_orderdate) AS l
        |            FROM orders GROUP BY 1),
        |u AS (SELECT c_mktsegment AS seg,
        |    CAST(date_diff('day', fl.f, fl.l) AS BIGINT) AS t0,
        |    CASE WHEN fl.l < TIMESTAMP '2001-01-01' THEN 1 ELSE 0 END AS ev
        |  FROM fl JOIN customer ON o_custkey = c_custkey),
        |bt AS (SELECT seg, t0 AS t, CAST(sum(ev) AS BIGINT) AS n_event,
        |    CAST(sum(1 - ev) AS BIGINT) AS n_censor FROM u GROUP BY 1, 2),
        |st AS (SELECT seg, t, n_event, n_censor,
        |    CAST(sum(n_event + n_censor) OVER (PARTITION BY seg) AS BIGINT) AS tot,
        |    CAST(COALESCE(sum(n_event + n_censor) OVER (PARTITION BY seg ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS gb
        |  FROM bt),
        |sp AS (SELECT seg, t, n_event, n_censor, tot - gb AS n_risk,
        |    CASE WHEN n_event = 0 THEN 0
        |         WHEN n_event < tot - gb THEN
        |           CAST(floor(ln(CAST(tot - gb - n_event AS DOUBLE)
        |             / CAST(tot - gb AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
        |         ELSE NULL END AS step
        |  FROM st),
        |fin AS (SELECT seg, t, n_risk, n_event, n_censor,
        |    max(CASE WHEN step IS NULL THEN 1 ELSE 0 END) OVER (PARTITION BY seg
        |      ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dead,
        |    CAST(sum(COALESCE(step, 0)) OVER (PARTITION BY seg ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM sp)
        |SELECT seg, t, n_risk, n_event, n_censor,
        |  CASE WHEN dead = 1 THEN 0 ELSE
        |    CAST(floor(exp(CAST(cum AS DOUBLE) / 1000000.0) * 1000000.0 + 0.5) AS BIGINT)
        |  END AS surv_micro
        |FROM fin ORDER BY seg, t""".stripMargin) { (s, dir) =>
      val fl = Tables.load(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(min(col("o_orderdate")).as("_f"), max(col("o_orderdate")).as("_l"))
      val units = Tables.load(s, dir, "customer")
        .join(fl, col("c_custkey") === col("o_custkey"))
        .select(
          col("c_mktsegment").as("seg"),
          datediff(col("_l"), col("_f")).cast("long").as("dur"),
          when(col("_l") < lit("2001-01-01").cast("timestamp"), 1).otherwise(0).as("ev"))
      graft.operators.Survival.kaplanMeier(units, Seq("seg"), "dur", "ev")
        .orderBy("seg", "t")
    },

    // Cohort LTV curve: first-order-year cohorts, revenue by months since
    // first order, cumulative per cohort, LTV cents per member as exact
    // floor quotients — the q154 retention shape with the money dimension.
    Q(
      "q241_ltv_curve",
      """WITH f AS (SELECT o_custkey, min(o_orderdate) AS fd FROM orders GROUP BY 1),
        |sz AS (SELECT CAST(year(fd) AS BIGINT) AS cohort,
        |    CAST(count(*) AS BIGINT) AS n_customers FROM f GROUP BY 1),
        |r AS (SELECT CAST(year(f.fd) AS BIGINT) AS cohort,
        |    CAST((year(o_orderdate) * 12 + month(o_orderdate))
        |       - (year(f.fd) * 12 + month(f.fd)) AS BIGINT) AS age_m,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev
        |  FROM orders JOIN f USING (o_custkey) GROUP BY 1, 2),
        |c AS (SELECT cohort, age_m, rev,
        |    CAST(sum(rev) OVER (PARTITION BY cohort ORDER BY age_m
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_rev
        |  FROM r)
        |SELECT c.cohort, c.age_m, sz.n_customers, c.rev, c.cum_rev,
        |  c.cum_rev // sz.n_customers AS ltv_cents
        |FROM c JOIN sz USING (cohort) ORDER BY c.cohort, c.age_m""".stripMargin) {
      (s, dir) =>
        import org.apache.spark.sql.expressions.Window
        val o = Tables.load(s, dir, "orders")
        val f = o.groupBy(col("o_custkey").as("_fck"))
          .agg(min(col("o_orderdate")).as("fd"))
        val r = o.join(f, col("o_custkey") === col("_fck"))
          .groupBy(
            year(col("fd")).cast("long").as("cohort"),
            ((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
              - (year(col("fd")) * 12 + month(col("fd")))).cast("long").as("age_m"))
          .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("rev"))
        val sz = f.groupBy(year(col("fd")).cast("long").as("_szc"))
          .agg(count(lit(1)).as("n_customers"))
        r.withColumn("cum_rev",
            sum("rev").over(Window.partitionBy("cohort").orderBy("age_m")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .join(broadcast(sz), col("cohort") === col("_szc"))
          .select(col("cohort"), col("age_m"), col("n_customers"), col("rev"),
            col("cum_rev"), expr("cum_rev div n_customers").as("ltv_cents"))
          .orderBy("cohort", "age_m")
    },

    // Last-touch attribution: each purchase credits the user's most
    // recent prior click (AsOfJoin.lastPriorMatchNative — the custom
    // merge exec), rolled up by click hour-of-day; unattributed
    // purchases land in hour −1. The marketing-attribution composite
    // over the native as-of operator.
    Q(
      "q242_attribution",
      """WITH p AS (SELECT event_id, user_id, ts,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts AS cts FROM events WHERE event_type = 'click'),
        |a AS (SELECT p.event_id, p.cents, c.cts
        |      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.cts)
        |SELECT CAST(COALESCE(hour(cts), -1) AS BIGINT) AS click_hour,
        |  CAST(count(*) AS BIGINT) AS n_purchases,
        |  CAST(sum(cents) AS BIGINT) AS attributed_cents
        |FROM a GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          round(col("value") * 100, 0).cast("long").as("cents"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("cts"))
      graft.operators.AsOfJoin
        .lastPriorMatchNative(purchases, clicks, Seq("user_id"), "ts", "cts", Seq("cts"))
        .groupBy(coalesce(hour(col("asof_cts")).cast("long"), lit(-1L)).as("click_hour"))
        .agg(count(lit(1)).as("n_purchases"), sum("cents").as("attributed_cents"))
        .orderBy("click_hour")
    },

    // Referential-integrity audit across the star schema: orphan-FK rates
    // for lineitem→orders, orders→customer, customer→nation in one
    // stacked ledger — each relation is a broadcast/keyed anti-join
    // count, the warehouse-health pre-flight.
    Q(
      "q243_fk_audit",
      """WITH a AS (SELECT 'lineitem.l_orderkey->orders' AS rel,
        |    CAST(count(*) AS BIGINT) AS n_child,
        |    CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_orphan
        |  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |b AS (SELECT 'orders.o_custkey->customer' AS rel,
        |    CAST(count(*) AS BIGINT) AS n_child,
        |    CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_orphan
        |  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey),
        |n AS (SELECT 'customer.c_nationkey->nation' AS rel,
        |    CAST(count(*) AS BIGINT) AS n_child,
        |    CAST(sum(CASE WHEN na.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_orphan
        |  FROM customer c LEFT JOIN nation na ON c.c_nationkey = na.n_nationkey)
        |SELECT rel, n_child, n_orphan, n_orphan * 1000000 // n_child AS orphan_micro
        |FROM (SELECT * FROM a UNION ALL SELECT * FROM b UNION ALL SELECT * FROM n)
        |ORDER BY rel""".stripMargin) { (s, dir) =>
      def audit(rel: String, child: org.apache.spark.sql.DataFrame, ck: String,
          parent: org.apache.spark.sql.DataFrame, pk: String) =
        child.join(parent.select(col(pk)), col(ck) === col(pk), "left")
          .agg(
            count(lit(1)).as("n_child"),
            sum(when(col(pk).isNull, 1L).otherwise(0L)).as("n_orphan"))
          .select(lit(rel).as("rel"), col("n_child"), col("n_orphan"),
            expr("n_orphan * 1000000 div n_child").as("orphan_micro"))
      val li = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
      val cu = Tables.load(s, dir, "customer")
      val na = Tables.load(s, dir, "nation")
      audit("lineitem.l_orderkey->orders", li, "l_orderkey", o, "o_orderkey")
        .unionByName(audit("orders.o_custkey->customer", o, "o_custkey", cu, "c_custkey"))
        .unionByName(audit("customer.c_nationkey->nation", cu, "c_nationkey", na,
          "n_nationkey"))
        .orderBy("rel")
    },

    // Source-freshness audit: per event type, latest event time and its
    // lag behind the fleet max, stale-flagged past 24 h — the ingestion
    // monitor every streaming warehouse fronts its SLA with.
    Q(
      "q244_freshness",
      """WITH m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    max(ts) AS mx FROM events GROUP BY 1),
        |g AS (SELECT max(mx) AS gmx FROM m)
        |SELECT event_type, n,
        |  strftime(date_trunc('second', mx), '%Y-%m-%d %H:%M:%S') AS latest_ts,
        |  (epoch_us(gmx) - epoch_us(mx)) // 1000000 AS lag_s,
        |  CAST((epoch_us(gmx) - epoch_us(mx)) // 1000000 > 86400 AS BOOLEAN) AS stale
        |FROM m, g ORDER BY event_type""".stripMargin) { (s, dir) =>
      val m = Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), max(col("ts")).as("_mx"))
      val g = m.agg(max(col("_mx")).as("_gmx"))
      // microsecond-exact lag: per-side unix_timestamp would truncate each
      // endpoint independently and disagree with the oracle by a second
      m.crossJoin(broadcast(g))
        .select(
          col("event_type"), col("n"),
          date_format(date_trunc("second", col("_mx")), "yyyy-MM-dd HH:mm:ss")
            .as("latest_ts"),
          expr("(unix_micros(_gmx) - unix_micros(_mx)) div 1000000").as("lag_s"),
          (expr("(unix_micros(_gmx) - unix_micros(_mx)) div 1000000") > 86400L)
            .as("stale"))
        .orderBy("event_type")
    })
}
