package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Round-7 batch: rule-based corpus quality (Gopher-style thresholds and
  * repetition mass), DSIR importance weighting, the one-way ANOVA omnibus,
  * local clustering coefficients, Brown double exponential smoothing, and
  * the zone-map skipping-depth layout audit. Determinism rules as
  * elsewhere: exact integer/decimal reductions, a single pinned double (or
  * one `ln`/division floored to integer units) at the end.
  */
object CorpusRuleQueries {

  private val pin6 = (c: org.apache.spark.sql.Column) =>
    (floor(c * lit(1000000.0) + lit(0.5)).cast("double") / lit(1000000.0))

  def all: Seq[Q] = Seq(

    // Gopher-style hard quality rules (QualityRules.gopherStats): word
    // count, mean word length, alphabetic-word fraction, stop-word
    // presence — all exact integer micro-unit ratios (no doubles), so the
    // keep decision is bit-identical across engines. One codegen'd
    // projection per doc, no shuffle.
    Q(
      "q261_gopher_rules",
      """WITH tok AS (SELECT doc_id,
        |    list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), x -> x != '') AS t
        |  FROM documents),
        |f AS (SELECT doc_id,
        |    CAST(len(t) AS BIGINT) AS n_words,
        |    CAST(coalesce(list_aggregate(list_transform(t, x -> length(x)), 'sum'), 0)
        |      AS BIGINT) AS chars,
        |    CAST(len(list_filter(t, x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS alpha,
        |    CAST(len(list_intersect(list_distinct(t),
        |      ['the','a','of','to','and','in','is','that','for','it'])) AS BIGINT) AS stop_hits
        |  FROM tok),
        |m AS (SELECT doc_id, n_words,
        |    CASE WHEN n_words = 0 THEN 0 ELSE (chars * 1000000) // n_words END
        |      AS mean_word_len_micro,
        |    CASE WHEN n_words = 0 THEN 0 ELSE (alpha * 1000000) // n_words END
        |      AS alpha_frac_micro,
        |    stop_hits
        |  FROM f)
        |SELECT doc_id, n_words, mean_word_len_micro, alpha_frac_micro, stop_hits,
        |  (n_words BETWEEN 10 AND 100000)
        |    AND (mean_word_len_micro BETWEEN 2000000 AND 12000000)
        |    AND alpha_frac_micro >= 700000 AND stop_hits >= 2 AS kept
        |FROM m ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.text.QualityRules
        .gopherStats(Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    // Gopher repetition statistics (QualityRules.repetitionStats): per
    // (doc, n-gram order) the fraction of gram character mass in the
    // single heaviest gram and in all repeated grams — the "is this doc a
    // copy-paste loop" signal. max(count·len), not argmax(count), so count
    // ties can't make the answer engine-dependent; exact micro-units.
    Q(
      "q262_gopher_repetition",
      """WITH tok AS (SELECT doc_id,
        |    list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), x -> x != '') AS t
        |  FROM documents),
        |ord AS (SELECT unnest([2, 3, 5]) AS n),
        |bg AS (SELECT tok.doc_id, o.n,
        |    array_to_string(list_slice(t, g.i, g.i + o.n - 1), ' ') AS gram
        |  FROM tok CROSS JOIN ord o,
        |    unnest(generate_series(1, len(t) - o.n + 1)) AS g(i)),
        |pc AS (SELECT doc_id, n, gram,
        |    CAST(length(gram) - (n - 1) AS BIGINT) AS len, count(*) AS c
        |  FROM bg GROUP BY 1, 2, 3, 4),
        |pd AS (SELECT doc_id, n,
        |    CAST(sum(c * len) AS BIGINT) AS total_mass,
        |    CAST(max(c * len) AS BIGINT) AS top,
        |    CAST(sum(CASE WHEN c >= 2 THEN c * len ELSE 0 END) AS BIGINT) AS dup
        |  FROM pc GROUP BY 1, 2)
        |SELECT d.doc_id, CAST(o.n AS INT) AS n,
        |  coalesce(total_mass, 0) AS total_mass,
        |  coalesce((top * 1000000) // total_mass, 0) AS top_frac_micro,
        |  coalesce((dup * 1000000) // total_mass, 0) AS dup_frac_micro
        |FROM documents d CROSS JOIN ord o
        |LEFT JOIN pd ON pd.doc_id = d.doc_id AND pd.n = o.n
        |ORDER BY d.doc_id, n""".stripMargin) { (s, dir) =>
      graft.text.QualityRules
        .repetitionStats(Tables.load(s, dir, "documents"), "doc_id", "text", Seq(2, 3, 5))
        .orderBy("doc_id", "n")
    },

    // DSIR hashed importance weights (Dsir.hashedImportanceWeights):
    // target = English docs, source = whole corpus, 64 hashed unigram
    // buckets. The bucket tables are broadcast-sized BY CONSTRUCTION
    // (dims rows regardless of corpus size); the only transcendental is
    // one ln of an exact rational per bucket, floored to micro-nats
    // before the exact per-doc integer sum.
    Q(
      "q263_dsir_weights",
      """WITH tok AS (SELECT doc_id, lang,
        |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
        |  FROM documents),
        |bk AS (SELECT doc_id, lang,
        |    CAST(CAST('0x' || substr(md5(token), 1, 6) AS INT) AS BIGINT) % 64 AS b
        |  FROM tok),
        |c AS (SELECT b,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ct,
        |    CAST(count(*) AS BIGINT) AS cs
        |  FROM bk GROUP BY 1),
        |t AS (SELECT CAST(sum(ct) AS BIGINT) AS tt, CAST(sum(cs) AS BIGINT) AS st FROM c),
        |r AS (SELECT b, CAST(floor(ln(
        |      CAST((ct + 1) * (st + 64) AS DOUBLE) / CAST((cs + 1) * (tt + 64) AS DOUBLE))
        |      * 1000000.0 + 0.5) AS BIGINT) AS rm
        |  FROM c, t),
        |p AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |    CAST(sum(rm) AS BIGINT) AS w
        |  FROM bk JOIN r USING (b) GROUP BY 1)
        |SELECT d.doc_id, coalesce(n_tokens, 0) AS n_tokens,
        |  coalesce(w, 0) AS w_micronats,
        |  CASE WHEN coalesce(n_tokens, 0) = 0 THEN 0
        |       ELSE CAST(floor(CAST(w AS DOUBLE) / CAST(n_tokens AS DOUBLE) + 0.5) AS BIGINT)
        |  END AS mean_micronats
        |FROM documents d LEFT JOIN p USING (doc_id) ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      graft.text.Dsir
        .hashedImportanceWeights(
          Tables.load(s, dir, "documents"), "doc_id", "text",
          isTarget = col("lang") === "en", dims = 64)
        .orderBy("doc_id")
    },

    // One-way ANOVA omnibus + η² effect size (RobustStats.anovaF) over
    // event values by type — "does the group matter at all" before q186's
    // pairwise Welch drill-down. One map-side-combined aggregate; the
    // between/within sums of squares are exact integer unit² in both
    // engines (floor per group is part of the pinned definition).
    Q(
      "q264_anova",
      """WITH g AS (SELECT event_type,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS HUGEINT) AS sx,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)
        |           * CAST(round(value * 100) AS BIGINT)) AS HUGEINT) AS sxx
        |  FROM events GROUP BY 1),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS n,
        |    CAST(sum(sx) AS HUGEINT) AS gx, CAST(sum(sxx) AS HUGEINT) AS gxx,
        |    CAST(sum((sx * sx) // n) AS HUGEINT) AS sb
        |  FROM g)
        |SELECT k, n, k - 1 AS df_between, n - k AS df_within,
        |  CAST(sb - (gx * gx) // n AS BIGINT) AS ssb_u,
        |  CAST(gxx - sb AS BIGINT) AS ssw_u,
        |  CASE WHEN k > 1 AND n > k AND gxx - sb > 0 THEN
        |    floor((CAST(sb - (gx * gx) // n AS DOUBLE) / CAST(k - 1 AS DOUBLE))
        |        / (CAST(gxx - sb AS DOUBLE) / CAST(n - k AS DOUBLE))
        |      * 1000000.0 + 0.5) / 1000000.0 END AS f_stat,
        |  CASE WHEN gxx - (gx * gx) // n > 0 THEN
        |    floor(CAST(sb - (gx * gx) // n AS DOUBLE)
        |        / CAST(gxx - (gx * gx) // n AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
        |  END AS eta_sq
        |FROM a""".stripMargin) { (s, dir) =>
      graft.operators.RobustStats
        .anovaF(Tables.events(s, dir), "event_type", "value", scale = 100)
        .select(
          col("k"), col("n"), col("df_between"), col("df_within"),
          col("ssb_u"), col("ssw_u"),
          pin6(col("f_stat")).as("f_stat"),
          pin6(col("eta_sq")).as("eta_sq"))
    },

    // Local clustering coefficient (Triangles.localClustering) on the
    // q149 bigram co-occurrence graph: per-node 2·tri/(deg·(deg−1)) in
    // exact integer micro-units — the per-node community-tightness probe
    // on top of the oriented-wedge triangle count.
    Q(
      "q265_local_clustering",
      """WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
        |bg AS (SELECT t[i] || ' ' || t[i+1] AS gram
        |       FROM tok, unnest(generate_series(1, len(t) - 1)) AS g(i)),
        |pc AS (SELECT gram, count(*) AS n FROM bg GROUP BY gram),
        |ed AS (SELECT DISTINCT
        |         least(split_part(gram, ' ', 1), split_part(gram, ' ', 2)) AS a,
        |         greatest(split_part(gram, ' ', 1), split_part(gram, ' ', 2)) AS b
        |       FROM pc
        |       WHERE n >= 5 AND split_part(gram, ' ', 1) != split_part(gram, ' ', 2)),
        |sym AS (SELECT a AS node FROM ed UNION ALL SELECT b FROM ed),
        |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree FROM sym GROUP BY 1),
        |tri AS (SELECT e1.a AS v1, e1.b AS v2, e2.b AS v3
        |        FROM ed e1 JOIN ed e2 ON e2.a = e1.b
        |        JOIN ed e3 ON e3.a = e1.a AND e3.b = e2.b),
        |tn AS (SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
        |       FROM (SELECT v1 AS node FROM tri
        |             UNION ALL SELECT v2 FROM tri
        |             UNION ALL SELECT v3 FROM tri)
        |       GROUP BY node)
        |SELECT deg.node, degree,
        |  coalesce(n_triangles, 0) AS n_triangles,
        |  CASE WHEN degree < 2 THEN 0
        |       ELSE (coalesce(n_triangles, 0) * 2000000) // (degree * (degree - 1))
        |  END AS coef_micro
        |FROM deg LEFT JOIN tn USING (node) ORDER BY node""".stripMargin) { (s, dir) =>
      val bg = graft.text.Vocab.ngramCounts(Tables.load(s, dir, "documents"), "text", 2)
        .filter(col("n") >= 5)
      val edges = bg.select(
        split(col("gram"), " ").getItem(0).as("a"),
        split(col("gram"), " ").getItem(1).as("b"))
      graft.operators.Triangles.localClustering(edges)
        .orderBy("node")
    },

    // Brown double exponential smoothing (TimeSeries.brownDouble) of the
    // daily event count per type: dyadic α=1/2 EWMA applied twice, level
    // 2s₁−s₂ / trend s₁−s₂ / 7-day forecast — exact integer numerators
    // over 225, one double division each, pinned 6 dp. Two window stages,
    // one shuffle.
    Q(
      "q266_brown_smoothing",
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT event_type, d, cnt,
        |    lag(cnt, 1) OVER w AS c1, lag(cnt, 2) OVER w AS c2, lag(cnt, 3) OVER w AS c3
        |  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY d)),
        |s1 AS (SELECT event_type, d, cnt,
        |    CASE WHEN c1 IS NOT NULL AND c2 IS NOT NULL AND c3 IS NOT NULL
        |         THEN 8 * cnt + 4 * c1 + 2 * c2 + c3 END AS s1_15
        |  FROM l),
        |l2 AS (SELECT event_type, d, cnt, s1_15,
        |    lag(s1_15, 1) OVER w AS p1, lag(s1_15, 2) OVER w AS p2, lag(s1_15, 3) OVER w AS p3
        |  FROM s1 WINDOW w AS (PARTITION BY event_type ORDER BY d)),
        |s2 AS (SELECT event_type, d, cnt, s1_15,
        |    CASE WHEN s1_15 IS NOT NULL AND p1 IS NOT NULL AND p2 IS NOT NULL AND p3 IS NOT NULL
        |         THEN 8 * s1_15 + 4 * p1 + 2 * p2 + p3 END AS s2_225
        |  FROM l2)
        |SELECT event_type, d, cnt,
        |  floor(CAST(s1_15 * 30 - s2_225 AS DOUBLE) / 225.0 * 1000000.0 + 0.5) / 1000000.0
        |    AS level,
        |  floor(CAST(s1_15 * 15 - s2_225 AS DOUBLE) / 225.0 * 1000000.0 + 0.5) / 1000000.0
        |    AS trend,
        |  floor(CAST(s1_15 * 135 - s2_225 * 8 AS DOUBLE) / 225.0 * 1000000.0 + 0.5) / 1000000.0
        |    AS forecast
        |FROM s2 ORDER BY event_type, d""".stripMargin) { (s, dir) =>
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(count(lit(1)).cast("long").as("cnt"))
      graft.operators.TimeSeries
        .brownDouble(daily, Seq("event_type"), Seq(col("d")), "cnt",
          horizon = 7, scale = 1)
        .select(
          col("event_type"), col("d"), col("cnt"),
          pin6(col("level")).as("level"),
          pin6(col("trend")).as("trend"),
          pin6(col("forecast")).as("forecast"))
        .orderBy("event_type", "d")
    },

    // Zone-map skipping-depth audit (ZOrder.skippingDepth): cut lineitem
    // into 32 files-in-spirit along its physical (orderkey, linenumber)
    // order, record each chunk's partkey min/max "zone map", and count
    // how many chunks overlap each chunk's range — the data-skipping
    // effectiveness metric for a layout (depth 1 = perfectly clustered;
    // depth ≈ 32 = min/max stats useless for partkey pruning). The ntile
    // is GlobalRank's range-partition form, not a single-partition window.
    Q(
      "q267_skipping_depth",
      """WITH r AS (SELECT l_partkey,
        |    ntile(32) OVER (ORDER BY l_orderkey, l_linenumber) AS chunk
        |  FROM lineitem),
        |z AS (SELECT chunk, CAST(count(*) AS BIGINT) AS n_rows,
        |    min(l_partkey) AS min_key, max(l_partkey) AS max_key
        |  FROM r GROUP BY 1)
        |SELECT a.chunk, a.n_rows, a.min_key, a.max_key,
        |  CAST(count(*) AS BIGINT) AS depth
        |FROM z a JOIN z b ON a.min_key <= b.max_key AND b.min_key <= a.max_key
        |GROUP BY 1, 2, 3, 4 ORDER BY a.chunk""".stripMargin) { (s, dir) =>
      graft.operators.ZOrder
        .skippingDepth(
          Tables.load(s, dir, "lineitem").select("l_orderkey", "l_linenumber", "l_partkey"),
          Seq("l_orderkey", "l_linenumber"), "l_partkey", chunks = 32)
        .orderBy("chunk")
    },

    // Workload-aware skip score (ZOrder.workloadSkipScore): q267's zone
    // maps evaluated against ten equal-width partkey range predicates —
    // what fraction of the 32 chunks each query range forces you to scan.
    // Predicate bounds derive from the key's min/max by exact integer
    // arithmetic (SF-portable); the O(1) min/max collect is the sanctioned
    // driver probe a real layout service runs before rewriting anything.
    Q(
      "q268_skip_workload",
      """WITH mm AS (SELECT min(l_partkey) AS kmin, max(l_partkey) AS kmax FROM lineitem),
        |p AS (SELECT CAST(g.i AS BIGINT) AS pred_id,
        |    kmin + (g.i * (kmax - kmin + 1)) // 10 AS lo,
        |    kmin + ((g.i + 1) * (kmax - kmin + 1)) // 10 - 1 AS hi
        |  FROM mm, unnest(generate_series(0, 9)) AS g(i)),
        |r AS (SELECT l_partkey,
        |    ntile(32) OVER (ORDER BY l_orderkey, l_linenumber) AS chunk
        |  FROM lineitem),
        |z AS (SELECT chunk, min(l_partkey) AS mn, max(l_partkey) AS mx
        |  FROM r GROUP BY 1)
        |SELECT pred_id, lo, hi,
        |  CAST(sum(CASE WHEN z.chunk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_scanned,
        |  (CAST(sum(CASE WHEN z.chunk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000000) // 32 AS scan_frac_micro
        |FROM p LEFT JOIN z ON p.lo <= z.mx AND z.mn <= p.hi
        |GROUP BY 1, 2, 3 ORDER BY pred_id""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_partkey")
      val mm = li.agg(min("l_partkey"), max("l_partkey")).head()
      val (kmin, kmax) = (mm.getLong(0), mm.getLong(1))
      val w = kmax - kmin + 1
      val preds = (0L until 10L).map(i =>
        (kmin + i * w / 10, kmin + (i + 1) * w / 10 - 1))
      graft.operators.ZOrder
        .workloadSkipScore(li, Seq("l_orderkey", "l_linenumber"), "l_partkey",
          chunks = 32, predicates = preds)
        .orderBy("pred_id")
    },

    // Closed-form two-regressor OLS per group (Regression.ols2): event
    // value ≈ β₀ + β₁·hour + β₂·dow, per type. One map-combined moment
    // aggregate; Cramer's rule on exact decimal moments; each β is one
    // double division, pinned. (DuckDB dayofweek is 0-based → +1 aligns
    // with Spark's 1-based convention, the q218 recipe.)
    Q(
      "q269_ols2",
      """WITH f AS (SELECT event_type,
        |    CAST(round(value * 100) AS BIGINT) AS y,
        |    CAST(hour(ts) AS BIGINT) AS x1,
        |    CAST(dayofweek(CAST(ts AS DATE)) + 1 AS BIGINT) AS x2
        |  FROM events),
        |m AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(x1) AS HUGEINT) AS s1, CAST(sum(x2) AS HUGEINT) AS s2,
        |    CAST(sum(x1 * x1) AS HUGEINT) AS s11, CAST(sum(x2 * x2) AS HUGEINT) AS s22,
        |    CAST(sum(x1 * x2) AS HUGEINT) AS s12,
        |    CAST(sum(y) AS HUGEINT) AS sy,
        |    CAST(sum(x1 * y) AS HUGEINT) AS s1y, CAST(sum(x2 * y) AS HUGEINT) AS s2y
        |  FROM f GROUP BY 1),
        |d AS (SELECT event_type, CAST(n AS BIGINT) AS n,
        |    n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
        |      + s2 * (s1 * s12 - s11 * s2) AS det,
        |    sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
        |      + s2 * (s1y * s12 - s11 * s2y) AS d0,
        |    n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
        |      + s2 * (s1 * s2y - s1y * s2) AS d1,
        |    n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
        |      + sy * (s1 * s12 - s11 * s2) AS d2
        |  FROM m)
        |SELECT event_type, n,
        |  CASE WHEN det != 0 THEN
        |    floor(CAST(d0 AS DOUBLE) / (CAST(det AS DOUBLE) * 100.0) * 1000000.0 + 0.5)
        |      / 1000000.0 END AS beta0,
        |  CASE WHEN det != 0 THEN
        |    floor(CAST(d1 AS DOUBLE) / (CAST(det AS DOUBLE) * 100.0) * 1000000.0 + 0.5)
        |      / 1000000.0 END AS beta1,
        |  CASE WHEN det != 0 THEN
        |    floor(CAST(d2 AS DOUBLE) / (CAST(det AS DOUBLE) * 100.0) * 1000000.0 + 0.5)
        |      / 1000000.0 END AS beta2
        |FROM d ORDER BY event_type""".stripMargin) { (s, dir) =>
      val f = Tables.events(s, dir).select(
        col("event_type"), col("value"),
        hour(col("ts")).as("x1"), dayofweek(to_date(col("ts"))).as("x2"))
      graft.operators.Regression
        .ols2(f, Seq("event_type"), "value", "x1", "x2", yScale = 100)
        .select(
          col("event_type"), col("n"),
          pin6(col("beta0")).as("beta0"),
          pin6(col("beta1")).as("beta1"),
          pin6(col("beta2")).as("beta2"))
        .orderBy("event_type")
    },

    // Tokenizer fertility by language: subword-estimate-per-word ratio —
    // the "how many BPE pieces does a word of this language cost" table a
    // multilingual pipeline uses to budget per-language token quotas.
    // Pure composition of the shared q38 counters at language grain;
    // exact micro-unit ratio.
    Q(
      "q270_fertility",
      """WITH f AS (SELECT lang,
        |    len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), x -> x != ''))
        |      AS w,
        |    len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\s]'),
        |      x -> x != '')) AS sw
        |  FROM documents)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(w) AS BIGINT) AS n_words, CAST(sum(sw) AS BIGINT) AS n_subwords,
        |  CASE WHEN sum(w) = 0 THEN 0
        |       ELSE (CAST(sum(sw) AS BIGINT) * 1000000) // CAST(sum(w) AS BIGINT)
        |  END AS fertility_micro
        |FROM f GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      import graft.text.TextAnalysis
      Tables.load(s, dir, "documents")
        .select(col("lang"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("_w"),
          TextAnalysis.subwordCountEstimate(col("text")).cast("long").as("_sw"))
        .groupBy("lang")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("_w")).cast("long").as("n_words"),
          sum(col("_sw")).cast("long").as("n_subwords"))
        .withColumn("fertility_micro",
          when(col("n_words") === 0, lit(0L))
            .otherwise(expr("(n_subwords * 1000000L) div n_words")))
        .orderBy("lang")
    },

    // Rank-biased overlap (RankStats.rboDyadic) between the English and
    // German top-16 token rankings — "how similar are two top-k lists,
    // weighted toward the top" (search/recommendation ranking drift). The
    // dyadic p = 1/2 form makes every depth's term an exact integer
    // micro-ratio; the per-lang window is over a LIMITed 16-row frame, so
    // no unbounded single-partition sort.
    Q(
      "q271_rbo",
      """WITH tok AS (SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
        |  FROM documents WHERE lang IN ('en', 'de')),
        |c AS (SELECT lang, token, count(*) AS n FROM tok GROUP BY 1, 2),
        |r AS (SELECT lang, token,
        |    row_number() OVER (PARTITION BY lang ORDER BY n DESC, token) AS rk
        |  FROM c),
        |a AS (SELECT token, rk FROM r WHERE lang = 'en' AND rk <= 16),
        |b AS (SELECT token, rk FROM r WHERE lang = 'de' AND rk <= 16),
        |mx AS (SELECT greatest(a.rk, b.rk) AS m FROM a JOIN b USING (token)),
        |dd AS (SELECT CAST(g.i AS BIGINT) AS d FROM unnest(generate_series(1, 16)) AS g(i)),
        |t AS (SELECT d, CAST(count(m) AS BIGINT) AS ov
        |      FROM dd LEFT JOIN mx ON mx.m <= dd.d GROUP BY 1)
        |SELECT CAST(16 AS INT) AS depth,
        |  CAST(sum((ov * 1000000) // (d * (1 << d))) AS BIGINT) AS rbo_micro
        |FROM t""".stripMargin) { (s, dir) =>
      import graft.text.TextAnalysis
      val tok = Tables.load(s, dir, "documents")
        .filter(col("lang").isin("en", "de"))
        .select(col("lang"), explode(TextAnalysis.tokens(col("text"))).as("token"))
      def ranking(l: String) = {
        val top = tok.filter(col("lang") === l)
          .groupBy("token").agg(count(lit(1)).as("_n"))
          .orderBy(col("_n").desc, col("token")).limit(16)
        // window over the LIMITed 16-row frame — bounded by construction
        top.withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("_n").desc, col("token"))))
      }
      graft.operators.RankStats
        .rboDyadic(ranking("en"), ranking("de"), "token", "rank", depth = 16)
    },

    // Sort-order advisor: q267's depth metric computed for three CANDIDATE
    // layouts (physical sort by orderkey / partkey / suppkey, each made a
    // total order with the PK as tie-break), always scoring partkey
    // pruning — the "which sort order should the 100 TB rewrite use"
    // comparison table. Sorting by the query key itself lands avg depth
    // ~1; unrelated orders land ~chunks.
    Q(
      "q272_layout_advisor",
      """WITH l1 AS (SELECT 'orderkey' AS layout, l_partkey,
        |    ntile(32) OVER (ORDER BY l_orderkey, l_linenumber) AS chunk FROM lineitem),
        |l2 AS (SELECT 'partkey' AS layout, l_partkey,
        |    ntile(32) OVER (ORDER BY l_partkey, l_orderkey, l_linenumber) AS chunk FROM lineitem),
        |l3 AS (SELECT 'suppkey' AS layout, l_partkey,
        |    ntile(32) OVER (ORDER BY l_suppkey, l_orderkey, l_linenumber) AS chunk FROM lineitem),
        |u AS (SELECT * FROM l1 UNION ALL SELECT * FROM l2 UNION ALL SELECT * FROM l3),
        |z AS (SELECT layout, chunk, min(l_partkey) AS mn, max(l_partkey) AS mx
        |      FROM u GROUP BY 1, 2),
        |d AS (SELECT a.layout, a.chunk, CAST(count(*) AS BIGINT) AS depth
        |      FROM z a JOIN z b ON a.layout = b.layout
        |        AND a.mn <= b.mx AND b.mn <= a.mx
        |      GROUP BY 1, 2)
        |SELECT layout, (CAST(sum(depth) AS BIGINT) * 1000000) // 32 AS avg_depth_micro,
        |  CAST(max(depth) AS BIGINT) AS max_depth
        |FROM d GROUP BY layout ORDER BY layout""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      // all three candidate layouts score through ONE range exchange
      // (skippingDepthMulti) instead of three ntile stamps over the same
      // 600k rows — same per-layout chunks, same depths
      graft.operators.ZOrder.skippingDepthMulti(
        li,
        Seq(
          "orderkey" -> Seq("l_orderkey", "l_linenumber"),
          "partkey" -> Seq("l_partkey", "l_orderkey", "l_linenumber"),
          "suppkey" -> Seq("l_suppkey", "l_orderkey", "l_linenumber")),
        "l_partkey", chunks = 32)
        .groupBy(col("layout"))
        .agg(
          expr("(sum(depth) * 1000000L) div 32").as("avg_depth_micro"),
          max(col("depth")).as("max_depth"))
        .orderBy("layout")
    },

    // Frame-grain audio features (Multimodal.extractWavFrameFeatures):
    // REAL RIFF decode → per-64-sample-frame zero crossings + Σv² — the
    // voice-activity/energy table. The oracle regenerates the q29 sample
    // recipe arithmetically and recomputes frames directly, so header or
    // frame-boundary bugs on the Spark side break the hash.
    Q(
      "q273_audio_frames",
      """WITH s AS (
        |  SELECT doc_id, i, i // 64 AS frame,
        |    ((doc_id * 7919 + i * 104729) % 65536) - 32768 AS v
        |  FROM documents, unnest(generate_series(0, 383)) AS u(i)),
        |l AS (SELECT doc_id, frame, v,
        |    lag(v) OVER (PARTITION BY doc_id, frame ORDER BY i) AS pv
        |  FROM s)
        |SELECT doc_id AS media_id, CAST(frame AS BIGINT) AS frame,
        |  CAST(sum(CASE WHEN pv IS NOT NULL AND ((pv < 0) != (v < 0)) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS zero_crossings,
        |  CAST(sum(v * v) AS BIGINT) AS sum_squares,
        |  round(sqrt(CAST(sum(v * v) AS DOUBLE) / 64.0), 6) AS rms
        |FROM l GROUP BY doc_id, frame ORDER BY media_id, frame""".stripMargin) { (s, dir) =>
      val media = graft.multimodal.Multimodal
        .synthesizeWav(Tables.load(s, dir, "documents"), "doc_id")
      graft.multimodal.Multimodal.extractWavFrameFeatures(media, frameLen = 64)
        .withColumn("rms",
          round(sqrt(col("sum_squares").cast("double") / 64.0), 6))
        .orderBy("media_id", "frame")
    },

    // Difference-hash image fingerprint (Multimodal.extractBmpDHash):
    // REAL BMP decode → 9×8 nearest-neighbor resize → horizontal gradient
    // sign bits — the brightness-shift-robust sibling of q122's aHash.
    // The oracle regenerates resized pixels via the same floor mapping
    // (sx = x·16//9, sy = y·12//8) and compares adjacent lumas.
    Q(
      "q274_image_dhash",
      """WITH px AS (
        |  SELECT doc_id, y.y AS y, x.x AS x,
        |    299 * ((doc_id * 31 + ((y.y * 12) // 8) * 7 + ((x.x * 16) // 9) * 13) % 256)
        |    + 587 * ((doc_id * 17 + ((y.y * 12) // 8) * 11 + ((x.x * 16) // 9) * 5) % 256)
        |    + 114 * ((doc_id * 23 + ((y.y * 12) // 8) * 3 + ((x.x * 16) // 9) * 19) % 256)
        |      AS l
        |  FROM documents,
        |       unnest(generate_series(0, 7)) AS y(y),
        |       unnest(generate_series(0, 8)) AS x(x)),
        |g AS (SELECT a.doc_id, a.y, a.x,
        |    CASE WHEN b.l > a.l THEN 1 ELSE 0 END AS bit
        |  FROM px a JOIN px b ON a.doc_id = b.doc_id AND a.y = b.y AND b.x = a.x + 1
        |  WHERE a.x < 8)
        |SELECT doc_id AS media_id,
        |  array_to_string(list(CAST(bit AS VARCHAR) ORDER BY y, x), '') AS dhash,
        |  CAST(sum(bit) AS BIGINT) AS n_ones
        |FROM g GROUP BY doc_id ORDER BY media_id""".stripMargin) { (s, dir) =>
      val media = graft.multimodal.Multimodal
        .synthesizeBmp(Tables.load(s, dir, "documents"), "doc_id")
      graft.multimodal.Multimodal.extractBmpDHash(media, side = 8)
        .orderBy("media_id")
    },

    // REAL GIF decode (GifCodec): palette-indexed synthetic pixels
    // round-trip through an actual LZW compress → GIF87a encode → parse →
    // LZW decompress → palette lookup, while the oracle COMPOSES the two
    // integer recipes (index(x,y) = (id·13+y·31+x·7)%256, palette entry
    // j → ((j·31+7)%256, (j·17+3)%256, (j·23+11)%256)) and recomputes the
    // same channel sums / luma extrema / edge counts as q100 — the third
    // pure-JVM container on the shared pixel contract.
    Q(
      "q282_gif_features",
      """WITH px AS (
        |  SELECT doc_id, y.y AS y, x.x AS x,
        |    ((doc_id * 13 + y.y * 31 + x.x * 7) % 256 * 31 + 7) % 256 AS r,
        |    ((doc_id * 13 + y.y * 31 + x.x * 7) % 256 * 17 + 3) % 256 AS g,
        |    ((doc_id * 13 + y.y * 31 + x.x * 7) % 256 * 23 + 11) % 256 AS b
        |  FROM documents,
        |       unnest(generate_series(0, 11)) AS y(y),
        |       unnest(generate_series(0, 15)) AS x(x)),
        |lum AS (
        |  SELECT doc_id, y, x, r, g, b, 299 * r + 587 * g + 114 * b AS l,
        |    lag(299 * r + 587 * g + 114 * b)
        |      OVER (PARTITION BY doc_id, y ORDER BY x) AS pl
        |  FROM px)
        |SELECT doc_id AS media_id,
        |  CAST(16 AS BIGINT) AS width,
        |  CAST(12 AS BIGINT) AS height,
        |  CAST(192 AS BIGINT) AS n_pixels,
        |  CAST(sum(r) AS BIGINT) AS sum_r,
        |  CAST(sum(g) AS BIGINT) AS sum_g,
        |  CAST(sum(b) AS BIGINT) AS sum_b,
        |  CAST(min(l) AS BIGINT) AS luma_min,
        |  CAST(max(l) AS BIGINT) AS luma_max,
        |  CAST(sum(CASE WHEN pl IS NOT NULL AND abs(l - pl) > 50000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS edge_count
        |FROM lum GROUP BY doc_id ORDER BY media_id""".stripMargin) { (s, dir) =>
      val media = graft.multimodal.Multimodal
        .synthesizeGif(Tables.load(s, dir, "documents"), "doc_id")
      graft.multimodal.Multimodal.extractGifFeatures(media).orderBy("media_id")
    },

    // GIF difference-hash: REAL LZW decode → 9×8 nearest-neighbor resize →
    // BmpCodec.dHash — q274's near-dup fingerprint machinery reused
    // verbatim on the third container (equal hashes across FORMATS mark
    // candidate duplicates: a GIF and a BMP of the same pixels collide).
    // Oracle: same floor resize mapping over the composed palette recipe.
    Q(
      "q283_gif_dhash",
      """WITH px AS (
        |  SELECT doc_id, y.y AS y, x.x AS x,
        |    299 * (((doc_id * 13 + ((y.y * 12) // 8) * 31 + ((x.x * 16) // 9) * 7) % 256
        |            * 31 + 7) % 256)
        |    + 587 * (((doc_id * 13 + ((y.y * 12) // 8) * 31 + ((x.x * 16) // 9) * 7) % 256
        |            * 17 + 3) % 256)
        |    + 114 * (((doc_id * 13 + ((y.y * 12) // 8) * 31 + ((x.x * 16) // 9) * 7) % 256
        |            * 23 + 11) % 256)
        |      AS l
        |  FROM documents,
        |       unnest(generate_series(0, 7)) AS y(y),
        |       unnest(generate_series(0, 8)) AS x(x)),
        |g AS (SELECT a.doc_id, a.y, a.x,
        |    CASE WHEN b.l > a.l THEN 1 ELSE 0 END AS bit
        |  FROM px a JOIN px b ON a.doc_id = b.doc_id AND a.y = b.y AND b.x = a.x + 1
        |  WHERE a.x < 8)
        |SELECT doc_id AS media_id,
        |  array_to_string(list(CAST(bit AS VARCHAR) ORDER BY y, x), '') AS dhash,
        |  CAST(sum(bit) AS BIGINT) AS n_ones
        |FROM g GROUP BY doc_id ORDER BY media_id""".stripMargin) { (s, dir) =>
      val media = graft.multimodal.Multimodal
        .synthesizeGif(Tables.load(s, dir, "documents"), "doc_id")
      graft.multimodal.Multimodal.extractGifDHash(media, side = 8)
        .orderBy("media_id")
    },

    // Mixed-container near-dup audit: a corpus holding the SAME image as
    // a GIF and as a BMP (synthesizeGif + its pixel twin
    // synthesizeBmpGifTwin) fingerprints both through their REAL decoders
    // and groups by dHash — the format-blind dedup shape (decode → shared
    // pixel contract → one fingerprint space). Every cluster must hold
    // equal GIF and BMP counts (twins collide by construction) and
    // mod-256 id aliases merge clusters across ids too. Oracle replays the
    // q283 dhash recipe once per doc and doubles the membership.
    Q(
      "q284_crossformat_dedup",
      """WITH px AS (
        |  SELECT doc_id, y.y AS y, x.x AS x,
        |    299 * (((doc_id * 13 + ((y.y * 12) // 8) * 31 + ((x.x * 16) // 9) * 7) % 256
        |            * 31 + 7) % 256)
        |    + 587 * (((doc_id * 13 + ((y.y * 12) // 8) * 31 + ((x.x * 16) // 9) * 7) % 256
        |            * 17 + 3) % 256)
        |    + 114 * (((doc_id * 13 + ((y.y * 12) // 8) * 31 + ((x.x * 16) // 9) * 7) % 256
        |            * 23 + 11) % 256)
        |      AS l
        |  FROM documents,
        |       unnest(generate_series(0, 7)) AS y(y),
        |       unnest(generate_series(0, 8)) AS x(x)),
        |g AS (SELECT a.doc_id, a.y, a.x,
        |    CASE WHEN b.l > a.l THEN 1 ELSE 0 END AS bit
        |  FROM px a JOIN px b ON a.doc_id = b.doc_id AND a.y = b.y AND b.x = a.x + 1
        |  WHERE a.x < 8),
        |per AS (SELECT doc_id,
        |    array_to_string(list(CAST(bit AS VARCHAR) ORDER BY y, x), '') AS dhash
        |  FROM g GROUP BY doc_id)
        |SELECT dhash,
        |  CAST(2 * count(*) AS BIGINT) AS n_media,
        |  CAST(count(*) AS BIGINT) AS n_gif,
        |  CAST(count(*) AS BIGINT) AS n_bmp
        |FROM per GROUP BY dhash ORDER BY dhash""".stripMargin) { (s, dir) =>
      import graft.multimodal.Multimodal
      val docs = Tables.load(s, dir, "documents")
      val gif = Multimodal
        .extractGifDHash(Multimodal.synthesizeGif(docs, "doc_id"), side = 8)
        .select(col("dhash"), lit("gif").as("_fmt"))
      val bmp = Multimodal
        .extractBmpDHash(Multimodal.synthesizeBmpGifTwin(docs, "doc_id"), side = 8)
        .select(col("dhash"), lit("bmp").as("_fmt"))
      // coalesce the union (narrow — decode stays spread): each branch
      // arrives at full session parallelism, and without this the
      // fingerprint groupBy's map side launches 2×parts tiny tasks
      gif.unionByName(bmp)
        .coalesce(math.max(1, s.sessionState.conf.numShufflePartitions / 4))
        .groupBy("dhash")
        .agg(
          count(lit(1)).as("n_media"),
          sum(when(col("_fmt") === "gif", 1L).otherwise(0L)).as("n_gif"),
          sum(when(col("_fmt") === "bmp", 1L).otherwise(0L)).as("n_bmp"))
        .orderBy("dhash")
    },

    // Brown–Forsythe robust variance-equality test: q264's ANOVA machinery
    // applied to |value − group median| — the heteroscedasticity check
    // that survives heavy tails (Levene with the median center). Median
    // via the exact interpolated percentile (the q109 recipe), deviations
    // integerized at cents, then the same exact-integer SSB/SSW path.
    Q(
      "q275_brown_forsythe",
      """WITH m AS (SELECT event_type, median(value) AS med FROM events GROUP BY 1),
        |f AS (SELECT e.event_type,
        |    CAST(round(abs(e.value - m.med) * 100) AS BIGINT) AS z
        |  FROM events e JOIN m ON e.event_type = m.event_type),
        |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(z) AS HUGEINT) AS sx, CAST(sum(z * z) AS HUGEINT) AS sxx
        |  FROM f GROUP BY 1),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS n,
        |    CAST(sum(sx) AS HUGEINT) AS gx, CAST(sum(sxx) AS HUGEINT) AS gxx,
        |    CAST(sum((sx * sx) // n) AS HUGEINT) AS sb
        |  FROM g)
        |SELECT k, n, k - 1 AS df_between, n - k AS df_within,
        |  CAST(sb - (gx * gx) // n AS BIGINT) AS ssb_u,
        |  CAST(gxx - sb AS BIGINT) AS ssw_u,
        |  CASE WHEN k > 1 AND n > k AND gxx - sb > 0 THEN
        |    floor((CAST(sb - (gx * gx) // n AS DOUBLE) / CAST(k - 1 AS DOUBLE))
        |        / (CAST(gxx - sb AS DOUBLE) / CAST(n - k AS DOUBLE))
        |      * 1000000.0 + 0.5) / 1000000.0 END AS f_stat
        |FROM a""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val med = ev.groupBy(col("event_type"))
        .agg(expr("percentile(value, 0.5)").as("_med"))
      val z = ev.join(broadcast(med), Seq("event_type"))
        .select(col("event_type"), abs(col("value") - col("_med")).as("z"))
      graft.operators.RobustStats
        .anovaF(z, "event_type", "z", scale = 100)
        .select(
          col("k"), col("n"), col("df_between"), col("df_within"),
          col("ssb_u"), col("ssw_u"),
          pin6(col("f_stat")).as("f_stat"))
    },

    // Connected-component census of the bigram graph
    // (DupClusters.components — hash-remapped star alternation):
    // component count, node count, largest/smallest size — the "is this
    // graph one blob or many islands" health readout. The oracle computes
    // the same partition by recursive reachability closure + min-root.
    Q(
      "q276_component_stats",
      s"""WITH RECURSIVE ${ExperimentQueries.EdgeCte},
         |r(node, root) AS (
         |  SELECT DISTINCT s, s FROM s0
         |  UNION
         |  SELECT s0.d, r.root FROM r JOIN s0 ON s0.s = r.node),
         |c AS (SELECT node, min(root) AS component FROM r GROUP BY 1),
         |sz AS (SELECT component, CAST(count(*) AS BIGINT) AS n FROM c GROUP BY 1)
         |SELECT CAST(count(*) AS BIGINT) AS n_components,
         |  CAST(sum(n) AS BIGINT) AS n_nodes,
         |  CAST(max(n) AS BIGINT) AS max_size,
         |  CAST(min(n) AS BIGINT) AS min_size
         |FROM sz""".stripMargin) { (s, dir) =>
      val comp = graft.dedup.DupClusters
        .components(SharedFrames.bigramEdges(s, dir), "a", "b")
      comp.groupBy(col("component")).agg(count(lit(1)).as("_n"))
        .agg(
          count(lit(1)).cast("long").as("n_components"),
          sum(col("_n")).cast("long").as("n_nodes"),
          max(col("_n")).cast("long").as("max_size"),
          min(col("_n")).cast("long").as("min_size"))
    },

    // Newman modularity of the 2-round label-propagation partition:
    // Q = Σ_c (4·m·m_c − d_c²) / (4m²) with intra-edge counts m_c and
    // community degree sums d_c as exact integers — one pinned double
    // division at the end. The "did the community detection find real
    // structure" score (Q ≈ 0 ⇒ no better than random).
    Q(
      "q277_modularity",
      s"""WITH ${ExperimentQueries.EdgeCte},
         |l0 AS (SELECT DISTINCT s AS node, s AS label FROM s0),
         |v1 AS (SELECT s0.s AS node, l0.label, count(*) AS c
         |       FROM s0 JOIN l0 ON s0.d = l0.node GROUP BY 1, 2),
         |l1 AS (SELECT node, label FROM (
         |         SELECT node, label,
         |           row_number() OVER (PARTITION BY node ORDER BY c DESC, label ASC) AS rn
         |         FROM v1) WHERE rn = 1),
         |v2 AS (SELECT s0.s AS node, l1.label, count(*) AS c
         |       FROM s0 JOIN l1 ON s0.d = l1.node GROUP BY 1, 2),
         |l2 AS (SELECT node, label FROM (
         |         SELECT node, label,
         |           row_number() OVER (PARTITION BY node ORDER BY c DESC, label ASC) AS rn
         |         FROM v2) WHERE rn = 1),
         |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM ed),
         |dg AS (SELECT s AS node, CAST(count(*) AS BIGINT) AS dg FROM s0 GROUP BY 1),
         |dc AS (SELECT l2.label, CAST(sum(dg.dg) AS BIGINT) AS d_c
         |       FROM dg JOIN l2 ON dg.node = l2.node GROUP BY 1),
         |mc AS (SELECT la.label, CAST(count(*) AS BIGINT) AS m_c
         |       FROM ed JOIN l2 la ON ed.a = la.node
         |               JOIN l2 lb ON ed.b = lb.node
         |       WHERE la.label = lb.label GROUP BY 1),
         |t AS (SELECT CAST(sum(4 * mm.m * coalesce(mc.m_c, 0) - dc.d_c * dc.d_c)
         |        AS BIGINT) AS num,
         |        CAST(count(*) AS BIGINT) AS n_communities
         |      FROM dc LEFT JOIN mc ON dc.label = mc.label CROSS JOIN mm)
         |SELECT mm.m, n_communities,
         |  floor(CAST(num AS DOUBLE) / CAST(4 * mm.m * mm.m AS DOUBLE)
         |    * 1000000.0 + 0.5) / 1000000.0 AS modularity
         |FROM t CROSS JOIN mm""".stripMargin) { (s, dir) =>
      val edges = SharedFrames.bigramEdges(s, dir).persist()
      // labels feed three plan branches (degree join + both endpoint
      // joins) — persist or the 2-round LPA re-executes per branch
      val labels = graft.operators.Communities
        .labelPropagate(edges, "a", "b", rounds = 2).persist()
      val sym = edges.select(col("a").as("node"))
        .union(edges.select(col("b").as("node")))
      val deg = sym.groupBy("node").agg(count(lit(1)).cast("long").as("_dg"))
      val m = edges.agg(count(lit(1)).cast("long").as("m"))
      val dc = deg.join(labels, "node")
        .groupBy("label").agg(sum(col("_dg")).cast("long").as("_d_c"))
      val mc = edges
        .join(labels.select(col("node").as("a"), col("label").as("_la")), "a")
        .join(labels.select(col("node").as("b"), col("label").as("_lb")), "b")
        .filter(col("_la") === col("_lb"))
        .groupBy(col("_la").as("label")).agg(count(lit(1)).cast("long").as("_m_c"))
      dc.join(mc, Seq("label"), "left")
        .crossJoin(broadcast(m))
        .agg(
          first(col("m")).as("m"),
          count(lit(1)).cast("long").as("n_communities"),
          sum(lit(4L) * col("m") * coalesce(col("_m_c"), lit(0L)) -
            col("_d_c") * col("_d_c")).cast("long").as("_num"))
        .select(
          col("m"), col("n_communities"),
          pin6(col("_num").cast("double") /
            (lit(4.0) * col("m").cast("double") * col("m").cast("double")))
            .as("modularity"))
    },

    // Harmonic centrality of the five highest-degree nodes, 4-hop bounded
    // (ShortestPath.bfsLevels per seed): Σ over reached nodes of
    // 1e6 div dist — exact integers, the "which hubs actually reach the
    // graph" readout that closeness can't give on disconnected graphs.
    // Bounded rounds keep the plan static (the q207 discipline).
    Q(
      "q278_harmonic",
      s"""WITH ${ExperimentQueries.EdgeCte},
         |dg AS (SELECT s AS node, count(*) AS dg FROM s0 GROUP BY 1),
         |seeds AS (SELECT node FROM dg ORDER BY dg DESC, node LIMIT 5),
         |d0 AS (SELECT node AS seed, node, CAST(0 AS BIGINT) AS dist FROM seeds),
         |r1 AS (SELECT d0.seed, s0.d AS node, CAST(1 AS BIGINT) AS dist
         |       FROM d0 JOIN s0 ON s0.s = d0.node),
         |d1 AS (SELECT seed, node, min(dist) AS dist FROM
         |        (SELECT * FROM d0 UNION ALL SELECT * FROM r1) GROUP BY 1, 2),
         |r2 AS (SELECT d1.seed, s0.d AS node, dist + 1 AS dist
         |       FROM d1 JOIN s0 ON s0.s = d1.node),
         |d2 AS (SELECT seed, node, min(dist) AS dist FROM
         |        (SELECT * FROM d1 UNION ALL SELECT * FROM r2) GROUP BY 1, 2),
         |r3 AS (SELECT d2.seed, s0.d AS node, dist + 1 AS dist
         |       FROM d2 JOIN s0 ON s0.s = d2.node),
         |d3 AS (SELECT seed, node, min(dist) AS dist FROM
         |        (SELECT * FROM d2 UNION ALL SELECT * FROM r3) GROUP BY 1, 2),
         |r4 AS (SELECT d3.seed, s0.d AS node, dist + 1 AS dist
         |       FROM d3 JOIN s0 ON s0.s = d3.node),
         |d4 AS (SELECT seed, node, min(dist) AS dist FROM
         |        (SELECT * FROM d3 UNION ALL SELECT * FROM r4) GROUP BY 1, 2)
         |SELECT seed, CAST(count(CASE WHEN dist > 0 THEN 1 END) AS BIGINT) AS n_reached,
         |  CAST(sum(CASE WHEN dist > 0 THEN 1000000 // dist ELSE 0 END) AS BIGINT)
         |    AS harmonic_micro
         |FROM d4 GROUP BY seed ORDER BY seed""".stripMargin) { (s, dir) =>
      val edges = SharedFrames.bigramEdges(s, dir).persist()
      val sym = edges.select(col("a").as("node"))
        .union(edges.select(col("b").as("node")))
      // collect the 5 seed ids (sanctioned O(k) driver probe): the BFS
      // union chain embeds its base plan 2^rounds times, so the seed set
      // must be a literal relation, not a live groupBy+limit subplan
      val seeds = sym.groupBy("node").agg(count(lit(1)).as("_dg"))
        .orderBy(col("_dg").desc, col("node")).limit(5)
        .select("node").collect().map(_.getString(0))
      val spark = s
      import spark.implicits._
      // one multi-source traversal: k seeds, the stage count of one BFS
      graft.operators.ShortestPath
        .bfsLevelsFrom(edges, "a", "b", seeds.toSeq.toDF("seed"), rounds = 4)
        .groupBy("seed")
        .agg(
          sum(when(col("dist") > 0, 1L).otherwise(0L)).as("n_reached"),
          sum(when(col("dist") > 0, expr("1000000L div dist")).otherwise(0L))
            .cast("long").as("harmonic_micro"))
        .orderBy("seed")
    },

    // Burstiness / index of dispersion of the daily event arrival per
    // type: variance-to-mean ratio of daily counts (1 = Poisson-like,
    // ≫1 = bursty traffic). The q264 moment discipline — exact counts,
    // variance numerator as one exact decimal, a single pinned division.
    Q(
      "q279_burstiness",
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(c) AS HUGEINT) AS sx,
        |    CAST(sum(c * c) AS HUGEINT) AS sxx
        |  FROM d GROUP BY 1)
        |SELECT event_type, n_days, CAST(sx AS BIGINT) AS n_events,
        |  CASE WHEN n_days > 1 AND sx > 0 THEN
        |    floor(CAST(n_days * sxx - sx * sx AS DOUBLE)
        |        / CAST((n_days - 1) * sx AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
        |  END AS dispersion
        |FROM g ORDER BY event_type""".stripMargin) { (s, dir) =>
      val dec = "decimal(38,0)"
      Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(count(lit(1)).cast("long").as("c"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).cast("long").as("n_days"),
          sum(col("c").cast(dec)).cast(dec).as("_sx"),
          sum((col("c") * col("c")).cast(dec)).cast(dec).as("_sxx"))
        .select(
          col("event_type"), col("n_days"),
          col("_sx").cast("long").as("n_events"),
          when(col("n_days") > 1 && col("_sx") > 0,
            pin6((col("n_days").cast(dec) * col("_sxx") - col("_sx") * col("_sx"))
              .cast("double") /
              ((col("n_days") - 1).cast("double") * col("_sx").cast("double"))))
            .as("dispersion"))
        .orderBy("event_type")
    },

    // The FULL Gopher-style filter: hard rules (q261) AND repetition
    // thresholds (q262's top-bigram / duplicate-5-gram mass), rolled up
    // to a per-language keep table — the one-line corpus-cut readout a
    // curation run reports. Pure composition of the two spec'd parts;
    // the exact integer micro thresholds make the cut engine-identical.
    Q(
      "q280_gopher_full",
      """WITH tok AS (SELECT doc_id, lang,
        |    list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), x -> x != '') AS t
        |  FROM documents),
        |f AS (SELECT doc_id, lang,
        |    CAST(len(t) AS BIGINT) AS n_words,
        |    CAST(coalesce(list_aggregate(list_transform(t, x -> length(x)), 'sum'), 0)
        |      AS BIGINT) AS chars,
        |    CAST(len(list_filter(t, x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS alpha,
        |    CAST(len(list_intersect(list_distinct(t),
        |      ['the','a','of','to','and','in','is','that','for','it'])) AS BIGINT) AS stop_hits
        |  FROM tok),
        |rules AS (SELECT doc_id, lang,
        |    (n_words BETWEEN 10 AND 100000)
        |      AND (CASE WHEN n_words = 0 THEN 0 ELSE (chars * 1000000) // n_words END
        |           BETWEEN 2000000 AND 12000000)
        |      AND (CASE WHEN n_words = 0 THEN 0 ELSE (alpha * 1000000) // n_words END)
        |          >= 700000
        |      AND stop_hits >= 2 AS rules_ok
        |  FROM f),
        |bg AS (SELECT tok.doc_id, o.n,
        |    array_to_string(list_slice(t, g.i, g.i + o.n - 1), ' ') AS gram
        |  FROM tok CROSS JOIN (SELECT unnest([2, 5]) AS n) o,
        |    unnest(generate_series(1, len(t) - o.n + 1)) AS g(i)),
        |pc AS (SELECT doc_id, n, gram,
        |    CAST(length(gram) - (n - 1) AS BIGINT) AS len, count(*) AS c
        |  FROM bg GROUP BY 1, 2, 3, 4),
        |pd AS (SELECT doc_id, n,
        |    (CAST(max(c * len) AS BIGINT) * 1000000) // CAST(sum(c * len) AS BIGINT)
        |      AS top_micro,
        |    (CAST(sum(CASE WHEN c >= 2 THEN c * len ELSE 0 END) AS BIGINT) * 1000000)
        |      // CAST(sum(c * len) AS BIGINT) AS dup_micro
        |  FROM pc GROUP BY 1, 2),
        |rep AS (SELECT doc_id,
        |    bool_and(CASE WHEN n = 2 THEN top_micro < 200000 ELSE TRUE END)
        |      AND bool_and(CASE WHEN n = 5 THEN dup_micro < 300000 ELSE TRUE END)
        |      AS rep_ok
        |  FROM pd GROUP BY 1)
        |SELECT r.lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN r.rules_ok AND coalesce(rep.rep_ok, TRUE) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_kept
        |FROM rules r LEFT JOIN rep ON r.doc_id = rep.doc_id
        |GROUP BY r.lang ORDER BY r.lang""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val rules = graft.text.QualityRules.gopherStats(docs, "doc_id", "text")
        .select(col("doc_id"), col("kept").as("_rules_ok"))
      val rep = graft.text.QualityRules
        .repetitionStats(docs, "doc_id", "text", Seq(2, 5))
        .groupBy("doc_id")
        .agg((
          min(when(col("n") === 2, col("top_frac_micro") < 200000L).otherwise(lit(true))
            .cast("int")) === 1 &&
          min(when(col("n") === 5, col("dup_frac_micro") < 300000L).otherwise(lit(true))
            .cast("int")) === 1).as("_rep_ok"))
      docs.select(col("doc_id"), col("lang"))
        .join(rules, "doc_id")
        .join(rep, Seq("doc_id"), "left")
        .groupBy("lang")
        .agg(
          count(lit(1)).cast("long").as("n_docs"),
          sum(when(col("_rules_ok") && coalesce(col("_rep_ok"), lit(true)), 1L)
            .otherwise(0L)).cast("long").as("n_kept"))
        .orderBy("lang")
    })
}
