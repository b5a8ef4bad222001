package graft.queries

import graft.Tables
import graft.load.Skew
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second half of the analytics surface (split from [[AnalyticsQueries]]
  * along its section seam for reviewability — same breadth-beyond-the-
  * reference charter: variant/JSON ingestion, window families, sketches,
  * revenue rollups; all decimal-exact or integer-exact for the DuckDB
  * hash-match).
  */
object AnalyticsQueriesB {

  val all: Seq[Q] = Seq(
    // Spark 4 VariantType ingestion: parse the JSON props ONCE into a
    // variant and extract typed fields from the parsed form — the
    // semi-structured path that beats q53's per-field get_json_object
    // (which re-parses the string for every extraction). try_parse_json on
    // malformed input nulls instead of failing the batch — the ingest
    // robustness contract. The oracle replays the same semantics through
    // DuckDB's JSON functions; outputs are plain BIGINT/BOOLEAN so the
    // engines compare bit-for-bit.
    Q(
      "q144_variant_extract",
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  bool_and(NOT json_valid('{oops')) AS bad_is_null
        |FROM events GROUP BY k_mod ORDER BY k_mod""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .select(variant_get(parse_json(col("props")), "$.k", "bigint").as("_k"))
        .groupBy((col("_k") % 10).as("k_mod"))
        .agg(count(lit(1)).as("n"), sum(col("_k")).as("sum_k"),
          bool_and(try_parse_json(lit("{oops")).isNull).as("bad_is_null"))
        .orderBy("k_mod")
    },

    // Blocked inverted index (Retrieval.invertedIndex): postings keyed by
    // (token, doc-id-range block) — the block id is a projection, NOT a
    // per-token row_number, so a stop word's postings split across blocks
    // mechanically instead of dragging into one reducer. The in-block
    // "doc:tf" string is array_sort-ed into doc-id order (collect order is
    // nondeterministic; struct sort restores it exactly).
    Q(
      "q145_inverted_index",
      """WITH tt AS (SELECT doc_id, u.tok AS token
        |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
        |    unnest(t) AS u(tok)),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM tt GROUP BY doc_id, token)
        |SELECT token, doc_id // 128 AS block_id, count(*) AS n_docs,
        |  CAST(sum(tf) AS BIGINT) AS tf_block,
        |  string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id) AS postings
        |FROM tf GROUP BY token, block_id
        |ORDER BY token, block_id""".stripMargin) { (s, dir) =>
      graft.text.Retrieval.invertedIndex(
        Tables.load(s, dir, "documents"), "doc_id", "text", docRange = 128)
        .orderBy("token", "block_id")
    },

    // Collocation mining by PMI lift (Vocab.collocations): the PMI's log
    // argument kept un-logged (monotone → identical ranking, no libm in the
    // gate), evaluated in a pinned double operation order so both engines
    // produce the same bits. minCount floors away the hapax-pair pathology.
    Q(
      "q146_pmi_bigrams",
      """WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
        |uni AS (SELECT u.tok AS token, count(*) AS c1 FROM tok, unnest(t) AS u(tok) GROUP BY token),
        |t1 AS (SELECT CAST(sum(c1) AS BIGINT) AS t1 FROM uni),
        |bg AS (SELECT t[i] || ' ' || t[i+1] AS gram
        |       FROM tok, unnest(generate_series(1, len(t) - 1)) AS g(i)),
        |pc AS (SELECT gram, count(*) AS n FROM bg GROUP BY gram),
        |t2 AS (SELECT CAST(sum(n) AS BIGINT) AS t2 FROM pc)
        |SELECT gram, n AS n_pair,
        |  round(CAST(n AS DOUBLE) * CAST(t1 AS DOUBLE) * CAST(t1 AS DOUBLE) /
        |    (CAST(t2 AS DOUBLE) * CAST(cx.c1 AS DOUBLE) * CAST(cy.c1 AS DOUBLE)), 4) AS lift
        |FROM pc
        |JOIN uni cx ON cx.token = split_part(gram, ' ', 1)
        |JOIN uni cy ON cy.token = split_part(gram, ' ', 2)
        |CROSS JOIN t1 CROSS JOIN t2
        |WHERE n >= 5
        |ORDER BY lift DESC, gram LIMIT 100""".stripMargin) { (s, dir) =>
      graft.text.Vocab.collocations(Tables.load(s, dir, "documents"), "text", minCount = 5)
        .orderBy(col("lift").desc, col("gram"))
        .limit(100)
    },

    // BM25 ranked retrieval (Retrieval.bm25): k1 = 6/5 and b = 3/4 make the
    // tf saturation a single division of exact 64-bit integers
    // (22·tf·S / (10·tf·S + 3·S + 9·dl·N)), and the idf is the classical
    // formula's log ARGUMENT (2N−2df+1)/(2df+1) — monotone, so per-term
    // ranking matches log-BM25 while the gate stays bit-portable. Top-10
    // per query term via row_number (Spark 4 WindowGroupLimit pushes the
    // limit below the exchange).
    Q(
      "q147_bm25_topk",
      """WITH tt AS (SELECT doc_id, u.tok AS term
        |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
        |    unnest(t) AS u(tok)),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tt GROUP BY doc_id, term),
        |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tt GROUP BY doc_id),
        |tot AS (SELECT CAST(sum(dl) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n FROM dl),
        |hits AS (SELECT * FROM tf WHERE term IN ('spark', 'vector', 'stream')),
        |dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS dfr FROM hits GROUP BY term),
        |sc AS (SELECT h.term, h.doc_id, h.tf, d.dl,
        |    round(CAST(22 * h.tf * s AS DOUBLE) /
        |        CAST(10 * h.tf * s + 3 * s + 9 * d.dl * n AS DOUBLE) *
        |      (CAST(2 * n - 2 * dfr + 1 AS DOUBLE) / CAST(2 * dfr + 1 AS DOUBLE)),
        |      4) AS score
        |  FROM hits h JOIN dl d USING (doc_id) JOIN dfq USING (term) CROSS JOIN tot),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY term ORDER BY score DESC, doc_id) AS rk
        |       FROM sc)
        |SELECT term, doc_id, tf, dl, score, rk FROM rk
        |WHERE rk <= 10 ORDER BY term, rk""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      graft.text.Retrieval.bm25(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        Seq("spark", "vector", "stream"))
        .withColumn("rk",
          row_number().over(
            Window.partitionBy("term").orderBy(col("score").desc, col("doc_id")))
            .cast("long"))
        .filter(col("rk") <= 10)
        .orderBy("term", "rk")
    },

    // Fixed-iteration PageRank (operators.PageRank) over the part↔supplier
    // bipartite graph, in scaled-INTEGER arithmetic: every step is integer
    // division + integer sums, so the result is independent of aggregation
    // order (double sums aren't associative) and bit-identical in DuckDB's
    // unrolled replay. Three iterations = three keyed shuffles — the static
    // power-iteration plan a cluster runs with checkpoints between stages.
    Q(
      "q148_pagerank",
      """WITH e AS (SELECT DISTINCT 'p' || l_partkey AS src, 's' || l_suppkey AS dst FROM lineitem
        |           UNION ALL
        |           SELECT DISTINCT 's' || l_suppkey, 'p' || l_partkey FROM lineitem),
        |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src),
        |nodes AS (SELECT DISTINCT src AS node FROM e),
        |r0 AS (SELECT node, CAST(1000000000000 AS BIGINT) AS pr FROM nodes),
        |c1 AS (SELECT e.dst AS node, CAST(sum(r0.pr // deg.deg) AS BIGINT) AS inr
        |       FROM e JOIN r0 ON e.src = r0.node JOIN deg ON e.src = deg.src GROUP BY e.dst),
        |r1 AS (SELECT n.node, 150000000000 + (17 * coalesce(c1.inr, 0)) // 20 AS pr
        |       FROM nodes n LEFT JOIN c1 USING (node)),
        |c2 AS (SELECT e.dst AS node, CAST(sum(r1.pr // deg.deg) AS BIGINT) AS inr
        |       FROM e JOIN r1 ON e.src = r1.node JOIN deg ON e.src = deg.src GROUP BY e.dst),
        |r2 AS (SELECT n.node, 150000000000 + (17 * coalesce(c2.inr, 0)) // 20 AS pr
        |       FROM nodes n LEFT JOIN c2 USING (node)),
        |c3 AS (SELECT e.dst AS node, CAST(sum(r2.pr // deg.deg) AS BIGINT) AS inr
        |       FROM e JOIN r2 ON e.src = r2.node JOIN deg ON e.src = deg.src GROUP BY e.dst),
        |r3 AS (SELECT n.node, 150000000000 + (17 * coalesce(c3.inr, 0)) // 20 AS pr
        |       FROM nodes n LEFT JOIN c3 USING (node))
        |SELECT node, pr FROM r3 ORDER BY pr DESC, node LIMIT 100""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey")).distinct()
      val edges = li
        .select(concat(lit("p"), col("l_partkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
        .union(li.select(concat(lit("s"), col("l_suppkey")).as("src"),
          concat(lit("p"), col("l_partkey")).as("dst")))
      graft.operators.PageRank.ranks(edges, iters = 3, undirected = true)
        .select(col("node"), col("rank").as("pr"))
        .orderBy(col("pr").desc, col("node"))
        .limit(100)
    },

    // Per-vertex triangle counts (operators.Triangles) over the token
    // adjacency graph: degree-ordered edge orientation bounds every node's
    // oriented out-degree at O(√m) — wedge generation can't explode on a
    // hub — and each triangle closes exactly once. The oracle brute-forces
    // the lexicographic triple join it can afford at oracle scale; the
    // triangle SET is orientation-independent, so the counts must agree.
    Q(
      "q149_triangles",
      """WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
        |bg AS (SELECT t[i] || ' ' || t[i+1] AS gram
        |       FROM tok, unnest(generate_series(1, len(t) - 1)) AS g(i)),
        |pc AS (SELECT gram, count(*) AS n FROM bg GROUP BY gram),
        |ed AS (SELECT DISTINCT
        |         least(split_part(gram, ' ', 1), split_part(gram, ' ', 2)) AS a,
        |         greatest(split_part(gram, ' ', 1), split_part(gram, ' ', 2)) AS b
        |       FROM pc
        |       WHERE n >= 5 AND split_part(gram, ' ', 1) != split_part(gram, ' ', 2)),
        |tri AS (SELECT e1.a AS v1, e1.b AS v2, e2.b AS v3
        |        FROM ed e1 JOIN ed e2 ON e2.a = e1.b
        |        JOIN ed e3 ON e3.a = e1.a AND e3.b = e2.b)
        |SELECT node, count(*) AS n_triangles
        |FROM (SELECT v1 AS node FROM tri
        |      UNION ALL SELECT v2 FROM tri
        |      UNION ALL SELECT v3 FROM tri)
        |GROUP BY node ORDER BY n_triangles DESC, node""".stripMargin) { (s, dir) =>
      // the edge set IS SharedFrames.bigramEdges (same n>=5 canonical
      // bigram graph as q185/q204/q276/q277) — measure the triangle
      // closure, not a private re-mine of the shared base
      graft.operators.Triangles.perVertexCounts(SharedFrames.bigramEdges(s, dir))
        .orderBy(col("n_triangles").desc, col("node"))
    },

    // Skip-gram pair generation (Vocab.skipgramPairs): the word2vec
    // training-pair step. Pairs are emitted by a nested array transform —
    // a pure codegen projection bounded at 2·window pairs per token — NOT
    // by a per-document position self-join; the only shuffle is the final
    // (center, context) count.
    Q(
      "q150_skipgram_pairs",
      """WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
        |pr AS (SELECT t[i] AS center, t[j] AS context
        |       FROM tok, unnest(generate_series(1, len(t))) AS a(i),
        |            unnest(generate_series(greatest(i - 2, 1), least(i + 2, len(t)))) AS b(j)
        |       WHERE j != i)
        |SELECT center, context, count(*) AS n
        |FROM pr GROUP BY center, context
        |ORDER BY n DESC, center, context LIMIT 200""".stripMargin) { (s, dir) =>
      graft.text.Vocab.skipgramPairs(Tables.load(s, dir, "documents"), "text", window = 2)
        .orderBy(col("n").desc, col("center"), col("context"))
        .limit(200)
    },

    // Market-basket co-occurrence: parts ordered together, by order-keyed
    // self-join — the shuffle keys on l_orderkey and ReuseExchange runs the
    // (orderkey, partkey) distinct ONCE for both sides. Pair fan-out per
    // order is bounded by basket size squared (max 17 items here; a cap on
    // basket size is the skew valve for pathological carts at 100 TB).
    Q(
      "q153_copurchase",
      """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        |SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n
        |FROM op a JOIN op b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |GROUP BY part_a, part_b
        |ORDER BY n DESC, part_a, part_b LIMIT 100""".stripMargin) { (s, dir) =>
      SharedFrames.basketPairCounts(s, dir)
        .select(col("part_a"), col("part_b"), col("n_ab").as("n"))
        .orderBy(col("n").desc, col("part_a"), col("part_b"))
        .limit(100)
    },

    // Cohort retention by acquisition channel: users cohorted on their
    // FIRST event's type (first-touch attribution), then distinct active
    // users per (cohort, week offset). First-touch is a map-side-combined
    // min(struct(ts, event_id, event_type)) — the deterministic argmin
    // (ties beyond ts broken by event_id), NOT a per-user window sort.
    Q(
      "q154_retention_cohorts",
      """WITH e AS (SELECT user_id, event_type, ts, event_id, CAST(ts AS DATE) AS d
        |           FROM events),
        |f AS (SELECT user_id, event_type AS cohort, d AS d0 FROM (
        |        SELECT *, row_number() OVER (PARTITION BY user_id
        |          ORDER BY ts, event_id) AS rn FROM e) WHERE rn = 1)
        |SELECT cohort, CAST((e.d - f.d0) // 7 AS BIGINT) AS wk,
        |  count(DISTINCT e.user_id) AS n_users
        |FROM e JOIN f USING (user_id)
        |GROUP BY cohort, wk ORDER BY cohort, wk""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"),
          to_date(col("ts")).as("d"))
      val first = ev
        .groupBy("user_id")
        .agg(min(struct(col("ts"), col("event_id"), col("event_type"), col("d"))).as("_f"))
        .select(col("user_id"), col("_f.event_type").as("cohort"), col("_f.d").as("d0"))
      ev.join(first, "user_id")
        .groupBy(col("cohort"), expr("datediff(d, d0) div 7").as("wk"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("cohort", "wk")
    },

    // Bottom-k-by-hash sample sketch (SampleSketch): a fixed-size MERGEABLE
    // uniform sample (min-k law — the sample analog of the HLL registers),
    // built by distributed TakeOrdered, never a global sort. Selection
    // quantiles from the 2000-row sketch beside the exact ones: the gate
    // pins BOTH the sample membership and the estimates, and the est/exact
    // columns show the O(1/√k) rank error directly.
    Q(
      "q155_sample_quantiles",
      """WITH li AS (SELECT l_extendedprice AS v, l_orderkey, l_linenumber,
        |    md5(l_orderkey || ':' || l_linenumber) AS h FROM lineitem),
        |s AS (SELECT v, h FROM li ORDER BY h LIMIT 2000),
        |sr AS (SELECT v, row_number() OVER (ORDER BY v, h) AS rn,
        |       count(*) OVER () AS k FROM s),
        |ex AS (SELECT v, row_number() OVER (ORDER BY v, l_orderkey, l_linenumber) AS rn,
        |       count(*) OVER () AS n FROM li)
        |SELECT p.pct, sr.v AS est, ex.v AS exact
        |FROM (VALUES (50), (90), (99)) AS p(pct)
        |JOIN sr ON sr.rn = (p.pct * sr.k + 99) // 100
        |JOIN ex ON ex.rn = (p.pct * ex.n + 99) // 100
        |ORDER BY pct""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.operators.{GlobalRank, SampleSketch}
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_extendedprice").as("v"), col("l_orderkey"), col("l_linenumber"))
      val sample = SampleSketch.bottomK(
        li, concat_ws(":", col("l_orderkey"), col("l_linenumber")), 2000)
      val est = SampleSketch.quantiles(sample, Seq("v", "_h"), Seq(50, 90, 99))
      val exact = GlobalRank
        .withRowNumber(li, Seq("v", "l_orderkey", "l_linenumber"), "_rn", "_n")
        .join(Seq(50, 90, 99).toDF("pct"), col("_rn") === expr("(pct * _n + 99) div 100"))
        .select(col("pct"), col("v").as("exact"))
      est.join(exact, "pct").select("pct", "est", "exact").orderBy("pct")
    },

    // Sorted-neighborhood ER (FuzzyJoin.sortedNeighborhoodPairs): candidates
    // from a GLOBAL rank window (O(N·w) pairs independent of value skew —
    // the blocking that survives when q139's equi-blocks don't exist or
    // one block holds 10^8 rows). Rank via GlobalRank (no Window stage);
    // window pairs via an equi-join on the rank bucket with a 2-key probe
    // explode. The oracle replays the definition with a window function.
    Q(
      "q156_sorted_neighborhood",
      """WITH r AS (SELECT c_custkey AS id, c_name AS nm,
        |    row_number() OVER (ORDER BY c_name, c_custkey) AS rn FROM customer)
        |SELECT least(a.id, b.id) AS id_a, greatest(a.id, b.id) AS id_b,
        |  CAST(levenshtein(a.nm, b.nm) AS INTEGER) AS dist
        |FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 5
        |WHERE levenshtein(a.nm, b.nm) <= 2
        |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      graft.operators.FuzzyJoin.sortedNeighborhoodPairs(
        Tables.load(s, dir, "customer"), "c_custkey", "c_name",
        window = 5, maxDist = 2)
        .orderBy("id_a", "id_b")
    },

    // Per-group uniform sample via the typed bottom-k Aggregator
    // (TypedAggregators.groupBottomK): buffer BOUNDED at k per group —
    // unlike collect_list (grows with the group) or a per-group rank
    // window (sorts the whole group for k rows). The md5 rank makes the
    // sample deterministic; the oracle replays it with a rank window it
    // CAN afford at oracle scale.
    Q(
      "q157_group_sample",
      """SELECT lang, rk, doc_id FROM (
        |  SELECT coalesce(lang, 'und') AS lang, doc_id,
        |    CAST(row_number() OVER (PARTITION BY coalesce(lang, 'und')
        |      ORDER BY md5(doc_id::VARCHAR), doc_id) AS BIGINT) AS rk
        |  FROM documents)
        |WHERE rk <= 5 ORDER BY lang, rk""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select(coalesce(col("lang"), lit("und")).as("lang"), col("doc_id"))
        .as[(String, Long)]
        .groupByKey(_._1)
        .mapValues(_._2)
        .agg(graft.functions.TypedAggregators.groupBottomK(5).toColumn.name("ids"))
        .toDF("lang", "ids")
        .select(col("lang"), posexplode(col("ids")).as(Seq("_p", "doc_id")))
        .select(col("lang"), (col("_p") + 1).cast("long").as("rk"), col("doc_id"))
        .orderBy("lang", "rk")
    },

    // Per-group winsorization (outlier repair by clamping at the p05/p95
    // SELECTION quantiles): the bounds are actual stored values picked by
    // integer-exact rank arithmetic — in-group rank = global GlobalRank
    // rank minus the group's min rank (aggregate + join, no per-group
    // window partition, so a group with 10^10 rows costs what the global
    // rank costs) — and the clamp is least/greatest on raw doubles, so no
    // floating arithmetic exists anywhere before the decimal-routed sum.
    Q(
      "q158_winsorize",
      """WITH r AS (SELECT event_type, value, event_id,
        |    row_number() OVER (ORDER BY event_type, value, event_id) AS rn FROM events),
        |b AS (SELECT event_type, min(rn) AS r0, count(*) AS n FROM r GROUP BY event_type),
        |lo AS (SELECT r.event_type, r.value AS lo FROM r JOIN b USING (event_type)
        |       WHERE r.rn - b.r0 + 1 = (b.n + 19) // 20),
        |hi AS (SELECT r.event_type, r.value AS hi FROM r JOIN b USING (event_type)
        |       WHERE r.rn - b.r0 + 1 = (19 * b.n + 19) // 20)
        |SELECT e.event_type, lo, hi,
        |  CAST(sum(CASE WHEN e.value < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
        |  CAST(sum(CASE WHEN e.value > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
        |  CAST(sum(CAST(least(greatest(e.value, lo), hi) AS DECIMAL(18,2))) AS DOUBLE)
        |    AS w_sum
        |FROM events e JOIN lo USING (event_type) JOIN hi USING (event_type)
        |GROUP BY e.event_type, lo, hi
        |ORDER BY event_type""".stripMargin) { (s, dir) =>
      import graft.operators.GlobalRank
      val ev = Tables.events(s, dir).select("event_type", "value", "event_id")
      val ranked = GlobalRank.withRowNumber(
        ev, Seq("event_type", "value", "event_id"), "_rn", "_n")
      val base = ranked.groupBy("event_type")
        .agg(min(col("_rn")).as("_r0"), count(lit(1)).as("_gn"))
      val inRank = ranked.join(base, "event_type")
        .withColumn("_gr", col("_rn") - col("_r0") + 1)
      val lo = inRank.filter(col("_gr") === expr("(_gn + 19) div 20"))
        .select(col("event_type"), col("value").as("lo"))
      val hi = inRank.filter(col("_gr") === expr("(19 * _gn + 19) div 20"))
        .select(col("event_type"), col("value").as("hi"))
      ev.join(lo, "event_type").join(hi, "event_type")
        .groupBy("event_type", "lo", "hi")
        .agg(
          sum(when(col("value") < col("lo"), 1L).otherwise(0L)).as("n_lo"),
          sum(when(col("value") > col("hi"), 1L).otherwise(0L)).as("n_hi"),
          sum(least(greatest(col("value"), col("lo")), col("hi"))
            .cast("decimal(18,2)")).cast("double").as("w_sum"))
        .orderBy("event_type")
    },

    // WINDOWED funnel (Funnel.windowedCounts; q64's unbounded funnel is the
    // sibling): users reaching view → click → purchase in STRICT time order
    // with the whole funnel capped at 7 days from the first view — the
    // "converted within N days" form. k conditional min-aggregates chained
    // by user-keyed joins — never a per-user sort/window over raw events,
    // so the shuffles are bounded by distinct users. Counts are exact.
    Q(
      "q160_funnel",
      """WITH s0 AS (SELECT user_id, min(ts) AS t0 FROM events
        |            WHERE event_type = 'view' GROUP BY 1),
        |s1 AS (SELECT e.user_id, min(e.ts) AS t1 FROM events e JOIN s0 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.ts > t0
        |         AND e.ts <= t0 + INTERVAL 604800 SECONDS GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2
        |       FROM events e JOIN s0 USING (user_id) JOIN s1 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.ts > t1
        |         AND e.ts <= t0 + INTERVAL 604800 SECONDS GROUP BY 1)
        |SELECT CAST(0 AS BIGINT) AS step, 'view' AS step_type, count(*) AS n_users FROM s0
        |UNION ALL SELECT CAST(1 AS BIGINT), 'click', count(*) FROM s1
        |UNION ALL SELECT CAST(2 AS BIGINT), 'purchase', count(*) FROM s2
        |ORDER BY step""".stripMargin) { (s, dir) =>
      graft.operators.Funnel.windowedCounts(
        Tables.events(s, dir), "user_id", "ts", "event_type",
        steps = Seq("view", "click", "purchase"), windowSec = 604800L)
        .orderBy("step")
    },

    // Blocked fuzzy match on the native jaro_winkler expression (the ER
    // scorer Spark lacks; one static call inside whole-stage codegen, like
    // the built-in levenshtein). Candidates come from an equi-join on the
    // blocking key (the name's noun), so the scorer never sees the cross
    // product; the filter runs on the ROUNDED score so a last-ulp
    // cross-engine wobble can't flip membership at the threshold.
    Q(
      "q161_jw_blocked",
      """WITH d AS (SELECT DISTINCT p_name AS nm FROM part),
        |b AS (SELECT nm, split_part(nm, ' ', 2) AS noun FROM d),
        |sc AS (SELECT a.nm AS name_a, b2.nm AS name_b,
        |    floor(jaro_winkler_similarity(a.nm, b2.nm) * 1000000.0 + 0.5)
        |      / 1000000.0 AS jw
        |  FROM b a JOIN b b2 ON a.noun = b2.noun AND a.nm < b2.nm)
        |SELECT name_a, name_b, jw FROM sc WHERE jw >= 0.75
        |ORDER BY name_a, name_b""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "part").select(col("p_name").as("nm")).distinct()
        .withColumn("noun", split(col("nm"), " ").getItem(1))
      d.as("a").join(d.as("b"),
          col("a.noun") === col("b.noun") && col("a.nm") < col("b.nm"))
        .select(
          col("a.nm").as("name_a"), col("b.nm").as("name_b"),
          (floor(graft.functions.JaroWinklerSim.jaroWinkler(col("a.nm"), col("b.nm"))
            * lit(1000000.0) + lit(0.5)).cast("double") / lit(1000000.0)).as("jw"))
        .filter(col("jw") >= 0.75)
        .orderBy("name_a", "name_b")
    },

    // Per-group OLS trend (TimeSeries.groupTrend): regression by sufficient
    // statistics — five mergeable sums in ONE map-side-combined aggregation,
    // all routed through exact arithmetic (integer seconds axis, 2-dp values
    // as integer cents, decimal(38,0) sums / HUGEINT on the oracle side), so
    // both engines agree bit-for-bit until the single final IEEE division.
    Q(
      "q162_group_trend",
      """WITH b AS (SELECT event_type,
        |    epoch_us(ts) // 1000000 - 1704067200 AS x,
        |    CAST(round(value * 100) AS BIGINT) AS yc FROM events),
        |a AS (SELECT event_type, count(*) AS n,
        |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(yc) AS HUGEINT) AS sy,
        |    CAST(sum(x * yc) AS HUGEINT) AS sxy, CAST(sum(x * x) AS HUGEINT) AS sxx
        |  FROM b GROUP BY 1)
        |SELECT event_type, n,
        |  floor(CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
        |    / 100.0 * 1000000.0 + 0.5) / 1000000.0 AS slope
        |FROM a ORDER BY event_type""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
        .withColumn("x", col("ts").cast("long") - lit(1704067200L))
      graft.operators.TimeSeries.groupTrend(ev, Seq("event_type"), "x", "value")
        .select(col("event_type"), col("n"),
          (floor(col("slope") * lit(1000000.0) + lit(0.5)).cast("double")
            / lit(1000000.0)).as("slope"))
        .orderBy("event_type")
    },

    // Trailing EWMA with dyadic decay (TimeSeries.dyadicEwma): α = 1/2 over
    // a 4-lag window means every weighted term is an exact 64-bit integer
    // (2-dp cents × a power of two), so the smoothed value is ONE IEEE
    // division both engines perform on identical operands — the classic
    // sequential-fp EWMA recurrence re-expressed as a frame-bounded window
    // (one shuffle, codegen arithmetic). values have no nulls in this
    // table, so the oracle's c0 term needs no null guard.
    Q(
      "q163_ewma",
      """WITH b AS (SELECT user_id, event_id, ts,
        |             CAST(round(value * 100) AS BIGINT) AS c FROM events),
        |l AS (SELECT user_id, event_id, c AS c0,
        |    lag(c, 1) OVER w AS c1, lag(c, 2) OVER w AS c2, lag(c, 3) OVER w AS c3
        |  FROM b WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, event_id,
        |  CAST(8 * c0 + coalesce(4 * c1, 0) + coalesce(2 * c2, 0) + coalesce(c3, 0) AS DOUBLE)
        |    / CAST(8 + (CASE WHEN c1 IS NULL THEN 0 ELSE 4 END)
        |         + (CASE WHEN c2 IS NULL THEN 0 ELSE 2 END)
        |         + (CASE WHEN c3 IS NULL THEN 0 ELSE 1 END) AS DOUBLE) / 100.0 AS ewma
        |FROM l ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      graft.operators.TimeSeries.dyadicEwma(
        Tables.events(s, dir), Seq("user_id"), Seq(col("ts"), col("event_id")),
        "value", lags = 4)
        .select("user_id", "event_id", "ewma")
        .orderBy("user_id", "event_id")
    },

    // Fellegi-Sunter record linkage (RecordLinkage.linkPairs): blocked
    // candidate pairs scored by integer milli-log-odds field weights —
    // agreement on source/length/prefix adds ln(m/u)-style evidence,
    // disagreement subtracts — thresholded at +1.5 log-odds units. Integer
    // weights keep the score an exact 64-bit sum (a double log-sum differs
    // in the last ulp with accumulation order, and the threshold sits
    // exactly where that hurts). Blocking = one shuffle on
    // (lang, n_chars//64); the scorer is a codegen'd projection.
    Q(
      "q166_linkage_score",
      """WITH d AS (SELECT doc_id, text, lang, source, n_chars,
        |             n_chars // 64 AS blk FROM documents),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    (CASE WHEN a.source = b.source THEN 1585 ELSE -1000 END)
        |  + (CASE WHEN a.n_chars = b.n_chars THEN 2000 ELSE -200 END)
        |  + (CASE WHEN substr(a.text, 1, 16) = substr(b.text, 1, 16) THEN 2500 ELSE -100 END)
        |    AS link_score
        |  FROM d a JOIN d b
        |    ON a.lang = b.lang AND a.blk = b.blk AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b, CAST(link_score AS BIGINT) AS link_score FROM p
        |WHERE link_score >= 1500 ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
        .withColumn("blk", floor(col("n_chars") / lit(64)).cast("long"))
      graft.operators.RecordLinkage.linkPairs(
        d, "doc_id", Seq("lang", "blk"),
        evidence = Seq(
          (col("a_source") === col("b_source"), 1585, -1000),
          (col("a_n_chars") === col("b_n_chars"), 2000, -200),
          (substring(col("a_text"), 1, 16) === substring(col("b_text"), 1, 16), 2500, -100)),
        minScore = 1500L)
        .select(col("a_doc_id").as("id_a"), col("b_doc_id").as("id_b"), col("link_score"))
        .orderBy("id_a", "id_b")
    },

    // Sliding-window DISTINCT users — the DAU/WAU shape (q87 counts rows;
    // this deduplicates the entity inside each overlapping window). The
    // oracle enumerates the same epoch-aligned windows arithmetically;
    // count(DISTINCT) is exact, windowing adds windowDuration/slide = 2
    // copies per event before the dedup-aggregate (both engines identical).
    Q(
      "q167_windowed_dau",
      """SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start,
        |  count(DISTINCT user_id) AS n_users
        |FROM (SELECT user_id,
        |        to_timestamp((epoch_us(ts) // 1800000000 - u.i) * 1800)::TIMESTAMP AS wstart
        |      FROM events, unnest([0, 1]) AS u(i)
        |      WHERE epoch_us(ts) // 1800000000 - u.i >= 0)
        |GROUP BY wstart ORDER BY window_start""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("n_users"))
        .orderBy("window_start")
    },

    // Right-to-be-forgotten cascade (Tombstone.purgeCounts): a tombstone
    // set (subjects who raised an 'error' event, standing in for a deletion
    // queue) audited against three tables in ONE broadcast-join scan per
    // table — n_before / n_purged / n_after, no purge-then-recount second
    // pass. The purge itself (broadcast LEFT ANTI) is the same plan minus
    // the aggregate.
    Q(
      "q168_tombstone_purge",
      """WITH t AS (SELECT DISTINCT user_id AS id FROM events WHERE event_type = 'error'),
        |u AS (
        |  SELECT 'customer' AS table_name, count(*) AS n_before, count(t.id) AS n_purged
        |  FROM customer c LEFT JOIN t ON c.c_custkey = t.id
        |  UNION ALL
        |  SELECT 'events', count(*), count(t.id)
        |  FROM events e LEFT JOIN t ON e.user_id = t.id
        |  UNION ALL
        |  SELECT 'orders', count(*), count(t.id)
        |  FROM orders o LEFT JOIN t ON o.o_custkey = t.id)
        |SELECT table_name, n_before, n_purged, n_before - n_purged AS n_after
        |FROM u ORDER BY table_name""".stripMargin) { (s, dir) =>
      val tomb = Tables.events(s, dir)
        .filter(col("event_type") === "error")
        .select(col("user_id").as("id"))
      graft.load.Tombstone.purgeCounts(
        Seq(
          ("customer", Tables.load(s, dir, "customer"), col("c_custkey")),
          ("events", Tables.events(s, dir), col("user_id")),
          ("orders", Tables.load(s, dir, "orders"), col("o_custkey"))),
        tomb, "id")
        .orderBy("table_name")
    },

    // CDC change-feed apply (Snapshot.applyChangeFeed): Debezium-style
    // full-row changes — op 'U' upserts, 'D' retracts — folded onto a base
    // snapshot in ONE key shuffle via a partial max(struct(seq, op,
    // payload)) aggregate: no window, no join, map-side combined. Orders
    // stand in for the change log (orderkey = unique sequence; status 'F'
    // = tombstone). The retraction half is what upsertLatestWins (q78)
    // can't express.
    Q(
      "q170_cdc_apply",
      """WITH u AS (
        |  SELECT c_custkey, c_acctbal, c_mktsegment, CAST(-1 AS BIGINT) AS seq, 'U' AS op
        |  FROM customer
        |  UNION ALL
        |  SELECT o_custkey, o_totalprice, o_orderpriority, o_orderkey,
        |    CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END
        |  FROM orders),
        |r AS (SELECT *, row_number() OVER (PARTITION BY c_custkey ORDER BY seq DESC) AS rn
        |      FROM u)
        |SELECT c_custkey, c_acctbal, c_mktsegment FROM r
        |WHERE rn = 1 AND op = 'U' ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val base = Tables.load(s, dir, "customer")
        .select("c_custkey", "c_acctbal", "c_mktsegment")
      val changes = Tables.load(s, dir, "orders").select(
        col("o_custkey").as("c_custkey"),
        col("o_totalprice").as("c_acctbal"),
        col("o_orderpriority").as("c_mktsegment"),
        col("o_orderkey").as("seq"),
        when(col("o_orderstatus") === "F", lit("D")).otherwise(lit("U")).as("op"))
      graft.load.Snapshot.applyChangeFeed(
        base, changes, Seq("c_custkey"), "seq", "op")
        .orderBy("c_custkey")
    },

    // Gaps-and-islands over the order-key sequence — the id-continuity
    // audit ("which ranges are missing?") every ingest pipeline owes its
    // watermark logic. The classic grp = id − row_number() trick, but the
    // row_number is GlobalRank's distributed two-pass rank, never a
    // single-partition window; the island roll-up is one map-combined
    // aggregate on grp.
    Q(
      "q171_id_islands",
      """WITH r AS (SELECT o_orderkey,
        |    o_orderkey - row_number() OVER (ORDER BY o_orderkey) AS grp
        |  FROM orders WHERE o_orderstatus <> 'F')
        |SELECT min(o_orderkey) AS island_start, max(o_orderkey) AS island_end,
        |  count(*) AS n
        |FROM r GROUP BY grp ORDER BY island_start""".stripMargin) { (s, dir) =>
      graft.operators.GlobalRank.withRowNumber(
        Tables.load(s, dir, "orders")
          .filter(col("o_orderstatus") =!= "F")
          .select("o_orderkey"),
        orderCols = Seq("o_orderkey"))
        .withColumn("grp", col("o_orderkey") - col("_rn"))
        .groupBy("grp")
        .agg(
          min("o_orderkey").as("island_start"),
          max("o_orderkey").as("island_end"),
          count(lit(1)).as("n"))
        .drop("grp")
        .orderBy("island_start")
    },

    // Per-group Pearson correlation (TimeSeries.groupCorr): the groupTrend
    // decomposition plus Σy² — six exact integer sums, then IEEE ops on
    // them. sqrt/multiply/divide are correctly rounded everywhere, but
    // DuckDB's HUGEINT→DOUBLE cast is NOT (it converts limb-wise, two
    // roundings — measured 1-ulp skew at sf0.1), so the computed double
    // takes the repo's standard 6-dp floor-round pin on both sides.
    Q(
      "q172_group_corr",
      """WITH b AS (SELECT event_type,
        |    epoch_us(ts) // 1000000 - 1704067200 AS x,
        |    CAST(round(value * 100) AS BIGINT) AS yc FROM events),
        |a AS (SELECT event_type, count(*) AS n,
        |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(yc) AS HUGEINT) AS sy,
        |    CAST(sum(x * yc) AS HUGEINT) AS sxy, CAST(sum(x * x) AS HUGEINT) AS sxx,
        |    CAST(sum(yc * yc) AS HUGEINT) AS syy
        |  FROM b GROUP BY 1)
        |SELECT event_type, n,
        |  floor(CAST(n * sxy - sx * sy AS DOUBLE)
        |    / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
        |    * 1000000.0 + 0.5) / 1000000.0 AS corr
        |FROM a ORDER BY event_type""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
        .withColumn("x", col("ts").cast("long") - lit(1704067200L))
      graft.operators.TimeSeries.groupCorr(ev, Seq("event_type"), "x", "value")
        .select(col("event_type"), col("n"),
          (floor(col("corr") * lit(1000000.0) + lit(0.5)).cast("double")
            / lit(1000000.0)).as("corr"))
        .orderBy("event_type")
    },

    // Quantity-weighted median price (RobustStats.weightedMedian): the
    // smallest price at which half the traded QUANTITY has cleared. The
    // cumulative weight is GlobalRank's two-pass running total — never a
    // single-partition window; the oracle's window replays it with a
    // unique (price, orderkey, linenumber) order so RANGE==ROWS.
    Q(
      "q173_weighted_median",
      """WITH t AS (SELECT l_extendedprice AS v,
        |    CAST(l_quantity AS BIGINT) AS w,
        |    sum(CAST(l_quantity AS BIGINT))
        |      OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS cum
        |  FROM lineitem),
        |tot AS (SELECT CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS tw FROM lineitem)
        |SELECT min(v) AS weighted_median FROM t, tot
        |WHERE cum >= (tw + 1) // 2 AND w > 0""".stripMargin) { (s, dir) =>
      graft.operators.RobustStats.weightedMedian(
        Tables.load(s, dir, "lineitem"),
        "l_extendedprice", "l_quantity", tieCols = Seq("l_orderkey", "l_linenumber"))
    },

    // New vs returning users per day — the first-touch split every growth
    // dashboard opens with: a user's first active day counts as new, every
    // later active day as returning. Two keyed aggregates + one user-keyed
    // join; exact integer counts.
    Q(
      "q174_new_vs_returning",
      """WITH d AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
        |f AS (SELECT user_id, min(day) AS first_day FROM d GROUP BY 1)
        |SELECT strftime(d.day, '%Y-%m-%d') AS day,
        |  count(*) FILTER (WHERE d.day = f.first_day) AS n_new,
        |  count(*) FILTER (WHERE d.day > f.first_day) AS n_returning
        |FROM d JOIN f USING (user_id)
        |GROUP BY d.day ORDER BY day""".stripMargin) { (s, dir) =>
      val d = Tables.events(s, dir)
        .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .distinct()
      val f = d.groupBy("user_id").agg(min("day").as("first_day"))
      d.join(f, "user_id")
        .withColumn("is_new", col("day") === col("first_day")) // day ≥ first_day always
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("is_new"))
        .groupBy("day")
        .agg(
          count(when(col("is_new"), 1)).as("n_new"),
          count(when(!col("is_new"), 1)).as("n_returning"))
        .orderBy("day")
    },

    // Declarative DQ rule audit (Quality.checkRules): every rule a
    // violation predicate, ALL rules evaluated in ONE scan (conditional
    // sums in a single aggregate, stacked to a ledger) — never a pass per
    // rule. Mix of always-clean contract rules and rules that actually
    // fire on this data (price cap, pre-1996 dates).
    Q(
      "q176_dq_rules",
      """WITH a AS (SELECT count(*) AS n,
        |    count(*) FILTER (WHERE o_custkey IS NULL) AS v_custkey_null,
        |    count(*) FILTER (WHERE o_orderdate < TIMESTAMP '1996-01-01') AS v_date_old,
        |    count(*) FILTER (WHERE o_totalprice <= 0) AS v_price_nonpos,
        |    count(*) FILTER (WHERE o_totalprice > 400000) AS v_price_cap,
        |    count(*) FILTER (WHERE o_orderstatus NOT IN ('F', 'O', 'P')) AS v_status_dom
        |  FROM orders)
        |SELECT rule, n AS n_checked, v AS n_violations, v = 0 AS pass
        |FROM (
        |  SELECT 'custkey_null' AS rule, n, v_custkey_null AS v FROM a
        |  UNION ALL SELECT 'date_old', n, v_date_old FROM a
        |  UNION ALL SELECT 'price_cap', n, v_price_cap FROM a
        |  UNION ALL SELECT 'price_nonpos', n, v_price_nonpos FROM a
        |  UNION ALL SELECT 'status_domain', n, v_status_dom FROM a)
        |ORDER BY rule""".stripMargin) { (s, dir) =>
      graft.load.Quality.checkRules(
        Tables.load(s, dir, "orders"),
        Seq(
          "custkey_null" -> col("o_custkey").isNull,
          "date_old" -> (col("o_orderdate") < lit("1996-01-01").cast("timestamp")),
          "price_cap" -> (col("o_totalprice") > 400000),
          "price_nonpos" -> (col("o_totalprice") <= 0),
          "status_domain" -> !col("o_orderstatus").isin("F", "O", "P")))
        .orderBy("rule")
    },

    // Share-of-total (ratio-to-report): revenue contribution per market
    // segment — exact decimal sums, the share = one division of
    // exactly-agreed cents (then the standard 6-dp pin on the computed
    // double).
    Q(
      "q177_share_of_total",
      """WITH s AS (SELECT c_mktsegment AS seg,
        |    CAST(sum(CAST(o_totalprice * 100 AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1),
        |t AS (SELECT CAST(sum(cents) AS BIGINT) AS total FROM s)
        |SELECT seg, CAST(cents AS DOUBLE) / 100.0 AS revenue,
        |  floor(CAST(cents AS DOUBLE) / CAST(total AS DOUBLE) * 1000000.0 + 0.5)
        |    / 1000000.0 AS share
        |FROM s, t ORDER BY seg""".stripMargin) { (s, dir) =>
      val seg = Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("seg"))
        .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))
      val total = seg.agg(sum("cents")).head().getLong(0)
      seg.select(
        col("seg"),
        (col("cents").cast("double") / lit(100.0)).as("revenue"),
        (floor(col("cents").cast("double") / lit(total.toDouble) * lit(1000000.0)
          + lit(0.5)).cast("double") / lit(1000000.0)).as("share"))
        .orderBy("seg")
    },

    // Pareto / ABC classification with NO division at all: the cumulative
    // share thresholds compare exact integers (cum·100 vs total·80 /
    // total·95), so the A/B/C boundary can never wobble on a computed
    // double. Running total over the few segment rows is a window over a
    // tiny aggregate — the window never sees fact rows.
    Q(
      "q178_pareto_abc",
      """WITH s AS (SELECT c_mktsegment AS seg,
        |    CAST(sum(CAST(o_totalprice * 100 AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1),
        |r AS (SELECT seg, cents,
        |    CAST(sum(cents) OVER (ORDER BY cents DESC, seg) AS BIGINT) AS cum,
        |    CAST(sum(cents) OVER () AS BIGINT) AS total
        |  FROM s)
        |SELECT seg, CAST(cents AS DOUBLE) / 100.0 AS revenue,
        |  CASE WHEN cum * 100 <= total * 80 THEN 'A'
        |       WHEN cum * 100 <= total * 95 THEN 'B' ELSE 'C' END AS cls
        |FROM r ORDER BY revenue DESC, seg""".stripMargin) { (s, dir) =>
      val seg = Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("seg"))
        .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))
      val wCum = Window.orderBy(col("cents").desc, col("seg"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy()
      seg
        .withColumn("cum", sum("cents").over(wCum))
        .withColumn("total", sum("cents").over(wAll))
        .select(
          col("seg"),
          (col("cents").cast("double") / lit(100.0)).as("revenue"),
          when(col("cum") * 100 <= col("total") * 80, "A")
            .when(col("cum") * 100 <= col("total") * 95, "B")
            .otherwise("C").as("cls"))
        .orderBy(col("revenue").desc, col("seg"))
    })
}
