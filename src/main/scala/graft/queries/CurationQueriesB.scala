package graft.queries

import graft.Tables
import graft.load.Splits
import graft.text.Vocab
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second half of the curation/behavioral surface (split from
  * [[CurationQueries]] along its section seam for reviewability; the
  * shared oracle CTE builders and memo slots stay in [[CurationQueries]]
  * as `private[queries]`).
  */
object CurationQueriesB {
  import CurationQueries.{sqlBoth, corpusRun, CorpusPipelineCtes, semDedupOracle}

  val all: Seq[Q] = Seq(
    // RANGE window frame over event time (trailing 24 h sum per user) —
    // decimal accumulation, so segment-tree vs sequential window
    // evaluation cannot diverge in the last ulp.
    Q(
      "q92_range_frame",
      """SELECT user_id, event_id,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(ts)
        |    RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS day_sum
        |FROM events ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(unix_micros(col("ts")))
        .rangeBetween(-86400000000L, Window.currentRow)
      Tables.events(s, dir)
        .select(
          col("user_id"), col("event_id"),
          sum(col("value").cast("decimal(18,2)")).over(w).cast("double").as("day_sum"))
        .orderBy("user_id", "event_id")
    },

    // INTERSECT (the q26 EXCEPT twin): set semantics incl. dedup.
    Q(
      "q93_intersect",
      """SELECT c_nationkey FROM customer
        |INTERSECT SELECT s_nationkey FROM supplier
        |ORDER BY c_nationkey""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "customer").select("c_nationkey")
        .intersect(Tables.load(s, dir, "supplier")
          .select(col("s_nationkey").as("c_nationkey")))
        .orderBy("c_nationkey")
    },

    // Group-wise z-score standardization (ML feature prep): moments from
    // exact decimal sums, then identical double arithmetic in both engines
    // (built-in stddev aggregates vary by algorithm — Welford vs sum of
    // squares — so the explicit formula is the portable one). Broadcast of
    // the tiny per-group stats joins back to the fact.
    Q(
      "q94_zscore",
      """WITH s AS (SELECT event_type,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS svv,
        |    count(*) AS n FROM events GROUP BY event_type)
        |SELECT e.event_id,
        |  CASE WHEN s.n > 1 AND s.svv - s.sv * s.sv / s.n > 0 THEN
        |    round((e.value - s.sv / s.n) / sqrt((s.svv - s.sv * s.sv / s.n) / (s.n - 1)), 6)
        |  END AS z
        |FROM events e JOIN s USING (event_type) ORDER BY e.event_id""".stripMargin) {
      (s, dir) =>
        val ev = Tables.events(s, dir)
        val stats = ev.groupBy("event_type").agg(
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sv"),
          sum(col("value").cast("decimal(18,2)") * col("value").cast("decimal(18,2)"))
            .cast("double").as("svv"),
          count(lit(1)).as("n"))
        // z is null for single-row or zero-variance groups IN BOTH ENGINES —
        // an unguarded /0 diverges (Spark non-ANSI null vs DuckDB IEEE NaN)
        val varNum = col("svv") - col("sv") * col("sv") / col("n")
        ev.join(broadcast(stats), "event_type")
          .select(
            col("event_id"),
            when(col("n") > 1 && varNum > 0,
              round(
                (col("value") - col("sv") / col("n")) / sqrt(varNum / (col("n") - 1)),
                6)).as("z"))
          .orderBy("event_id")
    },

    // Quantile bucketing via ntile (equal-count bins; the feature-binning
    // primitive). Total order incl. tie-break → deterministic bins. NOT the
    // built-in window: `ntile(4) OVER (ORDER BY …)` with no PARTITION BY
    // collapses the table into one window partition; GlobalRank derives the
    // same buckets from a range-partitioned global row_number instead.
    Q(
      "q95_ntile",
      """SELECT o_orderkey,
        |  CAST(ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS quartile
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      graft.operators.GlobalRank.ntile(
        Tables.load(s, dir, "orders").select("o_orderkey", "o_totalprice"),
        Seq("o_totalprice", "o_orderkey"), buckets = 4, outCol = "quartile")
        .select(col("o_orderkey"), col("quartile"))
        .orderBy("o_orderkey")
    },

    // Per-document token diversity as Gini impurity 1 - sum(p^2): the
    // log-free twin of token entropy (rational arithmetic → engine-
    // portable); low values flag repetitive/boilerplate documents.
    Q(
      "q96_token_gini",
      """WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
        |            FROM documents),
        |tf AS (SELECT doc_id, u.tok AS token, count(*) AS c
        |       FROM tok, unnest(t) AS u(tok) GROUP BY 1, 2)
        |SELECT doc_id,
        |  round(1.0 - sum(c * c) * 1.0 / (sum(c) * sum(c)), 6) AS gini
        |FROM tf GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Vocab.giniDiversity(Tables.load(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), round(col("gini"), 6).as("gini"))
        .orderBy("doc_id")
    },

    // LATERAL correlated subquery join (per-order top-2 line items): the
    // SQL spelling of dependent per-row subplans; Catalyst decorrelates
    // the sorted-limited lateral into a window-ranked join.
    sqlBoth(
      "q97_lateral_topk",
      Seq("orders", "lineitem"),
      """SELECT o_orderkey, l.l_linenumber FROM orders, LATERAL (
        |  SELECT l_linenumber FROM lineitem WHERE l_orderkey = o_orderkey
        |  ORDER BY l_quantity DESC, l_linenumber LIMIT 2) AS l
        |ORDER BY o_orderkey, l.l_linenumber""".stripMargin),

    // Rank-to-[0,1] window family (percent_rank / cume_dist): rational
    // rank arithmetic, deterministic under the total order. GlobalRank
    // computes both from a distributed row_number — the (o_totalprice,
    // o_orderkey) order is total, so rank == row_number and the tie-group
    // join is skipped (tiesPossible = false).
    Q(
      "q98_rank_ratios",
      """SELECT o_orderkey,
        |  round(percent_rank() OVER w, 6) AS prk,
        |  round(cume_dist() OVER w, 6) AS cd
        |FROM orders WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      graft.operators.GlobalRank.rankRatios(
        Tables.load(s, dir, "orders").select("o_orderkey", "o_totalprice"),
        Seq("o_totalprice", "o_orderkey"),
        prkCol = "prk", cdCol = "cd", tiesPossible = false)
        .select(col("o_orderkey"), round(col("prk"), 6).as("prk"), round(col("cd"), 6).as("cd"))
        .orderBy("o_orderkey")
    },

    // Exactly-n deterministic sample: TopK by md5 sort key (global sort
    // avoided — per-partition top-n + merge). Same 50 docs on any engine.
    Q(
      "q99_fixed_sample",
      """SELECT doc_id, lang FROM documents
        |ORDER BY md5(doc_id::VARCHAR), doc_id LIMIT 50""".stripMargin) { (s, dir) =>
      graft.load.Splits.fixedSample(Tables.load(s, dir, "documents"), col("doc_id"), 50)
        .select("doc_id", "lang")
    },

    // Stratified rebalancing sample: per-language keep rates (en 0.25,
    // de 0.5, rest whole) via the md5-uniform keep rule — binary-fraction
    // rates make every keep decision bit-identical across engines.
    Q(
      "q107_stratified_sample",
      """SELECT lang, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS sum_id
        |FROM documents
        |WHERE CAST(CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 6)) AS BIGINT) AS DOUBLE)
        |    / 16777216.0
        |  < CASE lang WHEN 'en' THEN 0.25 WHEN 'de' THEN 0.5 ELSE 1.0 END
        |GROUP BY lang ORDER BY lang NULLS FIRST""".stripMargin) { (s, dir) =>
      Splits.stratifiedSample(
        Tables.load(s, dir, "documents"), "lang", col("doc_id"),
        Map("en" -> 0.25, "de" -> 0.5))
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("sum_id"))
        .orderBy("lang")
    },

    // Row-level snapshot diff — the backup-verification op one step past
    // the q83 checksum: WHICH keys were added/removed/changed between two
    // snapshots. Snapshot b is derived from a by deterministic predicates,
    // so the oracle states the expected diff directly from those
    // predicates while Spark has to discover it via the hash-compare
    // full-outer join.
    Q(
      "q105_snapshot_diff",
      """WITH k AS (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)
        |SELECT l_orderkey, l_linenumber, change FROM (
        |  SELECT l_orderkey, l_linenumber,
        |    CASE WHEN l_orderkey % 97 = 0 THEN 'removed'
        |         WHEN l_orderkey % 89 = 0 THEN 'changed' END AS change
        |  FROM k
        |  UNION ALL
        |  SELECT l_orderkey + 100000000, l_linenumber, 'added'
        |  FROM k WHERE l_orderkey % 101 = 0)
        |WHERE change IS NOT NULL
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      // the synthetic lineitem does NOT enforce the TPC-H PK, so build the
      // snapshot at (orderkey, linenumber) grain first — diffTables requires
      // a unique key (see its scaladoc)
      val a = Tables.load(s, dir, "lineitem")
        .groupBy("l_orderkey", "l_linenumber")
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("qty"))
      val b = a.filter(pmod(col("l_orderkey"), lit(97)) =!= 0)
        .withColumn(
          "qty",
          when(pmod(col("l_orderkey"), lit(89)) === 0, col("qty") + 1)
            .otherwise(col("qty")))
        .unionByName(
          a.filter(pmod(col("l_orderkey"), lit(101)) === 0)
            .withColumn("l_orderkey", col("l_orderkey") + lit(100000000L)))
      graft.load.Snapshot
        .diffTables(a, b, Seq("l_orderkey", "l_linenumber"), Seq("qty"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // SCD Type-2 upsert: MERGE that keeps history — each updated key's open
    // row closes at the update version and a new open row appends; the
    // validity intervals reconstruct the state as of any version.
    Q(
      "q106_scd2_upsert",
      """SELECT c_custkey, bal, valid_from, valid_to FROM (
        |  SELECT c_custkey,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS bal,
        |    CAST(0 AS BIGINT) AS valid_from,
        |    CASE WHEN c_custkey % 7 = 0 THEN CAST(5 AS BIGINT) END AS valid_to
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) + 100 AS DOUBLE),
        |    CAST(5 AS BIGINT), CAST(NULL AS BIGINT)
        |  FROM customer WHERE c_custkey % 7 = 0)
        |ORDER BY c_custkey, valid_from""".stripMargin) { (s, dir) =>
      val cust = Tables.load(s, dir, "customer")
      val current = cust.select(
        col("c_custkey"),
        col("c_acctbal").cast("decimal(18,2)").cast("double").as("bal"),
        lit(0L).as("valid_from"),
        lit(null).cast("long").as("valid_to"))
      val updates = cust.filter(pmod(col("c_custkey"), lit(7)) === 0)
        .select(
          col("c_custkey"),
          (col("c_acctbal").cast("decimal(18,2)") + lit(100)).cast("double").as("bal"),
          lit(5L).as("_ver"))
      graft.load.Snapshot
        .upsertScd2(current, updates, Seq("c_custkey"), "_ver")
        .orderBy("c_custkey", "valid_from")
    },

    // Bloom-reduced exact semi join (runtime-filter shape, explicit): the
    // big side is pre-filtered by a bloom of the small side's keys before
    // its exchange; the exact join removes false positives, so rows equal
    // the plain semi join the oracle runs.
    Q(
      "q101_bloom_semi",
      """SELECT l.l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem l
        |WHERE l.l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000)
        |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin) { (s, dir) =>
      val hot = Tables.load(s, dir, "orders")
        .filter(col("o_totalprice") > 400000).select("o_orderkey")
      graft.operators.BloomPrune.semiJoinReduced(
        Tables.load(s, dir, "lineitem"), hot, "l_orderkey", "o_orderkey")
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))
        .orderBy("l_returnflag")
    },

    // Bloom-reduced exact ANTI join — the shape of the pipeline's
    // cross-file dedup at 100 TB: bloom-negative rows ("never seen") skip
    // the join entirely; only candidates pay the exchange.
    Q(
      "q102_bloom_anti",
      """SELECT l.l_returnflag, count(*) AS n
        |FROM lineitem l
        |WHERE l.l_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000)
        |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin) { (s, dir) =>
      val hot = Tables.load(s, dir, "orders")
        .filter(col("o_totalprice") > 400000).select("o_orderkey")
      graft.operators.BloomPrune.antiJoinReduced(
        Tables.load(s, dir, "lineitem"), hot, "l_orderkey", "o_orderkey")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },

    // URL parsing for web-corpus curation: host extraction + per-domain
    // rollup (Spark's parse_url; the oracle regexes the same grammar).
    Q(
      "q77_url_host",
      """SELECT regexp_extract('https://' || source || '.example.com/' || lang || '/' || doc_id,
        |    'https://([^/]+)/', 1) AS host, count(*) AS n
        |FROM documents GROUP BY host ORDER BY host""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(parse_url(
          concat(lit("https://"), col("source"), lit(".example.com/"),
            col("lang"), lit("/"), col("doc_id").cast("string")),
          lit("HOST")).as("host"))
        .groupBy("host")
        .agg(count(lit(1)).as("n"))
        .orderBy("host")
    },

    // End-to-end corpus pipeline gate: quality filter → exact dedup →
    // MinHash-LSH + Jaccard near-dup clustering (canonical per component) →
    // benchmark decontamination → deterministic split → snapshot append,
    // run as ONE CorpusPipeline.processBatch against a fresh corpus; the
    // gate reads back what the pipeline actually WROTE, so the composite —
    // not just its parts — is oracle-checked.
    Q(
      "q110_corpus_pipeline",
      s"""WITH RECURSIVE $CorpusPipelineCtes
         |SELECT doc_id,
         |  CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val' ELSE 'test' END AS split
         |FROM (SELECT doc_id,
         |        CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 6)) AS BIGINT) % 10 AS b
         |      FROM kept)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      corpusRun(s, dir)._1
    },

    // The same run's audit counts (the pipeline Result the daemon would
    // log): the oracle recomputes every stage-transition delta from scratch.
    Q(
      "q111_corpus_audit",
      s"""WITH RECURSIVE $CorpusPipelineCtes
         |SELECT
         |  (SELECT count(*) FROM kept) AS ingested,
         |  (SELECT count(*) FROM qual) - (SELECT count(*) FROM fw) AS exact_dups,
         |  (SELECT count(*) FROM fw) - (SELECT count(*) FROM ded) AS near_dups,
         |  (SELECT count(*) FROM ann) - (SELECT count(*) FROM qual) AS rejected,
         |  (SELECT count(*) FROM ded) - (SELECT count(*) FROM kept) AS contaminated""".stripMargin) {
      (s, dir) => corpusRun(s, dir)._2
    },

    // Sequence-packing manifest (concat-then-split, the GPT-style
    // pretraining layout): docs concatenate in doc_id order and split at
    // 2048-token boundaries; each doc's bin span is pure arithmetic over
    // the global EXCLUSIVE token prefix sum. The prefix sum is the
    // distributed two-pass GlobalRank shape (range partition + O(partitions)
    // driver longs) — a bare `sum OVER (ORDER BY)` would collapse to one
    // task at 100 TB.
    Q(
      "q113_pack_manifest",
      """WITH tk AS (SELECT doc_id,
        |    len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), x -> x != '')) AS n_tokens
        |  FROM documents),
        |p AS (SELECT doc_id, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset
        |  FROM tk WHERE n_tokens > 0)
        |SELECT doc_id, n_tokens, tok_offset,
        |  CAST(tok_offset // 2048 AS BIGINT) AS first_bin,
        |  CAST((tok_offset + n_tokens - 1) // 2048 AS BIGINT) AS last_bin
        |FROM p ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .select(
          col("doc_id"),
          graft.text.TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
        .filter(col("n_tokens") > 0)
      graft.operators.GlobalRank
        .withRunningTotal(docs, Seq("doc_id"), "n_tokens", "tok_offset")
        .withColumn("first_bin", floor(col("tok_offset") / 2048).cast("long"))
        .withColumn(
          "last_bin",
          floor((col("tok_offset") + col("n_tokens") - 1) / 2048).cast("long"))
        .orderBy("doc_id")
    },

    // Token-budget selection: take docs in deterministic md5(doc_id) order
    // until a 50k-token budget is exhausted (the doc crossing the boundary
    // is kept — it started inside the budget). Same prefix-sum primitive,
    // ordered by the hash so the sample is unbiased yet reproducible on any
    // engine/partitioning.
    Q(
      "q114_token_budget",
      """WITH tk AS (SELECT doc_id,
        |    len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), x -> x != '')) AS n_tokens,
        |    md5(doc_id::VARCHAR) AS h
        |  FROM documents),
        |p AS (SELECT doc_id, n_tokens,
        |    coalesce(sum(n_tokens) OVER (ORDER BY h
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_offset
        |  FROM tk WHERE n_tokens > 0)
        |SELECT doc_id, n_tokens FROM p WHERE tok_offset < 50000
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .select(
          col("doc_id"),
          graft.text.TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
          md5(col("doc_id").cast("string")).as("_h"))
        .filter(col("n_tokens") > 0)
      graft.operators.GlobalRank
        .withRunningTotal(docs, Seq("_h"), "n_tokens", "tok_offset")
        .filter(col("tok_offset") < 50000)
        .select("doc_id", "n_tokens")
        .orderBy("doc_id")
    },

    // Corpus-level repeated-span removal (the RefinedWeb "duplicated line"
    // correction over 10-token spans): spans occurring in >= 2 distinct
    // docs (duplicated bodies, boilerplate) are dropped and each doc is
    // reassembled from its surviving spans in order.
    Q(
      "q120_span_dedup",
      """WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
        |c AS (SELECT doc_id, t, len(t) AS n FROM tok WHERE len(t) > 0),
        |ch AS (SELECT doc_id, u.i AS cid,
        |    array_to_string(t[u.i*10+1 : least(u.i*10+10, n)], ' ') AS ctext
        |  FROM c, unnest(generate_series(0, (greatest(n - 10, 0) + 9) // 10)) AS u(i)),
        |hot AS (SELECT ctext FROM (SELECT ctext, count(DISTINCT doc_id) AS nd
        |                           FROM ch GROUP BY ctext) WHERE nd >= 2),
        |j AS (SELECT ch.doc_id, ch.cid, ch.ctext, h.ctext IS NOT NULL AS ishot
        |  FROM ch LEFT JOIN hot h ON ch.ctext = h.ctext)
        |SELECT doc_id,
        |  coalesce(array_to_string(list(ctext ORDER BY cid) FILTER (WHERE NOT ishot), ' '), '')
        |    AS kept_text,
        |  CAST(count(*) AS BIGINT) AS n_spans,
        |  CAST(sum(CASE WHEN ishot THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.text.TextAnalysis.stripRepeatedSpans(
        Tables.load(s, dir, "documents"), "doc_id", "text", spanTokens = 10, minDocs = 2)
        .orderBy("doc_id")
    },

    // Temperature-flattened language rebalancing at alpha = 1/2: the
    // dominant stratum downsamples toward a flatter mix, the smallest
    // keeps everything; the keep decision is exact integer arithmetic
    // (h^2 * n_s < n_min * 2^24), bit-identical in any engine with md5.
    Q(
      "q121_temperature_mix",
      """WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS ns FROM documents GROUP BY lang),
        |m AS (SELECT min(ns) AS nmin FROM c),
        |h AS (SELECT doc_id, lang,
        |    CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 3)) AS BIGINT) AS h12
        |  FROM documents)
        |SELECT h.doc_id, h.lang FROM h JOIN c USING (lang), m
        |WHERE h12 * h12 * c.ns < m.nmin * 16777216
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Splits.temperatureRebalanceSqrt(
        Tables.load(s, dir, "documents"), "lang", col("doc_id"))
        .select("doc_id", "lang")
        .orderBy("doc_id")
    },

    // Count-Min sketch heavy hitters: a 4x256 md5-hashed counter grid over
    // all token occurrences, point-estimated (min over rows) for the true
    // top-20 tokens. The sketch table is depth*width rows REGARDLESS of
    // stream size — the fixed-footprint summary of an unbounded stream —
    // and the md5 hash family makes even its collisions engine-portable:
    // the oracle rebuilds the identical grid and must land the identical
    // (over-)estimates.
    Q(
      "q125_countmin_heavy",
      """WITH occ AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
        |  FROM documents),
        |ex AS (SELECT token, CAST(count(*) AS BIGINT) AS exact_n FROM occ GROUP BY token),
        |top AS (SELECT token, exact_n FROM ex ORDER BY exact_n DESC, token LIMIT 20),
        |cells AS (SELECT r.r AS row,
        |    CAST(('0x' || substr(md5(r.r::VARCHAR || ':' || token), 1, 6)) AS BIGINT) % 256 AS cell
        |  FROM occ, unnest(generate_series(0, 3)) AS r(r)),
        |sk AS (SELECT row, cell, CAST(count(*) AS BIGINT) AS c FROM cells GROUP BY row, cell),
        |probe AS (SELECT t.token, t.exact_n, r.r AS row,
        |    CAST(('0x' || substr(md5(r.r::VARCHAR || ':' || t.token), 1, 6)) AS BIGINT) % 256 AS cell
        |  FROM top t, unnest(generate_series(0, 3)) AS r(r))
        |SELECT p.token, p.exact_n, CAST(min(s.c) AS BIGINT) AS cm_est
        |FROM probe p JOIN sk s USING (row, cell)
        |GROUP BY p.token, p.exact_n
        |ORDER BY exact_n DESC, token""".stripMargin) { (s, dir) =>
      val occ = Tables.load(s, dir, "documents")
        .select(explode(graft.text.TextAnalysis.tokens(col("text"))).as("token"))
      val top = occ.groupBy("token").agg(count(lit(1)).as("exact_n"))
        .orderBy(col("exact_n").desc, col("token")).limit(20)
      val sk = graft.operators.CountMinSketch.build(occ, col("token"), depth = 4, width = 256)
      graft.operators.CountMinSketch.estimate(sk, top, "token", depth = 4, width = 256)
        .orderBy(col("exact_n").desc, col("token"))
    },

    // URL canonicalization — the dedup-key normalizer of web-corpus
    // curation: messy synthesized URLs (uppercase www host, default port,
    // utm_* tracking params, fragment) reduce to the canonical form the
    // URL-dedup join would key on. Four URL shapes by doc_id%4 pin the
    // scoping rules: https:443 stripped but http:443 KEPT (non-default
    // port), a /docs/utm_guide path segment and an xutm_source param KEPT
    // (utm stripping sees only &-anchored query params), http:80 stripped,
    // all-utm query vanishing without a dangling '?'. Both engines run the
    // identical split-at-'?' + global-regexp algebra (RE2-safe, no
    // lookarounds).
    Q(
      "q127_url_canonical",
      """WITH raw AS (SELECT doc_id,
        |    CASE doc_id % 4
        |      WHEN 0 THEN 'HTTPS://WWW.' || upper(source) || '.Example.COM:443/' || lang
        |        || '/' || doc_id || '?utm_source=feed&id=' || doc_id
        |        || '&utm_campaign=c' || (doc_id % 3) || '&ref=r' || (doc_id % 5) || '#sec'
        |      WHEN 1 THEN 'http://' || source || '.example.com:443/' || lang || '/' || doc_id
        |        || '?id=' || doc_id
        |      WHEN 2 THEN 'https://' || source || '.example.com/docs/utm_guide/' || doc_id
        |        || '?xutm_source=1&utm_medium=m&id=' || doc_id
        |      ELSE 'HTTP://WWW.' || upper(source) || '.Example.COM:80/' || lang
        |        || '?utm_only=1#f'
        |    END AS u
        |  FROM documents),
        |s1 AS (SELECT doc_id, regexp_replace(u, '#.*', '', 'g') AS u FROM raw),
        |s2 AS (SELECT doc_id, u, regexp_extract(u, '^[a-zA-Z]+://[^/?]+') AS p FROM s1),
        |s3 AS (SELECT doc_id,
        |    regexp_replace(regexp_replace(regexp_replace(lower(p),
        |        '^(https://[^/]*):443$', '\1'), '^(http://[^/]*):80$', '\1'),
        |      '://www\.', '://', 'g') AS host,
        |    substr(u, length(p) + 1) AS rest
        |  FROM s2),
        |s4 AS (SELECT doc_id, host, rest, strpos(rest, '?') AS qp FROM s3),
        |s5 AS (SELECT doc_id, host,
        |    CASE WHEN qp > 0 THEN substr(rest, 1, qp - 1) ELSE rest END AS path,
        |    regexp_replace(regexp_replace(
        |      '&' || CASE WHEN qp > 0 THEN substr(rest, qp + 1) ELSE '' END,
        |      '&utm_[^&]*', '', 'g'), '^&', '') AS cleaned
        |  FROM s4)
        |SELECT doc_id,
        |  host || path || CASE WHEN cleaned = '' THEN '' ELSE '?' || cleaned END AS url
        |FROM s5 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val d = col("doc_id").cast("string")
      val raw = when(col("doc_id") % 4 === 0, concat(
          lit("HTTPS://WWW."), upper(col("source")), lit(".Example.COM:443/"),
          col("lang"), lit("/"), d, lit("?utm_source=feed&id="), d,
          lit("&utm_campaign=c"), (col("doc_id") % 3).cast("string"),
          lit("&ref=r"), (col("doc_id") % 5).cast("string"), lit("#sec")))
        .when(col("doc_id") % 4 === 1, concat(
          lit("http://"), col("source"), lit(".example.com:443/"), col("lang"),
          lit("/"), d, lit("?id="), d))
        .when(col("doc_id") % 4 === 2, concat(
          lit("https://"), col("source"), lit(".example.com/docs/utm_guide/"), d,
          lit("?xutm_source=1&utm_medium=m&id="), d))
        .otherwise(concat(
          lit("HTTP://WWW."), upper(col("source")), lit(".Example.COM:80/"),
          col("lang"), lit("?utm_only=1#f")))
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), graft.text.TextAnalysis.canonicalizeUrl(raw).as("url"))
        .orderBy("doc_id")
    },

    // URL-level dedup (the CCNet first stage): four messy renderings of the
    // same page — www + default port + utm + fragment variants by doc_id%4
    // — must collapse onto ONE canonical key, then first-wins group-dedup
    // keeps the lowest doc_id. The oracle is INDEPENDENT: it states the
    // intended canonical form directly ('https://example.com/p' || k)
    // rather than replaying the normalizer, so any canonicalization drift
    // on any of the four shapes fails the gate. Scale shape: stateless
    // canonicalize projection + one groupBy on the canonical key.
    Q(
      "q138_url_dedup",
      """WITH c AS (SELECT doc_id, 'https://example.com/p' || (doc_id % 50) AS url
        |           FROM documents)
        |SELECT url, min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_dups
        |FROM c GROUP BY url ORDER BY url""".stripMargin) { (s, dir) =>
      val k = (col("doc_id") % 50).cast("string")
      val raw = when(col("doc_id") % 4 === 0,
          concat(lit("HTTPS://WWW.EXAMPLE.COM:443/p"), k,
            lit("?utm_source=a&utm_medium=m#x")))
        .when(col("doc_id") % 4 === 1, concat(lit("https://example.com/p"), k))
        .when(col("doc_id") % 4 === 2,
          concat(lit("https://www.example.com/p"), k, lit("?utm_only=1")))
        .otherwise(concat(lit("HTTPS://Example.Com:443/p"), k, lit("#frag")))
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), graft.text.TextAnalysis.canonicalizeUrl(raw).as("url"))
        .groupBy("url")
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_dups"))
        .orderBy("url")
    },

    // Sequential Poisson sampling (Splits.weightedSample): exactly-100
    // sample with inclusion ~proportional to n_chars — the "sample tokens,
    // not documents" knob. Priority ξ = md5-uniform / weight is one IEEE
    // division of exactly-agreed operands (no RNG, no libm), and the pick
    // is the fixedSample TopK shape — per-partition top-n + merge, never a
    // global sort.
    Q(
      "q164_weighted_sample",
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE n_chars > 0
        |ORDER BY (CAST(CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 6)) AS BIGINT) AS DOUBLE)
        |    / 16777216.0) / CAST(n_chars AS DOUBLE), doc_id
        |LIMIT 100""".stripMargin) { (s, dir) =>
      Splits.weightedSample(
        Tables.load(s, dir, "documents"), col("doc_id"), col("n_chars"), 100)
        .select("doc_id", "lang", "n_chars")
    },

    // SemDeDup (Similarity.semanticDedup): k-means clusters the embedding
    // space (the same fit q86 gates), then within-cluster cosine ≥ 0.3
    // drops every higher-id member — first-wins semantic dedup with the
    // pair space bounded to (n/k)² per cluster. The oracle replays the
    // full fit from scratch AND the pair decisions.
    Q("q165_semdedup", semDedupOracle(k = 5, iters = 3, dims = 64, tau = 0.3)) {
      (s, dir) =>
        graft.sim.Similarity.semanticDedup(
          Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
          k = 5, iters = 3, minCosine = 0.3)
          .orderBy("vec_id")
    },

    // Unicode NFC normalization (functions.NfcNormalize, SQL
    // `nfc_normalize`): the canonical-composition pass that belongs before
    // any hash/dedup on real text. The corpus is ASCII, so each doc gets a
    // decomposed suffix (e + U+0301, A + U+0308) appended IN THE QUERY —
    // normalization composes both pairs (char length drops by exactly 2),
    // and both engines implement the same Unicode mapping (JDK Normalizer
    // here, utf8proc in the oracle).
    Q(
      "q169_nfc_normalize",
      """SELECT doc_id, nfc_normalize(s) AS norm,
        |  length(s) AS n_raw, length(nfc_normalize(s)) AS n_norm
        |FROM (SELECT doc_id, substr(text, 1, 24) || 'e' || chr(769) || 'A' || chr(776) AS s
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val raw = concat(substring(col("text"), 1, 24), lit("e\u0301A\u0308"))
      Tables.load(s, dir, "documents")
        .select(
          col("doc_id"),
          graft.functions.NfcNormalize.nfc(raw).as("norm"),
          length(raw).cast("long").as("n_raw"),
          length(graft.functions.NfcNormalize.nfc(raw)).cast("long").as("n_norm"))
        .orderBy("doc_id")
    })
}
