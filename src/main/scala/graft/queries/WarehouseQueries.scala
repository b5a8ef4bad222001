package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse-lifecycle and statistics operators added in round 7's
  * continuation: SCD Type-2 dimension versioning + point-in-time facts,
  * exact integer proration, LM-proxy surprisal scoring, Benford DQ audit,
  * per-key autocorrelation, k-core graph peeling, Welch's t, co-occurrence
  * Jaccard, and rank-with-ties group limits. Determinism rules as
  * elsewhere: integers wherever a sum happens, one pinned (6-dp floor)
  * double at the very end of each computed-double column.
  */
object WarehouseQueries {

  private val pin6 = (c: org.apache.spark.sql.Column) =>
    (floor(c * lit(1000000.0) + lit(0.5)).cast("double") / lit(1000000.0))

  /** Shared oracle CTE fragments, same text as TrainingQueries' (private
    * there): tokenization and word 3-shingles matching TextAnalysis.tokens /
    * MinHashLsh.shingles.
    */
  private val TokCteW =
    "tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents)"
  private val ShCteW =
    """sh AS (SELECT doc_id,
      |  CASE WHEN len(t) = 0 THEN CAST([] AS VARCHAR[])
      |       WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
      |       ELSE list_transform(generate_series(1, len(t) - 2),
      |                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
      |  END AS s FROM tok)""".stripMargin

  /** One unrolled BPE training round for the q196 oracle: pair counts with
    * lead(), argmax with a total order, merge application as the same
    * windowed position arithmetic Vocab.bpeTrain runs (runs of adjacent
    * flagged positions merge at even in-run offsets = greedy leftmost).
    */
  private[queries] def bpeRound(k: Int): String = {
    val p = s"p${k - 1}"
    s"""c$k AS (SELECT sym, nxt, CAST(sum(tf) AS BIGINT) AS n FROM (
       |    SELECT sym, lead(sym) OVER (PARTITION BY wid ORDER BY pos) AS nxt, tf FROM $p)
       |  WHERE nxt IS NOT NULL GROUP BY sym, nxt),
       |b$k AS (SELECT sym AS a, nxt AS b, n FROM c$k ORDER BY n DESC, a, b LIMIT 1),
       |f$k AS (SELECT p.wid, p.tf, p.pos, p.sym,
       |    coalesce(p.sym = b.a AND
       |      lead(p.sym) OVER (PARTITION BY p.wid ORDER BY p.pos) = b.b, false) AS flg,
       |    b.b AS bb
       |  FROM $p p CROSS JOIN b$k b),
       |g$k AS (SELECT *, CASE WHEN flg
       |    THEN pos - row_number() OVER (PARTITION BY wid, flg ORDER BY pos) END AS grp
       |  FROM f$k),
       |m$k AS (SELECT *, flg AND (pos - min(pos) OVER (PARTITION BY wid, grp)) % 2 = 0 AS mrg
       |  FROM g$k),
       |n$k AS (SELECT wid, tf, pos, CASE WHEN mrg THEN sym || bb ELSE sym END AS sym,
       |    coalesce(lag(mrg) OVER (PARTITION BY wid ORDER BY pos), false) AS consumed
       |  FROM m$k),
       |p$k AS (SELECT wid, tf,
       |    CAST(row_number() OVER (PARTITION BY wid ORDER BY pos) AS BIGINT) AS pos, sym
       |  FROM n$k WHERE NOT consumed)""".stripMargin
  }

  val all: Seq[Q] = Seq(

    // SCD Type-2 build (Scd.buildVersions): the events changelog collapsed
    // into versioned per-user state intervals — run-collapse filter and
    // version numbering share one window partitioning (a single exchange
    // on user_id). Timestamps exported as exact epoch-microsecond longs.
    Q(
      "q179_scd2_build",
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS t FROM events),
        |m AS (SELECT *, row_number() OVER w AS rn, lag(event_type) OVER w AS prev
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
        |s AS (SELECT user_id, CAST(row_number() OVER w2 AS BIGINT) AS version,
        |             event_type AS state, t AS valid_from_us,
        |             lead(t) OVER w2 AS valid_to_us
        |      FROM m WHERE rn = 1 OR prev IS DISTINCT FROM event_type
        |      WINDOW w2 AS (PARTITION BY user_id ORDER BY t, event_id))
        |SELECT user_id, version, state, valid_from_us, valid_to_us,
        |       valid_to_us IS NULL AS is_current
        |FROM s ORDER BY user_id, version""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir).withColumn("t", unix_micros(col("ts")))
      graft.operators.Scd
        .buildVersions(ev, Seq("user_id"), "t", Seq("event_id"), "event_type")
        .select(
          col("user_id"), col("version"), col("state"),
          col("valid_from").as("valid_from_us"),
          col("valid_to").as("valid_to_us"), col("is_current"))
        .orderBy("user_id", "version")
    },

    // Point-in-time fact enrichment (Scd.pointInTime → the NATIVE as-of
    // merge exec): each purchase joined to the dimension version current at
    // its timestamp. The oracle replays it as an interval-containment join
    // — an INDEPENDENT formulation (as-of pick == containing interval only
    // because buildVersions' intervals partition each key's timeline).
    Q(
      "q180_scd2_pit",
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS t FROM events),
        |m AS (SELECT *, row_number() OVER w AS rn, lag(event_type) OVER w AS prev
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
        |s AS (SELECT user_id, CAST(row_number() OVER w2 AS BIGINT) AS version,
        |             event_type AS state, t AS valid_from_us,
        |             lead(t) OVER w2 AS valid_to_us
        |      FROM m WHERE rn = 1 OR prev IS DISTINCT FROM event_type
        |      WINDOW w2 AS (PARTITION BY user_id ORDER BY t, event_id)),
        |f AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
        |      WHERE event_type = 'purchase')
        |SELECT f.event_id, f.user_id, f.ts_us, s.state, s.version
        |FROM f JOIN s ON f.user_id = s.user_id AND f.ts_us >= s.valid_from_us
        |            AND (s.valid_to_us IS NULL OR f.ts_us < s.valid_to_us)
        |ORDER BY f.event_id""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir).withColumn("t", unix_micros(col("ts")))
      val dim = graft.operators.Scd
        .buildVersions(ev, Seq("user_id"), "t", Seq("event_id"), "event_type")
      val facts = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("t").as("ts_us"))
      graft.operators.Scd
        .pointInTime(facts, dim, Seq("user_id"), "ts_us", Seq("state", "version"))
        .select(
          col("event_id"), col("user_id"), col("ts_us"),
          col("asof_state").as("state"), col("asof_version").as("version"))
        .orderBy("event_id")
    },

    // Largest-remainder proration (Allocation.largestRemainder): a 1M-unit
    // budget apportioned across nations by exact revenue cents — the alloc
    // column SUMS TO THE TOTAL EXACTLY, all decimal(38,0) integer math.
    // Facts aggregate to the 25-row target grain first; the remainder-rank
    // window only ever sees that aggregate.
    Q(
      "q181_proration",
      """WITH s AS (SELECT c_nationkey AS nk,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS weight_cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1),
        |t AS (SELECT CAST(sum(weight_cents) AS HUGEINT) AS tw FROM s),
        |b AS (SELECT nk, weight_cents,
        |    (1000000 * CAST(weight_cents AS HUGEINT)) // tw AS base,
        |    (1000000 * CAST(weight_cents AS HUGEINT)) % tw AS rem
        |  FROM s, t),
        |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, nk) AS rk,
        |    1000000 - sum(base) OVER () AS short FROM b)
        |SELECT nk, weight_cents,
        |  CAST(base + CASE WHEN rk <= short THEN 1 ELSE 0 END AS BIGINT) AS alloc
        |FROM r ORDER BY nk""".stripMargin) { (s, dir) =>
      val targets = Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nk"))
        .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("weight_cents"))
      graft.operators.Allocation
        .largestRemainder(targets, "weight_cents", 1000000L, tieCols = Seq("nk"))
        .select(col("nk"), col("weight_cents"), col("alloc"))
        .orderBy("nk")
    },

    // Unigram surprisal quality score (Vocab.surprisalScores): the
    // LM-perplexity proxy for corpus filtering. Per-token surprisal is
    // rounded ONCE to integer micro-nats on the vocabulary table; document
    // scores are exact long sums + floor division — the single ln per
    // distinct token is the only fp op in the pipeline.
    Q(
      "q182_surprisal",
      """WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
        |             FROM documents),
        |c AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1),
        |nt AS (SELECT count(*) AS n FROM tok),
        |w AS (SELECT token,
        |    CAST(floor(ln(CAST(n AS DOUBLE) / CAST(cnt AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS unats
        |  FROM c, nt),
        |p AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |             CAST(sum(unats) AS BIGINT) AS su
        |      FROM tok JOIN w USING (token) GROUP BY 1)
        |SELECT d.doc_id, coalesce(p.n_tokens, 0) AS n_tokens,
        |  CASE WHEN coalesce(p.n_tokens, 0) > 0 THEN su // p.n_tokens ELSE 0 END AS mean_unats
        |FROM documents d LEFT JOIN p USING (doc_id) ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      graft.text.Vocab
        .surprisalScores(Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    // Benford first-digit audit (Quality.benfordAudit): leading-digit
    // distribution of order amounts vs log10(1 + 1/d), with per-digit χ²
    // contributions. Digit extraction is integer/string only; the two
    // computed doubles are pinned (1e-9 for the expected share, 1e-6 for
    // the χ² term).
    Q(
      "q183_benford",
      """WITH u AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders),
        |d AS (SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INT) AS digit, count(*) AS n
        |      FROM u WHERE c > 0 GROUP BY 1),
        |f AS (SELECT CAST(g.i AS INT) AS digit, CAST(coalesce(d.n, 0) AS BIGINT) AS n
        |      FROM generate_series(1, 9) AS g(i) LEFT JOIN d ON d.digit = g.i),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM f),
        |e AS (SELECT digit, n, tot,
        |    floor(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) * 1000000000.0 + 0.5)
        |      / 1000000000.0 AS expected_p
        |  FROM f, t)
        |SELECT digit, n, expected_p,
        |  floor((CAST(n AS DOUBLE) - CAST(tot AS DOUBLE) * expected_p)
        |    * (CAST(n AS DOUBLE) - CAST(tot AS DOUBLE) * expected_p)
        |    / (CAST(tot AS DOUBLE) * expected_p) * 1000000.0 + 0.5) / 1000000.0 AS chi2_term
        |FROM e ORDER BY digit""".stripMargin) { (s, dir) =>
      graft.load.Quality
        .benfordAudit(Tables.load(s, dir, "orders"), "o_totalprice", scale = 100)
        .orderBy("digit")
    },

    // Lag-1 autocorrelation of per-user daily activity
    // (TimeSeries.autoCorrLag): one grouped count, one keyed lag window,
    // then the exact-integer-sum correlation — the q172 groupCorr recipe
    // applied to a series against its shifted self.
    Q(
      "q184_autocorr",
      """WITH d AS (SELECT user_id, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS c
        |           FROM events GROUP BY 1, 2),
        |p AS (SELECT user_id, lag(c) OVER (PARTITION BY user_id ORDER BY day) AS x, c AS y
        |      FROM d),
        |q AS (SELECT user_id, x, y FROM p WHERE x IS NOT NULL),
        |a AS (SELECT user_id, count(*) AS n,
        |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
        |    CAST(sum(x * y) AS HUGEINT) AS sxy, CAST(sum(x * x) AS HUGEINT) AS sxx,
        |    CAST(sum(y * y) AS HUGEINT) AS syy
        |  FROM q GROUP BY 1),
        |r AS (SELECT user_id, n, n * sxy - sx * sy AS num,
        |    n * sxx - sx * sx AS dx, n * syy - sy * sy AS dy
        |  FROM a)
        |SELECT user_id, n,
        |  floor(CAST(num AS DOUBLE) / (sqrt(CAST(dx AS DOUBLE)) * sqrt(CAST(dy AS DOUBLE)))
        |    * 1000000.0 + 0.5) / 1000000.0 AS autocorr
        |FROM r WHERE n >= 8 AND dx != 0 AND dy != 0
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      val daily = Tables.events(s, dir)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
      graft.operators.TimeSeries
        .autoCorrLag(daily, Seq("user_id"), Seq(col("day").asc), "c", lagN = 1)
        .filter(col("n") >= 8 && col("autocorr").isNotNull)
        .select(col("user_id"), col("n"), pin6(col("autocorr")).as("autocorr"))
        .orderBy("user_id")
    },

    // k-core peeling (KCore.peel, k=3, 3 rounds) over the bigram
    // co-occurrence graph — the dense-region extractor; the oracle unrolls
    // the same three peel rounds (degree → filter → induced subgraph) in
    // CTEs, cascade deletions included.
    Q(
      "q185_kcore",
      """WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
        |bg AS (SELECT t[i] || ' ' || t[i+1] AS gram
        |       FROM tok, unnest(generate_series(1, len(t) - 1)) AS g(i)),
        |pc AS (SELECT gram, count(*) AS n FROM bg GROUP BY gram),
        |ed AS (SELECT DISTINCT
        |         least(split_part(gram, ' ', 1), split_part(gram, ' ', 2)) AS a,
        |         greatest(split_part(gram, ' ', 1), split_part(gram, ' ', 2)) AS b
        |       FROM pc
        |       WHERE n >= 5 AND split_part(gram, ' ', 1) != split_part(gram, ' ', 2)),
        |s0 AS (SELECT a AS s, b AS d FROM ed UNION ALL SELECT b, a FROM ed),
        |k1 AS (SELECT s FROM (SELECT s, count(*) AS dg FROM s0 GROUP BY 1) WHERE dg >= 3),
        |s1 AS (SELECT s0.s, s0.d FROM s0 JOIN k1 USING (s) JOIN k1 kb ON s0.d = kb.s),
        |k2 AS (SELECT s FROM (SELECT s, count(*) AS dg FROM s1 GROUP BY 1) WHERE dg >= 3),
        |s2 AS (SELECT s1.s, s1.d FROM s1 JOIN k2 USING (s) JOIN k2 kb ON s1.d = kb.s),
        |k3 AS (SELECT s FROM (SELECT s, count(*) AS dg FROM s2 GROUP BY 1) WHERE dg >= 3),
        |s3 AS (SELECT s2.s, s2.d FROM s2 JOIN k3 USING (s) JOIN k3 kb ON s2.d = kb.s)
        |SELECT s AS node, CAST(count(*) AS BIGINT) AS deg
        |FROM s3 GROUP BY 1 ORDER BY node""".stripMargin) { (s, dir) =>
      graft.operators.KCore
        .peel(SharedFrames.bigramEdges(s, dir), k = 3, rounds = 3)
        .orderBy("node")
    },

    // Pairwise Welch's t across market segments (RobustStats.welchT): exact
    // integer n/Σx/Σx² per group from ONE fact scan, then the closed-form t
    // on the 10-row pair join — the A/B-test readout at warehouse scale.
    Q(
      "q186_welch_ttest",
      """WITH g AS (SELECT c_mktsegment AS seg, count(*) AS n,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS HUGEINT) AS sx,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)
        |           * CAST(round(o_totalprice * 100) AS BIGINT)) AS HUGEINT) AS sxx
        |  FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1),
        |p AS (SELECT a.seg AS group_a, b.seg AS group_b, a.n AS n_a, b.n AS n_b,
        |    CAST(a.sx AS DOUBLE) / CAST(a.n AS DOUBLE) AS ma,
        |    CAST(b.sx AS DOUBLE) / CAST(b.n AS DOUBLE) AS mb,
        |    CAST(a.n * a.sxx - a.sx * a.sx AS DOUBLE)
        |      / (CAST(a.n AS DOUBLE) * CAST(a.n - 1 AS DOUBLE)) AS va,
        |    CAST(b.n * b.sxx - b.sx * b.sx AS DOUBLE)
        |      / (CAST(b.n AS DOUBLE) * CAST(b.n - 1 AS DOUBLE)) AS vb
        |  FROM g a JOIN g b ON a.seg < b.seg)
        |SELECT group_a, group_b, n_a, n_b,
        |  floor((ma - mb) / sqrt(va / CAST(n_a AS DOUBLE) + vb / CAST(n_b AS DOUBLE))
        |    * 1000000.0 + 0.5) / 1000000.0 AS t
        |FROM p ORDER BY group_a, group_b""".stripMargin) { (s, dir) =>
      val joined = Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      graft.operators.RobustStats
        .welchT(joined, "c_mktsegment", "o_totalprice", scale = 100)
        .select(col("group_a"), col("group_b"), col("n_a"), col("n_b"),
          pin6(col("t")).as("t"))
        .orderBy("group_a", "group_b")
    },

    // Item-item Jaccard from basket co-occurrence: the q153 pair counts
    // normalized by per-item order counts — n_ab / (n_a + n_b − n_ab), the
    // item-recommendation similarity. All counts exact; one pinned division
    // per pair row; top-100 orders by the PINNED value so both engines cut
    // the same boundary.
    Q(
      "q187_item_jaccard",
      """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pc AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_orders FROM op GROUP BY 1),
        |pr AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
        |         CAST(count(*) AS BIGINT) AS n_ab
        |       FROM op a JOIN op b
        |         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |       GROUP BY 1, 2)
        |SELECT part_a, part_b, n_ab,
        |  floor(CAST(n_ab AS DOUBLE) / CAST(ca.n_orders + cb.n_orders - n_ab AS DOUBLE)
        |    * 1000000.0 + 0.5) / 1000000.0 AS jaccard
        |FROM pr JOIN pc ca ON pr.part_a = ca.l_partkey
        |        JOIN pc cb ON pr.part_b = cb.l_partkey
        |ORDER BY jaccard DESC, part_a, part_b LIMIT 100""".stripMargin) { (s, dir) =>
      val op = Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_partkey").distinct()
      val pc = op.groupBy("l_partkey").agg(count(lit(1)).as("n_orders"))
      val pr = SharedFrames.basketPairCounts(s, dir)
      pr
        .join(pc.select(col("l_partkey").as("part_a"), col("n_orders").as("_na")), "part_a")
        .join(pc.select(col("l_partkey").as("part_b"), col("n_orders").as("_nb")), "part_b")
        .select(col("part_a"), col("part_b"), col("n_ab"),
          pin6(col("n_ab").cast("double") /
            (col("_na") + col("_nb") - col("n_ab")).cast("double")).as("jaccard"))
        .orderBy(col("jaccard").desc, col("part_a"), col("part_b"))
        .limit(100)
    },

    // Top-3 orders per segment WITH TIES (rank(), not row_number): the
    // group limit that keeps equal-amount rows together. Spark 4 rewrites
    // the rank filter into WindowGroupLimit — per-partition top-k BEFORE
    // the window exchange (asserted in PlanSpec).
    Q(
      "q188_rank_ties",
      """WITH r AS (SELECT c_mktsegment AS seg, o_orderkey, o_totalprice,
        |    CAST(rank() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC) AS BIGINT) AS rnk
        |  FROM orders JOIN customer ON o_custkey = c_custkey)
        |SELECT seg, o_orderkey, o_totalprice, rnk FROM r WHERE rnk <= 3
        |ORDER BY seg, rnk, o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("seg")).orderBy(col("o_totalprice").desc)
      Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("seg"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rnk", rank().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .orderBy("seg", "rnk", "o_orderkey")
    },

    // Hybrid retrieval: BM25 more-like-this (each anchor doc's distinct
    // tokens as the query, per-term scores summed as exact 1e4-scaled
    // longs) fused with embedding-cosine ranking by reciprocal-rank fusion
    // (Retrieval.moreLikeThis + rrfFuse). The RRF contribution is the
    // INTEGER quotient 1000000 div (60 + rank) — a double 1/(k+r) sum
    // would be aggregation-order-sensitive; the integer sum is not.
    Q(
      "q189_rrf_fusion",
      """WITH tt AS (SELECT doc_id, u.tok AS term
        |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
        |    unnest(t) AS u(tok)),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tt GROUP BY doc_id, term),
        |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tt GROUP BY doc_id),
        |tot AS (SELECT CAST(sum(dl) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n FROM dl),
        |aterms AS (SELECT DISTINCT doc_id AS anchor_id, term FROM tt WHERE doc_id IN (0, 1, 2)),
        |qterms AS (SELECT DISTINCT term FROM aterms),
        |hits AS (SELECT tf.* FROM tf JOIN qterms USING (term)),
        |dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS dfr FROM hits GROUP BY term),
        |sc AS (SELECT h.term, h.doc_id,
        |    CAST(floor(round(CAST(22 * h.tf * s AS DOUBLE) /
        |        CAST(10 * h.tf * s + 3 * s + 9 * d.dl * n AS DOUBLE) *
        |        (CAST(2 * n - 2 * dfr + 1 AS DOUBLE) / CAST(2 * dfr + 1 AS DOUBLE)), 4)
        |      * 10000.0 + 0.5) AS BIGINT) AS s4
        |  FROM hits h JOIN dl d USING (doc_id) JOIN dfq USING (term) CROSS JOIN tot),
        |lexsum AS (SELECT a.anchor_id, sc.doc_id, CAST(sum(sc.s4) AS BIGINT) AS lex_i4
        |  FROM sc JOIN aterms a USING (term) WHERE sc.doc_id != a.anchor_id
        |  GROUP BY a.anchor_id, sc.doc_id),
        |lex AS (SELECT * FROM (SELECT anchor_id, doc_id, lex_i4,
        |    CAST(row_number() OVER (PARTITION BY anchor_id ORDER BY lex_i4 DESC, doc_id)
        |      AS BIGINT) AS lex_rank FROM lexsum) WHERE lex_rank <= 20),
        |nv AS (SELECT vec_id, embedding,
        |    sqrt(list_aggregate(list_transform(generate_series(1, len(embedding)),
        |      i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE), 'sum')) AS nrm
        |  FROM embeddings),
        |semsc AS (SELECT a.vec_id AS anchor_id, b.vec_id AS doc_id,
        |    round(list_aggregate(list_transform(generate_series(1, len(a.embedding)),
        |      i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE), 'sum')
        |      / (a.nrm * b.nrm), 6) AS cos_sim
        |  FROM nv a JOIN nv b ON b.vec_id != a.vec_id WHERE a.vec_id IN (0, 1, 2)),
        |sem AS (SELECT * FROM (SELECT anchor_id, doc_id,
        |    CAST(row_number() OVER (PARTITION BY anchor_id ORDER BY cos_sim DESC, doc_id)
        |      AS BIGINT) AS sem_rank FROM semsc) WHERE sem_rank <= 20),
        |u AS (SELECT anchor_id, doc_id FROM lex UNION SELECT anchor_id, doc_id FROM sem),
        |f AS (SELECT u.anchor_id, u.doc_id, l.lex_rank, s.sem_rank,
        |    CAST(coalesce(1000000 // (60 + l.lex_rank), 0)
        |       + coalesce(1000000 // (60 + s.sem_rank), 0) AS BIGINT) AS rrf_i6
        |  FROM u LEFT JOIN lex l ON u.anchor_id = l.anchor_id AND u.doc_id = l.doc_id
        |         LEFT JOIN sem s ON u.anchor_id = s.anchor_id AND u.doc_id = s.doc_id)
        |SELECT anchor_id, doc_id, lex_rank, sem_rank, rrf_i6,
        |  CAST(rrf_i6 AS DOUBLE) / 1000000.0 AS rrf, fused_rank
        |FROM (SELECT *, CAST(row_number() OVER (PARTITION BY anchor_id
        |    ORDER BY rrf_i6 DESC, doc_id) AS BIGINT) AS fused_rank FROM f)
        |WHERE fused_rank <= 10 ORDER BY anchor_id, fused_rank""".stripMargin) { (s, dir) =>
      import graft.text.Retrieval
      import graft.sim.Similarity
      val docs = Tables.load(s, dir, "documents")
      val lex = SharedFrames.lexRanked(s, dir)
      val emb = Tables.load(s, dir, "embeddings")
      val nv = emb.select(col("vec_id"), Similarity.normalized(col("embedding")).as("_nv"))
      val anchors = nv.filter(col("vec_id").isin(0L, 1L, 2L))
        .select(col("vec_id").as("anchor_id"), col("_nv").as("_na"))
      val semW = Window.partitionBy("anchor_id")
        .orderBy(col("cos_sim").desc, col("doc_id"))
      val sem = broadcast(anchors).crossJoin(nv)
        .filter(col("vec_id") =!= col("anchor_id"))
        .select(col("anchor_id"), col("vec_id").as("doc_id"),
          round(graft.functions.VectorFunctions.dot(col("_na"), col("_nv")), 6).as("cos_sim"))
        .withColumn("rank", row_number().over(semW).cast("long"))
        .filter(col("rank") <= 20)
        .select("anchor_id", "doc_id", "rank")
      Retrieval.rrfFuse(
        Seq("lex" -> lex.select("anchor_id", "doc_id", "rank"),
          "sem" -> sem),
        "anchor_id", "doc_id", kRrf = 60, topK = 10)
        .select("anchor_id", "doc_id", "lex_rank", "sem_rank", "rrf_i6", "rrf", "fused_rank")
        .orderBy("anchor_id", "fused_rank")
    },

    // Exact stratified 80/10/10 split (Splits.exactStratifiedSplit): per
    // lang, split sizes are the grouped largest-remainder apportionment
    // (Allocation.largestRemainderBy) of the stratum count by 8/1/1, and
    // rows assign in md5(seed|id) order — counts exact to the row per
    // stratum, membership a pure function of (seed, id). Ranks come from
    // the two-pass GlobalRank stamping, never a single-partition window.
    Q(
      "q190_exact_split",
      """WITH cnt AS (SELECT lang, CAST(count(*) AS BIGINT) AS tot FROM documents GROUP BY lang),
        |sp AS (SELECT * FROM (VALUES ('train', 8, 0), ('val', 1, 1), ('test', 1, 2))
        |       AS v(split, w, ord)),
        |t AS (SELECT lang, tot, split, w, ord, (tot * w) // 10 AS base, (tot * w) % 10 AS rem
        |      FROM cnt CROSS JOIN sp),
        |a AS (SELECT *, CAST(row_number() OVER (PARTITION BY lang ORDER BY rem DESC, split)
        |        AS BIGINT) AS rk,
        |        tot - sum(base) OVER (PARTITION BY lang) AS short FROM t),
        |al AS (SELECT lang, split, ord,
        |        base + CASE WHEN rk <= short THEN 1 ELSE 0 END AS alloc FROM a),
        |cu AS (SELECT lang, split,
        |        sum(alloc) OVER (PARTITION BY lang ORDER BY ord) AS hi,
        |        sum(alloc) OVER (PARTITION BY lang ORDER BY ord) - alloc AS lo FROM al),
        |r AS (SELECT doc_id, lang, CAST(row_number() OVER (PARTITION BY lang
        |        ORDER BY md5('split42|' || doc_id::VARCHAR), doc_id) AS BIGINT) AS rr
        |      FROM documents)
        |SELECT r.doc_id, r.lang, cu.split
        |FROM r JOIN cu ON r.lang = cu.lang AND r.rr > cu.lo AND r.rr <= cu.hi
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.operators.Splits.exactStratifiedSplit(
        Tables.load(s, dir, "documents").select("doc_id", "lang"),
        "doc_id", Seq("lang"),
        weights = Seq("train" -> 8L, "val" -> 1L, "test" -> 1L),
        seed = "split42")
        .select("doc_id", "lang", "split")
        .orderBy("doc_id")
    },

    // Deterministic epoch shuffle + loader sharding (Splits.epochShuffle):
    // shard from one md5 segment, intra-shard position from the full
    // digest via GlobalRank's two-pass stamping, interleaved global order
    // key pos*S + shard. Reproducible across runs and cluster layouts —
    // the property rand(seed) does not have under Spark's per-partition
    // draw.
    Q(
      "q191_epoch_shuffle",
      """WITH h AS (SELECT doc_id, md5('epoch1|' || doc_id::VARCHAR) AS hh FROM documents),
        |s AS (SELECT doc_id, hh,
        |        CAST(CAST('0x' || substr(hh, 1, 2) AS INT) % 8 AS INT) AS shard FROM h),
        |p AS (SELECT doc_id, shard,
        |        CAST(row_number() OVER (PARTITION BY shard ORDER BY hh, doc_id) - 1
        |          AS BIGINT) AS pos FROM s)
        |SELECT doc_id, shard, pos, CAST(pos * 8 + shard AS BIGINT) AS global_pos
        |FROM p ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.operators.Splits.epochShuffle(
        Tables.load(s, dir, "documents").select("doc_id"), "doc_id",
        seed = "epoch1", numShards = 8)
        .select("doc_id", "shard", "pos", "global_pos")
        .orderBy("doc_id")
    },

    // Distinctive terms per language (Keyness.oddsRatio): Haldane-corrected
    // odds ratio vs the rest of the corpus — numerator and denominator are
    // exact integer products, the emitted double is ONE division, so the
    // rank order is engine-identical with no libm log anywhere.
    Q(
      "q192_keyness",
      """WITH tt AS (SELECT lang, u.tok AS token
        |  FROM (SELECT lang, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
        |    unnest(t) AS u(tok)),
        |y AS (SELECT lang, token, CAST(count(*) AS BIGINT) AS y FROM tt GROUP BY lang, token),
        |n AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM tt GROUP BY lang),
        |yt AS (SELECT token, CAST(count(*) AS BIGINT) AS ytot FROM tt GROUP BY token),
        |nt AS (SELECT CAST(count(*) AS BIGINT) AS ntot FROM tt),
        |o AS (SELECT y.lang, y.token, y.y, n.n,
        |    yt.ytot - y.y AS y_rest, nt.ntot - n.n AS n_rest,
        |    CAST((2 * y.y + 1) * (2 * ((nt.ntot - n.n) - (yt.ytot - y.y)) + 1) AS DOUBLE)
        |      / CAST((2 * (n.n - y.y) + 1) * (2 * (yt.ytot - y.y) + 1) AS DOUBLE) AS odds_ratio
        |  FROM y JOIN n USING (lang) JOIN yt USING (token) CROSS JOIN nt)
        |SELECT lang, token, y, n, y_rest, n_rest, odds_ratio, rk FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY odds_ratio DESC, token) AS BIGINT) AS rk FROM o)
        |WHERE rk <= 5 ORDER BY lang, rk""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("lang").orderBy(col("odds_ratio").desc, col("token"))
      graft.text.Keyness.oddsRatio(Tables.load(s, dir, "documents"), "text", "lang")
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 5)
        .orderBy("lang", "rk")
    },

    // Score the q40 language-ID heuristic against the labeled lang column
    // (Eval.perClassPrf): per-class confusion counts and precision/recall/
    // F1, each ONE integer division (F1 via 2tp/(n_true+n_pred) — no
    // intermediate P,R rounding); zero-denominator metrics are NULL, not
    // NaN. zh (never predicted — latin stopword sets) exercises the
    // null-precision path; und (never true) the null-recall path.
    Q(
      "q193_langid_eval",
      """WITH p AS (SELECT lang AS truth,
        |  CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en > 0 THEN 'en'
        |       WHEN s_es >= s_de AND s_es >= s_fr AND s_es > 0 THEN 'es'
        |       WHEN s_de >= s_fr AND s_de > 0 THEN 'de'
        |       WHEN s_fr > 0 THEN 'fr' ELSE 'und' END AS pred
        |  FROM (SELECT lang,
        |      len(list_filter(t, x -> x IN ('the','and','of','to','in','is','a'))) AS s_en,
        |      len(list_filter(t, x -> x IN ('el','la','de','que','los','es','una'))) AS s_es,
        |      len(list_filter(t, x -> x IN ('der','die','und','das','ist','ein','nicht'))) AS s_de,
        |      len(list_filter(t, x -> x IN ('le','la','les','des','est','une','dans'))) AS s_fr
        |    FROM (SELECT lang, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
        |          FROM documents))),
        |bt AS (SELECT truth AS clazz, CAST(count(*) AS BIGINT) AS n_true,
        |    CAST(sum(CASE WHEN pred = truth THEN 1 ELSE 0 END) AS BIGINT) AS tp
        |  FROM p GROUP BY truth),
        |bp AS (SELECT pred AS clazz, CAST(count(*) AS BIGINT) AS n_pred FROM p GROUP BY pred)
        |SELECT coalesce(bt.clazz, bp.clazz) AS clazz,
        |  coalesce(n_true, 0) AS n_true, coalesce(n_pred, 0) AS n_pred,
        |  coalesce(tp, 0) AS tp,
        |  CASE WHEN coalesce(n_pred, 0) > 0
        |    THEN CAST(coalesce(tp, 0) AS DOUBLE) / CAST(n_pred AS DOUBLE) END AS "precision",
        |  CASE WHEN coalesce(n_true, 0) > 0
        |    THEN CAST(coalesce(tp, 0) AS DOUBLE) / CAST(n_true AS DOUBLE) END AS recall,
        |  CASE WHEN coalesce(n_true, 0) + coalesce(n_pred, 0) > 0
        |    THEN CAST(2 * coalesce(tp, 0) AS DOUBLE)
        |       / CAST(coalesce(n_true, 0) + coalesce(n_pred, 0) AS DOUBLE) END AS f1
        |FROM bt FULL OUTER JOIN bp ON bt.clazz = bp.clazz
        |ORDER BY clazz""".stripMargin) { (s, dir) =>
      val pairs = Tables.load(s, dir, "documents")
        .select(col("lang").as("truth"),
          graft.text.TextAnalysis.langId(col("text")).as("pred"))
      graft.operators.Eval.perClassPrf(pairs, "truth", "pred")
        .orderBy("clazz")
    },

    // Score q189's LEXICAL ranking against embedding-label relevance
    // (Eval.rankingMetrics): hits, MRR, P@10, AP@20 per anchor — the
    // evaluation loop that closes index → rank → fuse. Reciprocal ranks
    // and AP terms are INTEGER quotients (1000000 div rank,
    // hits·1e6 div i) summed as longs; each emitted double is one final
    // division. NDCG is deliberately absent — its log2 discount would
    // drag libm into the gate; MRR/AP carry the ordering signal as exact
    // rationals.
    Q(
      "q194_retrieval_eval",
      """WITH tt AS (SELECT doc_id, u.tok AS term
        |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
        |    unnest(t) AS u(tok)),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tt GROUP BY doc_id, term),
        |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tt GROUP BY doc_id),
        |tot AS (SELECT CAST(sum(dl) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n FROM dl),
        |aterms AS (SELECT DISTINCT doc_id AS anchor_id, term FROM tt WHERE doc_id IN (0, 1, 2)),
        |qterms AS (SELECT DISTINCT term FROM aterms),
        |hits0 AS (SELECT tf.* FROM tf JOIN qterms USING (term)),
        |dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS dfr FROM hits0 GROUP BY term),
        |sc0 AS (SELECT h.term, h.doc_id,
        |    CAST(floor(round(CAST(22 * h.tf * s AS DOUBLE) /
        |        CAST(10 * h.tf * s + 3 * s + 9 * d.dl * n AS DOUBLE) *
        |        (CAST(2 * n - 2 * dfr + 1 AS DOUBLE) / CAST(2 * dfr + 1 AS DOUBLE)), 4)
        |      * 10000.0 + 0.5) AS BIGINT) AS s4
        |  FROM hits0 h JOIN dl d USING (doc_id) JOIN dfq USING (term) CROSS JOIN tot),
        |lexsum AS (SELECT a.anchor_id, sc0.doc_id, CAST(sum(sc0.s4) AS BIGINT) AS lex_i4
        |  FROM sc0 JOIN aterms a USING (term) WHERE sc0.doc_id != a.anchor_id
        |  GROUP BY a.anchor_id, sc0.doc_id),
        |lex AS (SELECT * FROM (SELECT anchor_id, doc_id,
        |    CAST(row_number() OVER (PARTITION BY anchor_id ORDER BY lex_i4 DESC, doc_id)
        |      AS BIGINT) AS rank FROM lexsum) WHERE rank <= 20),
        |rel AS (SELECT a.vec_id AS anchor_id, b.vec_id AS doc_id
        |  FROM embeddings a JOIN embeddings b
        |    ON a.label = b.label AND b.vec_id != a.vec_id WHERE a.vec_id IN (0, 1, 2)),
        |rt AS (SELECT anchor_id, CAST(count(*) AS BIGINT) AS n_rel FROM rel GROUP BY anchor_id),
        |fl AS (SELECT l.anchor_id, l.doc_id, l.rank, r.doc_id IS NOT NULL AS rel
        |  FROM lex l LEFT JOIN rel r ON l.anchor_id = r.anchor_id AND l.doc_id = r.doc_id),
        |scn AS (SELECT *, sum(CASE WHEN rel THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY anchor_id ORDER BY rank) AS hits_run FROM fl),
        |ag AS (SELECT anchor_id,
        |    CAST(sum(CASE WHEN rel THEN 1 ELSE 0 END) AS BIGINT) AS hits,
        |    CAST(min(CASE WHEN rel THEN rank END) AS BIGINT) AS first_rel_rank,
        |    CAST(sum(CASE WHEN rel AND rank <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS p_hits,
        |    CAST(sum(CASE WHEN rel AND rank <= 20
        |      THEN (hits_run * 1000000) // rank ELSE 0 END) AS BIGINT) AS ap_sum
        |  FROM scn GROUP BY anchor_id)
        |SELECT ag.anchor_id, rt.n_rel, ag.hits, ag.first_rel_rank,
        |  CAST(coalesce(1000000 // first_rel_rank, 0) AS DOUBLE) / 1000000.0 AS mrr,
        |  CAST(p_hits AS DOUBLE) / 10.0 AS p_at_k,
        |  CASE WHEN n_rel > 0 THEN CAST(ap_sum AS DOUBLE)
        |    / CAST(least(n_rel, 20) * 1000000 AS DOUBLE) END AS ap
        |FROM ag JOIN rt USING (anchor_id) ORDER BY anchor_id""".stripMargin) { (s, dir) =>
      import graft.text.Retrieval
      val docs = Tables.load(s, dir, "documents")
      val ranked = SharedFrames.lexRanked(s, dir)
        .select("anchor_id", "doc_id", "rank")
      val emb = Tables.load(s, dir, "embeddings")
      val anchors = emb.filter(col("vec_id").isin(0L, 1L, 2L))
        .select(col("vec_id").as("anchor_id"), col("label").as("_al"))
      val rel = broadcast(anchors)
        .join(emb.select(col("vec_id").as("doc_id"), col("label")),
          col("label") === col("_al") && col("doc_id") =!= col("anchor_id"))
        .select("anchor_id", "doc_id")
      val rt = rel.groupBy("anchor_id").agg(count(lit(1)).as("n_rel"))
      graft.operators.Eval.rankingMetrics(
        ranked, rel, rt, "anchor_id", "doc_id", pAtK = 10, apAtK = 20)
        .orderBy("anchor_id")
    },

    // NDCG@20 over the SAME lexical ranking + embedding-label relevance as
    // q194 (Eval.ndcgAtK) — the graded-discount readout rankingMetrics
    // deliberately externalizes. The log2 discount rides the q182
    // pinned-micro-nat recipe: u = floor(ln(rank+1)·1e6 + 0.5) once per
    // LIST row, rmicro = (693147·1e6) div u (ln 2 pinned as the literal
    // 693147), DCG/IDCG exact long sums of rmicro, ndcg one final
    // division. IDCG reads the same pinned table at ranks 1..min(k,n_rel),
    // so the oracle replays every term bit-identically.
    Q(
      "q281_ndcg",
      """WITH tt AS (SELECT doc_id, u.tok AS term
        |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
        |    unnest(t) AS u(tok)),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tt GROUP BY doc_id, term),
        |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tt GROUP BY doc_id),
        |tot AS (SELECT CAST(sum(dl) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n FROM dl),
        |aterms AS (SELECT DISTINCT doc_id AS anchor_id, term FROM tt WHERE doc_id IN (0, 1, 2)),
        |qterms AS (SELECT DISTINCT term FROM aterms),
        |hits0 AS (SELECT tf.* FROM tf JOIN qterms USING (term)),
        |dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS dfr FROM hits0 GROUP BY term),
        |sc0 AS (SELECT h.term, h.doc_id,
        |    CAST(floor(round(CAST(22 * h.tf * s AS DOUBLE) /
        |        CAST(10 * h.tf * s + 3 * s + 9 * d.dl * n AS DOUBLE) *
        |        (CAST(2 * n - 2 * dfr + 1 AS DOUBLE) / CAST(2 * dfr + 1 AS DOUBLE)), 4)
        |      * 10000.0 + 0.5) AS BIGINT) AS s4
        |  FROM hits0 h JOIN dl d USING (doc_id) JOIN dfq USING (term) CROSS JOIN tot),
        |lexsum AS (SELECT a.anchor_id, sc0.doc_id, CAST(sum(sc0.s4) AS BIGINT) AS lex_i4
        |  FROM sc0 JOIN aterms a USING (term) WHERE sc0.doc_id != a.anchor_id
        |  GROUP BY a.anchor_id, sc0.doc_id),
        |lex AS (SELECT * FROM (SELECT anchor_id, doc_id,
        |    CAST(row_number() OVER (PARTITION BY anchor_id ORDER BY lex_i4 DESC, doc_id)
        |      AS BIGINT) AS rank FROM lexsum) WHERE rank <= 20),
        |rel AS (SELECT a.vec_id AS anchor_id, b.vec_id AS doc_id
        |  FROM embeddings a JOIN embeddings b
        |    ON a.label = b.label AND b.vec_id != a.vec_id WHERE a.vec_id IN (0, 1, 2)),
        |rt AS (SELECT anchor_id, CAST(count(*) AS BIGINT) AS n_rel FROM rel GROUP BY anchor_id),
        |fl AS (SELECT l.anchor_id, l.rank, r.doc_id IS NOT NULL AS rel
        |  FROM lex l LEFT JOIN rel r ON l.anchor_id = r.anchor_id AND l.doc_id = r.doc_id),
        |disc AS (SELECT CAST(g.i AS BIGINT) AS rank,
        |    (CAST(693147 AS BIGINT) * 1000000)
        |      // CAST(floor(ln(CAST(g.i + 1 AS DOUBLE)) * 1000000.0 + 0.5)
        |        AS BIGINT) AS rmicro
        |  FROM generate_series(1, 20) AS g(i)),
        |ag AS (SELECT fl.anchor_id,
        |    CAST(sum(CASE WHEN fl.rel THEN d.rmicro ELSE 0 END) AS BIGINT) AS dcg_micro,
        |    CAST(sum(CASE WHEN fl.rank <= least(20, rt.n_rel) THEN d.rmicro ELSE 0 END)
        |      AS BIGINT) AS idcg_micro
        |  FROM fl JOIN disc d USING (rank) JOIN rt USING (anchor_id)
        |  GROUP BY fl.anchor_id)
        |SELECT ag.anchor_id, rt.n_rel, ag.dcg_micro, ag.idcg_micro,
        |  CASE WHEN idcg_micro > 0
        |    THEN CAST(dcg_micro AS DOUBLE) / CAST(idcg_micro AS DOUBLE) END AS ndcg
        |FROM ag JOIN rt USING (anchor_id) ORDER BY ag.anchor_id""".stripMargin) { (s, dir) =>
      import graft.text.Retrieval
      val docs = Tables.load(s, dir, "documents")
      val ranked = SharedFrames.lexRanked(s, dir)
        .select("anchor_id", "doc_id", "rank")
      val emb = Tables.load(s, dir, "embeddings")
      val anchors = emb.filter(col("vec_id").isin(0L, 1L, 2L))
        .select(col("vec_id").as("anchor_id"), col("label").as("_al"))
      val rel = broadcast(anchors)
        .join(emb.select(col("vec_id").as("doc_id"), col("label")),
          col("label") === col("_al") && col("doc_id") =!= col("anchor_id"))
        .select("anchor_id", "doc_id")
      val rt = rel.groupBy("anchor_id").agg(count(lit(1)).as("n_rel"))
      graft.operators.Eval.ndcgAtK(ranked, rel, rt, "anchor_id", "doc_id", k = 20)
        .orderBy("anchor_id")
    },

    // Graded-relevance NDCG@20 (Eval.ndcgGradedAtK) — the reranker-eval
    // variant: qrels grade = 1 + vec_id % 3 (a deterministic 1..3 ladder),
    // gain = 2^grade − 1 exact longs, DCG/IDCG both exact sums of
    // gain·rmicro over q281's pinned discount table; IDCG ranks the qrels
    // by (grade desc, id) in a qrels-grain window. Same lexical ranking.
    Q(
      "q285_ndcg_graded",
      """WITH tt AS (SELECT doc_id, u.tok AS term
        |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
        |    unnest(t) AS u(tok)),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tt GROUP BY doc_id, term),
        |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tt GROUP BY doc_id),
        |tot AS (SELECT CAST(sum(dl) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n FROM dl),
        |aterms AS (SELECT DISTINCT doc_id AS anchor_id, term FROM tt WHERE doc_id IN (0, 1, 2)),
        |qterms AS (SELECT DISTINCT term FROM aterms),
        |hits0 AS (SELECT tf.* FROM tf JOIN qterms USING (term)),
        |dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS dfr FROM hits0 GROUP BY term),
        |sc0 AS (SELECT h.term, h.doc_id,
        |    CAST(floor(round(CAST(22 * h.tf * s AS DOUBLE) /
        |        CAST(10 * h.tf * s + 3 * s + 9 * d.dl * n AS DOUBLE) *
        |        (CAST(2 * n - 2 * dfr + 1 AS DOUBLE) / CAST(2 * dfr + 1 AS DOUBLE)), 4)
        |      * 10000.0 + 0.5) AS BIGINT) AS s4
        |  FROM hits0 h JOIN dl d USING (doc_id) JOIN dfq USING (term) CROSS JOIN tot),
        |lexsum AS (SELECT a.anchor_id, sc0.doc_id, CAST(sum(sc0.s4) AS BIGINT) AS lex_i4
        |  FROM sc0 JOIN aterms a USING (term) WHERE sc0.doc_id != a.anchor_id
        |  GROUP BY a.anchor_id, sc0.doc_id),
        |lex AS (SELECT * FROM (SELECT anchor_id, doc_id,
        |    CAST(row_number() OVER (PARTITION BY anchor_id ORDER BY lex_i4 DESC, doc_id)
        |      AS BIGINT) AS rank FROM lexsum) WHERE rank <= 20),
        |relg AS (SELECT a.vec_id AS anchor_id, b.vec_id AS doc_id,
        |    CAST(1 + b.vec_id % 3 AS BIGINT) AS g
        |  FROM embeddings a JOIN embeddings b
        |    ON a.label = b.label AND b.vec_id != a.vec_id WHERE a.vec_id IN (0, 1, 2)),
        |disc AS (SELECT CAST(g.i AS BIGINT) AS pos,
        |    (CAST(693147 AS BIGINT) * 1000000)
        |      // CAST(floor(ln(CAST(g.i + 1 AS DOUBLE)) * 1000000.0 + 0.5)
        |        AS BIGINT) AS rmicro
        |  FROM generate_series(1, 20) AS g(i)),
        |fl AS (SELECT l.anchor_id, l.rank AS pos, coalesce(r.g, 0) AS g
        |  FROM lex l LEFT JOIN relg r ON l.anchor_id = r.anchor_id AND l.doc_id = r.doc_id),
        |dcg AS (SELECT anchor_id,
        |    CAST(sum(((1 << g) - 1) * d.rmicro) AS BIGINT) AS dcg_micro
        |  FROM fl JOIN disc d USING (pos) GROUP BY anchor_id),
        |ideal AS (SELECT * FROM (SELECT anchor_id, g,
        |    CAST(row_number() OVER (PARTITION BY anchor_id ORDER BY g DESC, doc_id)
        |      AS BIGINT) AS pos FROM relg) WHERE pos <= 20),
        |idcg AS (SELECT anchor_id,
        |    CAST(sum(((1 << g) - 1) * d.rmicro) AS BIGINT) AS idcg_micro,
        |    CAST(count(*) AS BIGINT) AS n_ideal
        |  FROM ideal JOIN disc d USING (pos) GROUP BY anchor_id)
        |SELECT dcg.anchor_id, idcg.n_ideal, dcg.dcg_micro, idcg.idcg_micro,
        |  CASE WHEN idcg_micro > 0
        |    THEN CAST(dcg_micro AS DOUBLE) / CAST(idcg_micro AS DOUBLE) END AS ndcg
        |FROM dcg JOIN idcg USING (anchor_id) ORDER BY dcg.anchor_id""".stripMargin) { (s, dir) =>
      import graft.text.Retrieval
      val docs = Tables.load(s, dir, "documents")
      val ranked = SharedFrames.lexRanked(s, dir)
        .select("anchor_id", "doc_id", "rank")
      val emb = Tables.load(s, dir, "embeddings")
      val anchors = emb.filter(col("vec_id").isin(0L, 1L, 2L))
        .select(col("vec_id").as("anchor_id"), col("label").as("_al"))
      val qrels = broadcast(anchors)
        .join(emb.select(col("vec_id").as("doc_id"), col("label")),
          col("label") === col("_al") && col("doc_id") =!= col("anchor_id"))
        .select(col("anchor_id"), col("doc_id"),
          (lit(1L) + pmod(col("doc_id"), lit(3L))).as("g"))
      graft.operators.Eval.ndcgGradedAtK(ranked, qrels, "anchor_id", "doc_id", "g", k = 20)
        .orderBy("anchor_id")
    },

    // MinHash sketch calibration audit (the DQ-of-sketches loop): on every
    // LSH candidate pair, the 12-hash signature-agreement ESTIMATE of
    // Jaccard next to the exact shingle-set value and the absolute error —
    // how a pipeline validates its sketch parameters (hash count, band
    // layout) against ground truth before trusting them at full scale.
    // n_eq is an integer column-agreement count; estimate and exact are
    // each one division, rounded to 6 dp before differencing so the error
    // column is a difference of pinned values in both engines.
    Q(
      "q195_minhash_calibration",
      s"""WITH $TokCteW,
         |$ShCteW,
         |sig AS (SELECT doc_id,
         |  list_transform(generate_series(0, 11), i ->
         |    list_aggregate(list_transform(s, sh2 -> md5(i::VARCHAR || ':' || sh2)), 'min')) AS g
         |  FROM sh WHERE len(s) > 0),
         |band AS (SELECT doc_id, u.b AS band,
         |    md5(array_to_string(g[u.b*3+1 : u.b*3+3], '|')) AS bucket
         |  FROM sig, unnest(generate_series(0, 3)) AS u(b)),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM band a JOIN band b ON a.band = b.band AND a.bucket = b.bucket
         |    AND a.doc_id < b.doc_id),
         |st AS (SELECT doc_id, list_distinct(s) AS ds FROM sh),
         |eq AS (SELECT c.id_a, c.id_b,
         |    CAST(len(list_filter(generate_series(1, 12), i -> x.g[i] = y.g[i])) AS BIGINT)
         |      AS n_eq,
         |    round(len(list_intersect(p.ds, q.ds)) * 1.0
         |      / (len(p.ds) + len(q.ds) - len(list_intersect(p.ds, q.ds))), 6) AS jaccard
         |  FROM cand c JOIN sig x ON x.doc_id = c.id_a JOIN sig y ON y.doc_id = c.id_b
         |    JOIN st p ON p.doc_id = c.id_a JOIN st q ON q.doc_id = c.id_b)
         |SELECT id_a, id_b, n_eq, round(n_eq / 12.0, 6) AS est, jaccard,
         |  round(abs(round(n_eq / 12.0, 6) - jaccard), 6) AS abs_err
         |FROM eq ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      import graft.dedup.{MinHashLsh, NGramJaccard}
      val docs = Tables.load(s, dir, "documents")
      val cands = MinHashLsh.candidatePairs(docs, "doc_id", "text", 3, 12, 4)
      val exact = NGramJaccard.verifyPairs(cands, docs, "doc_id", "text", 3)
        .withColumn("jaccard", round(col("jaccard"), 6))
      val sig = MinHashLsh.signatureTable(docs, "doc_id", "text", 3, 12)
      val sa = sig.select(
        col("doc_id").as("id_a") +: (0 until 12).map(i => col(s"_h$i").as(s"_a$i")): _*)
      val sb = sig.select(
        col("doc_id").as("id_b") +: (0 until 12).map(i => col(s"_h$i").as(s"_b$i")): _*)
      val nEq = (0 until 12)
        .map(i => when(col(s"_a$i") === col(s"_b$i"), 1L).otherwise(0L))
        .reduce(_ + _)
      exact.join(sa, "id_a").join(sb, "id_b")
        .withColumn("n_eq", nEq)
        .withColumn("est", round(col("n_eq") / 12.0, 6))
        .withColumn("abs_err", round(abs(col("est") - col("jaccard")), 6))
        .select("id_a", "id_b", "n_eq", "est", "jaccard", "abs_err")
        .orderBy("id_a", "id_b")
    },

    // BPE merge TRAINING, three full rounds (Vocab.bpeTrain; q159 counts
    // round 0's pairs, this gate runs the whole count → argmax → apply
    // loop): the learned merge list, where rounds 2-3's counts gate round
    // 1-2's merge APPLICATION deeply — a wrong apply shifts every later
    // count. Merge application is windowed position arithmetic on the
    // distinct-word table (Heaps'-law state, never the token stream); the
    // oracle unrolls the identical algebra per round.
    Q(
      "q196_bpe_train",
      s"""WITH tt AS (SELECT u.tok AS tok
         |  FROM (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
         |    unnest(t) AS u(tok)),
         |wt AS (SELECT tok AS wid, CAST(count(*) AS BIGINT) AS tf FROM tt GROUP BY tok),
         |p0 AS (SELECT wid, tf, CAST(i.i AS BIGINT) AS pos, substr(wid, i.i, 1) AS sym
         |  FROM wt, unnest(generate_series(1, len(wid))) AS i(i)),
         |${bpeRound(1)},
         |${bpeRound(2)},
         |${bpeRound(3)}
         |SELECT * FROM (
         |  SELECT 1 AS iter, a AS lsym, b AS rsym, n FROM b1
         |  UNION ALL SELECT 2, a, b, n FROM b2
         |  UNION ALL SELECT 3, a, b, n FROM b3)
         |ORDER BY iter""".stripMargin) { (s, dir) =>
      graft.text.Vocab.bpeTrain(Tables.load(s, dir, "documents"), "text", iterations = 3)
        .orderBy("iter")
    },

    // Delete-one-fold jackknife SE of mean order value
    // (RobustStats.jackknifeMeanSe): the error bar a metrics pipeline
    // attaches to scorecard figures in the SAME pass — hash folds
    // (md5 mod 10, reproducible under any layout), leave-one-out means as
    // exact integer floor quotients in micro-cents, the deviation sum in
    // decimal(38,0) (k·Σθ² − (Σθ)², order-free), ONE double conversion
    // into IEEE sqrt (correctly rounded by spec — not a libm log).
    Q(
      "q197_jackknife_se",
      """WITH c AS (SELECT o_orderkey, CAST(o_totalprice * 100 AS BIGINT) AS cents FROM orders),
        |f AS (SELECT CAST(CAST('0x' || substr(md5(o_orderkey::VARCHAR), 1, 4) AS INT) % 10
        |    AS INT) AS fold, cents FROM c),
        |p AS (SELECT fold, CAST(count(*) AS BIGINT) AS ni, CAST(sum(cents) AS BIGINT) AS si
        |      FROM f GROUP BY fold),
        |t AS (SELECT CAST(sum(ni) AS BIGINT) AS n, CAST(sum(si) AS BIGINT) AS s FROM p),
        |th AS (SELECT ((s - si) * 1000000) // (n - ni) AS th FROM p CROSS JOIN t),
        |a AS (SELECT CAST(sum(CAST(th AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS t1,
        |             CAST(sum(CAST(th AS DECIMAL(38,0)) * CAST(th AS DECIMAL(38,0)))
        |               AS DECIMAL(38,0)) AS t2 FROM th)
        |SELECT t.n,
        |  round(CAST((t.s * 1000000) // t.n AS DOUBLE) / 100000000.0, 6) AS mean_price,
        |  round(sqrt(CAST(10 * t2 - t1 * t1 AS DOUBLE) * 9.0 / 100.0) / 100000000.0, 6)
        |    AS se_price
        |FROM a CROSS JOIN t ORDER BY n""".stripMargin) { (s, dir) =>
      // round-then-cast matches DuckDB's rounding double->BIGINT cast (the
      // q177 cents precedent); a bare .cast("long") truncates and drifts
      val cents = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      graft.operators.RobustStats.jackknifeMeanSe(cents, "cents", "o_orderkey", folds = 10)
        .select(col("n"),
          round(col("mean_micro").cast("double") / 100000000.0, 6).as("mean_price"),
          round(col("se_micro") / 100000000.0, 6).as("se_price"))
        .orderBy("n")
    },

    // BPE compression audit (Vocab.bpeCompressionStats): tf-weighted
    // symbol count + distinct-symbol count of the corpus after each
    // training round, round 0 = the character baseline. Each row gates the
    // whole round-k STATE table (q196 gates only the argmaxes); the
    // round-over-round token drop equals the APPLIED merge count, so the
    // greedy non-overlap rule is pinned too.
    Q(
      "q198_bpe_compression",
      s"""WITH tt AS (SELECT u.tok AS tok
         |  FROM (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
         |    unnest(t) AS u(tok)),
         |wt AS (SELECT tok AS wid, CAST(count(*) AS BIGINT) AS tf FROM tt GROUP BY tok),
         |p0 AS (SELECT wid, tf, CAST(i.i AS BIGINT) AS pos, substr(wid, i.i, 1) AS sym
         |  FROM wt, unnest(generate_series(1, len(wid))) AS i(i)),
         |${bpeRound(1)},
         |${bpeRound(2)},
         |${bpeRound(3)}
         |SELECT * FROM (
         |  SELECT 0 AS iter, CAST(sum(tf) AS BIGINT) AS corpus_tokens,
         |    CAST(count(DISTINCT sym) AS BIGINT) AS distinct_syms FROM p0
         |  UNION ALL SELECT 1, CAST(sum(tf) AS BIGINT), CAST(count(DISTINCT sym) AS BIGINT)
         |    FROM p1
         |  UNION ALL SELECT 2, CAST(sum(tf) AS BIGINT), CAST(count(DISTINCT sym) AS BIGINT)
         |    FROM p2
         |  UNION ALL SELECT 3, CAST(sum(tf) AS BIGINT), CAST(count(DISTINCT sym) AS BIGINT)
         |    FROM p3)
         |ORDER BY iter""".stripMargin) { (s, dir) =>
      graft.text.Vocab.bpeCompressionStats(
        Tables.load(s, dir, "documents"), "text", iterations = 3)
        .orderBy("iter")
    })
}
