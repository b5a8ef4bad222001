package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Round-8 scale-operator gates: substring-level duplication coverage,
  * the bucketed interval-overlap join, recall@k retrieval coverage,
  * leakage-safe group k-fold assignment, and the mergeable histogram
  * quantile sketch. Each pairs a Spark-first operator
  * ([[graft.dedup.SubstringDup]], [[graft.operators.IntervalJoin]],
  * [[graft.operators.Eval]], [[graft.load.Splits]],
  * [[graft.operators.HistogramSketch]]) with a DuckDB oracle replaying the
  * identical integer arithmetic.
  */
object ScaleOpsQueries {

  def all: Seq[Q] = Seq(

    // Per-document duplicated-8-gram token coverage
    // (SubstringDup.dupNgramCoverage) — the substring-level dedup metric
    // document-level dedup can't see: what fraction of each doc's tokens
    // sit inside a token 8-gram that occurs ≥ 2 times corpus-wide.
    // Positions, counts and the merged-interval union are exact integers;
    // cov_micro is one integer div.
    Q(
      "q286_dup_ngram_cov",
      """WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
        |g AS (SELECT doc_id, CAST(i AS BIGINT) AS pos, array_to_string(t[i:i+7], ' ') AS gram
        |      FROM tok, unnest(generate_series(1, len(t) - 7)) AS s(i)),
        |dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
        |h AS (SELECT doc_id, pos, pos + 7 AS e FROM g JOIN dup USING (gram)),
        |m AS (SELECT doc_id, pos, e,
        |        max(e) OVER (PARTITION BY doc_id ORDER BY pos
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |      FROM h),
        |cov AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_grams,
        |          CAST(sum(greatest(0, e - greatest(pos - 1, coalesce(pmax, 0)))) AS BIGINT)
        |            AS dup_tokens
        |        FROM m GROUP BY doc_id)
        |SELECT tok.doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
        |  CAST(coalesce(dup_tokens, 0) AS BIGINT) AS dup_tokens,
        |  CAST(CASE WHEN len(t) = 0 THEN 0
        |       ELSE (coalesce(dup_tokens, 0) * 1000000) // len(t) END AS BIGINT) AS cov_micro
        |FROM tok LEFT JOIN cov USING (doc_id) ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.dedup.SubstringDup
        .dupNgramCoverage(Tables.load(s, dir, "documents"), "doc_id", "text", n = 8)
        .orderBy("doc_id")
    },

    // Interval-overlap join (IntervalJoin.overlapJoin, 16-day grain):
    // lineitem ship intervals [shipdate, shipdate + suppkey%14 days]
    // against 43 fixed 10-day audit windows — per window, overlap count
    // and quantity. The oracle runs the plain non-equi join; the Spark
    // side must reproduce it through the bucketed equi-join (no cartesian
    // — PlanSpec-gated).
    Q(
      "q287_interval_join",
      """WITH li AS (SELECT
        |    date_diff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE)) AS ls,
        |    date_diff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE)) + l_suppkey % 14 AS le,
        |    CAST(l_quantity AS BIGINT) AS qty
        |  FROM lineitem),
        |w AS (SELECT CAST(i AS BIGINT) AS w, CAST(i * 60 AS BIGINT) AS ws,
        |        CAST(i * 60 + 9 AS BIGINT) AS we
        |      FROM generate_series(0, 42) AS g(i)),
        |j AS (SELECT w.w, CAST(count(*) AS BIGINT) AS n_overlap,
        |        CAST(sum(qty) AS BIGINT) AS sum_qty
        |      FROM w JOIN li ON li.ls <= w.we AND w.ws <= li.le GROUP BY 1)
        |SELECT w.w, w.ws, w.we,
        |  CAST(coalesce(n_overlap, 0) AS BIGINT) AS n_overlap,
        |  CAST(coalesce(sum_qty, 0) AS BIGINT) AS sum_qty
        |FROM w LEFT JOIN j USING (w) ORDER BY w""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .select(
          datediff(col("l_shipdate"), lit("1995-01-01").cast("date")).cast("long").as("ls"),
          (datediff(col("l_shipdate"), lit("1995-01-01").cast("date")).cast("long") +
            col("l_suppkey") % 14).as("le"),
          col("l_quantity").cast("long").as("qty"))
      val win = s.range(43).select(
        col("id").as("w"), (col("id") * 60).as("ws"), (col("id") * 60 + 9).as("we"))
      val pairs = graft.operators.IntervalJoin
        .overlapJoin(li, "ls", "le", win, "ws", "we", grain = 16L)
        .groupBy("w").agg(count(lit(1)).as("_n"), sum("qty").as("_q"))
      win.join(pairs, Seq("w"), "left")
        .select(
          col("w"), col("ws"), col("we"),
          coalesce(col("_n"), lit(0L)).as("n_overlap"),
          coalesce(col("_q"), lit(0L)).as("sum_qty"))
        .orderBy("w")
    },

    // Recall@5 / recall@20 (Eval.recallAtK) of q194's lexical ranking
    // against embedding-label relevance — the coverage readout P@k/AP
    // don't give: of the n_rel relevant docs, how many the top-k list
    // caught at all. Integer hit counts; each recall is one final
    // division.
    Q(
      "q288_recall_at_k",
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
        |ag AS (SELECT anchor_id,
        |    CAST(sum(CASE WHEN rel AND rank <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS hits_at_5,
        |    CAST(sum(CASE WHEN rel AND rank <= 20 THEN 1 ELSE 0 END) AS BIGINT) AS hits_at_20
        |  FROM fl GROUP BY 1)
        |SELECT ag.anchor_id, rt.n_rel, ag.hits_at_5,
        |  CASE WHEN n_rel > 0 THEN CAST(hits_at_5 AS DOUBLE) / CAST(n_rel AS DOUBLE) END
        |    AS recall_at_5,
        |  ag.hits_at_20,
        |  CASE WHEN n_rel > 0 THEN CAST(hits_at_20 AS DOUBLE) / CAST(n_rel AS DOUBLE) END
        |    AS recall_at_20
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
      graft.operators.Eval
        .recallAtK(ranked, rel, rt, "anchor_id", "doc_id", ks = Seq(5, 20))
        .orderBy("anchor_id")
    },

    // Leakage-safe GROUP 5-fold assignment (Splits.groupKFold on
    // l_suppkey): every lineitem of a supplier lands in the same fold, so
    // a per-entity row cluster can never straddle a train/test boundary.
    // Readout per fold: rows, distinct groups, quantity mass.
    Q(
      "q289_group_kfold",
      """SELECT
        |  CAST(CAST('0x' || substr(md5(CAST(l_suppkey AS VARCHAR)), 1, 6) AS BIGINT) % 5
        |    AS BIGINT) AS fold,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_groups,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem GROUP BY 1 ORDER BY fold""".stripMargin) { (s, dir) =>
      graft.load.Splits
        .groupKFold(Tables.load(s, dir, "lineitem"), col("l_suppkey"), k = 5)
        .groupBy("fold")
        .agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col("l_suppkey")).as("n_groups"),
          sum(col("l_quantity").cast("long")).as("sum_qty"))
        .orderBy("fold")
    },

    // Histogram quantile sketch (HistogramSketch.quantileEdges): p50/p95/
    // p99 of line-item price in cents at $1000-bin resolution — the
    // one-pass mergeable telemetry shape; the reported bin edges and
    // cumulative counts are exact integers the oracle rebuilds
    // bit-identically.
    Q(
      "q290_hist_quantiles",
      """WITH v AS (SELECT CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS c
        |           FROM lineitem),
        |b AS (SELECT c // 100000 AS bin, CAST(count(*) AS BIGINT) AS cnt FROM v GROUP BY 1),
        |cum AS (SELECT bin,
        |          CAST(sum(cnt) OVER (ORDER BY bin) AS BIGINT) AS cum_le,
        |          CAST(sum(cnt) OVER () AS BIGINT) AS n
        |        FROM b),
        |q AS (SELECT CAST(i AS BIGINT) AS q_permille FROM unnest([500, 950, 990]) AS t(i)),
        |sel AS (SELECT q_permille, min(bin) AS bin
        |        FROM cum JOIN q ON 1000 * cum_le >= q_permille * n GROUP BY 1)
        |SELECT sel.q_permille, sel.bin,
        |  CAST(sel.bin * 100000 AS BIGINT) AS lo,
        |  CAST(sel.bin * 100000 + 99999 AS BIGINT) AS hi,
        |  c2.cum_le, c2.n
        |FROM sel JOIN cum c2 ON sel.bin = c2.bin ORDER BY q_permille""".stripMargin) { (s, dir) =>
      val cents = Tables.load(s, dir, "lineitem")
        .select(expr("CAST(floor(l_extendedprice * 100.0 + 0.5) AS LONG)").as("c"))
      graft.operators.HistogramSketch
        .quantileEdges(cents, "c", width = 100000L, quantilesPermille = Seq(500, 950, 990))
        .withColumn("q_permille", col("q_permille").cast("long"))
        .orderBy("q_permille")
    },

    // Keep-BEST-per-cluster (DupClusters.keepBest) over the q81 MinHash
    // component graph: within each near-dup cluster the longest doc
    // (n_chars, tie → smallest id) survives — the curation survivor
    // policy, vs q82's min-id canonical. Rolled up by language with the
    // kept character mass.
    Q(
      "q291_dedup_keep_best",
      s"""WITH RECURSIVE ${CurationQueries.MinhashComponentCtes},
         |mq AS (SELECT comp.node, comp.component, d.n_chars
         |       FROM comp JOIN documents d ON d.doc_id = comp.node),
         |win AS (SELECT node FROM (
         |         SELECT node, row_number() OVER (
         |             PARTITION BY component ORDER BY n_chars DESC, node ASC) AS rn
         |         FROM mq) WHERE rn = 1),
         |losers AS (SELECT node FROM mq WHERE node NOT IN (SELECT node FROM win))
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
         |FROM documents WHERE doc_id NOT IN (SELECT node FROM losers)
         |GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val comp = CurationQueries.minhashComponents(s, dir)
      graft.dedup.DupClusters.keepBest(docs, "doc_id", "n_chars", comp)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy("lang")
    },

    // Token-distribution Shannon entropy per doc
    // (TextAnalysis.tokenEntropy, pinned micro-nats): the information-
    // density quality signal — h_micro = lnµ(n) − (Σ c·lnµ(c)) div n with
    // one pinned ln per (doc, type) row; h_norm the single final
    // division.
    Q(
      "q292_token_entropy",
      """WITH tok AS (SELECT doc_id, u.tok AS t
        |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts FROM documents),
        |    unnest(ts) AS u(tok)),
        |tf AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2),
        |tf2 AS (SELECT doc_id, c,
        |         CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS lnc
        |       FROM tf),
        |ag AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |         CAST(count(*) AS BIGINT) AS n_types,
        |         CAST(sum(c * lnc) AS BIGINT) AS s
        |       FROM tf2 GROUP BY 1),
        |ag2 AS (SELECT doc_id, n_tokens, n_types, s,
        |         CAST(floor(ln(CAST(n_tokens AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS lnn
        |       FROM ag)
        |SELECT d.doc_id,
        |  CAST(coalesce(n_tokens, 0) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(n_types, 0) AS BIGINT) AS n_types,
        |  CAST(coalesce(lnn - (s // n_tokens), 0) AS BIGINT) AS h_micro,
        |  CASE WHEN n_tokens > 1 THEN
        |    CAST(lnn - (s // n_tokens) AS DOUBLE) / CAST(lnn AS DOUBLE) END AS h_norm
        |FROM documents d LEFT JOIN ag2 USING (doc_id) ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      graft.text.TextAnalysis
        .tokenEntropy(Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    // Expanding-window time-series CV folds (Splits.timeSeriesFolds):
    // orders cut into 6 equal-count temporal chunks; fold f trains on
    // chunks 1..f, tests on chunk f+1. The fold summary carries the
    // rolling-origin boundaries plus the boundary-tie leak count; the
    // ntile is GlobalRank's range-exchange (no single-partition window —
    // PlanSpec-gated).
    Q(
      "q293_ts_cv_folds",
      """WITH r AS (SELECT CAST(o_orderdate AS DATE) AS t, o_orderkey,
        |    ntile(6) OVER (ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS chunk
        |  FROM orders),
        |c AS (SELECT chunk, CAST(count(*) AS BIGINT) AS n, min(t) AS mn, max(t) AS mx
        |      FROM r GROUP BY 1),
        |f AS (SELECT CAST(i AS BIGINT) AS fold FROM generate_series(1, 5) AS g(i)),
        |tr AS (SELECT fold, CAST(sum(n) AS BIGINT) AS n_train, max(mx) AS train_end
        |       FROM f JOIN c ON c.chunk <= f.fold GROUP BY 1),
        |te AS (SELECT fold, n AS n_test, mn AS test_start, mx AS test_end
        |       FROM f JOIN c ON c.chunk = f.fold + 1),
        |ti AS (SELECT tr.fold, CAST(count(*) AS BIGINT) AS n_boundary_ties
        |       FROM tr JOIN r ON r.chunk = tr.fold + 1 AND r.t = tr.train_end
        |       GROUP BY 1)
        |SELECT tr.fold, tr.n_train, tr.train_end, te.n_test, te.test_start,
        |  te.test_end, CAST(coalesce(ti.n_boundary_ties, 0) AS BIGINT) AS n_boundary_ties
        |FROM tr JOIN te USING (fold) LEFT JOIN ti USING (fold)
        |ORDER BY fold""".stripMargin) { (s, dir) =>
      val orders = Tables.load(s, dir, "orders")
        .select(col("o_orderdate").cast("date").as("t"), col("o_orderkey"))
      graft.operators.Splits
        .timeSeriesFolds(orders, Seq("t", "o_orderkey"), k = 5)
        .orderBy("fold")
    },

    // Corpus-centroid embedding outliers (Similarity.centroidOutliers):
    // the 20 vectors farthest (exact integer micro-d²) from the corpus
    // mean — the off-distribution curation filter. Centroid = per-dim
    // truncating quotient of a decimal-safe sum; top-k is a TakeOrdered,
    // not a global sort.
    Q(
      "q294_embed_outliers",
      """WITH vm AS (SELECT vec_id, label,
        |    list_transform(embedding,
        |      v -> CAST(floor(CAST(v AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS m
        |  FROM embeddings),
        |e AS (SELECT vec_id, i, m[i] AS v
        |      FROM vm, unnest(generate_series(1, len(m))) AS s(i)),
        |c AS (SELECT i, CAST(CAST(sum(v) AS BIGINT) // CAST(count(*) AS BIGINT)
        |        AS BIGINT) AS c
        |      FROM e GROUP BY 1),
        |d AS (SELECT e.vec_id, CAST(sum((e.v - c.c) * (e.v - c.c)) AS BIGINT) AS d2
        |      FROM e JOIN c USING (i) GROUP BY 1)
        |SELECT vm.vec_id, vm.label, d.d2
        |FROM d JOIN vm USING (vec_id)
        |ORDER BY d2 DESC, vec_id LIMIT 20""".stripMargin) { (s, dir) =>
      graft.sim.Similarity
        .centroidOutliers(
          Tables.load(s, dir, "embeddings"), "vec_id", "embedding", topK = 20)
        .select("vec_id", "label", "d2")
        .orderBy(col("d2").desc, col("vec_id"))
    },

    // Split-conformal prediction intervals (Conformal.splitConformal,
    // alpha = 10%): md5 2/1/1 train/cal/test split of lineitem by row id,
    // per-returnflag train-mean predictor, qhat = exact
    // ceil((n_cal+1)·0.9)-th smallest calibration residual (GlobalRank
    // order statistic — no per-group window), and the held-out coverage
    // readout.
    Q(
      "q295_conformal",
      """WITH b AS (SELECT l_returnflag AS g,
        |    CAST(floor(CAST(l_quantity AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS y6,
        |    l_orderkey * 8 + l_linenumber AS id,
        |    CAST('0x' || substr(md5(CAST(l_orderkey * 8 + l_linenumber AS VARCHAR)), 1, 6)
        |      AS BIGINT) % 4 AS h
        |  FROM lineitem),
        |mu AS (SELECT g, CAST(count(*) AS BIGINT) AS n_train,
        |    CAST(CAST(sum(y6) AS HUGEINT) // count(*) AS BIGINT) AS mu_micro
        |  FROM b WHERE h < 2 GROUP BY 1),
        |cal AS (SELECT b.g, abs(b.y6 - mu.mu_micro) AS r, b.id
        |        FROM b JOIN mu ON b.g = mu.g WHERE b.h = 2),
        |cr AS (SELECT g, r, row_number() OVER (PARTITION BY g ORDER BY r, id) AS rk
        |       FROM cal),
        |cn AS (SELECT g, CAST(count(*) AS BIGINT) AS n_cal,
        |         CAST(((count(*) + 1) * 900 + 999) // 1000 AS BIGINT) AS k_idx
        |       FROM cal GROUP BY 1),
        |q AS (SELECT cn.g, cn.n_cal, cn.k_idx, cr.r AS qhat
        |      FROM cn LEFT JOIN cr ON cr.g = cn.g AND cr.rk = cn.k_idx),
        |te AS (SELECT b.g, CAST(count(*) AS BIGINT) AS n_test,
        |         CAST(CASE WHEN max(q.qhat) IS NOT NULL THEN
        |             sum(CASE WHEN abs(b.y6 - mu.mu_micro) <= q.qhat
        |                 THEN 1 ELSE 0 END) END AS BIGINT) AS n_covered
        |       FROM b JOIN mu ON b.g = mu.g JOIN q ON b.g = q.g
        |       WHERE b.h = 3 GROUP BY b.g)
        |SELECT mu.g AS l_returnflag, mu.n_train, mu.mu_micro, q.n_cal, q.k_idx,
        |  q.qhat, te.n_test, te.n_covered,
        |  CAST(te.n_covered AS DOUBLE) / CAST(te.n_test AS DOUBLE) AS coverage
        |FROM mu JOIN q ON mu.g = q.g JOIN te ON mu.g = te.g
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .select(
          col("l_returnflag"), col("l_quantity"),
          (col("l_orderkey") * 8 + col("l_linenumber")).as("_id"))
      graft.operators.Conformal
        .splitConformal(li, Seq("l_returnflag"), "l_quantity", "_id",
          alphaPermille = 100)
        .orderBy("l_returnflag")
    },

    // Binary-segmentation changepoint (TimeSeries.changepointBss) on the
    // per-priority daily order-count series: the exact-integer BSS argmax
    // — q200's CUSUM numerator with the t·(n−t) normalization that
    // removes the mid-series bias. Ties break to the earliest split.
    Q(
      "q297_changepoint_bss",
      """WITH s AS (SELECT o_orderpriority AS grp, CAST(o_orderdate AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM orders GROUP BY 1, 2),
        |w AS (SELECT grp, day, y,
        |    CAST(row_number() OVER pw AS BIGINT) AS t,
        |    CAST(sum(y) OVER (PARTITION BY grp ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c,
        |    CAST(count(*) OVER (PARTITION BY grp) AS BIGINT) AS n,
        |    CAST(sum(y) OVER (PARTITION BY grp) AS BIGINT) AS s
        |  FROM s WINDOW pw AS (PARTITION BY grp ORDER BY day)),
        |g AS (SELECT grp, day, t, n, c, s,
        |    CAST((CAST(n * c - t * s AS HUGEINT) * CAST(n * c - t * s AS HUGEINT))
        |      // CAST(t * (n - t) AS HUGEINT) AS BIGINT) AS bss
        |  FROM w WHERE t < n),
        |b AS (SELECT grp, t, day, bss, c, n, s,
        |    row_number() OVER (PARTITION BY grp ORDER BY bss DESC, t) AS rn
        |  FROM g)
        |SELECT grp AS o_orderpriority, n, t AS t_star, day AS at_order, bss,
        |  CAST((c * 1000000) // t AS BIGINT) AS mean_left_micro,
        |  CAST(((s - c) * 1000000) // (n - t) AS BIGINT) AS mean_right_micro
        |FROM b WHERE rn = 1 ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val daily = Tables.load(s, dir, "orders")
        .groupBy(
          col("o_orderpriority"),
          col("o_orderdate").cast("date").as("day"))
        .agg(count(lit(1)).as("y"))
      graft.operators.TimeSeries
        .changepointBss(daily, Seq("o_orderpriority"), "day", "y")
        .orderBy("o_orderpriority")
    }
  )
}
