package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Experimentation + feature-prep operators (round 7 continuation):
  * CUPED variance reduction, CUSUM change-point, chi-squared independence
  * with Cramér's V, the Kolmogorov-Smirnov separation statistic,
  * leave-one-out target encoding, equal-frequency binning, synchronous
  * label-propagation communities, and association rules — the A/B-test
  * and feature-engineering surface of the warehouse. Determinism rules
  * as elsewhere: exact integer/decimal sums everywhere a reduction
  * happens, closed-form doubles only at the very end, pinned to 6 dp
  * (or emitted as exact integer micro-units).
  */
object ExperimentQueries {

  private val pin6 = (c: org.apache.spark.sql.Column) =>
    (floor(c * lit(1000000.0) + lit(0.5)).cast("double") / lit(1000000.0))

  /** Bigram co-occurrence edges (the q185 graph): distinct undirected
    * word pairs appearing adjacently ≥ 5 times corpus-wide.
    */
  private[queries] val EdgeCte =
    """tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
      |bg AS (SELECT t[i] || ' ' || t[i+1] AS gram
      |       FROM tok, unnest(generate_series(1, len(t) - 1)) AS g(i)),
      |pc AS (SELECT gram, count(*) AS n FROM bg GROUP BY gram),
      |ed AS (SELECT DISTINCT
      |         least(split_part(gram, ' ', 1), split_part(gram, ' ', 2)) AS a,
      |         greatest(split_part(gram, ' ', 1), split_part(gram, ' ', 2)) AS b
      |       FROM pc
      |       WHERE n >= 5 AND split_part(gram, ' ', 1) != split_part(gram, ' ', 2)),
      |s0 AS (SELECT a AS s, b AS d FROM ed UNION ALL SELECT b, a FROM ed)""".stripMargin

  def all: Seq[Q] = Seq(

    // CUPED adjusted means (Experiment.cuped): units = customers, variant =
    // md5 hash bit (the q197 fold recipe), Y = lifetime order spend, X =
    // account balance as the pre-period covariate. Per-variant n/Σ and the
    // pooled cross-moments are exact HUGEINT/decimal sums from one pass;
    // θ, the adjusted means, and ρ² are the same closed-form double
    // expression tree in both engines, pinned at 6 dp.
    Q(
      "q199_cuped",
      """WITH sp AS (SELECT o_custkey,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend
        |  FROM orders GROUP BY 1),
        |u AS (SELECT
        |    CAST(CAST('0x' || substr(md5(c_custkey::VARCHAR), 1, 4) AS INT) % 2 AS INT)
        |      AS variant,
        |    COALESCE(sp.spend, 0) AS y,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS x
        |  FROM customer LEFT JOIN sp ON c_custkey = o_custkey),
        |g AS (SELECT variant, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
        |    CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
        |    CAST(sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT) AS sxy,
        |    CAST(sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS HUGEINT) AS sxx,
        |    CAST(sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT) AS syy
        |  FROM u GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS HUGEINT) AS tn, CAST(sum(sy) AS HUGEINT) AS tsy,
        |    CAST(sum(sx) AS HUGEINT) AS tsx, CAST(sum(sxy) AS HUGEINT) AS tsxy,
        |    CAST(sum(sxx) AS HUGEINT) AS tsxx, CAST(sum(syy) AS HUGEINT) AS tsyy FROM g),
        |e AS (SELECT variant, n,
        |    CAST(tn * tsxy - tsx * tsy AS DOUBLE) AS covn,
        |    CAST(tn * tsxx - tsx * tsx AS DOUBLE) AS vxn,
        |    CAST(tn * tsyy - tsy * tsy AS DOUBLE) AS vyn,
        |    CAST(sy AS DOUBLE) / CAST(1 * n AS DOUBLE) AS my,
        |    CAST(sx AS DOUBLE) / CAST(1 * n AS DOUBLE) AS mx,
        |    CAST(tsx AS DOUBLE) / CAST(1 * tn AS DOUBLE) AS mxp
        |  FROM g CROSS JOIN t)
        |SELECT variant, n,
        |  floor(my / 100.0 * 1000000.0 + 0.5) / 1000000.0 AS mean_y,
        |  floor((my - (covn / vxn) * (mx - mxp)) / 100.0 * 1000000.0 + 0.5) / 1000000.0
        |    AS mean_y_adj,
        |  floor((covn / vxn) * 1000000.0 + 0.5) / 1000000.0 AS theta,
        |  floor((covn / vxn) * (covn / vyn) * 1000000.0 + 0.5) / 1000000.0 AS rho2
        |FROM e ORDER BY variant""".stripMargin) { (s, dir) =>
      val spend = Tables.load(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("_spend"))
      val units = Tables.load(s, dir, "customer")
        .join(spend, col("c_custkey") === col("o_custkey"), "left")
        .select(
          (conv(substring(md5(col("c_custkey").cast("string")), 1, 4), 16, 10)
            .cast("int") % 2).as("variant"),
          coalesce(col("_spend"), lit(0L)).as("y"),
          round(col("c_acctbal") * 100, 0).cast("long").as("x"))
      graft.operators.Experiment.cuped(units, "variant", "y", "x", scale = 1)
        .select(col("variant"), col("n"),
          pin6(col("mean_y") / 100.0).as("mean_y"),
          pin6(col("mean_y_adj") / 100.0).as("mean_y_adj"),
          pin6(col("theta")).as("theta"),
          pin6(col("rho2")).as("rho2"))
        .orderBy("variant")
    },

    // CUSUM change-point per order priority (TimeSeries.cusumChangePoint)
    // over the daily-revenue series: the argmax of the EXACT integer
    // |n·C_t − t·S| — no fp anywhere until the one pinned shift_norm
    // division; ties take the earliest day. The oracle replays the
    // identical integer algebra through window sums (CAST back to BIGINT —
    // DuckDB window sums widen to HUGEINT, the q113 lesson).
    Q(
      "q200_cusum",
      """WITH d AS (SELECT o_orderpriority AS priority, o_orderdate AS dt,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
        |  FROM orders GROUP BY 1, 2),
        |w AS (SELECT priority, dt, v,
        |    CAST(row_number() OVER (PARTITION BY priority ORDER BY dt) AS BIGINT) AS t,
        |    CAST(sum(v) OVER (PARTITION BY priority ORDER BY dt) AS BIGINT) AS c,
        |    CAST(count(*) OVER (PARTITION BY priority) AS BIGINT) AS n,
        |    CAST(sum(v) OVER (PARTITION BY priority) AS BIGINT) AS s
        |  FROM d),
        |x AS (SELECT priority, n, t, dt, CAST(abs(n * c - t * s) AS BIGINT) AS dd FROM w),
        |b AS (SELECT priority, CAST(max(dd) AS BIGINT) AS dmax FROM x GROUP BY 1),
        |a AS (SELECT x.priority, min(t) AS t_star
        |      FROM x JOIN b ON x.priority = b.priority AND x.dd = b.dmax GROUP BY 1)
        |SELECT x.priority, x.n, x.t AS t_star, CAST(x.dt AS VARCHAR) AS at_order,
        |  x.dd AS d_abs,
        |  CAST(floor(CAST(x.dd AS DOUBLE) / (CAST(x.n AS DOUBLE) * CAST(x.n AS DOUBLE))
        |    * 1000000.0 + 0.5) AS BIGINT) AS shift_norm_micro
        |FROM x JOIN a ON x.priority = a.priority AND x.t = a.t_star
        |ORDER BY x.priority""".stripMargin) { (s, dir) =>
      val daily = Tables.load(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("priority"), col("o_orderdate").as("dt"))
        .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("v"))
      graft.operators.TimeSeries
        .cusumChangePoint(daily, Seq("priority"), "dt", "v")
        .select(col("priority"), col("n"), col("t_star"),
          col("at_order").cast("string").as("at_order"),
          col("d_abs"), col("shift_norm_micro"))
        .orderBy("priority")
    },

    // Chi-squared independence of market segment × order priority
    // (Experiment.chiSquared): exact cell/marginal counts, per-cell
    // (N·n−r·c)²/(N·r·c) pinned to integer micro-units BEFORE the sum (an
    // order-free integer total where a double sum would drift), Cramér's V
    // from one IEEE sqrt.
    Q(
      "q201_chi_squared",
      """WITH f AS (SELECT c_mktsegment AS x, o_orderpriority AS y
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |cells AS (SELECT x, y, CAST(count(*) AS BIGINT) AS nxy FROM f GROUP BY 1, 2),
        |r AS (SELECT x, CAST(sum(nxy) AS BIGINT) AS rx FROM cells GROUP BY 1),
        |c AS (SELECT y, CAST(sum(nxy) AS BIGINT) AS cy FROM cells GROUP BY 1),
        |t AS (SELECT CAST(sum(nxy) AS BIGINT) AS n,
        |    CAST(count(DISTINCT x) AS BIGINT) AS n_rows,
        |    CAST(count(DISTINCT y) AS BIGINT) AS n_cols FROM cells),
        |grid AS (SELECT r.x, r.rx, c.y, c.cy, COALESCE(cells.nxy, 0) AS nxy
        |  FROM r CROSS JOIN c LEFT JOIN cells ON cells.x = r.x AND cells.y = c.y),
        |k AS (SELECT n, n_rows, n_cols,
        |    CAST(sum(CAST(floor(
        |      CAST((CAST(n AS HUGEINT) * nxy - CAST(rx AS HUGEINT) * cy)
        |         * (CAST(n AS HUGEINT) * nxy - CAST(rx AS HUGEINT) * cy) AS DOUBLE)
        |      / CAST(CAST(n AS HUGEINT) * rx * cy AS DOUBLE) * 1000000.0 + 0.5)
        |      AS BIGINT)) AS BIGINT) AS chi2_micro
        |  FROM grid CROSS JOIN t
        |  GROUP BY 1, 2, 3)
        |SELECT n, n_rows, n_cols, (n_rows - 1) * (n_cols - 1) AS dof,
        |  CAST(chi2_micro AS DOUBLE) / 1000000.0 AS chi2,
        |  floor(sqrt((CAST(chi2_micro AS DOUBLE) / 1000000.0)
        |      / (CAST(n AS DOUBLE) * CAST(least(n_rows - 1, n_cols - 1) AS DOUBLE)))
        |    * 1000000.0 + 0.5) / 1000000.0 AS cramers_v
        |FROM k""".stripMargin) { (s, dir) =>
      val f = Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      graft.operators.Experiment.chiSquared(f, "c_mktsegment", "o_orderpriority")
    },

    // Kolmogorov-Smirnov separation of order price against final-status
    // (Experiment.ksStatistic): distinct-score grain, two-pass
    // range-partitioned cumulative sums (GlobalRank — no single-partition
    // window), EXACT integer argmax |cumPos·N_neg − cumNeg·N_pos|, earliest
    // threshold on ties, one pinned division.
    Q(
      "q202_ks_stat",
      """WITH s AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS sc,
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS p FROM orders),
        |g AS (SELECT sc, CAST(sum(p) AS BIGINT) AS np,
        |    CAST(count(*) - sum(p) AS BIGINT) AS nn FROM s GROUP BY 1),
        |cu AS (SELECT sc, CAST(sum(np) OVER (ORDER BY sc) AS BIGINT) AS ip,
        |    CAST(sum(nn) OVER (ORDER BY sc) AS BIGINT) AS ic FROM g),
        |t AS (SELECT max(ip) AS n_pos, max(ic) AS n_neg FROM cu),
        |d AS (SELECT sc, CAST(abs(ip * n_neg - ic * n_pos) AS BIGINT) AS dd,
        |    n_pos, n_neg FROM cu CROSS JOIN t),
        |m AS (SELECT n_pos, n_neg, CAST(max(dd) AS BIGINT) AS dmax FROM d GROUP BY 1, 2)
        |SELECT m.n_pos, m.n_neg, min(d.sc) AS ks_score,
        |  floor(CAST(m.dmax AS DOUBLE)
        |      / CAST(CAST(m.n_pos AS HUGEINT) * CAST(m.n_neg AS HUGEINT) AS DOUBLE)
        |    * 1000000.0 + 0.5) / 1000000.0 AS ks
        |FROM d JOIN m ON d.dd = m.dmax
        |GROUP BY m.n_pos, m.n_neg, m.dmax""".stripMargin) { (s, dir) =>
      val in = Tables.load(s, dir, "orders")
        .select(round(col("o_totalprice") * 100, 0).cast("long").as("sc"),
          (col("o_orderstatus") === "F").as("lbl"))
      graft.operators.Experiment.ksStatistic(in, "lbl", "sc")
    },

    // Leave-one-out target encoding of order priority against price
    // (Encoders.looTargetEncode): each order's encoding is the exact
    // integer floor quotient (Σ_cat − y)·10⁶ div (n_cat − 1) — the
    // leakage-safe categorical feature, bit-exact in any engine; singleton
    // categories fall back to the global mean.
    Q(
      "q203_loo_encode",
      """WITH c AS (SELECT o_orderkey, o_orderpriority AS pri,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS y FROM orders),
        |g AS (SELECT CAST(sum(y) AS BIGINT) AS gsum, CAST(count(*) AS BIGINT) AS gn FROM c),
        |w AS (SELECT o_orderkey, pri, y,
        |    CAST(sum(y) OVER (PARTITION BY pri) AS BIGINT) AS csum,
        |    CAST(count(*) OVER (PARTITION BY pri) AS BIGINT) AS cn FROM c)
        |SELECT o_orderkey, pri,
        |  CASE WHEN cn > 1 THEN ((csum - y) * 1000000) // (cn - 1)
        |       ELSE (gsum * 1000000) // gn END AS loo_enc_micro
        |FROM w CROSS JOIN g ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val in = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority").as("pri"),
          round(col("o_totalprice") * 100, 0).cast("long").as("y"))
      graft.load.Encoders.looTargetEncode(in, "pri", "y", "loo_enc_micro")
        .select("o_orderkey", "pri", "loo_enc_micro")
        .orderBy("o_orderkey")
    },

    // Synchronous label-propagation communities, 2 rounds, over the q185
    // bigram co-occurrence graph (Communities.labelPropagate): every node
    // adopts its neighbors' plurality label, ties to the SMALLEST — fully
    // deterministic, no random visit order; the oracle unrolls both rounds.
    Q(
      "q204_label_prop",
      s"""WITH $EdgeCte,
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
         |         FROM v2) WHERE rn = 1)
         |SELECT node, label FROM l2 ORDER BY node""".stripMargin) { (s, dir) =>
      graft.operators.Communities
        .labelPropagate(SharedFrames.bigramEdges(s, dir), "a", "b", rounds = 2)
        .orderBy("node")
    },

    // Association rules over order baskets (MarketBasket.associationRules):
    // directional support/confidence/lift from exact distinct-basket
    // counts, low-support pairs dropped BEFORE any join, measures as exact
    // integer micro-units; top-100 by lift with a total-order tiebreak so
    // both engines cut the same boundary.
    Q(
      "q205_assoc_rules",
      """WITH bi AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem),
        |n AS (SELECT CAST(count(DISTINCT bk) AS BIGINT) AS nb FROM bi),
        |ic AS (SELECT it, CAST(count(*) AS BIGINT) AS ni FROM bi GROUP BY 1),
        |pr AS (SELECT a.it AS ante, b.it AS cons, CAST(count(*) AS BIGINT) AS n_ab
        |       FROM bi a JOIN bi b ON a.bk = b.bk AND a.it != b.it
        |       GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT ante, cons, ia.ni AS n_a, ib.ni AS n_b, n_ab,
        |  CAST(floor(CAST(n_ab AS DOUBLE) / CAST(nb AS DOUBLE) * 1000000.0 + 0.5)
        |    AS BIGINT) AS support_micro,
        |  CAST(floor(CAST(n_ab AS DOUBLE) / CAST(ia.ni AS DOUBLE) * 1000000.0 + 0.5)
        |    AS BIGINT) AS confidence_micro,
        |  CAST(floor(CAST(n_ab * nb AS DOUBLE) / CAST(ia.ni * ib.ni AS DOUBLE)
        |    * 1000000.0 + 0.5) AS BIGINT) AS lift_micro
        |FROM pr JOIN ic ia ON pr.ante = ia.it JOIN ic ib ON pr.cons = ib.it
        |CROSS JOIN n
        |ORDER BY lift_micro DESC, ante, cons LIMIT 100""".stripMargin) { (s, dir) =>
      graft.operators.MarketBasket
        .associationRules(Tables.load(s, dir, "lineitem"), "l_orderkey", "l_partkey",
          minPairCount = 2L)
        .orderBy(col("lift_micro").desc, col("ante"), col("cons"))
        .limit(100)
    },

    // Equal-frequency decile binning of order price (Encoders.quantileBin —
    // GlobalRank's two-pass ntile, never a single-partition ORDER BY
    // window), summarized per bin: the feature-discretization step, gated
    // on exact bin boundaries.
    Q(
      "q206_quantile_bin",
      """WITH c AS (SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |b AS (SELECT cents, CAST(ntile(10) OVER (ORDER BY cents, o_orderkey) AS BIGINT)
        |    AS bin FROM c)
        |SELECT bin, CAST(count(*) AS BIGINT) AS n, min(cents) AS lo, max(cents) AS hi
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin) { (s, dir) =>
      val in = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      graft.load.Encoders.quantileBin(in, "cents", Seq("o_orderkey"), buckets = 10)
        .groupBy("bin")
        .agg(count(lit(1)).as("n"), min("cents").as("lo"), max("cents").as("hi"))
        .orderBy("bin")
    },

    // Bounded-round BFS levels from the lexicographically smallest node of
    // the bigram graph (ShortestPath.bfsLevels, 3 rounds): exact integer
    // hop distances, |E|-bounded keyed joins per round; the oracle unrolls
    // the same three relax-and-min rounds.
    Q(
      "q207_bfs_levels",
      s"""WITH $EdgeCte,
         |d0 AS (SELECT min(s) AS node, CAST(0 AS BIGINT) AS dist FROM s0),
         |u1 AS (SELECT node, dist FROM d0
         |       UNION ALL SELECT s0.d, d0.dist + 1 FROM s0 JOIN d0 ON s0.s = d0.node),
         |d1 AS (SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM u1 GROUP BY 1),
         |u2 AS (SELECT node, dist FROM d1
         |       UNION ALL SELECT s0.d, d1.dist + 1 FROM s0 JOIN d1 ON s0.s = d1.node),
         |d2 AS (SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM u2 GROUP BY 1),
         |u3 AS (SELECT node, dist FROM d2
         |       UNION ALL SELECT s0.d, d2.dist + 1 FROM s0 JOIN d2 ON s0.s = d2.node),
         |d3 AS (SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM u3 GROUP BY 1)
         |SELECT node, dist FROM d3 ORDER BY node""".stripMargin) { (s, dir) =>
      val edges = SharedFrames.bigramEdges(s, dir)
      val sources = edges.agg(min(col("a")).as("node"))
      graft.operators.ShortestPath.bfsLevels(edges, "a", "b", sources, rounds = 3)
        .orderBy("node")
    },

    // Degree assortativity of the bigram graph: Pearson correlation of
    // endpoint degrees over the directed edge list — "do hubs link to
    // hubs?" (TimeSeries.groupCorr with no keys: the exact-decimal-moments
    // correlation, one pinned double at the end).
    Q(
      "q208_assortativity",
      s"""WITH $EdgeCte,
         |dg AS (SELECT s, CAST(count(*) AS BIGINT) AS deg FROM s0 GROUP BY 1),
         |pr AS (SELECT da.deg AS x, db.deg AS y
         |       FROM s0 JOIN dg da ON s0.s = da.s JOIN dg db ON s0.d = db.s),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
         |    CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
         |    CAST(sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT) AS sxy,
         |    CAST(sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS HUGEINT) AS sxx,
         |    CAST(sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT) AS syy
         |  FROM pr)
         |SELECT n,
         |  floor(CAST(n * sxy - sx * sy AS DOUBLE)
         |      / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
         |         * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
         |    * 1000000.0 + 0.5) / 1000000.0 AS corr
         |FROM m""".stripMargin) { (s, dir) =>
      val und = SharedFrames.bigramEdges(s, dir)
      val adj = und.union(und.select(col("b").as("a"), col("a").as("b")))
      val dg = adj.groupBy(col("a").as("_nd")).agg(count(lit(1)).as("deg"))
      val pairs = adj
        .join(dg.select(col("_nd").as("a"), col("deg").as("x")), "a")
        .join(dg.select(col("_nd").as("b"), col("deg").as("y")), "b")
      graft.operators.TimeSeries.groupCorr(pairs, Seq.empty, "x", "y", yScale = 1)
        .select(col("n"), pin6(col("corr")).as("corr"))
    },

    // Interpolated Kneser-Ney bigram LM (NgramLm.kneserNeyBigrams, d=3/4):
    // discounted bigram term + continuation-count interpolation, all
    // rational over exact integer counts (4c−3 / 4c(v) etc. — the dyadic
    // discount keeps libm out); top-100 bigrams by count.
    Q(
      "q209_kneser_ney",
      """WITH tok AS (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
        |bp AS (SELECT t[i] AS v, t[i+1] AS w
        |       FROM tok, unnest(generate_series(1, len(t) - 1)) AS g(i)),
        |cb AS (SELECT v, w, CAST(count(*) AS BIGINT) AS c_vw FROM bp GROUP BY 1, 2),
        |cv AS (SELECT v, CAST(sum(c_vw) AS BIGINT) AS c_v FROM cb GROUP BY 1),
        |fw AS (SELECT v, CAST(count(*) AS BIGINT) AS n1f FROM cb GROUP BY 1),
        |bk AS (SELECT w, CAST(count(*) AS BIGINT) AS n1b FROM cb GROUP BY 1),
        |tt AS (SELECT CAST(count(*) AS BIGINT) AS t FROM cb)
        |SELECT cb.v, cb.w, cb.c_vw, cv.c_v,
        |  floor((CASE WHEN 4 * c_vw - 3 > 0
        |           THEN CAST(4 * c_vw - 3 AS DOUBLE) / CAST(4 * c_v AS DOUBLE)
        |           ELSE 0.0 END
        |       + CAST(3 * n1f * n1b AS DOUBLE) / CAST(4 * c_v * t AS DOUBLE))
        |    * 1000000.0 + 0.5) / 1000000.0 AS p_kn
        |FROM cb JOIN cv USING (v) JOIN fw USING (v) JOIN bk USING (w) CROSS JOIN tt
        |ORDER BY c_vw DESC, v, w LIMIT 100""".stripMargin) { (s, dir) =>
      val sp = split(col("gram"), " ")
      graft.text.NgramLm.kneserNeyFromCounts(
        SharedFrames.bigramCounts(s, dir)
          .select(sp.getItem(0).as("v"), sp.getItem(1).as("w"), col("n").as("c_vw")))
        .select(col("v"), col("w"), col("c_vw"), col("c_v"), pin6(col("p_kn")).as("p_kn"))
        .orderBy(col("c_vw").desc, col("v"), col("w"))
        .limit(100)
    },

    // Trailing rolling z-score over daily revenue per priority
    // (TimeSeries.rollingZScore, 6-day strictly-preceding frame): exact
    // long/decimal frame sums, z emitted only on full positive-variance
    // baselines — the metric-anomaly readout.
    Q(
      "q210_rolling_z",
      """WITH d AS (SELECT o_orderpriority AS priority, o_orderdate AS dt,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
        |  FROM orders GROUP BY 1, 2),
        |w AS (SELECT priority, dt, v,
        |    CAST(count(*) OVER win AS BIGINT) AS cnt,
        |    CAST(sum(v) OVER win AS BIGINT) AS s,
        |    CAST(sum(CAST(v AS HUGEINT) * v) OVER win AS HUGEINT) AS ss
        |  FROM d
        |  WINDOW win AS (PARTITION BY priority ORDER BY dt
        |                 ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING))
        |SELECT priority, CAST(dt AS VARCHAR) AS dt, v,
        |  floor((CAST(v AS DOUBLE) - CAST(s AS DOUBLE) / CAST(cnt AS DOUBLE))
        |      / sqrt(CAST(cnt * ss - CAST(s AS HUGEINT) * s AS DOUBLE)
        |             / CAST(cnt * (cnt - 1) AS DOUBLE))
        |    * 1000000.0 + 0.5) / 1000000.0 AS z
        |FROM w
        |WHERE cnt = 6 AND cnt * ss - CAST(s AS HUGEINT) * s > 0
        |ORDER BY priority, dt""".stripMargin) { (s, dir) =>
      val daily = Tables.load(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("priority"), col("o_orderdate").as("dt"))
        .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("v"))
      graft.operators.TimeSeries
        .rollingZScore(daily, Seq("priority"), "dt", "v", window = 6)
        .filter(col("z").isNotNull)
        .select(col("priority"), col("dt").cast("string").as("dt"), col("v"),
          pin6(col("z")).as("z"))
        .orderBy("priority", "dt")
    },

    // ROLLUP hierarchy totals with grouping_id: status × priority revenue
    // plus per-status and grand totals in ONE pass (Catalyst expands the
    // grouping sets — one scan, not three). 'ALL' placeholders keep NULL
    // ordering differences between engines out of the gate. Single-table
    // input is deliberate: Spark 4's DetectAmbiguousSelfJoin false-flags
    // rollup's Expand when the input lineage contains a join (the Expand
    // duplicates the join-derived grouping attrs) — a hierarchy over a
    // joined frame should pre-materialize the projection.
    Q(
      "q211_rollup",
      """WITH f AS (SELECT o_orderstatus AS st, o_orderpriority AS pri,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders)
        |SELECT CAST(GROUPING(st, pri) AS BIGINT) AS gid,
        |  coalesce(st, 'ALL') AS st, coalesce(pri, 'ALL') AS pri,
        |  CAST(sum(cents) AS BIGINT) AS rev, CAST(count(*) AS BIGINT) AS n
        |FROM f GROUP BY ROLLUP(st, pri)
        |ORDER BY gid, st, pri""".stripMargin) { (s, dir) =>
      val f = Tables.load(s, dir, "orders")
        .select(col("o_orderstatus").as("st"), col("o_orderpriority").as("pri"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      f.rollup("st", "pri")
        .agg(grouping_id().as("_gid"), sum("cents").as("rev"), count(lit(1)).as("n"))
        // selectExpr: name-resolved against THIS frame (col("st") would
        // carry upstream dataset-id tags into the ambiguity check)
        .selectExpr("cast(_gid as bigint) as gid", "coalesce(st, 'ALL') as st",
          "coalesce(pri, 'ALL') as pri", "rev", "n")
        .orderBy("gid", "st", "pri")
    },

    // Pivot (long → wide): revenue cents per segment × priority as five
    // typed columns — Spark's relational pivot with an EXPLICIT value list
    // (an inferred list would scan twice and order nondeterministically);
    // the oracle is the equivalent conditional aggregation.
    Q(
      "q212_pivot",
      """WITH f AS (SELECT c_mktsegment AS seg, o_orderpriority AS pri,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey)
        |SELECT seg,
        |  CAST(coalesce(sum(CASE WHEN pri = '1-URGENT' THEN cents END), 0) AS BIGINT) AS p1,
        |  CAST(coalesce(sum(CASE WHEN pri = '2-HIGH' THEN cents END), 0) AS BIGINT) AS p2,
        |  CAST(coalesce(sum(CASE WHEN pri = '3-MEDIUM' THEN cents END), 0) AS BIGINT) AS p3,
        |  CAST(coalesce(sum(CASE WHEN pri = '4-NOT SPECIFIED' THEN cents END), 0)
        |    AS BIGINT) AS p4,
        |  CAST(coalesce(sum(CASE WHEN pri = '5-LOW' THEN cents END), 0) AS BIGINT) AS p5
        |FROM f GROUP BY seg ORDER BY seg""".stripMargin) { (s, dir) =>
      val f = Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("seg"), col("o_orderpriority").as("pri"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      val vals = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
      val piv = f.groupBy("seg").pivot("pri", vals).agg(sum("cents"))
      piv.select(col("seg") +:
          vals.zipWithIndex.map { case (v, i) =>
            coalesce(col(s"`$v`"), lit(0L)).as(s"p${i + 1}") }: _*)
        .orderBy("seg")
    },

    // First-order Markov transition matrix over per-user event streams
    // (Sessionize.transitionMatrix): lead() over (user, ts, event_id),
    // pair counts, row-normalized probabilities as exact integer floor
    // quotients — the next-event-prediction baseline.
    Q(
      "q213_markov",
      """WITH e AS (SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        |  FROM events),
        |p AS (SELECT event_type AS src, nxt AS dst, CAST(count(*) AS BIGINT) AS n
        |      FROM e WHERE nxt IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT src, CAST(sum(n) AS BIGINT) AS tn FROM p GROUP BY 1)
        |SELECT p.src, p.dst, p.n, (p.n * 1000000) // t.tn AS p_micro
        |FROM p JOIN t USING (src) ORDER BY src, dst""".stripMargin) { (s, dir) =>
      graft.operators.Sessionize
        .transitionMatrix(Tables.events(s, dir), "user_id", Seq("ts", "event_id"),
          "event_type")
        .orderBy("src", "dst")
    })
}
