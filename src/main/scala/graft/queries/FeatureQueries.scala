package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Feature-engineering + uncertainty operators (round 7, fifth batch):
  * neighborhood-overlap link prediction over the word co-occurrence
  * graph and the deterministic Poisson bootstrap — the "what's missing
  * from this graph" and "how sure is this mean" questions a pipeline
  * answers at corpus scale. Determinism rules as elsewhere: exact
  * integer/decimal reductions (the RA index is Σ 1e12 div deg — an exact
  * bigint, no float 1/deg summation), closed-form doubles only at the
  * end, pinned to 6 dp.
  */
object FeatureQueries {

  private val pin6 = (c: org.apache.spark.sql.Column) =>
    (floor(c * lit(1000000.0) + lit(0.5)).cast("double") / lit(1000000.0))

  def all: Seq[Q] = Seq(

    // Link prediction on the part co-purchase graph — parts bought
    // together in ≥ 2 orders are edges; LinkPredict.neighborOverlap scores
    // every NON-adjacent two-hop pair by common-neighbor count and the
    // resource-allocation index Σ_z 1e12 div deg(z) (exact integer
    // micro-units — RA is Adamic-Adar with 1/deg in place of 1/log deg,
    // which keeps the reduction in bigint). The "recommend the missing
    // edge" operator: wedge join → grouped agg → anti-join against the
    // edge set; top 100 by (ra, cn, pair). (The q185 bigram graph is
    // deliberately NOT used here: the generator's small vocabulary makes
    // it complete, and a complete graph has no links to predict.)
    Q(
      "q248_link_predict",
      """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pp AS (SELECT a.l_partkey AS a, b.l_partkey AS b
        |  FROM op a JOIN op b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |ed AS (SELECT a, b FROM (SELECT a, b, count(*) AS n FROM pp GROUP BY 1, 2)
        |       WHERE n >= 2),
        |s0 AS (SELECT a AS s, b AS d FROM ed UNION ALL SELECT b, a FROM ed),
        |deg AS (SELECT s AS z, CAST(count(*) AS BIGINT) AS dg FROM s0 GROUP BY 1),
        |nb AS (SELECT d AS z, s AS nbr FROM s0),
        |w AS (SELECT n1.z AS z, n1.nbr AS a, n2.nbr AS b
        |  FROM nb n1 JOIN nb n2 ON n1.z = n2.z WHERE n1.nbr < n2.nbr),
        |sc AS (SELECT a, b, CAST(count(*) AS BIGINT) AS common_neighbors,
        |    CAST(sum(1000000000000 // dg) AS BIGINT) AS ra_micro
        |  FROM w JOIN deg USING (z) GROUP BY 1, 2)
        |SELECT sc.a, sc.b, common_neighbors, ra_micro
        |FROM sc LEFT JOIN ed ON sc.a = ed.a AND sc.b = ed.b
        |WHERE ed.a IS NULL
        |ORDER BY ra_micro DESC, common_neighbors DESC, sc.a, sc.b LIMIT 100""".stripMargin) {
      (s, dir) =>
        val edges = SharedFrames.basketPairCounts(s, dir)
          .filter(col("n_ab") >= 2)
          .select(col("part_a").as("a"), col("part_b").as("b"))
        graft.operators.LinkPredict
          .neighborOverlap(edges, "a", "b")
          .orderBy(col("ra_micro").desc, col("common_neighbors").desc, col("a"), col("b"))
          .limit(100)
    },

    // Poisson-bootstrap standard error of the mean order price
    // (Bootstrap.meanSe, B = 16): each order joins resample b with
    // multiplicity = Poisson(1) inverse CDF of a 24-bit md5 draw against
    // precomputed integer thresholds — no RNG state, no exp/ln at query
    // time, bit-identical resamples in any engine. Draws are packed five
    // per digest (resample b reads hex offset 6·(b mod 5) of
    // md5(id ":" b div 5)), so the hash bill is B/5 per row, not B.
    // Resample means are exact integer micro-cent quotients; the SE
    // across them is one closed-form sqrt over an exactly-formed decimal
    // numerator, pinned at 6 dp.
    Q(
      "q249_poisson_bootstrap",
      """WITH v AS (SELECT o_orderkey AS id,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders),
        |r AS (SELECT id, v, g.b FROM v, unnest(generate_series(0, 15)) AS g(b)),
        |h AS (SELECT b, v, CAST(CAST('0x' || substr(
        |    md5(id::VARCHAR || ':' || (b // 5)::VARCHAR),
        |    (b % 5) * 6 + 1, 6) AS INT) AS BIGINT) AS h FROM r),
        |m AS (SELECT b, v,
        |    CASE WHEN h < 6171992 THEN 0 WHEN h < 12343985 THEN 1
        |         WHEN h < 15429982 THEN 2 WHEN h < 16458647 THEN 3
        |         WHEN h < 16715813 THEN 4 WHEN h < 16767247 THEN 5 ELSE 6 END AS m
        |  FROM h),
        |g AS (SELECT b, CAST(sum(CAST(m * v AS HUGEINT)) AS HUGEINT) AS svb,
        |    CAST(sum(m) AS BIGINT) AS nb FROM m GROUP BY b),
        |mb AS (SELECT CAST((svb * 1000000) // nb AS BIGINT) AS mb FROM g WHERE nb > 0),
        |se AS (SELECT CAST(count(*) AS BIGINT) AS n_resamples,
        |    CAST(sum(CAST(mb AS HUGEINT)) AS HUGEINT) AS sm,
        |    CAST(sum(CAST(mb AS HUGEINT) * mb) AS HUGEINT) AS sm2 FROM mb),
        |f AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(v AS HUGEINT)) AS HUGEINT) AS sv FROM v)
        |SELECT n, CAST((sv * 1000000) // n AS BIGINT) AS mean_micro, n_resamples,
        |  floor(sqrt(CAST(sm2 * n_resamples - sm * sm AS DOUBLE)
        |      / (CAST(n_resamples AS DOUBLE) * CAST(n_resamples - 1 AS DOUBLE)))
        |    * 1000000.0 + 0.5) / 1000000.0 AS se_micro
        |FROM f CROSS JOIN se""".stripMargin) { (s, dir) =>
      val v = Tables.load(s, dir, "orders").select(
        col("o_orderkey").as("id"),
        round(col("o_totalprice") * 100, 0).cast("long").as("v"))
      graft.operators.Bootstrap.meanSe(v, "id", "v", b = 16)
        .select(col("n"), col("mean_micro"), col("n_resamples"),
          pin6(col("se_micro")).as("se_micro"))
    },

    // Good-Turing frequency-of-frequencies over TRIGRAM types
    // (Vocab.frequencyOfFrequenciesIn ∘ ngramCounts): n_r = types
    // occurring exactly r times, with the Turing-adjusted count
    // (r+1)·n_{r+1}/n_r — the table Katz/KN smoothing starts from and
    // the unseen-mass (n_1/N) corpus-health signal. Trigrams, because
    // the generator's unigram vocabulary has no low-frequency tail at
    // all (every word occurs thousands of times — itself a corpus-health
    // finding this table makes visible). Exact counts; one IEEE division
    // per row.
    Q(
      "q250_good_turing",
      """WITH tok AS (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS t
        |             FROM documents),
        |c AS (SELECT t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram,
        |        CAST(count(*) AS BIGINT) AS tf
        |      FROM tok, unnest(generate_series(1, len(t) - 2)) AS g(i)
        |      GROUP BY 1),
        |ff AS (SELECT tf AS r, CAST(count(*) AS BIGINT) AS n_r FROM c
        |       WHERE tf <= 11 GROUP BY 1)
        |SELECT f.r, f.n_r,
        |  CASE WHEN nx.n_r IS NOT NULL AND f.n_r > 0
        |    THEN CAST((f.r + 1) * nx.n_r AS DOUBLE) / CAST(f.n_r AS DOUBLE) END AS gt_r
        |FROM ff f LEFT JOIN ff nx ON nx.r = f.r + 1
        |WHERE f.r <= 10 ORDER BY f.r""".stripMargin) { (s, dir) =>
      graft.text.Vocab
        .frequencyOfFrequenciesIn(
          graft.text.Vocab.ngramCounts(Tables.load(s, dir, "documents"), "text", 3),
          "n", maxR = 10)
        .orderBy("r")
    },

    // Heaps'-law vocabulary-growth curve (Vocab.vocabGrowth): cumulative
    // tokens vs cumulative distinct types across ten doc-id deciles — the
    // diminishing-returns audit ("is more crawl still buying vocabulary?").
    // First appearance = min(bucket) per type, so no per-prefix distinct
    // pass; exact integers end-to-end; the only window is 10 rows wide.
    Q(
      "q251_heaps_law",
      """WITH nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        |tok AS (SELECT least((doc_id * 10) // n, 9) AS bk,
        |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
        |  FROM documents, nd),
        |nt AS (SELECT bk, CAST(count(*) AS BIGINT) AS nt FROM tok GROUP BY 1),
        |fb AS (SELECT bk, CAST(count(*) AS BIGINT) AS nv
        |  FROM (SELECT token, min(bk) AS bk FROM tok GROUP BY token) GROUP BY 1)
        |SELECT g.i AS bucket,
        |  CAST(sum(coalesce(nt.nt, 0)) OVER (ORDER BY g.i) AS BIGINT) AS cum_tokens,
        |  CAST(sum(coalesce(fb.nv, 0)) OVER (ORDER BY g.i) AS BIGINT) AS cum_vocab
        |FROM generate_series(0, 9) AS g(i)
        |LEFT JOIN nt ON nt.bk = g.i LEFT JOIN fb ON fb.bk = g.i
        |ORDER BY bucket""".stripMargin) { (s, dir) =>
      graft.text.Vocab
        .vocabGrowth(Tables.load(s, dir, "documents"), "doc_id", "text", buckets = 10)
        .orderBy("bucket")
    },

    // Zipf-law OLS fit over the top-1000 tokens (Vocab.zipfFit): slope of
    // ln f on ln rank ≈ −1 for natural text; flat slopes flag templated/
    // synthetic corpora. Each ln pinned ONCE to micro-units (q182 rule),
    // normal equations in exact decimals, slope/intercept pinned at 6 dp.
    Q(
      "q252_zipf_slope",
      """WITH tok AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
        |             FROM documents),
        |c AS (SELECT token, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1),
        |top AS (SELECT tf, row_number() OVER (ORDER BY tf DESC, token) AS rk FROM c
        |        QUALIFY rk <= 1000),
        |p AS (SELECT CAST(floor(ln(CAST(rk AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS x,
        |             CAST(floor(ln(CAST(tf AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS y
        |      FROM top),
        |g AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
        |    CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
        |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
        |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx FROM p)
        |SELECT n AS n_terms,
        |  floor(CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
        |    * 1000000.0 + 0.5) / 1000000.0 AS slope,
        |  floor((CAST(sy AS DOUBLE)
        |      - CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
        |        * CAST(sx AS DOUBLE))
        |    / CAST(n AS DOUBLE) / 1000000.0 * 1000000.0 + 0.5) / 1000000.0
        |    AS intercept_unats
        |FROM g""".stripMargin) { (s, dir) =>
      graft.text.Vocab.zipfFit(Tables.load(s, dir, "documents"), "text", topK = 1000)
        .select(col("n_terms"), pin6(col("slope")).as("slope"),
          pin6(col("intercept_unats")).as("intercept_unats"))
    },

    // Hashing-trick featurization audit (Vocab.hashedFeatures at 64 dims):
    // signed md5 feature hashing — the vocabulary-free featurizer — with
    // per-bucket occupancy stats (docs touching the bucket, signed and
    // absolute weight mass) as the gate: collisions, sign balance, and
    // the load factor are exactly reproducible in any engine.
    Q(
      "q253_feature_hash",
      """WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
        |             FROM documents),
        |f AS (SELECT doc_id,
        |    CAST(CAST('0x' || substr(md5(token), 1, 6) AS INT) AS BIGINT) % 64 AS idx,
        |    CASE WHEN CAST('0x' || substr(md5(token), 7, 1) AS INT) % 2 = 0
        |      THEN 1 ELSE -1 END AS sg
        |  FROM tok),
        |w AS (SELECT doc_id, idx, CAST(sum(sg) AS BIGINT) AS weight FROM f GROUP BY 1, 2)
        |SELECT idx, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(weight) AS BIGINT) AS sum_weight,
        |  CAST(sum(abs(weight)) AS BIGINT) AS sum_abs_weight
        |FROM w GROUP BY idx ORDER BY idx""".stripMargin) { (s, dir) =>
      graft.text.Vocab
        .hashedFeatures(Tables.load(s, dir, "documents"), "doc_id", "text", dims = 64)
        .groupBy("idx")
        .agg(count(lit(1)).as("n_docs"), sum(col("weight")).as("sum_weight"),
          sum(abs(col("weight"))).as("sum_abs_weight"))
        .orderBy("idx")
    },

    // Per-dimension embedding feature stats (Similarity.embeddingDimStats):
    // the normalization table (mean/std/min/max per dim, integer
    // micro-units) a training pipeline computes before standardizing and
    // re-computes per drop as a drift probe. Elements pinned once, exact
    // decimal moments, std is the one closed-form sqrt — pinned at 6 dp.
    Q(
      "q254_embed_dim_stats",
      """WITH e AS (SELECT g.i - 1 AS dim,
        |    CAST(floor(CAST(embedding[g.i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS vm
        |  FROM embeddings, unnest(generate_series(1, len(embedding))) AS g(i)),
        |g AS (SELECT dim, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(vm AS HUGEINT)) AS HUGEINT) AS s,
        |    CAST(sum(CAST(vm AS HUGEINT) * vm) AS HUGEINT) AS s2,
        |    CAST(min(vm) AS BIGINT) AS min_micro,
        |    CAST(max(vm) AS BIGINT) AS max_micro
        |  FROM e GROUP BY 1)
        |SELECT dim, n, CAST(s // n AS BIGINT) AS mean_micro,
        |  CASE WHEN n > 1 THEN
        |    floor(sqrt(CAST(s2 * n - s * s AS DOUBLE)
        |        / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))
        |      * 1000000.0 + 0.5) / 1000000.0 END AS std_micro,
        |  min_micro, max_micro
        |FROM g ORDER BY dim""".stripMargin) { (s, dir) =>
      graft.sim.Similarity
        .embeddingDimStats(Tables.load(s, dir, "embeddings"), "embedding")
        .select(col("dim"), col("n"), col("mean_micro"),
          pin6(col("std_micro")).as("std_micro"), col("min_micro"), col("max_micro"))
        .orderBy("dim")
    },

    // Sample-ratio-mismatch health gate (Experiment.srmCheck): χ² on the
    // md5-bit assignment counts against uniform expectation — folded to
    // ONE division of exact integers, Σ(k·n_i − n)²/(k·n), compared at
    // the SRM-tight 0.001 critical value. The "is the bucketing itself
    // broken?" check that precedes every A/B readout.
    Q(
      "q255_srm",
      """WITH u AS (SELECT CASE WHEN CAST('0x' || substr(md5(c_custkey::VARCHAR), 1, 4)
        |      AS INT) % 2 = 0 THEN 'control' ELSE 'treatment' END AS variant
        |  FROM customer),
        |b AS (SELECT variant, CAST(count(*) AS BIGINT) AS n FROM u GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS tn, CAST(count(*) AS BIGINT) AS k FROM b),
        |c AS (SELECT k, tn,
        |    CAST(sum(CAST(k * n - tn AS HUGEINT) * (k * n - tn)) AS HUGEINT) AS num
        |  FROM b, t GROUP BY 1, 2)
        |SELECT variant, n,
        |  CAST(num AS DOUBLE) / (CAST(k AS DOUBLE) * CAST(tn AS DOUBLE)) AS chi2,
        |  CAST(num AS DOUBLE) / (CAST(k AS DOUBLE) * CAST(tn AS DOUBLE))
        |    > (CASE WHEN k <= 2 THEN 10.828 WHEN k = 3 THEN 13.816 ELSE 16.266 END) AS srm
        |FROM b, c ORDER BY variant""".stripMargin) { (s, dir) =>
      val units = Tables.load(s, dir, "customer").select(
        when(conv(substring(md5(col("c_custkey").cast("string")), 1, 4), 16, 10)
          .cast("int") % 2 === 0, "control").otherwise("treatment").as("variant"))
      graft.operators.Experiment.srmCheck(units, "variant").orderBy("variant")
    },

    // Minimum detectable effect for the conversion metric
    // (Experiment.mdeBinomial): with the md5-bit split and "placed ≥ 1
    // order" as conversion, the smallest absolute/relative lift this
    // traffic could resolve at α=0.05, power 0.8 — the planning number
    // read BEFORE running the experiment. Counts exact; p one division;
    // MDE the closed-form double, pinned at 6 dp.
    Q(
      "q256_mde",
      """WITH u AS (SELECT
        |    CASE WHEN CAST('0x' || substr(md5(c_custkey::VARCHAR), 1, 4) AS INT) % 2 = 0
        |      THEN 'control' ELSE 'treatment' END AS v,
        |    CASE WHEN o.o_custkey IS NOT NULL THEN 1 ELSE 0 END AS cv
        |  FROM customer LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o
        |    ON c_custkey = o.o_custkey),
        |b AS (SELECT v, CAST(count(*) AS BIGINT) AS n, CAST(sum(cv) AS BIGINT) AS c
        |      FROM u GROUP BY 1),
        |g AS (SELECT
        |    max(CASE WHEN v = 'control' THEN n END) AS n_a,
        |    max(CASE WHEN v = 'treatment' THEN n END) AS n_b,
        |    max(CASE WHEN v = 'control' THEN c END) AS conv_a,
        |    max(CASE WHEN v = 'treatment' THEN c END) AS conv_b FROM b)
        |SELECT n_a, n_b, conv_a, conv_b,
        |  CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) AS p_pooled,
        |  floor((1.959964 + 0.841621) * sqrt(2.0
        |      * (CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
        |      * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
        |      / CAST(least(n_a, n_b) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS mde_abs,
        |  CASE WHEN conv_a + conv_b > 0 THEN
        |    floor((1.959964 + 0.841621) * sqrt(2.0
        |        * (CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
        |        * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
        |        / CAST(least(n_a, n_b) AS DOUBLE))
        |      / (CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
        |      * 1000000.0 + 0.5) / 1000000.0 END AS mde_rel
        |FROM g""".stripMargin) { (s, dir) =>
      val ordered = Tables.load(s, dir, "orders").select(col("o_custkey")).distinct()
      val units = Tables.load(s, dir, "customer")
        .join(ordered, col("c_custkey") === col("o_custkey"), "left")
        .select(
          when(conv(substring(md5(col("c_custkey").cast("string")), 1, 4), 16, 10)
            .cast("int") % 2 === 0, "control").otherwise("treatment").as("v"),
          when(col("o_custkey").isNotNull, 1L).otherwise(0L).as("cv"))
      graft.operators.Experiment.mdeBinomial(units, "v", "cv")
        .select(col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
          col("p_pooled"), pin6(col("mde_abs")).as("mde_abs"),
          pin6(col("mde_rel")).as("mde_rel"))
    },

    // Date-spine coverage audit / backfill planner
    // (TimeSeries.dateSpineGaps): per order priority, how many days of
    // the global order-date span have at least one order, how many are
    // missing, and the first gap — the "which partitions need backfilling"
    // report. Spine = one exploded sequence(); presence = a distinct
    // (group, day) aggregate; exact integers + a date-as-string.
    Q(
      "q259_backfill_gaps",
      """WITH sp AS (SELECT unnest(generate_series(
        |    (SELECT min(o_orderdate) FROM orders),
        |    (SELECT max(o_orderdate) FROM orders), INTERVAL 1 DAY))::DATE AS d),
        |g AS (SELECT DISTINCT o_orderpriority AS priority FROM orders),
        |pr AS (SELECT DISTINCT o_orderpriority AS priority, o_orderdate AS d FROM orders),
        |j AS (SELECT g.priority, sp.d, CASE WHEN pr.d IS NULL THEN 0 ELSE 1 END AS here
        |  FROM g CROSS JOIN sp
        |  LEFT JOIN pr ON pr.priority = g.priority AND pr.d = sp.d)
        |SELECT priority, CAST(count(*) AS BIGINT) AS n_expected_days,
        |  CAST(sum(here) AS BIGINT) AS n_present_days,
        |  CAST(count(*) - sum(here) AS BIGINT) AS n_missing_days,
        |  CAST(min(CASE WHEN here = 0 THEN d END) AS VARCHAR) AS first_missing
        |FROM j GROUP BY priority ORDER BY priority""".stripMargin) { (s, dir) =>
      graft.operators.TimeSeries
        .dateSpineGaps(
          Tables.load(s, dir, "orders")
            .select(col("o_orderpriority").as("priority"), col("o_orderdate")),
          Seq("priority"), "o_orderdate")
        .select(col("priority"), col("n_expected_days"), col("n_present_days"),
          col("n_missing_days"), col("first_missing").cast("string").as("first_missing"))
        .orderBy("priority")
    },

    // KN-LM perplexity-proxy document scores (NgramLm.documentScores over
    // the shared q209 bigram counts): every doc's mean bigram surprisal in
    // integer micro-nats — the CCNet-style "score with a corpus LM, filter
    // the improbable tail" quality operator. Per-TYPE −ln p_kn pinned once
    // on the LM table (p_kn pinned 6 dp, floored at 1e-9); doc scores are
    // exact sums + integral division.
    Q(
      "q260_lm_score",
      """WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
        |             FROM documents),
        |bp AS (SELECT doc_id, t[i] AS v, t[i+1] AS w
        |       FROM tok, unnest(generate_series(1, len(t) - 1)) AS g(i)),
        |cb AS (SELECT v, w, CAST(count(*) AS BIGINT) AS c_vw FROM bp GROUP BY 1, 2),
        |cv AS (SELECT v, CAST(sum(c_vw) AS BIGINT) AS c_v FROM cb GROUP BY 1),
        |fw AS (SELECT v, CAST(count(*) AS BIGINT) AS n1f FROM cb GROUP BY 1),
        |bk AS (SELECT w, CAST(count(*) AS BIGINT) AS n1b FROM cb GROUP BY 1),
        |tt AS (SELECT CAST(count(*) AS BIGINT) AS t FROM cb),
        |lm AS (SELECT cb.v, cb.w,
        |    CAST(floor(-ln(greatest(
        |        floor((CASE WHEN 4 * c_vw - 3 > 0
        |                 THEN CAST(4 * c_vw - 3 AS DOUBLE) / CAST(4 * c_v AS DOUBLE)
        |                 ELSE 0.0 END
        |             + CAST(3 * n1f * n1b AS DOUBLE) / CAST(4 * c_v * t AS DOUBLE))
        |          * 1000000.0 + 0.5) / 1000000.0,
        |        1e-9)) * 1000000.0 + 0.5) AS BIGINT) AS unats
        |  FROM cb JOIN cv USING (v) JOIN fw USING (v) JOIN bk USING (w) CROSS JOIN tt),
        |ds AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |    CAST(sum(unats) AS BIGINT) AS su
        |  FROM bp JOIN lm USING (v, w) GROUP BY 1)
        |SELECT d.doc_id, coalesce(ds.n_bigrams, 0) AS n_bigrams,
        |  CASE WHEN coalesce(ds.n_bigrams, 0) > 0 THEN su // ds.n_bigrams
        |    ELSE 0 END AS mean_unats
        |FROM documents d LEFT JOIN ds USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      val sp = split(col("gram"), " ")
      graft.text.NgramLm.documentScores(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        SharedFrames.bigramCounts(s, dir)
          .select(sp.getItem(0).as("v"), sp.getItem(1).as("w"), col("n").as("c_vw")))
        .orderBy("doc_id")
    })
}
