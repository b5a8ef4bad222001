package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Governance + labeling-audit operators (round 7, fourth batch): Cohen's
  * κ rater agreement, referential-integrity-preserving pseudonymization,
  * and k-anonymity suppression — the privacy/compliance surface a
  * warehouse needs before any extract leaves the building, plus the
  * agreement statistic every labeling pipeline runs on its annotators.
  * Determinism rules as elsewhere: exact integer/decimal reductions,
  * closed-form doubles only at the end, pinned to 6 dp.
  */
object GovernanceQueries {

  private val pin6 = (c: org.apache.spark.sql.Column) =>
    (floor(c * lit(1000000.0) + lit(0.5)).cast("double") / lit(1000000.0))

  def all: Seq[Q] = Seq(

    // Cohen's κ between the labeled lang column and the q40 stopword-vote
    // language-ID heuristic (Eval.cohenKappa): chance-corrected agreement
    // from exact marginal counts — po and pe are single IEEE divisions of
    // exact integers, κ is the one compound double, pinned at 6 dp. The
    // statistic that tells a labeling pipeline whether annotator agreement
    // beats luck.
    Q(
      "q245_cohen_kappa",
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
        |ma AS (SELECT truth AS clazz, CAST(count(*) AS BIGINT) AS ca FROM p GROUP BY 1),
        |mb AS (SELECT pred AS clazz, CAST(count(*) AS BIGINT) AS cb FROM p GROUP BY 1),
        |pe AS (SELECT CAST(sum(CAST(ca AS HUGEINT) * cb) AS HUGEINT) AS pe_num
        |  FROM ma JOIN mb USING (clazz)),
        |ag AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN truth = pred THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
        |  FROM p)
        |SELECT n, n_agree,
        |  CAST(n_agree AS DOUBLE) / CAST(n AS DOUBLE) AS po,
        |  CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS pe,
        |  CASE WHEN CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) < 1.0
        |    THEN floor((CAST(n_agree AS DOUBLE) / CAST(n AS DOUBLE)
        |          - CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
        |        / (1.0 - CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
        |      * 1000000.0 + 0.5) / 1000000.0 END AS kappa
        |FROM ag CROSS JOIN pe""".stripMargin) { (s, dir) =>
      val pairs = Tables.load(s, dir, "documents")
        .select(col("lang").as("truth"),
          graft.text.TextAnalysis.langId(col("text")).as("pred"))
      graft.operators.Eval.cohenKappa(pairs, "truth", "pred")
        .select(col("n"), col("n_agree"), col("po"), col("pe"),
          pin6(col("kappa")).as("kappa"))
    },

    // Referential-integrity-preserving pseudonymization
    // (Governance.pseudonym): customers and orders masked INDEPENDENTLY
    // with the same salted-hash recipe, then joined back on the pseudonym —
    // per-segment customer/order/spend totals must survive masking intact,
    // and min(pseudonym) pins the mapping itself. The masked-extract
    // contract: joins still work, identities don't.
    Q(
      "q246_pseudonymize",
      """WITH mc AS (SELECT 'anon_' || substr(md5('g7:' || c_custkey::VARCHAR), 1, 16) AS pid,
        |    c_mktsegment AS seg FROM customer),
        |mo AS (SELECT 'anon_' || substr(md5('g7:' || o_custkey::VARCHAR), 1, 16) AS pid,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        |j AS (SELECT seg, mc.pid, cents FROM mc LEFT JOIN mo ON mc.pid = mo.pid)
        |SELECT seg, CAST(count(DISTINCT pid) AS BIGINT) AS n_customers,
        |  CAST(count(cents) AS BIGINT) AS n_orders,
        |  CAST(coalesce(sum(CAST(cents AS HUGEINT)), 0) AS BIGINT) AS spend_cents,
        |  min(pid) AS sample_pid
        |FROM j GROUP BY seg ORDER BY seg""".stripMargin) { (s, dir) =>
      import graft.operators.Governance.pseudonym
      val mc = Tables.load(s, dir, "customer")
        .select(pseudonym(col("c_custkey"), "g7").as("pid"), col("c_mktsegment").as("seg"))
      val mo = Tables.load(s, dir, "orders")
        .select(pseudonym(col("o_custkey"), "g7").as("pid"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      mc.join(mo, Seq("pid"), "left")
        .groupBy("seg")
        .agg(
          countDistinct(col("pid")).as("n_customers"),
          count(col("cents")).as("n_orders"),
          coalesce(sum(col("cents")), lit(0L)).as("spend_cents"),
          min(col("pid")).as("sample_pid"))
        .orderBy("seg")
    },

    // k-anonymity suppression (Governance.kAnonymize) over the
    // quasi-identifier (nation, segment, acctbal-thousand-bucket) at k=5:
    // QI combinations shared by fewer than 5 customers are fully
    // suppressed to '*'; the gate audits the post-suppression group sizes
    // — every surviving non-'*' group must carry >= k rows, and the '*'
    // row absorbs the rest. One grouped count + join-back, no window.
    Q(
      "q247_k_anonymity",
      """WITH q AS (SELECT c_custkey,
        |    c_nationkey::VARCHAR AS nat, c_mktsegment AS seg,
        |    CAST(floor(c_acctbal / 1000.0) AS BIGINT)::VARCHAR AS bal FROM customer),
        |g AS (SELECT nat, seg, bal, CAST(count(*) AS BIGINT) AS qn FROM q GROUP BY 1, 2, 3),
        |m AS (SELECT CASE WHEN qn >= 5 THEN nat ELSE '*' END AS nat,
        |    CASE WHEN qn >= 5 THEN seg ELSE '*' END AS seg,
        |    CASE WHEN qn >= 5 THEN bal ELSE '*' END AS bal, qn
        |  FROM q JOIN g USING (nat, seg, bal))
        |SELECT nat, seg, bal, CAST(count(*) AS BIGINT) AS n
        |FROM m GROUP BY 1, 2, 3 ORDER BY nat, seg, bal""".stripMargin) { (s, dir) =>
      val q = Tables.load(s, dir, "customer").select(
        col("c_custkey"),
        col("c_nationkey").cast("string").as("nat"),
        col("c_mktsegment").as("seg"),
        floor(col("c_acctbal") / 1000.0).cast("long").cast("string").as("bal"))
      graft.operators.Governance.kAnonymize(q, Seq("nat", "seg", "bal"), 5L)
        .groupBy("nat", "seg", "bal")
        .agg(count(lit(1)).as("n"))
        .orderBy("nat", "seg", "bal")
    },

    // Subject-access-request export manifest (GDPR Art. 15 / CCPA): for a
    // deterministic subject set (one customer per market segment), the
    // per-table footprint — order count, date range, lineitem count,
    // lifetime cents — assembled by broadcast semi-joins against the
    // subject list, so the scan cost is the fact tables once, regardless
    // of subject count. The "what do we hold on this person" report as a
    // query, not an export script.
    Q(
      "q257_sar_export",
      """WITH s AS (SELECT min(c_custkey) AS k FROM customer GROUP BY c_mktsegment),
        |o AS (SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS n_orders,
        |    CAST(min(o_orderdate) AS VARCHAR) AS first_order,
        |    CAST(max(o_orderdate) AS VARCHAR) AS last_order,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |  FROM orders WHERE o_custkey IN (SELECT k FROM s) GROUP BY 1),
        |li AS (SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS n_lineitems
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_custkey IN (SELECT k FROM s) GROUP BY 1)
        |SELECT c_custkey, c_mktsegment AS seg,
        |  coalesce(n_orders, 0) AS n_orders, first_order, last_order,
        |  coalesce(n_lineitems, 0) AS n_lineitems,
        |  coalesce(total_cents, 0) AS total_cents
        |FROM customer JOIN s ON c_custkey = s.k
        |LEFT JOIN o ON o.k = c_custkey LEFT JOIN li ON li.k = c_custkey
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val cust = Tables.load(s, dir, "customer")
      val subjects = cust.groupBy("c_mktsegment").agg(min("c_custkey").as("k"))
        .select("k")
      val orders = Tables.load(s, dir, "orders")
        .join(broadcast(subjects), col("o_custkey") === col("k"), "left_semi")
        .groupBy(col("o_custkey").as("k"))
        .agg(count(lit(1)).as("n_orders"),
          min(col("o_orderdate")).cast("string").as("first_order"),
          max(col("o_orderdate")).cast("string").as("last_order"),
          sum(round(col("o_totalprice") * 100, 0).cast("long")).as("total_cents"))
      val li = Tables.load(s, dir, "lineitem")
        .join(
          Tables.load(s, dir, "orders")
            .join(broadcast(subjects), col("o_custkey") === col("k"), "left_semi")
            .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("k"))
        .agg(count(lit(1)).as("n_lineitems"))
      cust.join(broadcast(subjects), col("c_custkey") === col("k"), "left_semi")
        .select(col("c_custkey"), col("c_mktsegment").as("seg"))
        .join(orders, col("c_custkey") === orders("k"), "left")
        .drop("k")
        .join(li, col("c_custkey") === li("k"), "left")
        .drop("k")
        .select(col("c_custkey"), col("seg"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          col("first_order"), col("last_order"),
          coalesce(col("n_lineitems"), lit(0L)).as("n_lineitems"),
          coalesce(col("total_cents"), lit(0L)).as("total_cents"))
        .orderBy("c_custkey")
    },

    // Train/val/test leakage audit (Splits.assignSplit +
    // TextAnalysis.bagFingerprint): content landing in DIFFERENT splits
    // of the q65 8/1/1 md5 split — the contamination a random split of an
    // un-deduplicated corpus ALWAYS has, counted per split pair. The
    // content key is the order/repetition-robust bag fingerprint (q41),
    // so shuffled near-copies count as leaks, not just byte-identical
    // text. Distinct (fingerprint, split) projection → self-join on
    // fingerprint with split_a < split_b → pair counts; document bodies
    // never shuffle.
    Q(
      "q258_split_leakage",
      """WITH d AS (SELECT md5(array_to_string(list_sort(list_distinct(
        |      regexp_extract_all(lower(text), '[a-z0-9]+'))), ' ')) AS h,
        |    CASE WHEN CAST(CAST('0x' || substr(md5(doc_id::VARCHAR), 1, 6) AS INT)
        |        AS BIGINT) % 10 < 8 THEN 'train'
        |      WHEN CAST(CAST('0x' || substr(md5(doc_id::VARCHAR), 1, 6) AS INT)
        |        AS BIGINT) % 10 < 9 THEN 'val'
        |      ELSE 'test' END AS s
        |  FROM documents),
        |ds AS (SELECT DISTINCT h, s FROM d),
        |p AS (SELECT a.s AS split_a, b.s AS split_b FROM ds a
        |      JOIN ds b ON a.h = b.h AND a.s < b.s)
        |SELECT split_a, split_b, CAST(count(*) AS BIGINT) AS n_shared_contents
        |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      import graft.load.Splits
      val d = Tables.load(s, dir, "documents").select(
        graft.text.TextAnalysis.bagFingerprint(col("text")).as("h"),
        Splits.assignSplit(col("doc_id"),
          Seq("train" -> 8, "val" -> 1, "test" -> 1)).as("s"))
        .distinct()
      val a = d.select(col("h"), col("s").as("split_a"))
      val b = d.select(col("h"), col("s").as("split_b"))
      a.join(b, Seq("h"))
        .filter(col("split_a") < col("split_b"))
        .groupBy("split_a", "split_b")
        .agg(count(lit(1)).as("n_shared_contents"))
        .orderBy("split_a", "split_b")
    })
}
