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
      """WITH pp AS (SELECT least(a.l_partkey, b.l_partkey) AS a,
        |    greatest(a.l_partkey, b.l_partkey) AS b
        |  FROM lineitem a JOIN lineitem b
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
        val li = Tables.load(s, dir, "lineitem").select("l_orderkey", "l_partkey")
        val a = li.select(col("l_orderkey"), col("l_partkey").as("_pa"))
        val b = li.select(col("l_orderkey"), col("l_partkey").as("_pb"))
        val edges = a.join(b, Seq("l_orderkey"))
          .filter(col("_pa") < col("_pb"))
          .groupBy(col("_pa").as("a"), col("_pb").as("b"))
          .agg(count(lit(1)).as("n"))
          .filter(col("n") >= 2)
          .select("a", "b")
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
    })
}
