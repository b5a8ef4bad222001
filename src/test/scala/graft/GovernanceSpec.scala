package graft

import graft.operators.{Bootstrap, Eval, Governance, LinkPredict}
import org.apache.spark.sql.functions._

/** Governance, agreement, link-prediction, and bootstrap operators. */
class GovernanceSpec extends SparkSpec {
  import spark.implicits._

  test("pseudonym is deterministic, salted, and join-preserving") {
    val a = Seq(1L, 2L, 3L).toDF("k")
      .select(Governance.pseudonym(col("k"), "s1").as("p")).collect().map(_.getString(0))
    val b = Seq(1L, 2L, 3L).toDF("k")
      .select(Governance.pseudonym(col("k"), "s1").as("p")).collect().map(_.getString(0))
    assert(a.sameElements(b)) // same salt+key → same pseudonym (referential integrity)
    assert(a.forall(p => p.startsWith("anon_") && p.length == 5 + 16))
    assert(a.distinct.length == 3)
    val other = Seq(1L).toDF("k")
      .select(Governance.pseudonym(col("k"), "s2").as("p")).collect().head.getString(0)
    assert(other != a.head) // different salt → unlinkable extracts
  }

  test("kAnonymize suppresses groups under k and preserves row count") {
    val df = Seq(
      ("a", "x"), ("a", "x"), ("a", "x"), // group of 3
      ("b", "y"), ("b", "y"), // group of 2
      ("c", "z") // singleton
    ).toDF("qi1", "qi2")
    val out = Governance.kAnonymize(df, Seq("qi1", "qi2"), 3L)
    assert(out.count() == 6)
    val groups = out.groupBy("qi1", "qi2").count().as[(String, String, Long)].collect()
      .map { case (q1, q2, n) => (q1, q2) -> n }.toMap
    assert(groups(("a", "x")) == 3) // >= k survives
    assert(groups(("*", "*")) == 3) // the 2-group and the singleton collapse
    intercept[IllegalArgumentException](Governance.kAnonymize(df, Seq.empty, 3L))
    intercept[IllegalArgumentException](
      Governance.kAnonymize(df.withColumn("_qn", lit(1)), Seq("qi1"), 3L))
  }

  test("kAnonymize keeps rows with NULL quasi-identifiers (null-safe join)") {
    // NULL is a QI value like any other: three rows sharing (null, "x")
    // form a group of 3 and SURVIVE at k=3; the lone (null, null) row is
    // suppressed to '*' — but every row must still be present
    val df = Seq(
      (Some("a"), Some("x")), (Some("a"), Some("x")), (Some("a"), Some("x")),
      (None, Some("x")), (None, Some("x")), (None, Some("x")),
      (None, None)
    ).toDF("qi1", "qi2")
    val out = Governance.kAnonymize(df, Seq("qi1", "qi2"), 3L)
    assert(out.count() == 7) // row-count preservation incl. NULL-QI rows
    val nullGroup = out.filter(col("qi1").isNull && col("qi2") === "x").count()
    assert(nullGroup == 3) // the NULL-keyed group of 3 keeps its values
    assert(out.filter(col("qi1") === "*" && col("qi2") === "*").count() == 1)
  }

  test("cohenKappa: perfect agreement is 1, disjoint raters are <= 0") {
    val perfect = Seq(("a", "a"), ("b", "b"), ("a", "a")).toDF("r1", "r2")
    val k1 = Eval.cohenKappa(perfect, "r1", "r2").select("kappa").head().getDouble(0)
    assert(math.abs(k1 - 1.0) < 1e-12)
    // systematic disagreement: observed agreement 0 → kappa < 0
    val disjoint = Seq(("a", "b"), ("b", "a"), ("a", "b"), ("b", "a")).toDF("r1", "r2")
    val k0 = Eval.cohenKappa(disjoint, "r1", "r2").select("kappa").head().getDouble(0)
    assert(k0 < 0.0)
  }

  test("neighborOverlap scores the open wedge and drops existing edges") {
    // path graph a-b-c: the only non-adjacent 2-hop pair is (a,c) through b
    val edges = Seq(("a", "b"), ("b", "c")).toDF("a", "b")
    val out = LinkPredict.neighborOverlap(edges, "a", "b")
      .as[(String, String, Long, Long)].collect()
    assert(out.toSeq == Seq(("a", "c", 1L, 500000000000L))) // deg(b)=2 → 1e12 div 2
    // triangle: no candidates at all
    val tri = Seq(("a", "b"), ("b", "c"), ("a", "c")).toDF("a", "b")
    assert(LinkPredict.neighborOverlap(tri, "a", "b").count() == 0)
    // non-canonical input: repeated edges and both orientations present must
    // not emit a==b self-pairs or inflate counts (neighbor sets, not lists)
    val messy = Seq(("a", "b"), ("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"))
      .toDF("a", "b")
    val messyOut = LinkPredict.neighborOverlap(messy, "a", "b")
      .as[(String, String, Long, Long)].collect()
    assert(messyOut.forall { case (a, b, _, _) => a != b })
    assert(messyOut.toSeq == Seq(("a", "c", 1L, 500000000000L)))
  }

  test("bootstrap multiplicities approximate Poisson(1) and meanSe is sane") {
    val ids = (1L to 4000L).toDF("id").withColumn("b", lit(0))
    val ms = ids.select(Bootstrap.multiplicity(col("id"), col("b")).as("m"))
      .groupBy("m").count().as[(Int, Long)].collect().toMap
    val n = 4000.0
    assert(math.abs(ms.getOrElse(0, 0L) / n - 0.368) < 0.03) // P(0) = 1/e
    assert(math.abs(ms.getOrElse(1, 0L) / n - 0.368) < 0.03) // P(1) = 1/e
    assert(ms.keys.forall(m => m >= 0 && m <= 6))
    val df = (1L to 500L).map(i => (i, i % 100)).toDF("id", "v")
    val row = Bootstrap.meanSe(df, "id", "v", b = 8).head()
    assert(row.getAs[Long]("n") == 500L)
    assert(row.getAs[Long]("n_resamples") == 8L)
    assert(row.getAs[Long]("mean_micro") == (df.agg(sum("v")).head().getLong(0) * 1000000L) / 500L)
    assert(row.getAs[Double]("se_micro") > 0.0)
    intercept[IllegalArgumentException](Bootstrap.meanSe(df, "id", "v", b = 1))
  }
}
