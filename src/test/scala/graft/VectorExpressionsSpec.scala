package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("dot_product: correct values, float and double arrays") {
    val df = Seq(
      (Seq(1.0f, 2.0f, 3.0f), Seq(4.0, 5.0, 6.0)),
      (Seq(0.0f, 0.0f, 0.0f), Seq(1.0, 1.0, 1.0))).toDF("f", "d")
    val out = df.select(
      VectorFunctions.dot($"f", $"d").as("fd"),
      VectorFunctions.dot($"f", $"f").as("ff"),
      VectorFunctions.dot($"d", $"d").as("dd")).collect()
    assert(out(0).getDouble(0) == 32.0)
    assert(out(0).getDouble(1) == 14.0)
    assert(out(0).getDouble(2) == 77.0)
    assert(out(1).getDouble(0) == 0.0)
  }

  test("dot_product matches the built-in HOF fold bit-for-bit on real embeddings") {
    val emb = Tables.load(spark, sf, "embeddings").limit(50)
    val hof = aggregate(
      zip_with(col("embedding"), col("embedding"), (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val diff = emb.select(
      (VectorFunctions.dot(col("embedding"), col("embedding")) - hof).as("d"))
      .agg(max(abs(col("d")))).head().getDouble(0)
    assert(diff == 0.0) // identical accumulation order => identical bits
  }

  test("mismatched vector lengths produce null (corrupt vectors must surface)") {
    val df = Seq((Seq(1.0f, 2.0f), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
    assert(df.select(VectorFunctions.dot($"a", $"b")).head().isNullAt(0))
    assert(df.select(VectorFunctions.cosine($"a", $"b")).head().isNullAt(0))
  }

  test("fused cosine_sim matches the three-DotProduct composition bit-for-bit") {
    val emb = Tables.load(spark, sf, "embeddings").limit(50)
    val e2 = emb.select(col("vec_id"), col("embedding"))
      .crossJoin(emb.select(col("embedding").as("emb2")).limit(5))
    def dotc(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      VectorFunctions.dot(a, b)
    val composed = dotc(col("embedding"), col("emb2")) /
      (sqrt(dotc(col("embedding"), col("embedding"))) * sqrt(dotc(col("emb2"), col("emb2"))))
    val diff = e2.select(
      (VectorFunctions.cosine(col("embedding"), col("emb2")) - composed).as("d"))
      .agg(max(abs(col("d")))).head().getDouble(0)
    assert(diff == 0.0) // same per-accumulator fold order => identical bits
  }

  test("cosine_sim SQL registration via extensions") {
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c," +
        " cosine_sim(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS o").head()
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 0.0)
  }

  test("null text never reaches size()=-1 semantics in the text stack") {
    val df = Seq[Option[String]](None, Some("a b")).toDF("t")
    val out = df.select(
      graft.text.TextAnalysis.tokenCount($"t").as("n"),
      graft.text.TextAnalysis.distinctTokenRatio($"t").as("r")).collect()
    assert(out(0).getInt(0) == 0 && out(0).getDouble(1) == 0.0)
    assert(out(1).getInt(0) == 2)
  }

  test("null inputs produce null; SQL registration works") {
    VectorFunctions.register(spark)
    val r = spark.sql("SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").head()
    assert(r.getDouble(0) == 11.0)
    val n = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]])).toDF("a", "b")
      .selectExpr("a", "b")
    val out = n.select(VectorFunctions.dot(col("a"), col("b"))).head()
    assert(out.isNullAt(0))
  }

  test("stays inside whole-stage codegen") {
    val emb = Tables.load(spark, sf, "embeddings")
    val df = emb.select(VectorFunctions.dot(col("embedding"), col("embedding")).as("d"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("), s"dot_product fell out of codegen:\n$p")
  }
}
