package graft

import graft.clean.Clean
import graft.dedup.Dedup
import graft.load.Casts
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generated properties from the SURVEY §5 test plan: dedup
  * idempotence, anti-join disjointness, cast totality, hash determinism —
  * checked on generated data, not fixtures. (Plain scalatest + scalacheck
  * Gens with a fixed seed; the scalatestplus shim isn't in the offline
  * dependency cache.)
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rowsGen: Gen[List[(String, String)]] =
    Gen.listOfN(30, Gen.zip(
      Gen.oneOf("a", "b", "c", "d", "e"),
      Gen.oneOf("x", "y", "z")))

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("dedup idempotence: dedup(dedup(x)) == dedup(x)") {
    for (rows <- samples(rowsGen, 5) if rows.nonEmpty) {
      val df = Clean.withRowHash(rows.toDF("k", "v"))
      val once = Dedup.selfDedupAnyWins(df, "row_hash")
      val twice = Dedup.selfDedupAnyWins(once, "row_hash")
      assert(once.count() == twice.count())
      assert(once.count() == rows.distinct.size)
    }
  }

  test("anti-join disjointness: inserted ∩ existing = ∅, inserted = batch \\ prior") {
    val pairs = samples(rowsGen, 4).grouped(2).collect { case Seq(a, b) => (a, b) }.toSeq
    for ((batchRows, priorRows) <- pairs if batchRows.nonEmpty) {
      val batch = Clean.withRowHash(batchRows.toDF("k", "v"))
      val prior = Clean.withRowHash(priorRows.toDF("k", "v"))
      val inserted = Dedup.antiJoinPrior(batch, prior, "row_hash")
        .select("k", "v").as[(String, String)].collect().toSet
      val priorSet = priorRows.toSet
      assert(inserted.intersect(priorSet).isEmpty)
      assert(batchRows.toSet.diff(priorSet) == inserted)
    }
  }

  test("cast totality: numeric/timestamp coercion never throws, for any string") {
    val strGen = Gen.oneOf(
      Gen.numStr, Gen.alphaStr, Gen.const(""), Gen.const("3.5"),
      Gen.const("<NA>"), Gen.const("nan"), Gen.const("2024-01-01 00:00:00"))
    for (vals <- samples(Gen.listOfN(20, strGen), 5) if vals.nonEmpty) {
      val df = vals.toDF("s")
      val n = df.select(
        Casts.toLongCoerce(Casts.normalizeNullStrings($"s")),
        Casts.toDoubleCoerce(Casts.normalizeNullStrings($"s")),
        Casts.toTimestampCoerce(Casts.normalizeNullStrings($"s")),
        Casts.dobFormat(Casts.normalizeNullStrings($"s"))).count()
      assert(n == vals.size)
    }
  }

  test("row hash: equal rows hash equal, differing rows hash differently") {
    for (rows <- samples(rowsGen, 5) if rows.nonEmpty) {
      val hashes = Clean.withRowHash(rows.toDF("k", "v"))
        .select("k", "v", "row_hash")
        .as[(String, String, String)].collect()
      val byContent = hashes.groupBy(r => (r._1, r._2)).values
      assert(byContent.forall(g => g.map(_._3).distinct.length == 1))
      assert(hashes.map(_._3).distinct.length == rows.distinct.length)
    }
  }
}
