package graft

import graft.functions.JaroWinklerSim
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class StringSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinklerSim.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("jaro_winkler kernel: classic textbook values") {
    // Winkler's canonical example: jaro = 0.944…, prefix 3 → 0.9611…
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-15)
    // DUANE/DWAYNE: jaro = 0.82, prefix 1 → 0.84
    assert(math.abs(jw("duane", "dwayne") - 0.84) < 1e-12)
  }

  test("jaro_winkler kernel: edges match DuckDB's conventions") {
    assert(jw("", "") == 0.0) // both empty → 0 (DuckDB), not 1
    assert(jw("abc", "") == 0.0)
    assert(jw("same", "same") == 1.0)
    assert(jw("abc", "xyz") == 0.0) // no matches
  }

  test("jaro_winkler kernel: prefix boost gated at jaro > 0.7, prefix capped at 4") {
    // jaro("abcdxx","abcdyy") = (4/6+4/6+4/4)/3 = 7/9 > 0.7: boost applies,
    // common prefix 4 → 7/9 + 0.4·(2/9)
    assert(math.abs(jw("abcdxx", "abcdyy") - (7.0 / 9 + 0.4 * 2.0 / 9)) < 1e-15)
    // transposed halves: jaro("ab","ba") = (2/2+2/2+1/2)/3 = 5/6 but match
    // window max(2,2)/2-1 = 0 → no matches at all → 0
    assert(jw("ab", "ba") == 0.0)
  }

  test("jaro_winkler column API runs inside codegen and matches the kernel") {
    val df = Seq(("martha", "marhta"), ("duane", "dwayne"), ("", ""))
      .toDF("a", "b")
    val got = df.select(JaroWinklerSim.jaroWinkler($"a", $"b")).as[Double].collect()
    assert(math.abs(got(0) - 0.9611111111111111) < 1e-15)
    assert(math.abs(got(1) - 0.84) < 1e-12)
    assert(got(2) == 0.0)
  }

  test("jaro_winkler is SQL-registered via GraftExtensions") {
    val got = spark.sql("SELECT jaro_winkler('martha', 'marhta') AS s")
      .as[Double].collect().head
    assert(math.abs(got - 0.9611111111111111) < 1e-15)
  }

  test("jaro_winkler: null propagates") {
    val df = Seq(("martha", Option.empty[String])).toDF("a", "b")
    val got = df.select(JaroWinklerSim.jaroWinkler($"a", $"b")).collect().head
    assert(got.isNullAt(0))
  }

  test("nfc_normalize: composes decomposed sequences, ASCII fast path, null propagates") {
    import graft.functions.NfcNormalize
    val df = Seq(
      Some("e\u0301"), // decomposed e + combining acute
      Some("A\u0308scii rest"), // decomposed at the head
      Some("plain ascii"), // isNormalized fast path: returned as-is
      None)
      .toDF("s")
    val got = df.select(NfcNormalize.nfc($"s")).as[Option[String]].collect().toSeq
    assert(got == Seq(Some("\u00e9"), Some("\u00c4scii rest"), Some("plain ascii"), None))
  }

  test("nfc_normalize is SQL-registered via GraftExtensions") {
    val got = spark.sql("SELECT nfc_normalize('ex' || 'e\u0301') AS s")
      .as[String].collect().head
    assert(got == "ex\u00e9" && got.length == 3)
  }
}
