package graft

import graft.text.{Dsir, QualityRules}
import org.apache.spark.sql.functions._

class QualityRulesSpec extends SparkSpec {
  import spark.implicits._

  test("gopherStats: counts, exact micro ratios, and the keep rule") {
    val df = Seq(
      (1L, "the cat sat on the mat and it is that good for it " * 1),
      (2L, "x1 9 77"), // too short, mostly non-alpha... but x1 has a letter
      (3L, "")
    ).toDF("doc_id", "text")
    val out = QualityRules.gopherStats(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    // doc 1: 13 tokens, all alpha, stop hits: the,on?,and,it,is,that,for
    val r1 = out(0)
    assert(r1.getAs[Long]("n_words") == 13L)
    assert(r1.getAs[Long]("alpha_frac_micro") == 1000000L)
    assert(r1.getAs[Long]("stop_hits") == 6L) // the and it is that for
    assert(r1.getAs[Boolean]("kept"))
    // chars = 3+3+3+2+3+3+3+2+2+4+4+3+2 = 37; 37e6 div 13
    assert(r1.getAs[Long]("mean_word_len_micro") == 37000000L / 13L)
    val r2 = out(1)
    assert(r2.getAs[Long]("n_words") == 3L)
    assert(r2.getAs[Long]("alpha_frac_micro") == 1000000L / 3L)
    assert(!r2.getAs[Boolean]("kept"))
    val r3 = out(2)
    assert(r3.getAs[Long]("n_words") == 0L &&
      r3.getAs[Long]("mean_word_len_micro") == 0L && !r3.getAs[Boolean]("kept"))
  }

  test("repetitionStats: top/dup gram mass on a crafted repeater") {
    // "ab cd ab cd ab" — bigrams: "ab cd"×2, "cd ab"×2; token-char mass
    // (separator excluded) 4 each → total 16; top 8/16, dup 16/16
    val df = Seq((1L, "ab cd ab cd ab"), (2L, "one"), (3L, "")).toDF("doc_id", "text")
    val out = QualityRules.repetitionStats(df, "doc_id", "text", Seq(2))
      .orderBy("doc_id").collect()
    val r1 = out(0)
    assert(r1.getAs[Long]("total_mass") == 16L)
    assert(r1.getAs[Long]("top_frac_micro") == 500000L)
    assert(r1.getAs[Long]("dup_frac_micro") == 1000000L)
    // doc 2 has no bigrams; doc 3 empty — both zero-filled, still present
    assert(out(1).getAs[Long]("total_mass") == 0L)
    assert(out(2).getAs[Long]("top_frac_micro") == 0L)
    assert(out.length == 3)
  }

  test("repetitionStats: unique-gram doc has top = 1/n_grams mass, dup = 0") {
    val df = Seq((1L, "a bb ccc dddd")).toDF("doc_id", "text")
    val out = QualityRules.repetitionStats(df, "doc_id", "text", Seq(2)).collect()
    // bigram token-char masses: "a bb"(3), "bb ccc"(5), "ccc dddd"(7) — total 15
    assert(out(0).getAs[Long]("total_mass") == 15L)
    assert(out(0).getAs[Long]("top_frac_micro") == 7L * 1000000L / 15L)
    assert(out(0).getAs[Long]("dup_frac_micro") == 0L)
  }

  test("dsir weights: target-heavy tokens score positive, source-only negative") {
    // target docs say "good", source noise says "spam"; a doc of pure
    // "good" must outweigh a doc of pure "spam"
    val df = Seq(
      (1L, "good good good", "en"),
      (2L, "good good good", "en"),
      (3L, "spam spam spam", "de"),
      (4L, "spam spam spam", "de"),
      (5L, "good spam", "de"),
      (6L, "", "en")
    ).toDF("doc_id", "text", "lang")
    val out = Dsir.hashedImportanceWeights(df, "doc_id", "text",
        isTarget = col("lang") === "en", dims = 16)
      .orderBy("doc_id").collect()
    val w = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("w_micronats")).toMap
    assert(w(1L) > 0L, s"target-typical doc should score positive, got ${w(1L)}")
    assert(w(3L) < 0L, s"source-only doc should score negative, got ${w(3L)}")
    assert(w(1L) == w(2L)) // identical docs, identical weights
    assert(w(6L) == 0L && out(5).getAs[Long]("n_tokens") == 0L)
    // mixed doc sits strictly between
    assert(w(3L) < w(5L) && w(5L) < w(1L))
  }
}
