package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.ingest.{Tar, TarCodec}
import org.apache.spark.sql.functions._

/** ustar/WebDataset gates: byte round-trip, checksum verification, 512
  * padding hops, zero-block termination, directory filtering, sample
  * grouping by stem, and loud typed failure on torn shards.
  */
class TarSpec extends SparkSpec {

  private def e(name: String, body: String, tf: Char = '0') =
    TarCodec.TarEntry(name, tf, body.getBytes(UTF_8))

  test("TarCodec: round-trip preserves names, types, and body bytes") {
    val in = Seq(
      e("0.txt", "hello world"),
      e("0.cls", "en"),
      e("dir/", "", '5'),
      e("0.json", """{"id":0}"""),
      e("1.txt", "x" * 1000), // spans multiple blocks
      e("1.bin", ""))
    val out = TarCodec.parse(TarCodec.build(in))
    assert(out.map(_.name) == in.map(_.name))
    assert(out.map(_.typeflag) == in.map(_.typeflag))
    in.zip(out).foreach { case (a, b) => assert(a.body.toSeq == b.body.toSeq) }
    // bodies pad to 512: total length is header+body blocks + 2 terminators
    val built = TarCodec.build(in)
    assert(built.length % 512 == 0)
  }

  test("TarCodec: checksum mismatch, torn body, missing terminator throw typed") {
    val built = TarCodec.build(Seq(e("a.txt", "abc"), e("b.txt", "def")))
    val flip = built.clone(); flip(0) = 'z'.toByte // corrupt first header name
    val e1 = intercept[IllegalArgumentException](TarCodec.parse(flip))
    assert(e1.getMessage.contains("checksum"))
    val torn = java.util.Arrays.copyOf(built, built.length - 600)
    val e2 = intercept[IllegalArgumentException](TarCodec.parse(torn))
    assert(e2.getMessage.contains("tar:"))
    // body overrun: size field larger than archive
    val one = TarCodec.build(Seq(e("a.txt", "abc")))
    val cut = java.util.Arrays.copyOf(one, 512 + 1) // header + 1 byte of body
    val e3 = intercept[IllegalArgumentException](TarCodec.parse(cut))
    assert(e3.getMessage.contains("overruns") || e3.getMessage.contains("truncated"))
  }

  test("TarCodec.samples groups by stem, skips directories, keys by extension") {
    val s = TarCodec.samples(Seq(
      e("data/", "", '5'),
      e("data/7.txt", "seven"),
      e("data/7.json", "{}"),
      e("data/8.txt", "eight"),
      e("noext", "raw")))
    assert(s.map(_._1) == Seq("7", "8", "noext"))
    val m7 = s.head._2.toMap
    assert(new String(m7("txt"), UTF_8) == "seven" && m7.contains("json"))
    assert(new String(s(2)._2.head._2, UTF_8) == "raw" && s(2)._2.head._1 == "")
  }

  test("Tar shard round-trip: samples == source documents") {
    val docs = spark.range(0, 120).toDF("doc_id")
      .withColumn("text", concat(lit("body of doc "), col("doc_id")))
      .withColumn("lang", when(col("doc_id") % 2 === 0, "en").otherwise("de"))
      .withColumn("source", lit("unit"))
    val shards = Tar.synthesizeShards(docs, "doc_id", docsPerShard = 50)
    assert(shards.count() == 3) // 120 docs / 50
    val out = Tar.samples(shards).orderBy(col("stem").cast("long")).collect()
    assert(out.length == 120)
    assert(out.forall(_.getLong(2) == 3L))
    val r7 = out(7)
    assert(r7.getString(1) == "7" && r7.getString(3) == "body of doc 7" &&
      r7.getString(4) == "de")
    assert(r7.getLong(5) == Tar.jsonBody(7, "unit").length.toLong)
  }
}
