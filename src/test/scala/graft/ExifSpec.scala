package graft

import graft.multimodal.{ExifCodec, JpegCodec, Multimodal}
import org.apache.spark.sql.functions._

/** EXIF gates: recipe round-trip through the real TIFF structure, the
  * big-endian variant, strip behavior (APP1+COM drop, pixel identity),
  * absent-EXIF sniff, and typed failure on malformed TIFF.
  */
class ExifSpec extends SparkSpec {
  import spark.implicits._

  private def jpeg(id: Long): Array[Byte] = {
    val px = Array.tabulate(16 * 16) { i =>
      val v = ((id * 29 + (i / 16) / 8 * 71 + (i % 16) / 8 * 113) % 256).toInt
      (v << 16) | (v << 8) | v
    }
    JpegCodec.encode(16, 16, px, grayscale = true)
  }

  test("recipe round-trip: build → insert → sniff for GPS and non-GPS ids") {
    for (id <- Seq(0L, 1L, 2L, 3L, 6L, 7L)) {
      val (o, dt, gps) = Multimodal.exifRecipe(id)
      val tagged = ExifCodec.insertApp1(jpeg(id), ExifCodec.buildApp1(o, dt, gps))
      val e = ExifCodec.sniff(tagged)
      assert(e.orientation.contains(o) && e.dateTime.contains(dt))
      assert(e.gps == gps, s"id $id")
      assert(ExifCodec.countApp1(tagged) == 1)
    }
  }

  test("big-endian (MM) TIFF with in-entry orientation parses") {
    // hand-build: Exif\0\0 + MM header + one-entry IFD0 (orientation=6)
    def be16(v: Int) = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be32(v: Int) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val tiff = "MM".getBytes("ISO-8859-1") ++ be16(42) ++ be32(8) ++
      be16(1) ++ (be16(0x0112) ++ be16(3) ++ be32(1) ++ be16(6) ++ be16(0)) ++ be32(0)
    val payload = "Exif\u0000\u0000".getBytes("ISO-8859-1") ++ tiff
    val e = ExifCodec.sniff(ExifCodec.insertApp1(jpeg(1), payload))
    assert(e.orientation.contains(6) && e.dateTime.isEmpty && e.gps.isEmpty)
  }

  test("strip drops APP1, keeps pixels bit-identical; plain JPEG sniffs absent") {
    val id = 9L
    val (o, dt, gps) = Multimodal.exifRecipe(id)
    val tagged = ExifCodec.insertApp1(jpeg(id), ExifCodec.buildApp1(o, dt, gps))
    val stripped = ExifCodec.stripMetadata(tagged)
    assert(ExifCodec.countApp1(stripped) == 0)
    assert(ExifCodec.sniff(stripped) == ExifCodec.Exif(None, None, None))
    assert(JpegCodec.decode(stripped).pixels.toSeq == JpegCodec.decode(jpeg(id)).pixels.toSeq)
    // plain JPEG: absent record, not an error
    assert(ExifCodec.sniff(jpeg(id)) == ExifCodec.Exif(None, None, None))
  }

  test("malformed TIFF throws typed; truncated segment throws typed") {
    val bad = "Exif\u0000\u0000XX".getBytes("ISO-8859-1") ++ new Array[Byte](8)
    val e1 = intercept[IllegalArgumentException](
      ExifCodec.sniff(ExifCodec.insertApp1(jpeg(1), bad)))
    assert(e1.getMessage.contains("byte order"))
    val (o, dt, gps) = Multimodal.exifRecipe(0L)
    val tagged = ExifCodec.insertApp1(jpeg(0), ExifCodec.buildApp1(o, dt, gps))
    val torn = java.util.Arrays.copyOf(tagged, 40) // cut inside APP1
    val e2 = intercept[IllegalArgumentException](ExifCodec.sniff(torn))
    assert(e2.getMessage.contains("exif:"))
  }

  test("extractExifAudit: per-row audit equals the recipe, strip proven") {
    val docs = spark.range(0, 12).toDF("doc_id")
    val out = Multimodal.extractExifAudit(
      Multimodal.withExif(
        Multimodal.synthesizeJpeg(docs, "doc_id", grayscale = true)))
      .orderBy("media_id").collect()
    assert(out.length == 12)
    out.foreach { r =>
      val id = r.getLong(0)
      val (o, dt, gps) = Multimodal.exifRecipe(id)
      assert(r.getLong(1) == o.toLong && r.getString(2) == dt)
      assert(r.getBoolean(3) == gps.isDefined)
      gps.foreach { g =>
        assert(r.getString(4) == g.latRef && r.getLong(5) == g.latDeg &&
          r.getLong(7) == g.latSecMilli && r.getString(8) == g.lonRef)
      }
      assert(r.getLong(12) == 1L && r.getLong(13) == 0L) // app1 before/after
      assert(r.getBoolean(14), s"pixels changed for $id")
    }
  }

  test("applyOrientation: exact remaps, involutions, and 6/8 inversion") {
    import graft.multimodal.BmpCodec
    // 3×2 image with distinct pixels: orientation math is fully determined
    val img = BmpCodec.Bmp(3, 2, Array(1, 2, 3, 4, 5, 6))
    def px(b: BmpCodec.Bmp) = (b.width, b.height, b.pixels.toSeq)
    assert(px(BmpCodec.applyOrientation(img, 1)) == ((3, 2, Seq(1, 2, 3, 4, 5, 6))))
    assert(px(BmpCodec.applyOrientation(img, 2)) == ((3, 2, Seq(3, 2, 1, 6, 5, 4))))
    assert(px(BmpCodec.applyOrientation(img, 3)) == ((3, 2, Seq(6, 5, 4, 3, 2, 1))))
    assert(px(BmpCodec.applyOrientation(img, 4)) == ((3, 2, Seq(4, 5, 6, 1, 2, 3))))
    assert(px(BmpCodec.applyOrientation(img, 5)) == ((2, 3, Seq(1, 4, 2, 5, 3, 6))))
    assert(px(BmpCodec.applyOrientation(img, 6)) == ((2, 3, Seq(4, 1, 5, 2, 6, 3))))
    assert(px(BmpCodec.applyOrientation(img, 7)) == ((2, 3, Seq(6, 3, 5, 2, 4, 1))))
    assert(px(BmpCodec.applyOrientation(img, 8)) == ((2, 3, Seq(3, 6, 2, 5, 1, 4))))
    // applying o then its inverse is the identity, for every o
    (1 to 8).foreach { o =>
      val back = BmpCodec.applyOrientation(
        BmpCodec.applyOrientation(img, o), BmpCodec.inverseOrientation(o))
      assert(px(back) == px(img), s"o=$o not inverted")
    }
    intercept[IllegalArgumentException](BmpCodec.applyOrientation(img, 0))
  }

  test("oriented dHash: all 8 orientations of one photo land ONE cluster; " +
    "the stored-order hash does NOT") {
    val docs = spark.range(0, 32).toDF("doc_id") // 4 groups × 8 orientations
    val media = Multimodal.synthesizeJpegOriented(docs, "doc_id")
    val oriented = Multimodal.extractJpegOrientedDHash(media)
      .select(expr("media_id div 8").as("grp"), col("dhash"))
      .groupBy("grp").agg(countDistinct("dhash").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(oriented.values.forall(_ == 1L), s"oriented clusters split: $oriented")
    // without normalization the rotated twins scatter across hashes —
    // the exact failure mode this closes
    val stored = Multimodal.extractJpegDHash(media)
      .select(expr("media_id div 8").as("grp"), col("dhash"))
      .groupBy("grp").agg(countDistinct("dhash").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(stored.values.exists(_ > 1L), s"stored-order hash already clustered: $stored")
  }
}
