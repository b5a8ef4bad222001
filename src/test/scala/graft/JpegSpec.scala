package graft

import graft.multimodal.{JpegCodec, Multimodal}

/** Gates for the pure-JVM baseline JPEG codec: the fixed-point transform's
  * closed-form DC path (what the q300/q301 oracles replay), real-image
  * round-trip tolerance, byte stuffing, and loud rejection of everything
  * the decoder does not support.
  */
class JpegSpec extends SparkSpec {
  import spark.implicits._

  /** The q300 oracle's BIGINT shift chain, reimplemented independently:
    * decode of a DC-only block whose level-shifted constant quantizes at
    * `q00`. Must equal what the codec's full FDCT → quant → Huffman →
    * dequant → IDCT pipeline produces for a constant block.
    */
  private def closedForm(chan: Int, q00: Int): Int = {
    val f00 = 8L * (chan - 128)
    val qdc = Math.floorDiv(2 * f00 + q00, 2L * q00)
    val g1 = (qdc * q00 * 370728L + 2048L) >> 12
    val rec = ((g1 * 370728L + (1L << 27)) >> 28) + 128
    math.max(0L, math.min(255L, rec)).toInt
  }

  test("Fix: DC basis constant is the oracle's 370728") {
    assert(JpegCodec.Fix.T00 == 370728L)
  }

  test("FDCT: every constant block lands exactly on F00 = 8*(v-128), AC quantizes to 0") {
    val coef = new Array[Long](64)
    for (v <- 0 until 256) {
      val samples = Array.fill(64)(v - 128)
      JpegCodec.Fix.fdct(samples, coef)
      assert(coef(0) == 8L * (v - 128), s"DC off for v=$v: ${coef(0)}")
      for (k <- 1 until 64) {
        // AC must quantize to zero under BOTH Annex-K tables (min Q is 10)
        assert(math.abs(coef(k)) < 5, s"AC($k) too large for v=$v: ${coef(k)}")
      }
    }
  }

  test("grayscale closed form: decode(encode(constant v)) == oracle chain, all 256 v") {
    for (v <- 0 until 256) {
      val px = Array.fill(64)((v << 16) | (v << 8) | v)
      val img = JpegCodec.decode(JpegCodec.encode(8, 8, px, grayscale = true))
      assert(img.width == 8 && img.height == 8)
      val want = closedForm(v, 16)
      val got = img.pixels(0)
      assert(img.pixels.forall(_ == got), s"block not constant for v=$v")
      assert(got == ((want << 16) | (want << 8) | want),
        f"v=$v: got 0x$got%06X want gray $want")
    }
  }

  test("color closed form: YCbCr 4:4:4 constant blocks match the q301 oracle chain") {
    // deterministic RGB sample sweep, including the channel extremes
    val rgbs = (0 until 300).map { i =>
      (((i * 67) % 256), ((i * 131 + 7) % 256), ((i * 251 + 13) % 256))
    } ++ Seq((0, 0, 0), (255, 255, 255), (255, 0, 0), (0, 255, 0), (0, 0, 255))
    for ((r, g, b) <- rgbs) {
      val px = Array.fill(64)((r << 16) | (g << 8) | b)
      val img = JpegCodec.decode(JpegCodec.encode(8, 8, px))
      // oracle replay: pinned forward color transform, per-channel DC
      // chain (Y at Q00=16, chroma at Q00=17), pinned inverse transform
      def fd(x: Long) = Math.floorDiv(x + 500000L, 1000000L).toInt
      def cl(x: Int) = math.max(0, math.min(255, x))
      val y = cl(fd(299000L * r + 587000L * g + 114000L * b))
      val cb = cl(128 + fd(-168736L * r - 331264L * g + 500000L * b))
      val cr = cl(128 + fd(500000L * r - 418688L * g - 81312L * b))
      val ry = closedForm(y, 16)
      val rcb = closedForm(cb, 17)
      val rcr = closedForm(cr, 17)
      val wr = cl(fd(1000000L * ry + 1402000L * (rcr - 128)))
      val wg = cl(fd(1000000L * ry - 344136L * (rcb - 128) - 714136L * (rcr - 128)))
      val wb = cl(fd(1000000L * ry + 1772000L * (rcb - 128)))
      val got = img.pixels(0)
      assert(img.pixels.forall(_ == got), s"block not constant for rgb=($r,$g,$b)")
      assert(got == ((wr << 16) | (wg << 8) | wb),
        f"rgb=($r,$g,$b): got 0x$got%06X want ($wr,$wg,$wb)")
    }
  }

  test("smooth gradient round-trips within quantization tolerance (incl. edge padding)") {
    // 21x13 exercises partial blocks (edge replication) on both axes
    val w = 21; val h = 13
    val px = Array.tabulate(w * h) { i =>
      val y = i / w; val x = i % w
      val r = math.min(255, 40 + 3 * x + 2 * y)
      val g = math.min(255, 80 + 2 * x + 4 * y)
      val b = math.min(255, 120 + x + y)
      (r << 16) | (g << 8) | b
    }
    for (gray <- Seq(true, false)) {
      val img = JpegCodec.decode(JpegCodec.encode(w, h, px, gray))
      assert(img.width == w && img.height == h)
      var maxErr = 0
      for (i <- 0 until w * h) {
        val want =
          if (gray) {
            val p = px(i)
            val (yy, _, _) = (Math.floorDiv(
              299000L * ((p >> 16) & 0xFF) + 587000L * ((p >> 8) & 0xFF) +
                114000L * (p & 0xFF) + 500000L, 1000000L).toInt, 0, 0)
            (yy << 16) | (yy << 8) | yy
          } else px(i)
        for (sh <- Seq(16, 8, 0)) {
          val e = math.abs(((img.pixels(i) >> sh) & 0xFF) - ((want >> sh) & 0xFF))
          maxErr = math.max(maxErr, e)
        }
      }
      assert(maxErr <= 24, s"gray=$gray: max channel error $maxErr over tolerance")
    }
  }

  test("encode is deterministic and the entropy stream exercises byte stuffing") {
    val px = Array.tabulate(256) { i => (i * 7919) % 0x1000000 }
    val a = JpegCodec.encode(16, 16, px)
    val b = JpegCodec.encode(16, 16, px)
    assert(java.util.Arrays.equals(a, b))
    // a big noise image still decodes (no exactness claim — just that the
    // real entropy stream parses end to end)
    val noise = Array.tabulate(64 * 64) { i => (i * 7919) % 0x1000000 }
    val rt = JpegCodec.decode(JpegCodec.encode(64, 64, noise))
    assert(rt.width == 64 && rt.height == 64)
  }

  test("byte stuffing: an all-ones bit pattern stuffs 0xFF00 and unstuffs back") {
    // drive the bit I/O pair directly — the codec's own Huffman code space
    // tops out below the all-ones prefixes, so aligned 0xFF bytes are rare
    // in natural streams; this pins the stuff/unstuff contract itself
    val bos = new java.io.ByteArrayOutputStream()
    val w = new JpegCodec.BitWriter(bos)
    w.put(0xFFFF, 16) // two aligned 0xFF bytes -> two stuffed zeros
    w.put(0x2, 3)
    w.finish()
    val bytes = bos.toByteArray
    assert(bytes.length == 5, bytes.map(b => f"$b%02X").mkString(" "))
    assert((bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0x00)
    assert((bytes(2) & 0xFF) == 0xFF && (bytes(3) & 0xFF) == 0x00)
    val r = new JpegCodec.BitReader(bytes, 0)
    assert(r.bitsVal(16) == 0xFFFF)
    assert(r.bitsVal(3) == 0x2)
    // a stuffed stream with a real marker instead of 0x00 fails loudly
    val bad = bytes.clone()
    bad(1) = 0xD9.toByte
    val rb = new JpegCodec.BitReader(bad, 0)
    val e = intercept[IllegalArgumentException](rb.bitsVal(16))
    assert(e.getMessage.contains("marker"))
  }

  test("unsupported and corrupt payloads fail loudly and typed") {
    val px = Array.fill(64)(0x336699)
    val ok = JpegCodec.encode(8, 8, px)

    def expectIae(bytes: Array[Byte], what: String): Unit = {
      val e = intercept[IllegalArgumentException](JpegCodec.decode(bytes))
      assert(e != null, what)
    }
    // truncation at every interesting boundary
    expectIae(ok.take(1), "one byte")
    expectIae(ok.take(ok.length / 2), "half the file")
    // mid-entropy truncation: a high-entropy 16x16 has a long scan; cut it
    val big = JpegCodec.encode(16, 16,
      Array.tabulate(256)(i => (i * 7919) % 0x1000000))
    val bigSos = (0 until big.length - 1).indexWhere(j =>
      (big(j) & 0xFF) == 0xFF && (big(j + 1) & 0xFF) == 0xDA)
    expectIae(big.take(bigSos + 20), "mid-entropy cut")
    // not a JPEG at all
    expectIae("not a jpeg at all".getBytes("US-ASCII"), "junk")
    // a baseline file RELABELED SOF2 is corrupt progressive (its single
    // scan claims the 0..63 band with Ss=0, which progressive forbids) —
    // loud, not a wrong-pixels decode
    val prog = ok.clone()
    val sof = (0 until prog.length - 1).indexWhere(j =>
      (prog(j) & 0xFF) == 0xFF && (prog(j + 1) & 0xFF) == 0xC0)
    prog(sof + 1) = 0xC2.toByte
    val pe = intercept[IllegalArgumentException](JpegCodec.decode(prog))
    assert(pe.getMessage.contains("DC band"), pe.getMessage)
    // unsupported sampling layout: craft a color file and flip Y's
    // sampling to 2x1 (4:2:2 — neither 1x1-everywhere nor 4:2:0)
    val colorPx = Array.fill(64)(0x884422)
    val color = JpegCodec.encode(8, 8, colorPx)
    val sub = color.clone()
    val csof = (0 until sub.length - 1).indexWhere(j =>
      (sub(j) & 0xFF) == 0xFF && (sub(j + 1) & 0xFF) == 0xC0)
    // SOF payload: len(2) precision(1) h(2) w(2) nc(1) then [id, hv, tq]*
    sub(csof + 2 + 2 + 1 + 4 + 1 + 1) = 0x21.toByte
    val se = intercept[IllegalArgumentException](JpegCodec.decode(sub))
    assert(se.getMessage.contains("sampling"))
  }

  test("4:2:0 closed form: MCU-constant tiles match the q301 per-channel chain") {
    // constant 16x16 MCU: 4 constant Y blocks; the pinned 2x2 chroma
    // average of a constant is the constant, so chroma is DC-only too —
    // the decode must land exactly where 4:4:4 does for the same color
    val rgbs = (0 until 120).map { i =>
      (((i * 67) % 256), ((i * 131 + 7) % 256), ((i * 251 + 13) % 256))
    } ++ Seq((0, 0, 0), (255, 255, 255), (255, 0, 0), (0, 255, 0), (0, 0, 255))
    for ((r, g, b) <- rgbs) {
      val px = Array.fill(16 * 16)((r << 16) | (g << 8) | b)
      val img = JpegCodec.decode(
        JpegCodec.encode(16, 16, px, subsample420 = true))
      assert(img.width == 16 && img.height == 16)
      def fd(x: Long) = Math.floorDiv(x + 500000L, 1000000L).toInt
      def cl(x: Int) = math.max(0, math.min(255, x))
      val y = cl(fd(299000L * r + 587000L * g + 114000L * b))
      val cb = cl(128 + fd(-168736L * r - 331264L * g + 500000L * b))
      val cr = cl(128 + fd(500000L * r - 418688L * g - 81312L * b))
      val ry = closedForm(y, 16)
      val rcb = closedForm(cb, 17)
      val rcr = closedForm(cr, 17)
      val wr = cl(fd(1000000L * ry + 1402000L * (rcr - 128)))
      val wg = cl(fd(1000000L * ry - 344136L * (rcb - 128) - 714136L * (rcr - 128)))
      val wb = cl(fd(1000000L * ry + 1772000L * (rcb - 128)))
      val got = img.pixels(0)
      assert(img.pixels.forall(_ == got), s"MCU not constant for rgb=($r,$g,$b)")
      assert(got == ((wr << 16) | (wg << 8) | wb),
        f"rgb=($r,$g,$b): got 0x$got%06X want ($wr,$wg,$wb)")
    }
  }

  test("4:2:0 general images: smooth gradient tolerance, odd dims, restarts compose") {
    val w = 37; val h = 21 // odd dims: replicated chroma edges + partial MCUs
    val px = Array.tabulate(w * h) { i =>
      val y = i / w; val x = i % w
      val r = math.min(255, 40 + 3 * x + 2 * y)
      val g = math.min(255, 80 + 2 * x + 4 * y)
      val b = math.min(255, 120 + x + y)
      (r << 16) | (g << 8) | b
    }
    val img = JpegCodec.decode(JpegCodec.encode(w, h, px, subsample420 = true))
    assert(img.width == w && img.height == h)
    var maxErr = 0
    for (i <- 0 until w * h; sh <- Seq(16, 8, 0)) {
      maxErr = math.max(maxErr,
        math.abs(((img.pixels(i) >> sh) & 0xFF) - ((px(i) >> sh) & 0xFF)))
    }
    assert(maxErr <= 32, s"4:2:0 max channel error $maxErr over tolerance")
    // restart markers on the subsampled layout change bytes, not pixels
    val rt = JpegCodec.decode(
      JpegCodec.encode(w, h, px, subsample420 = true, restartInterval = 2))
    assert(rt.pixels.toSeq == img.pixels.toSeq)
    // an unsupported layout (2x1) still fails loudly
    val f = JpegCodec.encode(16, 16, px.take(256), subsample420 = true)
    val sof = (0 until f.length - 1).indexWhere(j =>
      (f(j) & 0xFF) == 0xFF && (f(j + 1) & 0xFF) == 0xC0)
    val bad = f.clone()
    bad(sof + 11) = 0x21.toByte // Y sampling 2x2 -> 2x1
    val e = intercept[IllegalArgumentException](JpegCodec.decode(bad))
    assert(e.getMessage.contains("sampling"))
  }

  test("restart intervals: DRI/RSTm round-trip equals the unrestarted decode") {
    // 40x16 gray = 10 MCUs; interval 3 -> RST0..RST2 at MCUs 3,6,9
    val w = 40; val h = 16
    val px = Array.tabulate(w * h) { i =>
      val v = (i * 37 + (i / w) * 11) % 256
      (v << 16) | (v << 8) | v
    }
    val plain = JpegCodec.encode(w, h, px, grayscale = true)
    val restarted = JpegCodec.encode(w, h, px, grayscale = true, restartInterval = 3)
    assert(!java.util.Arrays.equals(plain, restarted))
    // the DRI segment and at least one RST marker are really in the bytes
    def hasMarker(bytes: Array[Byte], m: Int): Boolean =
      (0 until bytes.length - 1).exists(j =>
        (bytes(j) & 0xFF) == 0xFF && (bytes(j + 1) & 0xFF) == m)
    assert(hasMarker(restarted, 0xDD) && hasMarker(restarted, 0xD0))
    assert(!hasMarker(plain, 0xDD))
    val a = JpegCodec.decode(plain)
    val b = JpegCodec.decode(restarted)
    assert(a.pixels.toSeq == b.pixels.toSeq,
      "restart markers must not change decoded pixels")
    // color path too (3 predictors reset per restart)
    val colorPx = Array.tabulate(w * h)(i => (i * 7919 + 13) % 0x1000000)
    val ca = JpegCodec.decode(JpegCodec.encode(w, h, colorPx))
    val cb = JpegCodec.decode(JpegCodec.encode(w, h, colorPx, restartInterval = 2))
    assert(ca.pixels.toSeq == cb.pixels.toSeq)
    // a wrong restart index is corruption, not a resync point
    val bad = restarted.clone()
    val at = (0 until bad.length - 1).indexWhere(j =>
      (bad(j) & 0xFF) == 0xFF && (bad(j + 1) & 0xFF) == 0xD0)
    bad(at + 1) = 0xD5.toByte
    val e = intercept[IllegalArgumentException](JpegCodec.decode(bad))
    assert(e.getMessage.contains("RST"))
  }

  test("synthesizeJpeg -> extractJpegFeatures: distributed decode matches closed form") {
    val docs = Seq(3L, 7L, 12L).toDF("doc_id")
    val gray = Multimodal.extractJpegFeatures(
      Multimodal.synthesizeJpeg(docs, "doc_id", grayscale = true))
      .orderBy("media_id").collect()
    assert(gray.length == 3)
    for (row <- gray) {
      val id = row.getLong(0)
      val recs = for (by <- 0 to 1; bx <- 0 to 1) yield
        closedForm((((id * 29 + by * 71 + bx * 113) % 256)).toInt, 16)
      assert(row.getLong(1) == 16 && row.getLong(2) == 16 && row.getLong(3) == 256)
      assert(row.getLong(4) == 64L * recs.sum, s"sum_r for id=$id")
      assert(row.getLong(7) == 1000L * recs.min && row.getLong(8) == 1000L * recs.max)
    }
  }

  test("dims: header-only sniff reads SOF without decoding, flags lying metadata") {
    val px = Array.tabulate(16 * 16)(i => (i * 7919) % 0x1000000)
    val jpg = JpegCodec.encode(16, 16, px)
    assert(JpegCodec.dims(jpg) == ((16, 16, 3)))
    val gray = JpegCodec.encode(16, 16, px, grayscale = true)
    assert(JpegCodec.dims(gray) == ((16, 16, 1)))
    // NON-square, so a SOF height-before-width swap cannot pass: the
    // classic trap dims0's u16(pos+5)/u16(pos+3) ordering guards against
    val rect = Array.tabulate(24 * 16)(i => (i * 131) % 0x1000000)
    assert(JpegCodec.dims(JpegCodec.encode(24, 16, rect)) == ((24, 16, 3)))
    val rectImg = JpegCodec.decode(JpegCodec.encode(24, 16, rect))
    assert(rectImg.width == 24 && rectImg.height == 16)
    // sniff is deliberately laxer than decode: a progressive SOF2 still
    // sniffs (dims live in the same frame-header layout)
    val prog = jpg.clone()
    val sof = (0 until prog.length - 1).indexWhere(j =>
      (prog(j) & 0xFF) == 0xFF && (prog(j + 1) & 0xFF) == 0xC0)
    prog(sof + 1) = 0xC2.toByte
    assert(JpegCodec.dims(prog) == ((16, 16, 3)))
    intercept[IllegalArgumentException](JpegCodec.dims(jpg.take(sof)))
    intercept[IllegalArgumentException](JpegCodec.dims("junk".getBytes))
    // the distributed sniff: bytes win over metadata, lying meta flagged
    val media = Multimodal.synthesizeJpeg(Seq(1L, 2L).toDF("doc_id"), "doc_id",
      grayscale = false)
    val lied = media.withColumn("meta",
      org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.col("media_id") === 2L,
        org.apache.spark.sql.functions.struct(
          org.apache.spark.sql.functions.lit("image").as("modality"),
          org.apache.spark.sql.functions.lit("jpeg").as("format"),
          org.apache.spark.sql.functions.lit(999).as("width"),
          org.apache.spark.sql.functions.lit(16).as("height"),
          org.apache.spark.sql.functions.lit(null).cast("long").as("duration_ms")))
        .otherwise(org.apache.spark.sql.functions.col("meta")))
    val out = Multimodal.sniffJpegDims(lied).orderBy("media_id").collect()
    assert(out(0).getLong(1) == 16 && out(0).getLong(2) == 16 &&
      out(0).getLong(3) == 3 && out(0).getBoolean(4))
    assert(out(1).getLong(1) == 16 && !out(1).getBoolean(4))
  }

  test("extractJpegDHash: identical pixels give identical payloads and hashes") {
    val docs = Seq(5L, 5L + 256L).toDF("doc_id") // recipes collide mod 256
    val hashes = Multimodal.extractJpegDHash(
      Multimodal.synthesizeJpeg(docs, "doc_id", grayscale = true))
      .select("dhash").distinct().count()
    assert(hashes == 1, "mod-256 twin payloads must fingerprint identically")
  }

  // ---- progressive (SOF2) --------------------------------------------------

  test("progressive == sequential: identical pixels for every layout and shape") {
    // the scan script only reorders WHEN coefficient bits arrive; after
    // the final refinement both codings carry the same quantized
    // coefficients, so the decoded pixels must be IDENTICAL — the
    // strongest possible equivalence gate, checked over high-entropy
    // images (every Huffman/EOB-run/ZRL/correction-bit path fires),
    // gradients, and odd dimensions that force padded MCU grids
    def px(w: Int, h: Int, seed: Int): Array[Int] =
      Array.tabulate(w * h)(i => ((i * 2654435761L + seed * 97L) >>> 5).toInt & 0xFFFFFF)
    val shapes = Seq((16, 16), (17, 11), (24, 16), (8, 8), (40, 33), (1, 1))
    for ((w, h) <- shapes; seed <- Seq(1, 2)) {
      val p = px(w, h, seed)
      val seq = JpegCodec.decode(JpegCodec.encode(w, h, p))
      val prog = JpegCodec.decode(JpegCodec.encodeProgressive(w, h, p))
      assert(prog.width == w && prog.height == h)
      assert(prog.pixels.toSeq == seq.pixels.toSeq, s"color ${w}x$h seed=$seed")
      val seqG = JpegCodec.decode(JpegCodec.encode(w, h, p, grayscale = true))
      val progG = JpegCodec.decode(
        JpegCodec.encodeProgressive(w, h, p, grayscale = true))
      assert(progG.pixels.toSeq == seqG.pixels.toSeq, s"gray ${w}x$h seed=$seed")
    }
    // 4:2:0 — including odd dims where the chroma plane edge-replicates
    // and the luma spec-dims are SMALLER than the padded MCU grid
    for ((w, h) <- Seq((16, 16), (32, 32), (20, 12), (17, 13), (15, 31))) {
      val p = px(w, h, 3)
      val seq = JpegCodec.decode(JpegCodec.encode(w, h, p, subsample420 = true))
      val prog = JpegCodec.decode(
        JpegCodec.encodeProgressive(w, h, p, subsample420 = true))
      assert(prog.pixels.toSeq == seq.pixels.toSeq, s"420 ${w}x$h")
    }
    // smooth gradients (long zero runs -> EOB-run coding across blocks)
    val grad = Array.tabulate(48 * 32) { i =>
      val y = i / 48; val x = i % 48
      ((x * 5 + y) << 16) | ((x * 3) << 8) | (y * 7)
    }
    val seqGr = JpegCodec.decode(JpegCodec.encode(48, 32, grad))
    val progGr = JpegCodec.decode(JpegCodec.encodeProgressive(48, 32, grad))
    assert(progGr.pixels.toSeq == seqGr.pixels.toSeq, "gradient")
    // solid image: every AC band is one giant EOB run
    val solid = Array.fill(24 * 24)(0x7FA03C)
    assert(JpegCodec.decode(JpegCodec.encodeProgressive(24, 24, solid)).pixels.toSeq
      == JpegCodec.decode(JpegCodec.encode(24, 24, solid)).pixels.toSeq, "solid")
  }

  test("progressive closed form: block-constant synthesis matches the q300 chain") {
    // the gate-query path: block-constant images stay DC-only, so the
    // progressive decode must land on the same closed form as baseline
    for (v <- Seq(0, 1, 31, 127, 128, 200, 254, 255)) {
      val p = Array.fill(64)((v << 16) | (v << 8) | v)
      val img = JpegCodec.decode(
        JpegCodec.encodeProgressive(8, 8, p, grayscale = true))
      val want = closedForm(v, 16)
      assert(img.pixels.forall(q => (q & 0xFF) == want), s"v=$v")
    }
  }

  test("progressive structure: SOF2 + multiple scans, honest failure modes") {
    val p = Array.tabulate(256)(i => (i * 7919) % 0x1000000)
    val jpg = JpegCodec.encodeProgressive(16, 16, p)
    // SOF2 marker present, more than one SOS
    val sof2 = (0 until jpg.length - 1).count(j =>
      (jpg(j) & 0xFF) == 0xFF && (jpg(j + 1) & 0xFF) == 0xC2)
    val scans = (0 until jpg.length - 1).count(j =>
      (jpg(j) & 0xFF) == 0xFF && (jpg(j + 1) & 0xFF) == 0xDA)
    assert(sof2 == 1 && scans == 10, s"sof2=$sof2 scans=$scans")
    // dims sniffs progressive like any SOF
    assert(JpegCodec.dims(jpg) == ((16, 16, 3)))
    // truncation mid-scans is loud (missing EOI / entropy cut)
    intercept[IllegalArgumentException](JpegCodec.decode(jpg.take(jpg.length / 2)))
    intercept[IllegalArgumentException](JpegCodec.decode(jpg.take(jpg.length - 3)))
    // a progressive file with EOI before any scan is loud
    val soiOnly = jpg.take(
      (0 until jpg.length - 1).indexWhere(j =>
        (jpg(j) & 0xFF) == 0xFF && (jpg(j + 1) & 0xFF) == 0xDA)) ++
      Array[Byte](0xFF.toByte, 0xD9.toByte)
    val e = intercept[IllegalArgumentException](JpegCodec.decode(soiOnly))
    assert(e.getMessage.contains("no scan"), e.getMessage)
  }

  test("progressive through the distributed verbs: quarantine + feature parity") {
    // Multimodal-level: progressive payloads flow through the same
    // extract verbs; a truncated progressive payload quarantines typed
    val docs = Seq(1L, 2L, 3L).toDF("doc_id")
    val media = Multimodal.synthesizeJpegProgressive(docs, "doc_id", grayscale = true)
    val prog = Multimodal.extractJpegFeatures(media).orderBy("media_id").collect()
    val base = Multimodal.extractJpegFeatures(
      Multimodal.synthesizeJpeg(docs, "doc_id", grayscale = true))
      .orderBy("media_id").collect()
    for ((a, b) <- prog.zip(base))
      assert(a.toSeq == b.toSeq, s"progressive features diverge: $a vs $b")
    val trunc = Multimodal.truncatePayloads(media, everyN = 2L)
    val out = Multimodal.extractJpegFeaturesQuarantine(trunc)
      .orderBy("media_id").collect()
    assert(!out(1).getBoolean(1) && out(0).getBoolean(1) && out(2).getBoolean(1))
  }
}
