package graft

import graft.multimodal.{FlacCodec, Multimodal, WavCodec}
import org.apache.spark.sql.functions._

/** FLAC codec gates: losslessness (decode ∘ encode == identity) across
  * every subframe path the encoder reaches, compression sanity, loud
  * structural failure, and — via an INDEPENDENT bit-writer and CRCs
  * implemented from the public spec — decoder paths the encoder never
  * emits (LPC prediction, multi-partition Rice, the 5-bit escape,
  * wasted bits, stereo decorrelation, reserved-code rejection).
  */
class FlacSpec extends SparkSpec {
  import spark.implicits._

  private def roundTrip(
      samples: Array[Short], channels: Int = 1,
      rate: Int = 16000, bs: Int = 256): Unit = {
    val flac = FlacCodec.encode(rate, channels, samples, bs)
    val w = FlacCodec.decode(flac)
    assert(w.sampleRate == rate && w.channels == channels && w.bitsPerSample == 16)
    assert(w.samples.toSeq == samples.toSeq)
  }

  test("FlacCodec: lossless round-trip across subframe paths") {
    roundTrip(Array.fill[Short](600)(1234)) // CONSTANT
    roundTrip(Array.tabulate(600)(i => (i * 7 - 2000).toShort)) // linear → order 2
    roundTrip(Array.tabulate(600)(i => ((i * i) % 3000 - 1500).toShort))
    roundTrip(Array.tabulate(600)(i => (((i * 104729) % 65536) - 32768).toShort)) // noise
    roundTrip(Multimodal.flacRecipe(0L, 600)) // constant recipe
    roundTrip(Multimodal.flacRecipe(7L, 600)) // sawtooth recipe
    roundTrip(Multimodal.flacRecipe(5L, 600)) // noise recipe
    roundTrip(Array.tabulate(601)(i => (i % 256 - 128).toShort)) // partial last block
    roundTrip(Array.tabulate(33)(i => (i * 3).toShort), bs = 16) // tiny blocks
    roundTrip(Array.tabulate(300)(i =>
      if (i % 2 == 0) Short.MaxValue else Short.MinValue)) // full-scale alternation
    roundTrip(Array.tabulate(1024)(i => (i - 512).toShort), bs = 512) // pow2 bs code
    roundTrip(Array.tabulate(580)(i => (i % 7).toShort), bs = 192) // bs code 1 + partial
  }

  test("FlacCodec: stereo independent channels round-trip interleaved") {
    val inter = Array.tabulate(1200)(i =>
      if (i % 2 == 0) (i / 2).toShort else (911 - 3 * (i / 2)).toShort)
    roundTrip(inter, channels = 2)
  }

  test("FlacCodec: stereo decorrelation round-trips losslessly (all three assignments)") {
    // correlated channels with odd L+R parity mixed in, so mid-side's
    // dropped low bit (recovered from side's parity) is exercised
    val inter = Array.tabulate(1200) { j =>
      val i = j / 2
      val l = (i % 256 - 128) * 3 + 40
      (if (j % 2 == 0) l else l - (i % 16 - 8) + (i % 2)).toShort
    }
    for (mode <- Seq("left-side", "right-side", "mid-side")) {
      val flac = FlacCodec.encode(16000, 2, inter, 256, stereoMode = mode)
      val w = FlacCodec.decode(flac)
      assert(w.channels == 2 && w.samples.toSeq == inter.toSeq, mode)
    }
    // decorrelation should BEAT independent coding when both channels
    // carry the SAME noise (the incompressible part codes once, the tiny
    // side channel rides on cheap Rice parameters)
    val noisy = Array.tabulate(1200) { j =>
      val i = j / 2
      val l = ((i * 104729) % 65536) - 32768
      (if (j % 2 == 0) l else l - (i % 3 - 1)).toShort
    }
    val indep = FlacCodec.encode(16000, 2, noisy, 256).length
    val ms = FlacCodec.encode(16000, 2, noisy, 256, stereoMode = "mid-side").length
    assert(ms * 3 < indep * 2, s"mid-side $ms B should beat independent $indep B")
    assert(FlacCodec.decode(
      FlacCodec.encode(16000, 2, noisy, 256, stereoMode = "mid-side"))
      .samples.toSeq == noisy.toSeq)
    // full-scale extremes survive the 17-bit side channel
    val extreme = Array.tabulate(64)(j =>
      (if (j % 2 == 0) Short.MaxValue else Short.MinValue): Short)
    for (mode <- Seq("left-side", "right-side", "mid-side")) {
      val flac = FlacCodec.encode(8000, 2, extreme, 16, stereoMode = mode)
      assert(FlacCodec.decode(flac).samples.toSeq == extreme.toSeq, mode)
    }
    intercept[IllegalArgumentException](
      FlacCodec.encode(8000, 1, Array[Short](1, 2, 3, 4), 16, stereoMode = "mid-side"))
  }

  test("FlacCodec: predictable signals compress, constants collapse to headers") {
    val ramp = Array.tabulate(4096)(i => ((i % 1000) * 30 - 15000).toShort)
    val rflac = FlacCodec.encode(16000, 1, ramp, 256)
    assert(rflac.length * 3 < ramp.length * 2,
      s"ramp should compress >3x, got ${rflac.length} B vs ${ramp.length * 2} B PCM")
    val cflac = FlacCodec.encode(16000, 1, Array.fill[Short](4096)(77), 256)
    assert(cflac.length < 300, s"constant stream should be ~headers, got ${cflac.length} B")
  }

  test("FlacCodec: structural corruption fails loudly") {
    val flac = FlacCodec.encode(16000, 1, Multimodal.flacRecipe(5L, 600), 256)
    intercept[IllegalArgumentException](FlacCodec.decode("junk-not-flac".getBytes))
    intercept[IllegalArgumentException](FlacCodec.decode(flac.take(flac.length / 2)))
    intercept[IllegalArgumentException](FlacCodec.decode(flac.take(30)))
    // STREAMINFO total-samples lie (last bit of the 36-bit field = byte 25)
    val lied = flac.clone()
    lied(25) = (lied(25) ^ 0x01).toByte
    val e = intercept[IllegalArgumentException](FlacCodec.decode(lied))
    assert(e.getMessage.contains("declares"), e.getMessage)
    // frame-header CRC-8 byte (first frame: 4 fixed + 1 frame-no bytes after 42)
    val badCrc = flac.clone()
    badCrc(47) = (badCrc(47) ^ 0xFF).toByte
    val e2 = intercept[IllegalArgumentException](FlacCodec.decode(badCrc))
    assert(e2.getMessage.contains("CRC-8"), e2.getMessage)
    // frame CRC-16 (last two bytes of the final frame)
    val badCrc16 = flac.clone()
    badCrc16(flac.length - 1) = (badCrc16(flac.length - 1) ^ 0xFF).toByte
    val e3 = intercept[IllegalArgumentException](FlacCodec.decode(badCrc16))
    assert(e3.getMessage.contains("CRC-16"), e3.getMessage)
  }

  // ---- independent bit-writer + CRCs (from the public spec) to hand-craft
  // ---- streams exercising decoder-only paths --------------------------------

  private class BW {
    val buf = collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var nb = 0
    def bit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1); nb += 1
      if (nb == 8) { buf += cur.toByte; cur = 0; nb = 0 }
    }
    def bits(v: Long, n: Int): Unit = {
      var i = n - 1; while (i >= 0) { bit(((v >>> i) & 1L).toInt); i -= 1 }
    }
    def unary(q: Int): Unit = { (0 until q).foreach(_ => bit(0)); bit(1) }
    def rice(r: Long, p: Int): Unit = {
      val u = if (r >= 0) 2 * r else -2 * r - 1
      unary((u >>> p).toInt); if (p > 0) bits(u & ((1L << p) - 1), p)
    }
    def align(): Unit = while (nb != 0) bit(0)
    def bytes: Array[Byte] = buf.toArray
  }

  private def specCrc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    for (i <- from until until) {
      crc ^= b(i) & 0xFF
      for (_ <- 0 until 8)
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xFF else (crc << 1) & 0xFF
    }
    crc
  }

  private def specCrc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    for (i <- from until until) {
      crc ^= (b(i) & 0xFF) << 8
      for (_ <- 0 until 8)
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xFFFF
          else (crc << 1) & 0xFFFF
    }
    crc
  }

  /** One-frame 16-bit stream: STREAMINFO + a frame whose subframe bits
    * `sub` writes (one per channel), CRCs computed independently.
    */
  private def craft(rate: Int, nCh: Int, bs: Int, chCode: Int)(sub: BW => Unit): Array[Byte] = {
    val w = new BW
    w.bits(0x664C6143L, 32)
    w.bit(1); w.bits(0, 7); w.bits(34, 24)
    w.bits(bs, 16); w.bits(bs, 16); w.bits(0, 24); w.bits(0, 24)
    w.bits(rate, 20); w.bits(nCh - 1, 3); w.bits(15, 5); w.bits(bs.toLong, 36)
    w.bits(0, 64); w.bits(0, 64)
    val fStart = w.bytes.length
    w.bits(0x3FFE, 14); w.bit(0); w.bit(0)
    w.bits(6, 4) // 8-bit blocksize−1 follows
    w.bits(0, 4) // rate from STREAMINFO
    w.bits(chCode, 4); w.bits(4, 3); w.bit(0)
    w.bits(0, 8) // frame number 0
    w.bits(bs - 1, 8)
    val hdr = w.bytes
    w.bits(specCrc8(hdr, fStart, hdr.length), 8)
    sub(w)
    w.align()
    val all = w.bytes
    w.bits(specCrc16(all, fStart, all.length), 16)
    w.bytes
  }

  test("FlacCodec decoder: LPC subframe (order 2, shift, signed coefs)") {
    val bs = 16
    val coefs = Array(3, 1)
    val shift = 2
    val res = Array.tabulate(bs - 2)(i => (i % 5) - 2)
    // simulate: s(i) = ((3·s(i−1) + s(i−2)) >> 2) + r(i)
    val s = new Array[Int](bs)
    s(0) = 100; s(1) = 110
    for (i <- 2 until bs)
      s(i) = ((coefs(0) * s(i - 1) + coefs(1) * s(i - 2)) >> shift) + res(i - 2)
    val stream = craft(8000, 1, bs, chCode = 0) { w =>
      w.bit(0); w.bits(0x20 | (2 - 1), 6); w.bit(0) // LPC order 2
      w.bits(s(0).toLong & 0xFFFF, 16); w.bits(s(1).toLong & 0xFFFF, 16)
      w.bits(5 - 1, 4) // precision 5
      w.bits(shift.toLong, 5)
      w.bits(coefs(0).toLong & 0x1F, 5); w.bits(coefs(1).toLong & 0x1F, 5)
      w.bits(0, 2); w.bits(0, 4); w.bits(2, 4) // method 0, one partition, param 2
      res.foreach(r => w.rice(r, 2))
    }
    val out = FlacCodec.decode(stream)
    assert(out.samples.toSeq == s.map(_.toShort).toSeq)
  }

  test("FlacCodec decoder: multi-partition Rice with an escaped partition") {
    val bs = 16 // partition order 2 → 4 partitions of 4; first has 3 (order 1)
    val res = Array.tabulate(bs - 1)(i => if (i < 7) (i % 3) - 1 else 100 + i)
    val s = new Array[Int](bs)
    s(0) = -50
    for (i <- 1 until bs) s(i) = s(i - 1) + res(i - 1)
    val stream = craft(8000, 1, bs, chCode = 0) { w =>
      w.bit(0); w.bits(0x08 | 1, 6); w.bit(0) // FIXED order 1
      w.bits(s(0).toLong & 0xFFFF, 16)
      w.bits(0, 2); w.bits(2, 4) // method 0, partition order 2
      w.bits(1, 4); res.slice(0, 3).foreach(r => w.rice(r, 1)) // partition 0: 3 res
      w.bits(0, 4); res.slice(3, 7).foreach(r => w.rice(r, 0)) // partition 1
      w.bits(15, 4); w.bits(9, 5) // partition 2: ESCAPE, 9-bit raw
      res.slice(7, 11).foreach(r => w.bits(r.toLong & 0x1FF, 9))
      w.bits(5, 4); res.slice(11, 15).foreach(r => w.rice(r, 5)) // partition 3
    }
    val out = FlacCodec.decode(stream)
    assert(out.samples.toSeq == s.map(_.toShort).toSeq)
  }

  test("FlacCodec decoder: wasted bits shift decoded samples back up") {
    val bs = 16
    val stream = craft(8000, 1, bs, chCode = 0) { w =>
      w.bit(0); w.bits(0, 6) // CONSTANT
      w.bit(1); w.unary(3 - 1) // wasted-bits flag: k = 3
      w.bits(5L & 0x1FFF, 13) // 16 − 3 = 13-bit constant 5
    }
    val out = FlacCodec.decode(stream)
    assert(out.samples.toSeq == Seq.fill(bs)((5 << 3).toShort))
  }

  test("FlacCodec decoder: crafted stereo-decorrelated streams (independent bit-writer)") {
    // left-side: L const 7 (16 bits), side const 3 (17 bits) → R = 4
    val ls = craft(8000, 2, 16, chCode = 8) { w =>
      w.bit(0); w.bits(0, 6); w.bit(0); w.bits(7, 16)
      w.bit(0); w.bits(0, 6); w.bit(0); w.bits(3L & 0x1FFFF, 17)
    }
    assert(FlacCodec.decode(ls).samples.toSeq ==
      Seq.fill(16)(Seq(7, 4)).flatten.map(_.toShort))
    // right-side: side const −5 (17 bits, sign-extended), R const 9 → L = 4
    val rs = craft(8000, 2, 16, chCode = 9) { w =>
      w.bit(0); w.bits(0, 6); w.bit(0); w.bits(-5L & 0x1FFFF, 17)
      w.bit(0); w.bits(0, 6); w.bit(0); w.bits(9, 16)
    }
    assert(FlacCodec.decode(rs).samples.toSeq ==
      Seq.fill(16)(Seq(4, 9)).flatten.map(_.toShort))
    // mid-side with ODD L+R: L=7, R=4 → mid=(7+4)>>1=5, side=3; the
    // dropped low bit must come back from side's parity
    val ms = craft(8000, 2, 16, chCode = 10) { w =>
      w.bit(0); w.bits(0, 6); w.bit(0); w.bits(5, 16)
      w.bit(0); w.bits(0, 6); w.bit(0); w.bits(3L & 0x1FFFF, 17)
    }
    assert(FlacCodec.decode(ms).samples.toSeq ==
      Seq.fill(16)(Seq(7, 4)).flatten.map(_.toShort))
    // mid-side with negative channels: L=−9, R=−6 → mid=−8 (floor), side=−3
    val msn = craft(8000, 2, 16, chCode = 10) { w =>
      w.bit(0); w.bits(0, 6); w.bit(0); w.bits(-8L & 0xFFFF, 16)
      w.bit(0); w.bits(0, 6); w.bit(0); w.bits(-3L & 0x1FFFF, 17)
    }
    assert(FlacCodec.decode(msn).samples.toSeq ==
      Seq.fill(16)(Seq(-9, -6)).flatten.map(_.toShort))
    // reserved channel assignments 11–15 stay loudly rejected
    val bad = craft(8000, 2, 16, chCode = 11) { w =>
      for (_ <- 0 until 2) { w.bit(0); w.bits(0, 6); w.bit(0); w.bits(7, 16) }
    }
    val e = intercept[IllegalArgumentException](FlacCodec.decode(bad))
    assert(e.getMessage.contains("reserved channel assignment"), e.getMessage)
  }

  test("FlacCodec: a crafted header declaring 2^26 samples x 8 channels fails fast (capped pre-size)") {
    // allocation-DoS probe: STREAMINFO is untrusted crawled input, so the
    // declared total must only HINT the output buffer (capped at 2^22
    // elements) — a ~50-byte hostile header must throw on the missing
    // frames, not allocate a ~GiB backing array first
    val w = new BW
    w.bits(0x664C6143L, 32)
    w.bit(1); w.bits(0, 7); w.bits(34, 24)
    w.bits(256, 16); w.bits(256, 16); w.bits(0, 24); w.bits(0, 24)
    w.bits(16000, 20); w.bits(8 - 1, 3); w.bits(15, 5); w.bits(1L << 26, 36)
    w.bits(0, 64); w.bits(0, 64)
    val e = intercept[IllegalArgumentException](FlacCodec.decode(w.bytes))
    assert(e.getMessage.contains("no frames"), e.getMessage)
  }

  test("synthesizeFlac -> extractFlacFeatures: features match the recipe; decimate composes") {
    val docs = Seq(3L, 5L, 7L).toDF("doc_id")
    val rows = Multimodal.extractFlacFeatures(Multimodal.synthesizeFlac(docs, "doc_id"))
      .orderBy("media_id").collect()
    assert(rows.length == 3)
    for (r <- rows) {
      val id = r.getLong(0)
      val f = WavCodec.features(WavCodec.Wav(16000, 1, 16, Multimodal.flacRecipe(id, 600)))
      assert(r.getLong(1) == 16000 && r.getLong(2) == 1 && r.getLong(3) == 600)
      assert(r.getLong(5) == f.peakMin && r.getLong(6) == f.peakMax)
      assert(r.getLong(7) == f.zeroCrossings && r.getLong(8) == f.sumSamples)
      assert(r.getLong(9) == f.sumSquares)
    }
    val dec = Multimodal.extractFlacFeatures(
      Multimodal.synthesizeFlac(docs, "doc_id"), decimateBy = 4)
      .orderBy("media_id").collect()
    assert(dec.forall(r => r.getLong(1) == 4000 && r.getLong(3) == 150))
  }

  test("extractFlacFingerprint: codec-agnostic — bits equal the raw-sample fingerprint") {
    val docs = Seq(2L, 4L, 5L).toDF("doc_id")
    val rows = Multimodal.extractFlacFingerprint(
      Multimodal.synthesizeFlac(docs, "doc_id"), frameLen = 50)
      .orderBy("media_id").collect()
    for (r <- rows) {
      val (nf, bits, tot) = WavCodec.energyFingerprint(
        WavCodec.Wav(16000, 1, 16, Multimodal.flacRecipe(r.getLong(0), 600)), 50)
      assert(r.getLong(1) == nf && r.getString(2) == bits && r.getLong(3) == tot,
        s"doc ${r.getLong(0)}")
    }
  }
}
