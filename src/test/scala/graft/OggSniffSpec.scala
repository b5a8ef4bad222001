package graft

import graft.multimodal.OggSniff

/** Ogg/Opus page-walk gates: recipe equality, CRC verification (a
  * flipped body bit must throw), lacing across the 255 boundary,
  * sequence-gap / post-EOS / non-Opus / torn-stream rejection.
  */
class OggSniffSpec extends SparkSpec {

  test("sniff matches the synthesis recipe closed-form") {
    for (id <- Seq(0L, 1L, 5L, 96L, 103L)) {
      val n = 10 + (id % 7).toInt
      val i = OggSniff.sniff(OggSniff.synthesize(id, n))
      assert(i.nPages == 2L + n && i.nPackets == 2L + 2L * n)
      assert(i.channels == 1 + (id % 2).toInt)
      assert(i.preSkip == 312 + (id % 200).toInt)
      assert(i.inputSampleRate == 48000L)
      assert(i.granuleFinal == i.preSkip + 1920L * n)
      assert(i.durationMs == 1920L * n * 1000L / 48000L)
    }
  }

  test("large packet laces across the 255 boundary and still counts once") {
    val big = Array.tabulate(700)(i => (i % 256).toByte) // 255+255+190 lacing
    val head = OggSniff.writePage(2, 0L, 7L, 0L, Seq(OggSniff.opusHead(2, 100, 48000L)))
    val audio = OggSniff.writePage(4, 2000L, 7L, 1L, Seq(big))
    val i = OggSniff.sniff(head ++ audio)
    assert(i.nPages == 2 && i.nPackets == 2) // OpusHead + the one big packet
    assert(i.granuleFinal == 2000L && i.durationMs == (2000L - 100L) * 1000L / 48000L)
  }

  test("corruption and structure violations throw typed") {
    val good = OggSniff.synthesize(3L, 10)
    def bad(bytes: Array[Byte], frag: String): Unit = {
      val e = intercept[IllegalArgumentException](OggSniff.sniff(bytes))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    val flip = good.clone(); flip(good.length - 10) = (flip(good.length - 10) ^ 1).toByte
    bad(flip, "CRC")
    bad(java.util.Arrays.copyOf(good, good.length - 20), "overruns")
    bad(good ++ good.take(60), "after EOS")
    bad("junk".getBytes("ISO-8859-1") ++ good, "bad capture")
    // sequence gap: drop the middle (comment) page entirely
    val p0len = {
      val nSeg = good(26) & 0xff
      27 + nSeg + (0 until nSeg).map(i => good(27 + i) & 0xff).sum
    }
    val p1len = {
      val o = p0len; val nSeg = good(o + 26) & 0xff
      27 + nSeg + (0 until nSeg).map(i => good(o + 27 + i) & 0xff).sum
    }
    bad(good.take(p0len) ++ good.drop(p0len + p1len), "sequence gap")
    // a vorbis BOS is not an Opus stream
    val vorbis = OggSniff.writePage(2, 0L, 7L, 0L,
      Seq(("XvorbisXXXXXXXXXXXX").getBytes("ISO-8859-1")))
    bad(vorbis, "not an Opus stream")
  }
}
