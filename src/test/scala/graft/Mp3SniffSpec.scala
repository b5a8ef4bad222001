package graft

import java.io.ByteArrayOutputStream

import graft.multimodal.MpegAudioSniff

/** MP3 header-walk gates: recipe equality, tag handling (leading ID3v2,
  * trailing ID3v1), padding-bit hop arithmetic, and loud typed rejection
  * of every malformed shape the walk can hit (crawled audio is hostile).
  */
class Mp3SniffSpec extends SparkSpec {

  private def frame(bIdx: Int, srIdx: Int, pad: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(0xff); out.write(0xe0 | (3 << 3) | (1 << 1) | 1)
    out.write((bIdx << 4) | (srIdx << 2) | (pad << 1)); out.write(3 << 6)
    val len = MpegAudioSniff.frameLength(
      MpegAudioSniff.BitrateKbps(bIdx), MpegAudioSniff.SampleRateHz(srIdx), pad)
    for (_ <- 4 until len) out.write(0xab)
    out.toByteArray
  }

  test("sniff matches the synthesis recipe closed-form") {
    for (id <- Seq(0L, 1L, 2L, 7L, 103L)) {
      val n = 20 + (id % 11).toInt
      val i = MpegAudioSniff.sniff(MpegAudioSniff.synthesize(id, n))
      assert(i.nFrames == n.toLong)
      val sr = MpegAudioSniff.SampleRateHz((id % 3).toInt)
      assert(i.sampleRate == sr)
      val kbps = (0 until n).map(f =>
        MpegAudioSniff.BitrateKbps(1 + ((id * 7 + f * 3) % 14).toInt))
      assert(i.sumBitrateKbps == kbps.sum.toLong)
      assert(i.minBitrateKbps == kbps.min && i.maxBitrateKbps == kbps.max)
      assert(i.durationMs == 1152L * n * 1000L / sr)
      assert(i.id3Bytes == 10L + (id % 100) + 4L)
    }
  }

  test("tagless stream, padding-bit hop, trailing ID3v1 tolerated") {
    val out = new ByteArrayOutputStream()
    out.write(frame(9, 0, 0)); out.write(frame(9, 0, 1)); out.write(frame(3, 0, 0))
    // trailing ID3v1: "TAG" + 125 filler
    out.write('T'); out.write('A'); out.write('G')
    for (_ <- 0 until 125) out.write(0)
    val i = MpegAudioSniff.sniff(out.toByteArray)
    assert(i.nFrames == 3 && i.id3Bytes == 0L)
    assert(i.sumBitrateKbps == 128L + 128L + 48L)
  }

  test("malformed streams throw typed") {
    def bad(bytes: Array[Byte], frag: String): Unit = {
      val e = intercept[IllegalArgumentException](MpegAudioSniff.sniff(bytes))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    val good = frame(9, 0, 0)
    bad(good.take(good.length - 5), "overruns") // torn last frame
    bad(good ++ Array[Byte](0x12, 0x34, 0x56, 0x78), "lost sync")
    val freeFmt = good.clone(); freeFmt(2) = ((0 << 4) | (0 << 2)).toByte
    bad(freeFmt, "bitrate index")
    val resSr = good.clone(); resSr(2) = ((9 << 4) | (3 << 2)).toByte
    bad(resSr, "sample-rate")
    val mpeg2 = good.clone(); mpeg2(1) = (0xe0 | (2 << 3) | (1 << 1) | 1).toByte
    bad(mpeg2, "unsupported version")
    bad(frame(9, 0, 0) ++ frame(9, 1, 0), "sample rate changed")
    bad(Array[Byte]('I', 'D', '3', 3, 0, 0, 0x7f, 0x7f, 0x7f, 0x7f), "overruns")
    bad(Array.empty[Byte], "no audio frames")
  }
}
