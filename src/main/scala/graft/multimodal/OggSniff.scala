package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.ISO_8859_1

/** Ogg container PAGE WALK + Opus identification-header parse (RFC 3533
  * pages, RFC 7845 OpusHead) — the header-only probe for the other big
  * crawled-audio family (.ogg/.opus podcast and voice corpora): channel
  * count, pre-skip, duration, and page/packet structure all come from
  * page headers and the first packet, no entropy decode — the audio twin
  * of [[MpegAudioSniff]] with CRC-VERIFIED pages (Ogg's own CRC-32,
  * polynomial 0x04c11db7, init 0, non-reflected — implemented from the
  * RFC, not java.util.zip, which computes the reflected variant).
  * Perceptual Opus decode honestly stays behind
  * [[Multimodal.StubDecoder]]; the container walk, lacing arithmetic,
  * granule bookkeeping, and typed rejection of torn/corrupt streams are
  * the real production probe.
  *
  * Page layout: "OggS", version 0, header-type flags, 8-byte granule
  * position (LE; for Opus: PCM sample count at 48 kHz including
  * pre-skip), 4-byte serial, 4-byte sequence, 4-byte CRC, segment count,
  * lacing table (packet = segments until a lacing value < 255).
  */
object OggSniff {

  final case class Info(
      nPages: Long,
      nPackets: Long,
      channels: Int,
      preSkip: Int,
      inputSampleRate: Long,
      granuleFinal: Long,
      durationMs: Long)

  /** Ogg CRC-32: poly 0x04c11db7, init 0, no reflection, no final xor —
    * computed over the page with the CRC field zeroed. Table-driven
    * (one lookup per byte; the bitwise loop was the sniff's hot spot —
    * every page of every payload is CRC'd).
    */
  private val CrcTable: Array[Long] = Array.tabulate(256) { i =>
    var r = i.toLong << 24
    var k = 0
    while (k < 8) {
      r = if ((r & 0x80000000L) != 0) ((r << 1) ^ 0x04c11db7L) & 0xffffffffL
      else (r << 1) & 0xffffffffL
      k += 1
    }
    r
  }

  def crc(bytes: Array[Byte], off: Int, len: Int, skipOff: Int): Long = {
    var r = 0L
    var i = off
    while (i < off + len) {
      val b = if (i >= skipOff && i < skipOff + 4) 0 else bytes(i) & 0xff
      r = ((r << 8) ^ CrcTable((((r >> 24) ^ b) & 0xff).toInt)) & 0xffffffffL
      i += 1
    }
    r
  }

  private def le32(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le64(v: Long): Array[Byte] = le32(v & 0xffffffffL) ++ le32(v >>> 32)

  /** Write one page: flags, granule, serial, seq, CRC stamped, lacing
    * from the packet lengths (each packet here ≤ 255·n bytes, laced
    * 255…remainder).
    */
  def writePage(
      flags: Int, granule: Long, serial: Long, seq: Long,
      packets: Seq[Array[Byte]]): Array[Byte] = {
    val lacing = packets.flatMap { p =>
      val full = p.length / 255
      Seq.fill(full)(255) :+ (p.length % 255)
    }
    require(lacing.length <= 255, "ogg: too many lacing segments for one page")
    val out = new ByteArrayOutputStream()
    out.write("OggS".getBytes(ISO_8859_1))
    out.write(0) // version
    out.write(flags)
    out.write(le64(granule)); out.write(le32(serial)); out.write(le32(seq))
    out.write(le32(0)) // CRC placeholder
    out.write(lacing.length)
    lacing.foreach(out.write)
    packets.foreach(p => out.write(p))
    val page = out.toByteArray
    val c = crc(page, 0, page.length, skipOff = 22)
    System.arraycopy(le32(c), 0, page, 22, 4)
    page
  }

  /** OpusHead identification packet (RFC 7845 §5.1). */
  def opusHead(channels: Int, preSkip: Int, inputSampleRate: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write("OpusHead".getBytes(ISO_8859_1))
    out.write(1) // version
    out.write(channels)
    out.write(preSkip & 0xff); out.write((preSkip >> 8) & 0xff)
    out.write(le32(inputSampleRate))
    out.write(0); out.write(0) // output gain
    out.write(0) // channel mapping family 0
    out.toByteArray
  }

  /** Deterministic Opus-shaped Ogg stream for doc `id`: BOS page with
    * OpusHead, a comment page (OpusTags), then `nAudioPages` audio pages
    * of recipe-sized junk packets with monotonic granules — a valid
    * CONTAINER (duration probes never open packets), honest about not
    * being encoded audio.
    */
  def synthesize(id: Long, nAudioPages: Int): Array[Byte] = {
    val serial = 0x47524100L + (id % 97)
    val channels = 1 + (id % 2).toInt
    val preSkip = 312 + (id % 200).toInt
    val out = new ByteArrayOutputStream()
    out.write(writePage(2, 0L, serial, 0L, Seq(opusHead(channels, preSkip, 48000L))))
    val tags = "OpusTags".getBytes(ISO_8859_1) ++
      le32(9) ++ "graft/1.0".getBytes(ISO_8859_1) ++ le32(0)
    out.write(writePage(0, 0L, serial, 1L, Seq(tags)))
    var granule = preSkip.toLong
    for (p <- 0 until nAudioPages) {
      // two packets per page, 960 samples (20 ms) each; junk payload
      val pk = (0 until 2).map { j =>
        val len = 40 + ((id * 11 + p * 7 + j * 3) % 200).toInt
        Array.tabulate(len)(i => ((id * 13 + p * 17 + j * 5 + i) % 256).toByte)
      }
      granule += 2 * 960
      val eos = if (p == nAudioPages - 1) 4 else 0
      out.write(writePage(eos, granule, serial, 2L + p, pk))
    }
    out.toByteArray
  }

  /** Walk every page: verify capture pattern, version, CRC, serial
    * constancy, sequence continuity; count packets from lacing; parse
    * OpusHead out of the BOS page; duration from the final granule minus
    * pre-skip at 48 kHz (RFC 7845 §4). Malformed streams throw typed.
    */
  def sniff(bytes: Array[Byte]): Info = {
    var p = 0
    var nPages = 0L
    var nPackets = 0L
    var serial = -1L
    var seq = -1L
    var granule = 0L
    var head: Option[(Int, Int, Long)] = None
    var sawEos = false
    while (p < bytes.length) {
      require(!sawEos, "ogg: data after EOS page")
      require(p + 27 <= bytes.length, "ogg: truncated page header")
      require(new String(bytes, p, 4, ISO_8859_1) == "OggS", s"ogg: bad capture at byte $p")
      require(bytes(p + 4) == 0, "ogg: unsupported stream structure version")
      val flags = bytes(p + 5) & 0xff
      def le(off: Int, n: Int): Long = {
        var v = 0L
        for (i <- 0 until n) v |= (bytes(p + off + i) & 0xffL) << (8 * i)
        v
      }
      val g = le(6, 8)
      val ser = le(14, 4)
      val sq = le(18, 4)
      val nSeg = bytes(p + 26) & 0xff
      require(p + 27 + nSeg <= bytes.length, "ogg: truncated lacing table")
      var bodyLen = 0
      var packetsHere = 0L
      var i = 0
      while (i < nSeg) {
        val l = bytes(p + 27 + i) & 0xff
        bodyLen += l
        if (l < 255) packetsHere += 1
        i += 1
      }
      val pageLen = 27 + nSeg + bodyLen
      require(p + pageLen <= bytes.length, "ogg: page body overruns stream")
      val stored = le(22, 4)
      require(crc(bytes, p, pageLen, skipOff = p + 22) == stored,
        s"ogg: page CRC mismatch at byte $p")
      if (serial == -1L) serial = ser
      else require(ser == serial, "ogg: multiplexed streams not supported")
      require(sq == seq + 1, s"ogg: page sequence gap (${seq + 1} expected, got $sq)")
      seq = sq
      if ((flags & 2) != 0) { // BOS: first packet must be OpusHead
        require(nSeg > 0 && bodyLen >= 19 &&
          new String(bytes, p + 27 + nSeg, 8, ISO_8859_1) == "OpusHead",
          "ogg: BOS page is not an Opus stream")
        val h = p + 27 + nSeg
        require((bytes(h + 8) & 0xff) == 1, "ogg: unsupported OpusHead version")
        val ch = bytes(h + 9) & 0xff
        val ps = (bytes(h + 10) & 0xff) | ((bytes(h + 11) & 0xff) << 8)
        var sr = 0L
        for (i <- 0 until 4) sr |= (bytes(h + 12 + i) & 0xffL) << (8 * i)
        head = Some((ch, ps, sr))
      }
      if ((flags & 4) != 0) sawEos = true
      if (g != -1L) granule = g
      nPages += 1
      nPackets += packetsHere
      p += pageLen
    }
    require(nPages > 0, "ogg: no pages")
    require(sawEos, "ogg: missing EOS page")
    val (ch, ps, sr) = head.getOrElse(
      throw new IllegalArgumentException("ogg: no BOS/OpusHead page"))
    val samples = math.max(granule - ps, 0L)
    Info(nPages, nPackets, ch, ps, sr, granule, samples * 1000L / 48000L)
  }
}
