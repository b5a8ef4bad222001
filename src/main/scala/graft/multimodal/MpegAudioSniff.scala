package graft.multimodal

/** MPEG-audio (MP3) FRAME-HEADER WALK — the O(headers) probe a media
  * pipeline runs on crawled audio BEFORE deciding whether to pay for (or
  * quarantine) a decode: frame count, sample rate, bitrate profile
  * (CBR/VBR), and duration all come from the 4-byte frame headers alone,
  * hopping payload to payload by the header-computed frame length
  * exactly the way every MP3 duration estimator works. This is honest
  * header-walk machinery, NOT a decoder: the perceptual synthesis
  * filterbank stays behind [[Multimodal.StubDecoder]] (the container
  * environment has no audio libs); everything here — sync scan, ID3v2
  * skip, header field extraction, frame-length arithmetic, typed
  * rejection of malformed streams — is the real production probe.
  *
  * Header layout (ISO/IEC 11172-3 §2.4.1.3): 11 sync bits, 2 version,
  * 2 layer, 1 protection, 4 bitrate index, 2 sample-rate index,
  * 1 padding, 1 private, 2 channel mode, … Supported: MPEG-1 Layer III
  * (the overwhelming crawl shape). Layer III frame length =
  * 144·bitrate/sampleRate + padding (integer floor).
  */
object MpegAudioSniff {

  /** MPEG-1 Layer III bitrates by header index 1–14, in kbit/s. */
  val BitrateKbps: Array[Int] =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** MPEG-1 sample rates by header index 0–2, in Hz. */
  val SampleRateHz: Array[Int] = Array(44100, 48000, 32000)

  /** Samples per MPEG-1 Layer III frame. */
  val SamplesPerFrame: Int = 1152

  final case class Info(
      nFrames: Long,
      sampleRate: Int,
      sumBitrateKbps: Long,
      minBitrateKbps: Int,
      maxBitrateKbps: Int,
      durationMs: Long,
      id3Bytes: Long)

  /** Layer III frame length in bytes for (bitrate kbps, sample rate Hz,
    * padding bit).
    */
  def frameLength(kbps: Int, sr: Int, padding: Int): Int =
    144000 * kbps / sr + padding

  /** Build one 4-byte MPEG-1 Layer III header (no CRC, mono). */
  private def header(bitrateIdx: Int, srIdx: Int, padding: Int): Array[Byte] = {
    require(bitrateIdx >= 1 && bitrateIdx <= 14, s"bad bitrate index $bitrateIdx")
    require(srIdx >= 0 && srIdx <= 2, s"bad sample-rate index $srIdx")
    val b1 = 0xff
    val b2 = 0xe0 | (3 << 3) | (1 << 1) | 1 // sync, MPEG-1, Layer III, no CRC
    val b3 = (bitrateIdx << 4) | (srIdx << 2) | (padding << 1)
    val b4 = 3 << 6 // mono (single channel)
    Array(b1.toByte, b2.toByte, b3.toByte, b4.toByte)
  }

  /** Synthesize a deterministic MP3-shaped stream for doc `id`: an ID3v2
    * tag of recipe size, then `nFrames` valid Layer III frames whose
    * bitrate index cycles by recipe (a VBR profile) with junk payload
    * bytes of exactly the header-computed length — a valid CONTAINER
    * walk (duration estimators never read payload), honest about not
    * being encoded audio.
    */
  def synthesize(id: Long, nFrames: Int): Array[Byte] = {
    val srIdx = (id % 3).toInt
    val tagBody = (id % 100).toInt + 4
    def bIdx(f: Int): Int = 1 + ((id * 7 + f * 3) % 14).toInt
    val total = 10 + tagBody + (0 until nFrames)
      .map(f => frameLength(BitrateKbps(bIdx(f)), SampleRateHz(srIdx), 0)).sum
    val out = new Array[Byte](total) // direct fill: a 25 KB payload is
    var p = 0 // 25k byte stores, not 25k stream calls
    // ID3v2.3 tag: "ID3", version, flags, 4-byte syncsafe size
    out(0) = 'I'; out(1) = 'D'; out(2) = '3'; out(3) = 3
    out(6) = ((tagBody >> 21) & 0x7f).toByte; out(7) = ((tagBody >> 14) & 0x7f).toByte
    out(8) = ((tagBody >> 7) & 0x7f).toByte; out(9) = (tagBody & 0x7f).toByte
    p = 10
    var i = 0
    while (i < tagBody) { out(p + i) = ((id * 31 + i * 7) % 256).toByte; i += 1 }
    p += tagBody
    var f = 0
    while (f < nFrames) {
      val b = bIdx(f)
      System.arraycopy(header(b, srIdx, padding = 0), 0, out, p, 4)
      val len = frameLength(BitrateKbps(b), SampleRateHz(srIdx), 0)
      val junk = id * 13 + f * 11
      i = 4
      while (i < len) { out(p + i) = ((junk + i) % 256).toByte; i += 1 }
      p += len
      f += 1
    }
    out
  }

  /** Walk the stream: skip a leading ID3v2 tag if present, then hop
    * frame header to frame header by computed length. Malformed input —
    * bad sync, free-format/bad bitrate index, reserved sample rate,
    * non-MPEG1-LayerIII, a frame overrunning the buffer — throws typed
    * IllegalArgumentException (quarantine discipline). A trailing ID3v1
    * tag ("TAG", 128 bytes) is tolerated and counted into no frame.
    */
  def sniff(bytes: Array[Byte]): Info = {
    var p = 0
    var id3 = 0L
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
      val size = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
      id3 = 10L + size
      p = 10 + size
      require(p <= bytes.length, "mp3: ID3v2 tag overruns stream")
    }
    var n = 0L
    var sr = -1
    var sum = 0L
    var minB = Int.MaxValue
    var maxB = 0
    while (p < bytes.length &&
      !(bytes.length - p == 128 && bytes(p) == 'T' && bytes(p + 1) == 'A' &&
        bytes(p + 2) == 'G')) {
      require(p + 4 <= bytes.length, "mp3: truncated frame header")
      require((bytes(p) & 0xff) == 0xff && (bytes(p + 1) & 0xe0) == 0xe0,
        f"mp3: lost sync at byte $p")
      val version = (bytes(p + 1) >> 3) & 3
      val layer = (bytes(p + 1) >> 1) & 3
      require(version == 3 && layer == 1,
        s"mp3: unsupported version/layer codes $version/$layer (MPEG-1 Layer III only)")
      val bIdx = (bytes(p + 2) >> 4) & 0xf
      require(bIdx >= 1 && bIdx <= 14, s"mp3: bad bitrate index $bIdx")
      val sIdx = (bytes(p + 2) >> 2) & 3
      require(sIdx <= 2, "mp3: reserved sample-rate index")
      val thisSr = SampleRateHz(sIdx)
      require(sr == -1 || sr == thisSr, "mp3: sample rate changed mid-stream")
      sr = thisSr
      val pad = (bytes(p + 2) >> 1) & 1
      val kbps = BitrateKbps(bIdx)
      sum += kbps
      if (kbps < minB) minB = kbps
      if (kbps > maxB) maxB = kbps
      val len = frameLength(kbps, thisSr, pad)
      require(p + len <= bytes.length, s"mp3: frame at byte $p overruns stream")
      p += len
      n += 1
    }
    require(n > 0, "mp3: no audio frames")
    Info(n, sr, sum, minB, maxB, SamplesPerFrame.toLong * n * 1000L / sr, id3)
  }
}
