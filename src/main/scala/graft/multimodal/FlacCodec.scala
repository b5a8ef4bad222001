package graft.multimodal

import java.io.ByteArrayOutputStream

import scala.collection.mutable.ArrayBuffer

/** Pure-JVM FLAC codec — the audio family's entropy-coded member: where
  * IMA-ADPCM ([[WavCodec.encodeAdpcm]]) is fixed-rate nibble coding, FLAC
  * is the "PNG of audio" — LOSSLESS integer prediction (constant /
  * verbatim / fixed polynomial / LPC) plus Rice/Golomb entropy coding of
  * the residuals, which is what crawled audio actually arrives as (raw
  * PCM never ships). Losslessness is itself the strongest gate: decode ∘
  * encode must reproduce the synthesis recipe SAMPLE-EXACTLY, so any bit
  * of drift in the bit packing, predictors, Rice coding, CRCs, or frame
  * headers lands off the oracle hash (the q311/q312 "fully transmitted ==
  * identity" discipline, applied to audio).
  *
  * Encoder subset (a valid stream any FLAC decoder reads): 16-bit
  * mono/stereo, fixed block size, per-block best FIXED predictor
  * (orders 0–4 by least sum-of-|residual|), CONSTANT blocks, VERBATIM
  * fallback, single-partition Rice with the 5-bit escape when raw coding
  * is cheaper, CRC-8/CRC-16 and UTF-8 frame numbers per spec, and — on
  * request — all three STEREO DECORRELATION channel assignments
  * (left/side, right/side, mid/side), which is what default FLAC
  * encoders actually emit for stereo: the side channel L−R carries ONE
  * extra bit of sample depth (17 bits here), mid is (L+R) >> 1 with the
  * dropped low bit recoverable from side's parity. Decoder superset: any
  * independent channel count, all three decorrelated assignments, all
  * four subframe types INCLUDING LPC (quantized coefficients + shift),
  * any Rice partition order, both residual methods (4- and 5-bit
  * parameters), wasted bits, 8-bit frame sample-rate/size overrides.
  * Loud IllegalArgumentException on anything structurally wrong — bad
  * magic, CRC mismatch, truncation, reserved codes (channel assignments
  * 11–15 included), or a STREAMINFO total that disagrees with the
  * decoded frames (the AVI dwTotalFrames discipline).
  *
  * Format is public: the FLAC format specification (RFC 9639 / the
  * canonical xiph.org description): STREAMINFO layout, frame-header
  * coding, subframe types, Rice partitioning, CRC-8 poly 0x07 and
  * CRC-16 poly 0x8005. Reference-behavior shape: the reference treats
  * binary media as opaque payloads; this is the beyond-reference decode
  * surface SURVEY.md §2's training-data section calls for.
  */
object FlacCodec {

  // ---- MSB-first bit IO (FLAC packs bits big-endian) -----------------------

  private final class BitWriter {
    private val buf = new ByteArrayOutputStream()
    private var cur = 0
    private var nb = 0
    def writeBit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1); nb += 1
      if (nb == 8) { buf.write(cur); cur = 0; nb = 0 }
    }
    def writeBits(v: Long, bits: Int): Unit = {
      var i = bits - 1
      while (i >= 0) { writeBit(((v >>> i) & 1L).toInt); i -= 1 }
    }
    def writeUnary(q: Int): Unit = {
      var i = 0
      while (i < q) { writeBit(0); i += 1 }
      writeBit(1)
    }
    def align(): Unit = while (nb != 0) writeBit(0)
    /** Current bytes; caller must be byte-aligned (CRC points always are). */
    def bytes: Array[Byte] = {
      require(nb == 0, "internal: bytes read off-alignment")
      buf.toByteArray
    }
  }

  private final class BitReader(bytes: Array[Byte]) {
    private var pos = 0
    private var bit = 0
    def readBit(): Int = {
      require(pos < bytes.length, "truncated FLAC: bitstream past end")
      val b = (bytes(pos) >> (7 - bit)) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      b
    }
    def readBits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def readSigned(n: Int): Int = {
      val v = readBits(n)
      ((v << (64 - n)) >> (64 - n)).toInt
    }
    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) q += 1
      q
    }
    def align(): Unit = if (bit != 0) { bit = 0; pos += 1 }
    def skipBytes(n: Int): Unit = {
      require(bit == 0, "internal: skip off-alignment")
      require(n >= 0 && pos.toLong + n <= bytes.length,
        s"truncated FLAC: metadata block overruns file")
      pos += n
    }
    def bytePos: Int = { require(bit == 0, "internal: bytePos off-alignment"); pos }
    def hasMore: Boolean = pos < bytes.length
  }

  // ---- CRCs (frame-header CRC-8 poly 0x07, whole-frame CRC-16 poly 0x8005) -

  private def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= b(i) & 0xFF
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xFF else (crc << 1) & 0xFF
        k += 1
      }
      i += 1
    }
    crc
  }

  private def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xFF) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xFFFF
          else (crc << 1) & 0xFFFF
        k += 1
      }
      i += 1
    }
    crc
  }

  // ---- frame/sample numbers: the spec's UTF-8-style variable coding --------

  private def writeUtf8(w: BitWriter, n: Long): Unit = {
    require(n >= 0, s"negative coded number $n")
    if (n < 0x80) { w.writeBits(n, 8); return }
    // count payload bits → lead-byte width
    var bytesN = 2
    var cap = 1L << 11
    while (n >= cap && bytesN < 7) { bytesN += 1; cap = 1L << (bytesN * 5 + 1) }
    val leadBits = 7 - bytesN // payload bits in the lead byte
    w.writeBits((0xFF << (leadBits + 1)) & 0xFF | (n >>> ((bytesN - 1) * 6)), 8)
    var i = bytesN - 2
    while (i >= 0) {
      w.writeBits(0x80L | ((n >>> (i * 6)) & 0x3F), 8)
      i -= 1
    }
  }

  private def readUtf8(r: BitReader): Long = {
    val lead = r.readBits(8).toInt
    if ((lead & 0x80) == 0) return lead
    var bytesN = 0
    var m = 0x40
    while ((lead & m) != 0 && bytesN < 7) { bytesN += 1; m >>= 1 }
    require(bytesN >= 1 && bytesN <= 6, s"corrupt FLAC: bad coded-number lead byte $lead")
    var v: Long = lead & (m - 1)
    var i = 0
    while (i < bytesN) {
      val c = r.readBits(8).toInt
      require((c & 0xC0) == 0x80, s"corrupt FLAC: bad coded-number continuation $c")
      v = (v << 6) | (c & 0x3F)
      i += 1
    }
    v
  }

  // ---- fixed predictors -----------------------------------------------------

  /** Residuals of fixed-order predictor `o` over `block` (length n−o). */
  private def fixedResiduals(block: Array[Int], o: Int): Array[Long] = {
    val n = block.length
    val out = new Array[Long](n - o)
    var i = o
    while (i < n) {
      val s = block
      out(i - o) = o match {
        case 0 => s(i).toLong
        case 1 => s(i).toLong - s(i - 1)
        case 2 => s(i).toLong - 2L * s(i - 1) + s(i - 2)
        case 3 => s(i).toLong - 3L * s(i - 1) + 3L * s(i - 2) - s(i - 3)
        case _ => s(i).toLong - 4L * s(i - 1) + 6L * s(i - 2) - 4L * s(i - 3) + s(i - 4)
      }
      i += 1
    }
    out
  }

  private def zigzag(r: Long): Long = if (r >= 0) 2 * r else -2 * r - 1

  /** Bits a signed two's-complement value needs (≥ 1). */
  private def signedBits(v: Long): Int = {
    var n = 1
    while (n < 32 && !(v >= -(1L << (n - 1)) && v < (1L << (n - 1)))) n += 1
    n
  }

  // ---- encoder --------------------------------------------------------------

  /** Stereo channel-assignment modes for [[encode]]. */
  val StereoModes: Set[String] = Set("independent", "left-side", "right-side", "mid-side")

  /** 16-bit FLAC bytes from interleaved samples (`channels` = 1 or 2).
    * `blockSize` is the fixed block size; the final block may be shorter.
    * `stereoMode` picks the channel assignment for stereo input:
    * "independent" (each channel its own subframe) or the three
    * decorrelated assignments default FLAC encoders emit — "left-side"
    * (L, L−R), "right-side" (L−R, R), "mid-side" ((L+R) >> 1, L−R); the
    * side subframe is coded at 17 bits per spec.
    */
  def encode(
      sampleRate: Int,
      channels: Int,
      samples: Array[Short],
      blockSize: Int = 256,
      stereoMode: String = "independent"): Array[Byte] = {
    require(sampleRate > 0 && sampleRate < (1 << 20), s"bad sample rate $sampleRate")
    require(channels == 1 || channels == 2, s"encoder is mono/stereo only, got $channels")
    require(samples != null && samples.nonEmpty && samples.length % channels == 0,
      "samples must be non-empty whole frames")
    require(blockSize >= 16 && blockSize <= 65535, s"bad blockSize $blockSize")
    require(StereoModes.contains(stereoMode), s"unknown stereoMode '$stereoMode'")
    require(channels == 2 || stereoMode == "independent",
      "stereo decorrelation needs 2 channels")
    val total = samples.length / channels

    val head = new BitWriter
    head.writeBits(0x664C6143L, 32) // "fLaC"
    head.writeBits(1, 1) // last metadata block
    head.writeBits(0, 7) // STREAMINFO
    head.writeBits(34, 24)
    head.writeBits(blockSize.toLong, 16)
    head.writeBits(blockSize.toLong, 16)
    head.writeBits(0, 24) // min frame size unknown
    head.writeBits(0, 24) // max frame size unknown
    head.writeBits(sampleRate.toLong, 20)
    head.writeBits((channels - 1).toLong, 3)
    head.writeBits(15, 5) // bps − 1
    head.writeBits(total.toLong, 36)
    head.writeBits(0, 64); head.writeBits(0, 64) // MD5 unknown (zeros, per spec)

    val out = new ByteArrayOutputStream()
    out.write(head.bytes)
    var frameNo = 0L
    var off = 0
    while (off < total) {
      val bs = math.min(blockSize, total - off)
      out.write(encodeFrame(frameNo, bs, channels, samples, off, stereoMode))
      off += bs
      frameNo += 1
    }
    out.toByteArray
  }

  private def encodeFrame(
      frameNo: Long, bs: Int, channels: Int,
      samples: Array[Short], off: Int, stereoMode: String): Array[Byte] = {
    val w = new BitWriter
    w.writeBits(0x3FFE, 14) // sync
    w.writeBit(0) // reserved
    w.writeBit(0) // fixed-blocksize strategy: frame number coded
    val bsCode =
      if (bs == 192) 1
      else if (bs == 576 || bs == 1152 || bs == 2304 || bs == 4608)
        2 + Integer.numberOfTrailingZeros(bs / 576)
      else if (bs >= 256 && bs <= 32768 && (bs & (bs - 1)) == 0)
        8 + Integer.numberOfTrailingZeros(bs / 256)
      else if (bs <= 256) 6
      else 7
    w.writeBits(bsCode.toLong, 4)
    w.writeBits(0, 4) // sample rate: from STREAMINFO
    val chCode = stereoMode match {
      case "left-side" => 8
      case "right-side" => 9
      case "mid-side" => 10
      case _ => channels - 1 // independent channels
    }
    w.writeBits(chCode.toLong, 4)
    w.writeBits(4, 3) // 16-bit samples
    w.writeBit(0) // reserved
    writeUtf8(w, frameNo)
    if (bsCode == 6) w.writeBits((bs - 1).toLong, 8)
    else if (bsCode == 7) w.writeBits((bs - 1).toLong, 16)
    val hdr = w.bytes
    w.writeBits(crc8(hdr, 0, hdr.length).toLong, 8)
    if (chCode >= 8) {
      // stereo decorrelation: side = L − R at 17 bits (one extra bit of
      // sample depth per spec); mid = (L + R) >> 1, the dropped low bit
      // recoverable from side's parity at decode
      val left = Array.tabulate(bs)(i => samples((off + i) * 2).toInt)
      val right = Array.tabulate(bs)(i => samples((off + i) * 2 + 1).toInt)
      val side = Array.tabulate(bs)(i => left(i) - right(i))
      chCode match {
        case 8 => writeSubframe(w, left, 16); writeSubframe(w, side, 17)
        case 9 => writeSubframe(w, side, 17); writeSubframe(w, right, 16)
        case _ =>
          val mid = Array.tabulate(bs)(i => (left(i) + right(i)) >> 1)
          writeSubframe(w, mid, 16); writeSubframe(w, side, 17)
      }
    } else {
      var c = 0
      while (c < channels) {
        val block = Array.tabulate(bs)(i => samples((off + i) * channels + c).toInt)
        writeSubframe(w, block, 16)
        c += 1
      }
    }
    w.align()
    val body = w.bytes
    w.writeBits(crc16(body, 0, body.length).toLong, 16)
    w.bytes
  }

  private def writeSubframe(w: BitWriter, block: Array[Int], bps: Int): Unit = {
    val n = block.length
    val mask = (1L << bps) - 1
    if (block.forall(_ == block(0))) {
      w.writeBit(0); w.writeBits(0, 6); w.writeBit(0) // CONSTANT, no wasted bits
      w.writeBits(block(0).toLong & mask, bps)
      return
    }
    val maxOrder = math.min(4, n - 1)
    var best = 0
    var bestSum = Long.MaxValue
    var bestRes: Array[Long] = null
    var o = 0
    while (o <= maxOrder) {
      val res = fixedResiduals(block, o)
      var s = 0L
      var i = 0
      while (i < res.length) { s += math.abs(res(i)); i += 1 }
      if (s < bestSum) { bestSum = s; best = o; bestRes = res }
      o += 1
    }
    // Rice cost (best single-partition parameter) vs 5-bit-escape raw cost
    var bestP = 0
    var bestBits = Long.MaxValue
    var p = 0
    while (p <= 14) {
      var bits = 0L
      var i = 0
      while (i < bestRes.length) { bits += (zigzag(bestRes(i)) >>> p) + 1 + p; i += 1 }
      if (bits < bestBits) { bestBits = bits; bestP = p }
      p += 1
    }
    var rawBits = 1
    var i = 0
    while (i < bestRes.length) {
      val b = signedBits(bestRes(i)); if (b > rawBits) rawBits = b; i += 1
    }
    val escBits = 5L + bestRes.length.toLong * rawBits
    val resBits = 2 + 4 + 4 + math.min(bestBits, escBits)
    val fixedCost = 8L + best.toLong * bps + resBits
    val verbCost = 8L + n.toLong * bps
    if (verbCost < fixedCost) {
      w.writeBit(0); w.writeBits(1, 6); w.writeBit(0) // VERBATIM
      var j = 0
      while (j < n) { w.writeBits(block(j).toLong & mask, bps); j += 1 }
      return
    }
    w.writeBit(0); w.writeBits((0x08 | best).toLong, 6); w.writeBit(0) // FIXED
    var j = 0
    while (j < best) { w.writeBits(block(j).toLong & mask, bps); j += 1 }
    w.writeBits(0, 2) // residual method 0: 4-bit Rice parameters
    w.writeBits(0, 4) // partition order 0: one partition
    if (escBits < bestBits) {
      w.writeBits(15, 4) // escape
      w.writeBits(rawBits.toLong, 5)
      var k = 0
      while (k < bestRes.length) {
        w.writeBits(bestRes(k) & ((1L << rawBits) - 1), rawBits); k += 1
      }
    } else {
      w.writeBits(bestP.toLong, 4)
      var k = 0
      while (k < bestRes.length) {
        val u = zigzag(bestRes(k))
        w.writeUnary((u >>> bestP).toInt)
        if (bestP > 0) w.writeBits(u & ((1L << bestP) - 1), bestP)
        k += 1
      }
    }
  }

  // ---- decoder --------------------------------------------------------------

  /** Parse FLAC bytes to interleaved PCM16 (as [[WavCodec.Wav]], so every
    * audio feature/fingerprint verb applies unchanged). Throws
    * IllegalArgumentException on anything structurally wrong.
    */
  def decode(bytes: Array[Byte]): WavCodec.Wav = {
    require(bytes != null && bytes.length >= 42, "not a FLAC file: too short")
    val r = new BitReader(bytes)
    require(r.readBits(32) == 0x664C6143L, "not a FLAC file: missing fLaC magic")

    var sampleRate = 0
    var channels = 0
    var bps = 0
    var total = 0L
    var last = false
    var first = true
    while (!last) {
      last = r.readBit() == 1
      val typ = r.readBits(7).toInt
      require(typ != 127, "corrupt FLAC: invalid metadata block type 127")
      val len = r.readBits(24).toInt
      if (first) {
        require(typ == 0 && len == 34,
          s"corrupt FLAC: first metadata block must be a 34-byte STREAMINFO (type $typ, $len)")
        r.readBits(16); r.readBits(16) // min/max block size
        r.readBits(24); r.readBits(24) // min/max frame size
        sampleRate = r.readBits(20).toInt
        channels = r.readBits(3).toInt + 1
        bps = r.readBits(5).toInt + 1
        total = r.readBits(36)
        r.readBits(64); r.readBits(64) // MD5
        require(sampleRate > 0, "corrupt FLAC: sample rate 0")
        require(bps <= 16, s"unsupported FLAC bps $bps (16-bit pipeline)")
      } else r.skipBytes(len)
      first = false
    }
    require(!first, "not a FLAC file: no metadata")

    // Pre-size from STREAMINFO is a HINT only, capped: the header is
    // untrusted crawled input, and total (≤2^36) × channels (≤8) taken at
    // face value would let a ~50-byte crafted header trigger a ~GiB
    // backing-array allocation before any frame decodes (allocation-DoS).
    // The buffer grows if the stream really is long; the got==total check
    // below still enforces the declared length.
    val out = new ArrayBuffer[Short](
      if (in(total, 1L, 1L << 26)) math.min(total * channels, 1L << 22).toInt else 1024)
    var got = 0L
    while (r.hasMore) got += decodeFrame(r, bytes, sampleRate, channels, bps, out)
    require(got > 0, "corrupt FLAC: no frames")
    require(total == 0 || got == total,
      s"corrupt FLAC: STREAMINFO declares $total samples, frames hold $got")
    WavCodec.Wav(sampleRate, channels, 16, out.toArray)
  }

  private def in(v: Long, lo: Long, hi: Long): Boolean = v >= lo && v <= hi

  /** Decode one frame into `out`; returns its block size (per channel). */
  private def decodeFrame(
      r: BitReader, bytes: Array[Byte], sampleRate: Int,
      channels: Int, bps: Int, out: ArrayBuffer[Short]): Int = {
    val start = r.bytePos
    require(r.readBits(14) == 0x3FFE, "corrupt FLAC: lost frame sync")
    require(r.readBit() == 0, "corrupt FLAC: reserved frame-header bit set")
    r.readBit() // blocking strategy (either is legal; the number below absorbs it)
    val bsCode = r.readBits(4).toInt
    require(bsCode != 0, "corrupt FLAC: reserved block-size code 0")
    val srCode = r.readBits(4).toInt
    require(srCode != 15, "corrupt FLAC: invalid sample-rate code 15")
    val chCode = r.readBits(4).toInt
    require(chCode <= 10, s"corrupt FLAC: reserved channel assignment $chCode")
    val frameCh = if (chCode <= 7) chCode + 1 else 2 // 8/9/10: stereo decorrelated
    require(frameCh == channels,
      s"corrupt FLAC: frame has $frameCh channels, STREAMINFO says $channels")
    val ssCode = r.readBits(3).toInt
    require(ssCode != 3, "corrupt FLAC: reserved sample-size code 3")
    val frameBps = ssCode match {
      case 0 => bps
      case 1 => 8
      case 2 => 12
      case 4 => 16
      case 5 => 20
      case 6 => 24
      case _ => 32
    }
    require(frameBps == bps,
      s"corrupt FLAC: frame bps $frameBps disagrees with STREAMINFO $bps")
    require(r.readBit() == 0, "corrupt FLAC: reserved frame-header bit set")
    readUtf8(r) // frame/sample number (validated structurally)
    val bs = bsCode match {
      case 1 => 192
      case c if c >= 2 && c <= 5 => 576 << (c - 2)
      case 6 => r.readBits(8).toInt + 1
      case 7 => r.readBits(16).toInt + 1
      case c => 256 << (c - 8)
    }
    srCode match { // frame-level overrides: parse to stay aligned
      case 12 => r.readBits(8)
      case 13 | 14 => r.readBits(16)
      case _ =>
    }
    val crcPos = r.bytePos
    val wantCrc8 = r.readBits(8).toInt
    require(crc8(bytes, start, crcPos) == wantCrc8, "corrupt FLAC: frame-header CRC-8 mismatch")

    val frame = Array.ofDim[Int](channels, bs)
    var c = 0
    while (c < channels) {
      // the SIDE channel of a decorrelated assignment carries one extra
      // bit of sample depth: ch1 for left-side (8) and mid-side (10),
      // ch0 for right-side (9)
      val sbps = chCode match {
        case 8 | 10 => if (c == 1) bps + 1 else bps
        case 9 => if (c == 0) bps + 1 else bps
        case _ => bps
      }
      decodeSubframe(r, frame(c), sbps)
      c += 1
    }
    r.align()
    val endPos = r.bytePos
    val wantCrc16 = r.readBits(16).toInt
    require(crc16(bytes, start, endPos) == wantCrc16, "corrupt FLAC: frame CRC-16 mismatch")

    // undo stereo decorrelation in place: side = L − R throughout;
    // mid = (L + R) >> 1, whose dropped low bit equals side's parity
    // (L + R and L − R share parity), so L + R = (mid << 1) | (side & 1)
    // and the halved sums/differences below are exact for any sign
    chCode match {
      case 8 => // (left, side) → (left, right)
        var i = 0
        while (i < bs) { frame(1)(i) = frame(0)(i) - frame(1)(i); i += 1 }
      case 9 => // (side, right) → (left, right)
        var i = 0
        while (i < bs) { frame(0)(i) = frame(1)(i) + frame(0)(i); i += 1 }
      case 10 => // (mid, side) → (left, right)
        var i = 0
        while (i < bs) {
          val side = frame(1)(i)
          val sum = (frame(0)(i) << 1) | (side & 1)
          frame(0)(i) = (sum + side) >> 1
          frame(1)(i) = (sum - side) >> 1
          i += 1
        }
      case _ =>
    }

    var i = 0
    while (i < bs) {
      var ch = 0
      while (ch < channels) {
        val v = frame(ch)(i)
        require(v >= -32768 && v <= 32767, s"corrupt FLAC: decoded sample $v overflows 16 bits")
        out += v.toShort
        ch += 1
      }
      i += 1
    }
    bs
  }

  private def decodeSubframe(r: BitReader, block: Array[Int], bps: Int): Unit = {
    require(r.readBit() == 0, "corrupt FLAC: reserved subframe-header bit set")
    val typ = r.readBits(6).toInt
    val wasted = if (r.readBit() == 1) r.readUnary() + 1 else 0
    val eb = bps - wasted
    require(eb > 0, s"corrupt FLAC: $wasted wasted bits leave no sample bits")
    val n = block.length
    if (typ == 0) { // CONSTANT
      val v = r.readSigned(eb)
      java.util.Arrays.fill(block, v)
    } else if (typ == 1) { // VERBATIM
      var i = 0
      while (i < n) { block(i) = r.readSigned(eb); i += 1 }
    } else if ((typ & 0x38) == 0x08 && (typ & 0x07) <= 4) { // FIXED 0–4
      val order = typ & 0x07
      require(order <= n, s"corrupt FLAC: fixed order $order exceeds block size $n")
      var i = 0
      while (i < order) { block(i) = r.readSigned(eb); i += 1 }
      val res = readResiduals(r, n, order)
      i = order
      while (i < n) {
        val pred: Long = order match {
          case 0 => 0L
          case 1 => block(i - 1).toLong
          case 2 => 2L * block(i - 1) - block(i - 2)
          case 3 => 3L * block(i - 1) - 3L * block(i - 2) + block(i - 3)
          case _ => 4L * block(i - 1) - 6L * block(i - 2) + 4L * block(i - 3) - block(i - 4)
        }
        val v = pred + res(i - order)
        require(in(v, Int.MinValue, Int.MaxValue), "corrupt FLAC: predictor overflow")
        block(i) = v.toInt
        i += 1
      }
    } else if ((typ & 0x20) == 0x20) { // LPC, order 1–32
      val order = (typ & 0x1F) + 1
      require(order <= n, s"corrupt FLAC: LPC order $order exceeds block size $n")
      var i = 0
      while (i < order) { block(i) = r.readSigned(eb); i += 1 }
      val precision = r.readBits(4).toInt + 1
      require(precision <= 15, "corrupt FLAC: invalid LPC precision code 15")
      val shift = r.readSigned(5)
      require(shift >= 0, s"corrupt FLAC: negative LPC shift $shift")
      val coefs = Array.fill(order)(r.readSigned(precision))
      val res = readResiduals(r, n, order)
      i = order
      while (i < n) {
        var acc = 0L
        var j = 0
        while (j < order) { acc += coefs(j).toLong * block(i - 1 - j); j += 1 }
        val v = (acc >> shift) + res(i - order)
        require(in(v, Int.MinValue, Int.MaxValue), "corrupt FLAC: LPC overflow")
        block(i) = v.toInt
        i += 1
      }
    } else {
      throw new IllegalArgumentException(s"corrupt FLAC: reserved subframe type $typ")
    }
    if (wasted > 0) {
      var i = 0
      while (i < n) { block(i) = block(i) << wasted; i += 1 }
    }
  }

  private def readResiduals(r: BitReader, blockSize: Int, order: Int): Array[Int] = {
    val method = r.readBits(2).toInt
    require(method <= 1, s"corrupt FLAC: reserved residual method $method")
    val pBits = if (method == 0) 4 else 5
    val escape = (1 << pBits) - 1
    val po = r.readBits(4).toInt
    val nPart = 1 << po
    require(blockSize % nPart == 0,
      s"corrupt FLAC: partition order $po incompatible with block size $blockSize")
    require((blockSize >> po) > order || po == 0,
      s"corrupt FLAC: partition order $po leaves no room for order-$order warmup")
    val out = new Array[Int](blockSize - order)
    var idx = 0
    var k = 0
    while (k < nPart) {
      val cnt = (blockSize >> po) - (if (k == 0) order else 0)
      require(cnt >= 0, "corrupt FLAC: negative partition sample count")
      val param = r.readBits(pBits).toInt
      if (param == escape) {
        val raw = r.readBits(5).toInt
        var i = 0
        while (i < cnt) {
          out(idx) = if (raw == 0) 0 else r.readSigned(raw)
          idx += 1; i += 1
        }
      } else {
        var i = 0
        while (i < cnt) {
          val u = (r.readUnary().toLong << param) | r.readBits(param)
          out(idx) = (if ((u & 1L) == 0L) u >>> 1 else -((u + 1) >>> 1)).toInt
          idx += 1; i += 1
        }
      }
      k += 1
    }
    out
  }
}
