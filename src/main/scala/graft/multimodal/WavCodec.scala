package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII

/** Pure-JVM RIFF/WAVE codec: header walk, chunk iteration (including
  * unknown chunks and the RIFF odd-size pad byte), 16-bit little-endian
  * PCM sample decode, and — round 10 — mono IMA/DVI ADPCM (format tag
  * 0x11), the audio family's first real DECOMPRESSION: 4-bit
  * predictor + step-table coding at 4:1 vs PCM16, decoded block-by-block
  * from each block's (predictor, step index) header.
  *
  * Reference shape: the WAVE format is public (RIFF 1991 spec; the
  * canonical 44-byte PCM header layout; the IMA ADPCM reference algorithm
  * and Microsoft's format-0x11 block layout). Only integer arithmetic
  * touches the samples — including the lossy ADPCM path, whose whole
  * encode+decode state machine the q314 oracle replays with a recursive
  * CTE — so every derived feature is exactly reproducible by DuckDB.
  */
object WavCodec {

  /** Decoded PCM: interleaved 16-bit samples + the format words. */
  final case class Wav(
      sampleRate: Int,
      channels: Int,
      bitsPerSample: Int,
      samples: Array[Short])

  /** Exact integer/sqrt features of a decoded payload — the audio analog of
    * the text quality stats. All-integer except `rms` (sqrt of an exact
    * ratio, so still bit-stable across engines).
    */
  final case class Features(
      sampleRate: Long,
      channels: Long,
      nSamples: Long,
      durationMs: Long,
      peakMin: Long,
      peakMax: Long,
      zeroCrossings: Long,
      sumSamples: Long,
      sumSquares: Long,
      rms: Double)

  /** 16-bit PCM mono/interleaved WAVE file bytes (the canonical 44-byte
    * header + data chunk).
    */
  def encode(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0, "sampleRate and channels must be positive")
    val dataLen = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(US_ASCII)).putInt(36 + dataLen).put("WAVE".getBytes(US_ASCII))
    bb.put("fmt ".getBytes(US_ASCII)).putInt(16)
    bb.putShort(1) // PCM format tag
    bb.putShort(channels.toShort).putInt(sampleRate)
    bb.putInt(sampleRate * channels * 2) // byte rate
    bb.putShort((channels * 2).toShort) // block align
    bb.putShort(16) // bits per sample
    bb.put("data".getBytes(US_ASCII)).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  // ---- IMA/DVI ADPCM (WAVE format tag 0x11) --------------------------------
  // The audio family's first real DECOMPRESSION: a pure-integer
  // predictor + step-table codec (4 bits/sample, 4:1 vs PCM16). Public
  // format: the IMA ADPCM reference algorithm and Microsoft's WAVE
  // format-0x11 block layout (per-block header: predictor int16, step
  // index uint8, reserved byte; then two 4-bit codes per byte, low
  // nibble first). Every operation is integer compare/shift/add, so a
  // SQL oracle replays the full encode+decode chain with a recursive CTE
  // — the decoded samples are exactly reproducible, lossy or not.

  private[graft] val ImaSteps: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544,
    598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707,
    1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871,
    5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  private[graft] val ImaIndexAdjust: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  private def clampPred(v: Int): Int =
    if (v < -32768) -32768 else if (v > 32767) 32767 else v

  private def clampIdx(v: Int): Int = if (v < 0) 0 else if (v > 88) 88 else v

  /** The decoder's reconstruction of one 4-bit code from (pred, idx) —
    * shared by encode (prediction must track the decoder exactly) and
    * decode. Returns (newPred, newIdx).
    */
  private def imaStep(pred: Int, idx: Int, code: Int): (Int, Int) = {
    val step = ImaSteps(idx)
    var diff = step >> 3
    if ((code & 4) != 0) diff += step
    if ((code & 2) != 0) diff += step >> 1
    if ((code & 1) != 0) diff += step >> 2
    val p = clampPred(if ((code & 8) != 0) pred - diff else pred + diff)
    (p, clampIdx(idx + ImaIndexAdjust(code & 7)))
  }

  /** Mono IMA-ADPCM WAVE bytes. `samplesPerBlock` must be odd (one header
    * sample + an even count of nibbles) and divide the sample count into
    * whole blocks — the layout standard encoders emit; a trailing partial
    * block is the caller's padding decision, not a silent one here. The
    * step index carries across blocks (stored in each block header, as
    * the format intends), so decode stays block-independent.
    */
  def encodeAdpcm(
      sampleRate: Int,
      samples: Array[Short],
      samplesPerBlock: Int = 505): Array[Byte] = {
    require(sampleRate > 0, "sampleRate must be positive")
    require(samplesPerBlock >= 3 && samplesPerBlock % 2 == 1,
      s"samplesPerBlock=$samplesPerBlock must be odd and >= 3")
    require(samples.nonEmpty && samples.length % samplesPerBlock == 0,
      s"${samples.length} samples is not whole blocks of $samplesPerBlock")
    val nBlocks = samples.length / samplesPerBlock
    val blockAlign = 4 + (samplesPerBlock - 1) / 2
    val dataLen = nBlocks * blockAlign
    val bb = ByteBuffer.allocate(12 + 8 + 20 + 12 + 8 + dataLen)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(US_ASCII)).putInt(4 + 28 + 20 + 8 + dataLen)
    bb.put("WAVE".getBytes(US_ASCII))
    bb.put("fmt ".getBytes(US_ASCII)).putInt(20)
    bb.putShort(0x11) // IMA ADPCM
    bb.putShort(1).putInt(sampleRate) // mono
    bb.putInt(sampleRate * blockAlign / samplesPerBlock) // avg byte rate
    bb.putShort(blockAlign.toShort)
    bb.putShort(4) // bits per (coded) sample
    bb.putShort(2) // cbSize
    bb.putShort(samplesPerBlock.toShort)
    // 'fact' chunk: total frames — format-0x11 files carry it
    bb.put("fact".getBytes(US_ASCII)).putInt(4).putInt(samples.length)
    bb.put("data".getBytes(US_ASCII)).putInt(dataLen)
    var idx = 0
    var s = 0
    var b = 0
    while (b < nBlocks) {
      var pred: Int = samples(s) // header sample transmits exactly
      bb.putShort(pred.toShort).put(idx.toByte).put(0.toByte)
      s += 1
      var i = 1
      var lowNibble = -1
      while (i < samplesPerBlock) {
        val step = ImaSteps(idx)
        val d = samples(s) - pred
        var code = if (d < 0) 8 else 0
        var ad = if (d < 0) -d else d
        if (ad >= step) { code |= 4; ad -= step }
        if (ad >= (step >> 1)) { code |= 2; ad -= step >> 1 }
        if (ad >= (step >> 2)) { code |= 1 }
        val (p2, i2) = imaStep(pred, idx, code) // track the decoder
        pred = p2; idx = i2
        if (lowNibble < 0) lowNibble = code
        else { bb.put((lowNibble | (code << 4)).toByte); lowNibble = -1 }
        s += 1
        i += 1
      }
      b += 1
    }
    bb.array()
  }

  /** Parse WAVE bytes — 16-bit PCM (tag 1) or mono IMA ADPCM (tag 0x11,
    * decompressed here to PCM16); throws IllegalArgumentException on
    * anything else (loud beats silent for a decoder — a corrupt corpus
    * should fail the batch, not ship zeroed features).
    */
  def decode(bytes: Array[Byte]): Wav = {
    require(bytes != null && bytes.length >= 44, "not a WAVE file: too short")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); bb.get(b); new String(b, US_ASCII)
    }
    require(fourcc() == "RIFF", "not a WAVE file: missing RIFF magic")
    bb.getInt // riff size (untrusted; chunk walk is bounded by the buffer)
    require(fourcc() == "WAVE", "not a WAVE file: missing WAVE form type")
    // (channels, sampleRate, bits, tag, blockAlign, samplesPerBlock)
    var fmt: Option[(Int, Int, Int, Int, Int, Int)] = None
    var dataRaw: Array[Byte] = null
    while (bb.remaining() >= 8 && (fmt.isEmpty || dataRaw == null)) {
      val id = fourcc()
      val size = bb.getInt
      require(size >= 0 && size <= bb.remaining(), s"corrupt chunk '$id': size $size")
      val next = bb.position() + size + (size % 2) // RIFF pads odd chunks
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too small: $size")
          val tag = bb.getShort.toInt
          require(tag == 1 || tag == 0x11,
            s"unsupported WAVE format tag $tag (PCM=1, IMA ADPCM=17 only)")
          val channels = bb.getShort.toInt
          val rate = bb.getInt
          bb.getInt // byte rate
          val blockAlign = bb.getShort.toInt
          val bits = bb.getShort.toInt
          require(channels > 0 && rate > 0, "corrupt fmt chunk")
          if (tag == 1) {
            require(bits == 16, s"unsupported bits-per-sample $bits (16 only)")
            fmt = Some((channels, rate, bits, tag, blockAlign, 0))
          } else {
            require(channels == 1, "IMA ADPCM: mono only")
            require(bits == 4, s"IMA ADPCM: 4 bits per sample, got $bits")
            require(size >= 20, "IMA ADPCM fmt chunk missing extension")
            bb.getShort // cbSize
            val spb = bb.getShort.toInt
            require(spb >= 3 && spb % 2 == 1, s"bad samplesPerBlock $spb")
            require(blockAlign == 4 + (spb - 1) / 2,
              s"blockAlign $blockAlign inconsistent with samplesPerBlock $spb")
            fmt = Some((channels, rate, bits, tag, blockAlign, spb))
          }
        case "data" =>
          val raw = new Array[Byte](size)
          bb.get(raw)
          dataRaw = raw
        case _ => // LIST/INFO/fact/cue/etc. — skip
      }
      bb.position(math.min(next, bb.limit()))
    }
    val (channels, rate, bits, tag, blockAlign, spb) = fmt.getOrElse(
      throw new IllegalArgumentException("not a WAVE file: no fmt chunk"))
    require(dataRaw != null, "not a WAVE file: no data chunk")
    if (tag == 1) {
      val n = dataRaw.length / 2
      val out = new Array[Short](n)
      val db = ByteBuffer.wrap(dataRaw).order(ByteOrder.LITTLE_ENDIAN)
      var i = 0
      while (i < n) { out(i) = db.getShort; i += 1 }
      Wav(rate, channels, bits, out)
    } else {
      require(dataRaw.length % blockAlign == 0,
        s"truncated ADPCM data: ${dataRaw.length} bytes not whole $blockAlign-byte blocks")
      val nBlocks = dataRaw.length / blockAlign
      val out = new Array[Short](nBlocks * spb)
      val db = ByteBuffer.wrap(dataRaw).order(ByteOrder.LITTLE_ENDIAN)
      var o = 0
      var b = 0
      while (b < nBlocks) {
        var pred: Int = db.getShort.toInt
        var idx: Int = db.get() & 0xFF
        db.get() // reserved
        require(idx <= 88, s"corrupt ADPCM block: step index $idx")
        out(o) = pred.toShort
        o += 1
        var i = 1
        while (i < spb) {
          val byte = db.get() & 0xFF
          var n = 0
          while (n < 2 && i < spb) {
            val code = if (n == 0) byte & 0x0F else byte >> 4
            val (p2, i2) = imaStep(pred, idx, code)
            pred = p2; idx = i2
            out(o) = pred.toShort
            o += 1
            i += 1
            n += 1
          }
        }
        b += 1
      }
      // decoded output is PCM16 regardless of the wire bits
      Wav(rate, channels, 16, out)
    }
  }

  /** Integer decimation by `factor` (mono): each FULL group of `factor`
    * consecutive samples averages (round-half-up, floorDiv so negatives
    * pin exactly) into one output sample; the tail partial group drops;
    * the rate divides. The boxcar average is the anti-alias prefilter in
    * its simplest pinned form — the 44.1k→16k-ish downsample an ASR
    * training pipeline runs on every clip, integer-exact so the oracle
    * replays it with grouped arithmetic.
    */
  def decimate(w: Wav, factor: Int): Wav = {
    require(factor >= 1, s"factor=$factor must be >= 1")
    require(w.channels == 1, "decimate: mono only")
    require(w.sampleRate % factor == 0,
      s"sample rate ${w.sampleRate} not divisible by $factor")
    val n = w.samples.length / factor
    val out = new Array[Short](n)
    var g = 0
    while (g < n) {
      var s = 0L
      var i = g * factor
      val end = i + factor
      while (i < end) { s += w.samples(i); i += 1 }
      out(g) = Math.floorDiv(2 * s + factor, 2L * factor).toShort
      g += 1
    }
    Wav(w.sampleRate / factor, 1, w.bitsPerSample, out)
  }

  /** Exact features over the interleaved samples (zero crossings use the
    * `(s_{i-1} < 0) != (s_i < 0)` sign-flip definition).
    */
  def features(w: Wav): Features = {
    val n = w.samples.length
    var sum = 0L
    var ssq = 0L
    var mn = Long.MaxValue
    var mx = Long.MinValue
    var zc = 0L
    var i = 0
    while (i < n) {
      val v = w.samples(i).toLong
      sum += v
      ssq += v * v
      if (v < mn) mn = v
      if (v > mx) mx = v
      if (i > 0 && ((w.samples(i - 1) < 0) != (v < 0))) zc += 1
      i += 1
    }
    val frames = if (w.channels > 0) n / w.channels else 0
    Features(
      sampleRate = w.sampleRate.toLong,
      channels = w.channels.toLong,
      nSamples = n.toLong,
      durationMs = if (w.sampleRate > 0) frames.toLong * 1000L / w.sampleRate else 0L,
      peakMin = if (n == 0) 0L else mn,
      peakMax = if (n == 0) 0L else mx,
      zeroCrossings = zc,
      sumSamples = sum,
      sumSquares = ssq,
      rms = if (n == 0) 0.0 else math.sqrt(ssq.toDouble / n))
  }

  /** Energy-delta acoustic fingerprint: the samples split into FULL frames
    * of `frameLen` (a trailing partial frame is dropped), each frame's
    * energy is the exact integer Σv², and bit f (f ≥ 1) is set when frame
    * f's energy exceeds frame f−1's — the sign-of-delta fingerprint that
    * audio-dedup systems hash, in its integer-exact form. Returns
    * (nFrames, bitstring of length nFrames−1, Σ energies).
    */
  def energyFingerprint(w: Wav, frameLen: Int): (Long, String, Long) = {
    require(frameLen > 0, s"frameLen=$frameLen must be positive")
    val nFrames = w.samples.length / frameLen
    val energies = Array.tabulate(nFrames) { f =>
      var s = 0L
      var i = f * frameLen
      val end = i + frameLen
      while (i < end) { val v = w.samples(i).toLong; s += v * v; i += 1 }
      s
    }
    val bits = new Array[Char](math.max(nFrames - 1, 0))
    var f = 1
    while (f < nFrames) {
      bits(f - 1) = if (energies(f) > energies(f - 1)) '1' else '0'
      f += 1
    }
    var total = 0L
    var j = 0
    while (j < nFrames) { total += energies(j); j += 1 }
    (nFrames.toLong, new String(bits), total)
  }

  /** Per-frame (zero-crossing count, Σv²) over FULL `frameLen`-sample
    * frames (the tail remainder is dropped — a partial frame's features
    * are a different statistic). Zero crossings count sign flips between
    * CONSECUTIVE samples WITHIN the frame (the first sample of each frame
    * has no predecessor), matching the whole-stream convention of
    * [[features]] restricted to frame boundaries. Exact integers — the
    * frame-grain voice-activity/energy table a curation pipeline windows
    * over.
    */
  def frameFeatures(w: Wav, frameLen: Int): Array[(Long, Long, Long)] = {
    require(frameLen > 0, s"frameLen=$frameLen must be positive")
    val nFrames = w.samples.length / frameLen
    Array.tabulate(nFrames) { f =>
      var zc = 0L
      var ssq = 0L
      var i = f * frameLen
      val end = i + frameLen
      var prev = 0L
      var first = true
      while (i < end) {
        val v = w.samples(i).toLong
        ssq += v * v
        if (!first && ((prev < 0) != (v < 0))) zc += 1
        prev = v
        first = false
        i += 1
      }
      (f.toLong, zc, ssq)
    }
  }
}
