package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII

/** Pure-JVM RIFF/WAVE PCM codec — the one modality this container CAN decode
  * for real (no external codec libraries needed), so the multimodal path has
  * an end-to-end-verified decoder next to [[Multimodal.StubDecoder]]'s
  * honest fakes: header walk, chunk iteration (including unknown chunks and
  * the RIFF odd-size pad byte), 16-bit little-endian PCM sample decode.
  *
  * Reference shape: the WAVE format is public (RIFF 1991 spec; the canonical
  * 44-byte PCM header layout). Only integer arithmetic touches the samples,
  * so every derived feature is exactly reproducible by the DuckDB oracle.
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

  /** Parse WAVE bytes; throws IllegalArgumentException on anything that is
    * not 16-bit PCM (loud beats silent for a decoder — a corrupt corpus
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
    var fmt: Option[(Int, Int, Int)] = None // (channels, sampleRate, bits)
    var data: Array[Short] = null
    while (bb.remaining() >= 8 && (fmt.isEmpty || data == null)) {
      val id = fourcc()
      val size = bb.getInt
      require(size >= 0 && size <= bb.remaining(), s"corrupt chunk '$id': size $size")
      val next = bb.position() + size + (size % 2) // RIFF pads odd chunks
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too small: $size")
          val tag = bb.getShort
          require(tag == 1, s"unsupported WAVE format tag $tag (PCM=1 only)")
          val channels = bb.getShort.toInt
          val rate = bb.getInt
          bb.getInt // byte rate
          bb.getShort // block align
          val bits = bb.getShort.toInt
          require(bits == 16, s"unsupported bits-per-sample $bits (16 only)")
          require(channels > 0 && rate > 0, "corrupt fmt chunk")
          fmt = Some((channels, rate, bits))
        case "data" =>
          val n = size / 2
          val out = new Array[Short](n)
          var i = 0
          while (i < n) { out(i) = bb.getShort; i += 1 }
          data = out
        case _ => // LIST/INFO/cue/etc. — skip
      }
      bb.position(math.min(next, bb.limit()))
    }
    val (channels, rate, bits) = fmt.getOrElse(
      throw new IllegalArgumentException("not a WAVE file: no fmt chunk"))
    require(data != null, "not a WAVE file: no data chunk")
    Wav(rate, channels, bits, data)
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
