package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val media = Multimodal.fromText(
    Seq((1L, "hello world of multimodal payloads"), (2L, "tiny")).toDF("id", "txt"),
    "id", "txt")

  test("media schema contract: binary payload + typed metadata struct") {
    assert(media.schema("payload").dataType.typeName == "binary")
    val meta = media.select("meta.modality", "meta.format").head()
    assert(meta.getString(0) == "image" && meta.getString(1) == "utf8")
  }

  test("payload byte length") {
    val n = media.filter($"media_id" === 1)
      .select(Multimodal.payloadBytes($"payload")).head().getLong(0)
    assert(n == "hello world of multimodal payloads".length)
  }

  test("frame sampling: first slice at offset 0, slices are hex of payload bytes") {
    val slices = media.filter($"media_id" === 1)
      .select(Multimodal.sampleSlices($"payload", 3, 4).as("s"))
      .head().getSeq[String](0)
    assert(slices.length == 3)
    assert(slices.head == "68656c6c") // "hell"
  }

  test("stub decoder: deterministic fixed-size features via mapPartitions") {
    val out = Multimodal.extractFeatures(media)
    assert(out.schema("features").dataType.simpleString == "array<float>")
    val f1 = out.filter($"media_id" === 1).select("features").head().getSeq[Float](0)
    val f2 = Multimodal.extractFeatures(media)
      .filter($"media_id" === 1).select("features").head().getSeq[Float](0)
    assert(f1.length == Multimodal.StubDecoder.FeatureDim)
    assert(f1 == f2) // deterministic
    assert(f1.forall(v => v >= 0.0f && v <= 1.0f))
    // matches a local recomputation from the same bytes
    val local = Multimodal.StubDecoder.features(
      "hello world of multimodal payloads".getBytes("UTF-8"))
    assert(f1 == local.toSeq)
  }

  // ---- real WAV codec -----------------------------------------------------

  test("WavCodec: encode -> decode round-trips samples, rate, channels") {
    import graft.multimodal.WavCodec
    val samples = Array.tabulate(300)(i => ((i * 37) % 65536 - 32768).toShort)
    val wav = WavCodec.decode(WavCodec.encode(8000, 2, samples))
    assert(wav.sampleRate == 8000 && wav.channels == 2 && wav.bitsPerSample == 16)
    assert(wav.samples.toSeq == samples.toSeq)
  }

  test("WavCodec: chunk walk skips unknown chunks (odd sizes padded) before data") {
    import graft.multimodal.WavCodec
    import java.nio.{ByteBuffer, ByteOrder}
    val samples = Array[Short](100, -200, 300)
    val plain = WavCodec.encode(44100, 1, samples)
    // splice a 5-byte (odd! forces the pad byte) LIST chunk between the fmt
    // and data chunks: [0,36) header+fmt, [36,...) data chunk
    val extra = ByteBuffer.allocate(8 + 6).order(ByteOrder.LITTLE_ENDIAN)
    extra.put("LIST".getBytes("US-ASCII")).putInt(5).put(Array[Byte](1, 2, 3, 4, 5, 0))
    val spliced = plain.take(36) ++ extra.array() ++ plain.drop(36)
    // patch the RIFF size field
    val bb = ByteBuffer.wrap(spliced).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    val wav = WavCodec.decode(spliced)
    assert(wav.samples.toSeq == samples.toSeq && wav.sampleRate == 44100)
  }

  test("WavCodec: non-PCM and truncated payloads fail loudly") {
    import graft.multimodal.WavCodec
    val good = WavCodec.encode(8000, 1, Array[Short](1, 2, 3))
    assertThrows[IllegalArgumentException](WavCodec.decode(good.take(20)))
    val nonPcm = good.clone()
    nonPcm(20) = 3 // format tag -> IEEE float
    assertThrows[IllegalArgumentException](WavCodec.decode(nonPcm))
    assertThrows[IllegalArgumentException](WavCodec.decode("RIFFxxxxJUNK".getBytes ++ new Array[Byte](40)))
  }

  test("WavCodec.features: exact integer stats + zero crossings") {
    import graft.multimodal.WavCodec
    val w = WavCodec.Wav(1000, 1, 16, Array[Short](5, -3, -2, 7, 0, -1))
    val f = WavCodec.features(w)
    assert(f.nSamples == 6 && f.durationMs == 6)
    assert(f.peakMin == -3 && f.peakMax == 7)
    // sign flips: 5->-3, -2->7, 0->-1 (0 counts as non-negative)
    assert(f.zeroCrossings == 3)
    assert(f.sumSamples == 6 && f.sumSquares == 25 + 9 + 4 + 49 + 0 + 1)
    assert(math.abs(f.rms - math.sqrt(88.0 / 6)) < 1e-12)
  }

  test("synthesizeWav -> extractWavFeatures: distributed real decode end-to-end") {
    val media = Multimodal.synthesizeWav(
      Seq((7L, "x"), (8L, "y")).toDF("id", "t"), "id", nSamples = 100, sampleRate = 10000)
    val out = Multimodal.extractWavFeatures(media).orderBy("media_id").collect()
    assert(out.length == 2)
    val r = out.head
    assert(r.getAs[Long]("sr") == 10000 && r.getAs[Long]("n_samples") == 100)
    assert(r.getAs[Long]("duration_ms") == 10)
    // recompute doc 7's features straight from the integer recipe
    val samples = Array.tabulate(100)(i => ((7L * 7919L + i * 104729L) % 65536L - 32768L))
    assert(r.getAs[Long]("sum_samples") == samples.sum)
    assert(r.getAs[Long]("sum_squares") == samples.map(v => v * v).sum)
    assert(r.getAs[Long]("peak_max") == samples.max)
  }
}
