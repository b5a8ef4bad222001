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

  // ---- real BMP codec -----------------------------------------------------

  test("BmpCodec: encode -> decode round-trips pixels (bottom-up + row padding)") {
    import graft.multimodal.BmpCodec
    // width 3 -> rowBytes 9 -> pad 3: exercises the padding path
    val pixels = Array.tabulate(3 * 5)(i => (i * 1234567) & 0xFFFFFF)
    val img = BmpCodec.decode(BmpCodec.encode(3, 5, pixels))
    assert(img.width == 3 && img.height == 5)
    assert(img.pixels.toSeq == pixels.toSeq)
  }

  test("BmpCodec: top-down (negative height) images decode to the same pixel order") {
    import graft.multimodal.BmpCodec
    import java.nio.{ByteBuffer, ByteOrder}
    val pixels = Array.tabulate(4 * 2)(i => i * 0x101010)
    val bu = BmpCodec.encode(4, 2, pixels)
    // flip to top-down: negate biHeight and swap the two stored rows
    val stride = 4 * 3 // width 4 -> rowBytes 12, no pad
    val td = bu.clone()
    ByteBuffer.wrap(td).order(ByteOrder.LITTLE_ENDIAN).putInt(22, -2)
    System.arraycopy(bu, 54, td, 54 + stride, stride)
    System.arraycopy(bu, 54 + stride, td, 54, stride)
    assert(BmpCodec.decode(td).pixels.toSeq == pixels.toSeq)
  }

  test("BmpCodec: non-24bpp / compressed / truncated payloads fail loudly") {
    import graft.multimodal.BmpCodec
    import java.nio.{ByteBuffer, ByteOrder}
    val good = BmpCodec.encode(2, 2, Array(0, 1, 2, 3))
    assertThrows[IllegalArgumentException](BmpCodec.decode(good.take(40)))
    val bpp8 = good.clone()
    ByteBuffer.wrap(bpp8).order(ByteOrder.LITTLE_ENDIAN).putShort(28, 8)
    assertThrows[IllegalArgumentException](BmpCodec.decode(bpp8))
    val rle = good.clone()
    ByteBuffer.wrap(rle).order(ByteOrder.LITTLE_ENDIAN).putInt(30, 1) // BI_RLE8
    assertThrows[IllegalArgumentException](BmpCodec.decode(rle))
  }

  test("BmpCodec.features: exact channel sums, luma extrema, edge transitions") {
    import graft.multimodal.BmpCodec
    // one row: black, white, black -> two strong horizontal edges
    val img = BmpCodec.Bmp(3, 1, Array(0x000000, 0xFFFFFF, 0x000000))
    val f = BmpCodec.features(img)
    assert(f.sumR == 255 && f.sumG == 255 && f.sumB == 255)
    assert(f.lumaMin == 0 && f.lumaMax == 255000)
    assert(f.edgeCount == 2)
  }

  test("BmpCodec.resizeNearest: floor-index sampling, identity at same size") {
    import graft.multimodal.BmpCodec
    val img = BmpCodec.Bmp(4, 2, Array(1, 2, 3, 4, 5, 6, 7, 8))
    // 4x2 -> 2x1: sx = x*4/2 = {0,2}, sy = 0 -> pixels (0,0)=1 and (0,2)=3
    assert(BmpCodec.resizeNearest(img, 2, 1).pixels.toSeq == Seq(1, 3))
    // upscale 2x repeats source pixels
    val up = BmpCodec.resizeNearest(BmpCodec.Bmp(2, 1, Array(9, 10)), 4, 1)
    assert(up.pixels.toSeq == Seq(9, 9, 10, 10))
    assert(BmpCodec.resizeNearest(img, 4, 2).pixels.toSeq == img.pixels.toSeq)
  }

  test("synthesizeBmp -> extractBmpFeatures: distributed real decode end-to-end") {
    val media = Multimodal.synthesizeBmp(
      Seq((3L, "x"), (4L, "y")).toDF("id", "t"), "id", width = 5, height = 4)
    val out = Multimodal.extractBmpFeatures(media).orderBy("media_id").collect()
    assert(out.length == 2)
    val r = out.head
    assert(r.getAs[Long]("width") == 5 && r.getAs[Long]("n_pixels") == 20)
    // recompute doc 3's red channel straight from the integer recipe
    val sumR = (for { y <- 0 until 4; x <- 0 until 5 }
      yield (3L * 31 + y * 7 + x * 13) % 256).sum
    assert(r.getAs[Long]("sum_r") == sumR)
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

  test("aHash: constant image all zeros, half-bright image splits, popcount matches") {
    import graft.multimodal.BmpCodec
    // constant image: no luma exceeds the mean -> all-zero hash
    val flat = BmpCodec.Bmp(4, 4, Array.fill(16)(0x808080))
    val (fb, fo) = BmpCodec.aHash(flat)
    assert(fb == "0" * 16 && fo == 0L)
    // left half black, right half white: exactly the white pixels are set
    val split = BmpCodec.Bmp(4, 2, Array.tabulate(8)(i => if (i % 4 < 2) 0x000000 else 0xFFFFFF))
    val (sb, so) = BmpCodec.aHash(split)
    assert(sb == "00110011" && so == 4L)
    assert(sb.count(_ == '1') == so)
  }

  test("energyFingerprint: rising energy sets bits, trailing partial frame dropped") {
    import graft.multimodal.WavCodec
    // frames of 2: energies 2, 8, 0 -> bits "10"; 7th sample (partial) ignored
    val w = WavCodec.Wav(8000, 1, 16, Array[Short](1, 1, 2, 2, 0, 0, 9999))
    val (nf, bits, tot) = WavCodec.energyFingerprint(w, 2)
    assert(nf == 3L && bits == "10" && tot == 2L + 8L + 0L)
    // round-trip through the real encoder
    val decoded = WavCodec.decode(WavCodec.encode(8000, 1, Array[Short](1, 1, 2, 2, 0, 0, 9999)))
    assert(WavCodec.energyFingerprint(decoded, 2) == ((3L, "10", 10L)))
  }

  test("frameFeatures: per-frame zcr + energy, no cross-frame crossings, tail dropped") {
    import graft.multimodal.WavCodec
    // frames of 3: [1,-1,2] zcr 2 ssq 6; [-5,0,1] zcr 1 (-5→0 flips; 0→1 no) ssq 26;
    // trailing [7] dropped
    val w = WavCodec.Wav(8000, 1, 16, Array[Short](1, -1, 2, -5, 0, 1, 7))
    val fs = WavCodec.frameFeatures(w, 3).toSeq
    assert(fs == Seq((0L, 2L, 6L), (1L, 1L, 26L)))
    // the frame boundary -1|2... 2→-5 sign flip crosses frames and must NOT count
    val w2 = WavCodec.Wav(8000, 1, 16, Array[Short](1, 1, -1, -1))
    assert(WavCodec.frameFeatures(w2, 2).toSeq == Seq((0L, 0L, 2L), (1L, 0L, 2L)))
  }

  test("dHash: horizontal gradient bits, brightness-shift invariant") {
    import graft.multimodal.BmpCodec
    // 3x2 ramp rising rightward: every adjacent pair increases → all bits 1
    val ramp = BmpCodec.Bmp(3, 2, Array(0x101010, 0x202020, 0x303030,
      0x101010, 0x202020, 0x303030))
    val (rb, ro) = BmpCodec.dHash(ramp)
    assert(rb == "1111" && ro == 4L)
    // add a constant brightness offset: aHash's mean cut may move, dHash must not
    val brighter = BmpCodec.Bmp(3, 2, ramp.pixels.map(_ + 0x404040))
    assert(BmpCodec.dHash(brighter) == ((rb, ro)))
    // falling ramp → all zeros
    val fall = BmpCodec.Bmp(3, 1, Array(0x303030, 0x202020, 0x101010))
    assert(BmpCodec.dHash(fall) == (("00", 0L)))
  }

  test("GifCodec: encode -> decode round-trips pixels through real LZW") {
    import graft.multimodal.GifCodec
    val palette = Array.tabulate(256) { j =>
      (((j * 31 + 7) % 256) << 16) | (((j * 17 + 3) % 256) << 8) | ((j * 23 + 11) % 256)
    }
    val w = 16; val h = 12
    val indices = Array.tabulate(w * h)(i => ((i * 13 + (i / w) * 31) % 256).toByte)
    val gif = GifCodec.encode(w, h, 8, palette, indices)
    assert(new String(gif, 0, 6, "US-ASCII") == "GIF87a")
    val img = GifCodec.decode(gif)
    assert(img.width == w && img.height == h)
    assert(img.pixels.toSeq == indices.map(i => palette(i & 0xFF)).toSeq)
  }

  test("GifCodec: solid-color runs exercise the KwKwK self-reference case") {
    import graft.multimodal.GifCodec
    // a long single-index run compresses to KwKwK chains (code == nextFree
    // on the decoder side) — the classic LZW edge every decoder must handle
    val palette = Array.tabulate(4)(j => j * 0x111111)
    val indices = Array.fill(400)(2.toByte)
    val img = GifCodec.decode(GifCodec.encode(20, 20, 2, palette, indices))
    assert(img.pixels.forall(_ == 0x222222))
    // 2-entry palette with alternating + run mix, small code widths
    val pal2 = Array(0x000000, 0xFFFFFF)
    val alt = Array.tabulate(64)(i => (if (i % 3 == 0) 1 else 0).toByte)
    val img2 = GifCodec.decode(GifCodec.encode(8, 8, 1, pal2, alt))
    assert(img2.pixels.toSeq == alt.map(i => pal2(i)).toSeq)
  }

  test("GifCodec: table-full clear/reset round-trips high-entropy images") {
    import graft.multimodal.GifCodec
    // 128x128 pseudo-random indices: ~16k codes force the dictionary past
    // 4096 entries → the encoder must emit a mid-stream clear and both
    // sides must resynchronize at reset width
    val palette = Array.tabulate(256) { j =>
      (((j * 31 + 7) % 256) << 16) | (((j * 17 + 3) % 256) << 8) | ((j * 23 + 11) % 256)
    }
    val n = 128 * 128
    val indices = Array.tabulate(n)(i => (((i * 2654435761L) >> 8) % 256).toByte)
    val img = GifCodec.decode(GifCodec.encode(128, 128, 8, palette, indices))
    assert(img.pixels.toSeq == indices.map(i => palette(i & 0xFF)).toSeq)
  }

  test("GifCodec: 89a extensions are skipped, junk fails loudly") {
    import graft.multimodal.GifCodec
    val palette = Array.tabulate(4)(j => j * 0x050505)
    val indices = Array.tabulate(6)(i => (i % 4).toByte)
    val gif = GifCodec.encode(3, 2, 2, palette, indices)
    // splice a GIF89a graphic-control extension right after the global
    // color table (offset 6 + 7 + 3*4 = 25) and relabel as 89a
    val ext = Array[Byte](0x21, 0xF9.toByte, 4, 0, 0, 0, 0, 0)
    val spliced = gif.take(25) ++ ext ++ gif.drop(25)
    spliced(4) = '9'.toByte // GIF87a -> GIF89a
    val img = GifCodec.decode(spliced)
    assert(img.pixels.toSeq == indices.map(i => palette(i & 0xFF)).toSeq)
    intercept[IllegalArgumentException](GifCodec.decode("nope".getBytes))
    intercept[IllegalArgumentException](GifCodec.decode(gif.take(20))) // truncated
  }

  test("GifCodec: animated encode -> decodeFrames round-trips every frame") {
    import graft.multimodal.GifCodec
    val palette = Array.tabulate(8)(j => j * 0x112233 & 0xFFFFFF)
    val frames = (0 until 4).map { f =>
      Array.tabulate(5 * 3)(i => ((i + f * 2) % 8).toByte)
    }
    val gif = GifCodec.encodeAnimation(5, 3, 3, palette, frames, delayCs = 5)
    assert(new String(gif, 0, 6, "US-ASCII") == "GIF89a")
    val out = GifCodec.decodeFrames(gif)
    assert(out.length == 4)
    for (f <- 0 until 4) {
      assert(out(f).width == 5 && out(f).height == 3)
      assert(out(f).pixels.toSeq == frames(f).map(i => palette(i & 0xFF)).toSeq,
        s"frame $f")
    }
    // single-frame decode of an animation = frame 0
    assert(GifCodec.decode(gif).pixels.toSeq == out.head.pixels.toSeq)
    // a plain single-frame GIF decodes as a 1-frame animation
    val single = GifCodec.encode(5, 3, 3, palette, frames.head)
    assert(GifCodec.decodeFrames(single).length == 1)
    // offset image blocks (partial-frame compositing) fail loudly:
    // image descriptor starts 0x2C left(2) top(2) — plant left = 1
    val off = gif.clone()
    val desc = (0 until off.length).indexWhere(j => (off(j) & 0xFF) == 0x2C)
    off(desc + 1) = 1
    val e = intercept[IllegalArgumentException](GifCodec.decodeFrames(off))
    assert(e.getMessage.contains("offset") || e.getMessage.contains("truncated"))
    // an UNDERSIZED frame (4x3 on the 5x3 screen) is compositing too —
    // the canvas outside the block would be prior content, so decoding
    // the block alone misrepresents the video
    val small = gif.clone()
    small(desc + 5) = 4
    val e2 = intercept[IllegalArgumentException](GifCodec.decodeFrames(small))
    assert(e2.getMessage.contains("undersized") || e2.getMessage.contains("corrupt"),
      e2.getMessage)
    // ...but the SINGLE-frame decode keeps its original lenient contract
    // (the first block's own pixels, wherever/whatever size it is)
    val single2 = GifCodec.encode(5, 3, 3, palette, frames.head)
    val sOff = (0 until single2.length).indexWhere(j => (single2(j) & 0xFF) == 0x2C)
    val shifted = single2.clone()
    shifted(sOff + 1) = 1 // left = 1: ignored by decode, loud in decodeFrames
    assert(GifCodec.decode(shifted).width == 5)
  }

  test("extractGifFeaturesQuarantine: GIF poison quarantines like PNG/JPEG") {
    import graft.multimodal.Multimodal
    val junk = Multimodal.fromText(
      Seq((9L, "definitely not a gif")).toDF("id", "t"), "id", "t")
    val good = Multimodal.synthesizeGif(Seq(1L).toDF("doc_id"), "doc_id")
    val out = Multimodal.extractGifFeaturesQuarantine(good.unionByName(junk))
      .orderBy("media_id").collect()
    assert(out(0).getBoolean(1) && !out(0).isNullAt(6))
    assert(!out(1).getBoolean(1) && out(1).getString(2).contains("GIF"))
  }

  test("synthesizeGifAnimation -> extractGifFrameFeatures: frame grain, scene recipe") {
    import graft.multimodal.Multimodal
    val docs = Seq(2L, 9L).toDF("doc_id")
    val ff = Multimodal.extractGifFrameFeatures(
      Multimodal.synthesizeGifAnimation(docs, "doc_id"))
      .orderBy("media_id", "frame").collect()
    assert(ff.length == 12) // 2 docs x 6 frames
    // frames 0-2 share a scene (identical), 3-5 the next; the boundary moves sums
    val d2 = ff.filter(_.getLong(0) == 2L)
    assert(d2.map(_.getLong(1)).toSeq == (0L to 5L))
    val sums = d2.map(r => (r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(sums(0) == sums(1) && sums(1) == sums(2))
    assert(sums(3) == sums(4) && sums(4) == sums(5))
    assert(sums(2) != sums(3), "scene boundary must change channel sums")
  }

  test("extractGifFrameDHash: a scene shared across two videos collides") {
    import graft.multimodal.Multimodal
    // by the scene recipe, doc+165's scene 0 IS doc's scene 1:
    // 13·doc + 97 ≡ 13·(doc + 165) (mod 256), since 97·13⁻¹ ≡ 165
    val docs = Seq(10L, 175L).toDF("doc_id")
    val fd = Multimodal.extractGifFrameDHash(
      Multimodal.synthesizeGifAnimation(docs, "doc_id"))
    def h(id: Long, f: Long): String = fd
      .filter($"media_id" === id && $"frame" === f)
      .select("dhash").head().getString(0)
    assert(h(10L, 3L) == h(175L, 0L), "shared scene must fingerprint equal")
    assert(h(10L, 0L) != h(10L, 3L), "distinct scenes must fingerprint apart")
  }

  test("quarantine decode: poison rows become audit rows, good rows stay exact") {
    import graft.multimodal.Multimodal
    // PNG: flipping the LAST byte lands in IEND's CRC — guaranteed typed
    // failure — so the planted poison is deterministic
    val media = Multimodal.corruptPayloads(
      Multimodal.synthesizePng(Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id"), "doc_id"),
      everyN = 5L)
    val out = Multimodal.extractPngFeaturesQuarantine(media)
      .orderBy("media_id").collect()
    assert(out.length == 5)
    val (bad, good) = out.partition(r => !r.getBoolean(1))
    assert(bad.map(_.getLong(0)).toSeq == Seq(5L))
    assert(bad.head.getString(2) != null && bad.head.isNullAt(6),
      "quarantined row must carry the error and NULL features")
    assert(good.forall(r => r.getString(2) == null && !r.isNullAt(6)))
    // the good rows match the throwing extractor exactly
    val strict = Multimodal.extractPngFeatures(
      Multimodal.synthesizePng(Seq(1L, 2L, 3L, 4L).toDF("doc_id"), "doc_id"))
      .orderBy("media_id").collect()
    for ((g, s) <- good.zip(strict))
      assert(g.getLong(6) == s.getLong(4), s"sum_r drift for id ${g.getLong(0)}")
    // JPEG twin: a non-JPEG payload quarantines, the good row decodes
    val junk = Multimodal.fromText(
      Seq((9L, "definitely not a jpeg")).toDF("id", "t"), "id", "t")
    val jgood = Multimodal.synthesizeJpeg(
      Seq(1L).toDF("doc_id"), "doc_id", grayscale = true)
    val jout = Multimodal.extractJpegFeaturesQuarantine(jgood.unionByName(junk))
      .orderBy("media_id").collect()
    assert(jout(0).getBoolean(1) && !jout(1).getBoolean(1))
    assert(jout(1).getString(2).contains("SOI"))
  }

  test("synthesizeGif -> extractGifFeatures/DHash: cross-format near-dup reuse") {
    import graft.multimodal.{BmpCodec, GifCodec, Multimodal}
    val ids = Seq(1L, 5L, 257L).toDF("doc_id") // 257 ≡ 1 (mod 256): same pixels as id 1
    val media = Multimodal.synthesizeGif(ids, "doc_id")
    val feats = Multimodal.extractGifFeatures(media).orderBy("media_id").collect()
    assert(feats.length == 3)
    // oracle-style recompute for id 1 from the composed integer recipes
    val expSumR = (for (y <- 0 until 12; x <- 0 until 16)
      yield ((1 * 13 + y * 31 + x * 7) % 256 * 31 + 7) % 256).sum.toLong
    assert(feats(0).getAs[Long]("sum_r") == expSumR)
    val hashes = Multimodal.extractGifDHash(media, side = 8).orderBy("media_id").collect()
    // id 257 decodes to id 1's pixels → identical dHash: the near-dup
    // machinery (hash equality join) works on GIF payloads unchanged
    assert(hashes(0).getAs[String]("dhash") == hashes(2).getAs[String]("dhash"))
    assert(hashes(0).getAs[String]("dhash") != hashes(1).getAs[String]("dhash"))
    // and ACROSS formats: a BMP of the same pixels hashes identically
    val px = Array.tabulate(16 * 12) { i =>
      val y = i / 16; val x = i % 16
      val j = (1 * 13 + y * 31 + x * 7) % 256
      (((j * 31 + 7) % 256) << 16) | (((j * 17 + 3) % 256) << 8) | ((j * 23 + 11) % 256)
    }
    val bmpImg = BmpCodec.resizeNearest(BmpCodec.decode(BmpCodec.encode(16, 12, px)), 9, 8)
    assert(BmpCodec.dHash(bmpImg)._1 == hashes(0).getAs[String]("dhash"))
  }

  test("PngCodec: encode -> decode round-trips through real DEFLATE + all filters") {
    import graft.multimodal.PngCodec
    // height 12 > 2*5: every filter type (y mod 5) appears at least twice,
    // including rows where the row ABOVE used a different filter
    val w = 16; val h = 12
    val px = Array.tabulate(w * h) { i =>
      val y = i / w; val x = i % w
      (((y * 37 + x * 11) % 256) << 16) | (((y * 5 + x * 29) % 256) << 8) | ((y * 13 + x * 3) % 256)
    }
    val png = PngCodec.encode(w, h, px)
    // PNG signature + IHDR tag present
    assert((png(0) & 0xFF) == 0x89 && new String(png, 1, 3, "US-ASCII") == "PNG")
    val img = PngCodec.decode(png)
    assert(img.width == w && img.height == h)
    assert(img.pixels.toSeq == px.toSeq)
  }

  test("PngCodec: high-entropy and solid images round-trip (deflate stored/rle paths)") {
    import graft.multimodal.PngCodec
    // pseudo-random pixels (poorly compressible) and a solid block (maximally
    // compressible) stress both ends of DEFLATE, plus multi-IDAT reassembly
    // (encoder splits at 2048 bytes; 64x48x3 filtered ≈ 9.4 kB → ≥2 chunks
    // even after compression on the random image)
    val n = 64 * 48
    val rnd = Array.tabulate(n)(i => (((i * 2654435761L) >>> 7) & 0xFFFFFF).toInt)
    assert(PngCodec.decode(PngCodec.encode(64, 48, rnd)).pixels.toSeq == rnd.toSeq)
    val solid = Array.fill(n)(0xABCDEF)
    assert(PngCodec.decode(PngCodec.encode(64, 48, solid)).pixels.toSeq == solid.toSeq)
  }

  test("PngCodec: degenerate dimensions round-trip (1x1, 1xN, Nx1)") {
    import graft.multimodal.PngCodec
    // width 1 exercises the no-left-neighbor path of Sub/Average/Paeth on
    // every row; height 1 the no-above path; 1x1 both at once
    for ((w, h) <- Seq((1, 1), (1, 8), (8, 1), (2, 2))) {
      val px = Array.tabulate(w * h)(i => (i * 0x123457 + 0x0B1D2C) & 0xFFFFFF)
      val img = PngCodec.decode(PngCodec.encode(w, h, px))
      assert(img.width == w && img.height == h)
      assert(img.pixels.toSeq == px.toSeq, s"${w}x$h")
    }
  }

  test("PngCodec: Adam7 interlace decodes pixel-identical to the plain encoding") {
    import graft.multimodal.PngCodec
    // odd dims exercise EMPTY passes (e.g. width < 5 kills pass 2) and
    // ragged pass grids; 16x12 is the gate shape; >=8x8 hits all 7 passes
    for ((w, h) <- Seq((16, 12), (1, 1), (3, 3), (5, 7), (8, 8), (9, 10), (2, 9))) {
      val px = Array.tabulate(w * h)(i => (i * 0x3D70A3 + 0x123456) & 0xFFFFFF)
      val plain = PngCodec.decode(PngCodec.encode(w, h, px))
      val inter = PngCodec.decode(PngCodec.encode(w, h, px, interlaced = true))
      assert(inter.width == w && inter.height == h)
      assert(inter.pixels.toSeq == plain.pixels.toSeq, s"${w}x$h")
      assert(inter.pixels.toSeq == px.toSeq, s"${w}x$h identity")
    }
  }

  test("PngCodec: paletted (type 3 + PLTE) round-trips, composes with interlace") {
    import graft.multimodal.PngCodec
    val palette = Array.tabulate(256)(j =>
      (((j * 31 + 7) % 256) << 16) | (((j * 17 + 3) % 256) << 8) | ((j * 23 + 11) % 256))
    val (w, h) = (16, 12)
    val idx = Array.tabulate(w * h)(i => (i * 13 + 5) % 256)
    val want = idx.map(palette)
    assert(PngCodec.decode(PngCodec.encodePalette(w, h, idx, palette)).pixels.toSeq
      == want.toSeq)
    assert(PngCodec.decode(
      PngCodec.encodePalette(w, h, idx, palette, interlaced = true)).pixels.toSeq
      == want.toSeq)
    // a short palette with in-range indices is fine; out-of-range is loud
    val small = palette.take(4)
    val idx4 = idx.map(_ % 4)
    assert(PngCodec.decode(PngCodec.encodePalette(w, h, idx4, small)).pixels.toSeq
      == idx4.map(small).toSeq)
    intercept[IllegalArgumentException](PngCodec.encodePalette(w, h, idx, small))
    // a CRAFTED file with an index past its PLTE must fail loudly on
    // decode: re-point a 4-entry palette file's index plane... simplest:
    // decode a 4-entry-palette file whose PLTE we truncate and re-CRC is
    // involved; instead assert the decoder's missing-PLTE loudness
    val noPlte = PngCodec.encodePalette(w, h, idx4, small)
    // strip the PLTE chunk (12 + 12-byte data) and expect a loud failure
    val plteAt = (0 until noPlte.length - 4).indexWhere(j =>
      new String(noPlte, j, 4, "US-ASCII") == "PLTE")
    // chunk = 4 len + 4 type + 12 data + 4 crc = 24 bytes from plteAt-4
    val stripped = noPlte.take(plteAt - 4) ++ noPlte.drop(plteAt + 20)
    val e = intercept[IllegalArgumentException](PngCodec.decode(stripped))
    assert(e.getMessage.contains("PLTE"), e.getMessage)
  }

  test("PngCodec: grayscale (type 0) widens to r=g=b, plain and interlaced") {
    import graft.multimodal.PngCodec
    val (w, h) = (16, 12)
    val gray = Array.tabulate(w * h)(i => (i * 53 + 11) % 256)
    val want = gray.map(v => (v << 16) | (v << 8) | v)
    assert(PngCodec.decode(PngCodec.encodeGray(w, h, gray)).pixels.toSeq == want.toSeq)
    assert(PngCodec.decode(
      PngCodec.encodeGray(w, h, gray, interlaced = true)).pixels.toSeq == want.toSeq)
    intercept[IllegalArgumentException](PngCodec.encodeGray(2, 1, Array(0, 256)))
  }

  test("PngCodec: RGBA (type 6) composites over white, plain and interlaced") {
    import graft.multimodal.PngCodec
    val (w, h) = (16, 12)
    def comp(c: Int, a: Int): Int = (a * c + (255 - a) * 255 + 127) / 255
    val argb = Array.tabulate(w * h) { i =>
      val r = (i * 37 + 5) % 256; val g = (i * 41 + 9) % 256
      val b = (i * 43 + 13) % 256; val a = (i * 29 + 3) % 256
      (a << 24) | (r << 16) | (g << 8) | b
    }
    // force the boundary alphas too: fully transparent and fully opaque
    argb(0) = 0x00123456 // a=0 → pure white
    argb(1) = 0xFF654321 // a=255 → the color verbatim
    val want = argb.map { p =>
      val a = (p >>> 24) & 0xFF
      (comp((p >> 16) & 0xFF, a) << 16) |
        (comp((p >> 8) & 0xFF, a) << 8) | comp(p & 0xFF, a)
    }
    assert(PngCodec.decode(PngCodec.encodeRgba(w, h, argb)).pixels.toSeq == want.toSeq)
    assert(PngCodec.decode(
      PngCodec.encodeRgba(w, h, argb, interlaced = true)).pixels.toSeq == want.toSeq)
    assert(want(0) == 0xFFFFFF && want(1) == 0x654321)
    // truncation of an alpha-carrying stream stays a typed loud failure
    val png = PngCodec.encodeRgba(w, h, argb)
    intercept[IllegalArgumentException](PngCodec.decode(png.take(png.length / 2)))
  }

  test("PngCodec: gray+alpha (type 4) composites then widens, plain and interlaced") {
    import graft.multimodal.PngCodec
    val (w, h) = (16, 12)
    val gray = Array.tabulate(w * h)(i => (i * 53 + 11) % 256)
    val alpha = Array.tabulate(w * h)(i => (i * 19 + 7) % 256)
    val want = gray.indices.map { i =>
      val v = (alpha(i) * gray(i) + (255 - alpha(i)) * 255 + 127) / 255
      (v << 16) | (v << 8) | v
    }
    assert(PngCodec.decode(
      PngCodec.encodeGrayAlpha(w, h, gray, alpha)).pixels.toSeq == want)
    assert(PngCodec.decode(
      PngCodec.encodeGrayAlpha(w, h, gray, alpha, interlaced = true)).pixels.toSeq == want)
    intercept[IllegalArgumentException](
      PngCodec.encodeGrayAlpha(2, 1, Array(0, 0), Array(0, 256)))
  }

  test("PngCodec: 16-bit grayscale decodes by MSB, plain and interlaced") {
    import graft.multimodal.PngCodec
    val (w, h) = (16, 12)
    val gray16 = Array.tabulate(w * h)(i => (i * 257 + i * i * 31 + 9) % 65536)
    val want = gray16.map { v =>
      val g = v >> 8
      (g << 16) | (g << 8) | g
    }
    assert(PngCodec.decode(PngCodec.encodeGray16(w, h, gray16)).pixels.toSeq == want.toSeq)
    assert(PngCodec.decode(
      PngCodec.encodeGray16(w, h, gray16, interlaced = true)).pixels.toSeq == want.toSeq)
    intercept[IllegalArgumentException](PngCodec.encodeGray16(2, 1, Array(0, 65536)))
  }

  test("PngCodec: palette tRNS composites per-entry alpha; short tables stay opaque") {
    import graft.multimodal.PngCodec
    def comp(c: Int, a: Int): Int = (a * c + (255 - a) * 255 + 127) / 255
    val palette = Array.tabulate(4)(j => j * 0x111111 + 0x221100)
    val idx = Array.tabulate(12)(_ % 4)
    // entry 0 fully transparent, entry 1 half, entries 2..3 NOT in tRNS →
    // opaque per spec
    val alphas = Array(0, 128)
    val out = PngCodec.decode(
      PngCodec.encodePaletteTrns(4, 3, idx, palette, alphas)).pixels
    idx.zipWithIndex.foreach { case (j, i) =>
      val a = if (j < alphas.length) alphas(j) else 255
      val p = palette(j)
      val want = (comp((p >> 16) & 0xFF, a) << 16) |
        (comp((p >> 8) & 0xFF, a) << 8) | comp(p & 0xFF, a)
      assert(out(i) == want, s"pixel $i entry $j")
    }
    assert(out(0) == 0xFFFFFF) // alpha 0 → pure white
    assert(out(2) == palette(2)) // past the tRNS table → verbatim
    // tRNS remains INVALID on the alpha color types — reject loudly
    val rgba = PngCodec.encodeRgba(2, 2, Array(0x11223344, 0x55667788, 0, -1))
    val trnsChunk = {
      val body = Array[Byte](0)
      val crc = new java.util.zip.CRC32()
      crc.update("tRNS".getBytes("US-ASCII")); crc.update(body)
      val c = crc.getValue
      Array[Byte](0, 0, 0, 1) ++ "tRNS".getBytes("US-ASCII") ++ body ++
        Array(((c >> 24) & 0xFF).toByte, ((c >> 16) & 0xFF).toByte,
          ((c >> 8) & 0xFF).toByte, (c & 0xFF).toByte)
    }
    val spliced = rgba.take(8 + 25) ++ trnsChunk ++ rgba.drop(8 + 25)
    val e = intercept[IllegalArgumentException](PngCodec.decode(spliced))
    assert(e.getMessage.contains("tRNS"), e.getMessage)
  }

  test("PngCodec: 16-bit truecolor and RGBA frame by MSB; color keys compare full depth") {
    import graft.multimodal.PngCodec
    def comp(c: Int, a: Int): Int = (a * c + (255 - a) * 255 + 127) / 255
    val (w, h) = (16, 12)
    val n = w * h
    val r = Array.tabulate(n)(i => (i * 257 + 11) % 65536)
    val g = Array.tabulate(n)(i => (i * 263 + 13) % 65536)
    val b = Array.tabulate(n)(i => (i * 269 + 17) % 65536)
    val wantRgb = Array.tabulate(n)(i =>
      ((r(i) >> 8) << 16) | ((g(i) >> 8) << 8) | (b(i) >> 8))
    assert(PngCodec.decode(PngCodec.encodeRgb16(w, h, r, g, b)).pixels.toSeq
      == wantRgb.toSeq)
    assert(PngCodec.decode(
      PngCodec.encodeRgb16(w, h, r, g, b, interlaced = true)).pixels.toSeq
      == wantRgb.toSeq)
    // RGBA16: composite over white on the MSBs
    val a = Array.tabulate(n)(i => (i * 271 + 19) % 65536)
    val wantRgba = Array.tabulate(n) { i =>
      val av = a(i) >> 8
      (comp(r(i) >> 8, av) << 16) | (comp(g(i) >> 8, av) << 8) | comp(b(i) >> 8, av)
    }
    assert(PngCodec.decode(PngCodec.encodeRgba16(w, h, r, g, b, a)).pixels.toSeq
      == wantRgba.toSeq)
    // truecolor color key: pixel 0 matches EXACTLY → white; pixel 1
    // differs from the key only in the LSB — MSB-equal — and must NOT key
    val r2 = r.clone(); val g2 = g.clone(); val b2 = b.clone()
    r2(0) = 0x1234; g2(0) = 0x5678; b2(0) = 0x9abc
    r2(1) = 0x1235; g2(1) = 0x5678; b2(1) = 0x9abc // LSB off by one
    val keyed = PngCodec.decode(PngCodec.encodeRgb16(w, h, r2, g2, b2,
      colorKey = Some((0x1234, 0x5678, 0x9abc)))).pixels
    assert(keyed(0) == 0xFFFFFF)
    assert(keyed(1) == ((0x12 << 16) | (0x56 << 8) | 0x9a))
    // gray16 color key: same full-depth discipline
    val gray = Array.tabulate(n)(i => (i * 257 + 5) % 65536)
    gray(0) = 0x4142; gray(1) = 0x4143
    val gk = PngCodec.decode(
      PngCodec.encodeGray16ColorKey(w, h, gray, key = 0x4142)).pixels
    assert(gk(0) == 0xFFFFFF && gk(1) == 0x414141)
  }

  test("PngCodec: corruption fails loudly (CRC, signature, truncation, unsupported)") {
    import graft.multimodal.PngCodec
    val png = PngCodec.encode(4, 3, Array.tabulate(12)(i => i * 0x010203))
    // flip a byte inside the first IDAT payload: CRC must catch it
    val idatPos = {
      var p = 8; var found = -1
      while (found < 0) {
        val len = ((png(p) & 0xFF) << 24) | ((png(p + 1) & 0xFF) << 16) |
          ((png(p + 2) & 0xFF) << 8) | (png(p + 3) & 0xFF)
        if (new String(png, p + 4, 4, "US-ASCII") == "IDAT") found = p + 8
        else p += 12 + len
      }
      found
    }
    val corrupt = png.clone()
    corrupt(idatPos) = (corrupt(idatPos) ^ 0x5A).toByte
    val e1 = intercept[IllegalArgumentException](PngCodec.decode(corrupt))
    assert(e1.getMessage.contains("CRC"))
    intercept[IllegalArgumentException](PngCodec.decode("notapng!".getBytes ++ png.drop(8)))
    intercept[IllegalArgumentException](PngCodec.decode(png.take(40))) // truncated
    // interlace flag: byte 20 of IHDR data (sig 8 + len 4 + tag 4 + 12) = 28
    val inter = png.clone(); inter(8 + 8 + 12) = 1
    // CRC now wrong too, but the loud path must reject either way
    intercept[IllegalArgumentException](PngCodec.decode(inter))
    // a CRAFTED corruption: flip an IDAT payload byte and RE-CRC the
    // chunk, so the corruption reaches the DEFLATE layer — still a typed
    // loud failure (bad stream / stall / wrong length), never wrong pixels
    val crafted = png.clone()
    crafted(idatPos + 4) = (crafted(idatPos + 4) ^ 0x3C).toByte
    val lenPos = idatPos - 8
    val len = ((crafted(lenPos) & 0xFF) << 24) | ((crafted(lenPos + 1) & 0xFF) << 16) |
      ((crafted(lenPos + 2) & 0xFF) << 8) | (crafted(lenPos + 3) & 0xFF)
    val crc = new java.util.zip.CRC32()
    crc.update(crafted, lenPos + 4, 4 + len)
    val c = crc.getValue
    crafted(idatPos + len) = ((c >> 24) & 0xFF).toByte
    crafted(idatPos + len + 1) = ((c >> 16) & 0xFF).toByte
    crafted(idatPos + len + 2) = ((c >> 8) & 0xFF).toByte
    crafted(idatPos + len + 3) = (c & 0xFF).toByte
    intercept[IllegalArgumentException](PngCodec.decode(crafted))
    // a CRC-VALID crafted IHDR claiming 65536x65536: width*height wraps
    // Int to 0 — must fail the Long-checked pixel bound loudly, never
    // allocate or return a malformed frame
    val big = png.clone()
    big(16) = 0; big(17) = 1; big(18) = 0; big(19) = 0 // width  = 65536
    big(20) = 0; big(21) = 1; big(22) = 0; big(23) = 0 // height = 65536
    val icrc = new java.util.zip.CRC32()
    icrc.update(big, 12, 4 + 13) // IHDR tag + data
    val ic = icrc.getValue
    big(29) = ((ic >> 24) & 0xFF).toByte; big(30) = ((ic >> 16) & 0xFF).toByte
    big(31) = ((ic >> 8) & 0xFF).toByte; big(32) = (ic & 0xFF).toByte
    val eBig = intercept[IllegalArgumentException](PngCodec.decode(big))
    assert(eBig.getMessage.contains("too large"), s"wrong failure: $eBig")
  }

  test("synthesizePng -> extractPngFeatures/DHash + three-format twin collision") {
    import graft.multimodal.Multimodal
    val ids = Seq(2L, 7L, 258L).toDF("doc_id") // 258 ≡ 2 (mod 256): same pixels as id 2
    val media = Multimodal.synthesizePng(ids, "doc_id")
    val feats = Multimodal.extractPngFeatures(media).orderBy("media_id").collect()
    assert(feats.length == 3)
    // oracle-style recompute for id 2 from the integer channel recipe
    val expSumG = (for (y <- 0 until 12; x <- 0 until 16)
      yield (2 * 41 + y * 13 + x * 3) % 256).sum.toLong
    assert(feats(0).getAs[Long]("sum_g") == expSumG)
    assert(feats(0).getAs[Long]("n_pixels") == 192L)
    // the GIF-pixel twin must dHash-collide with BOTH other containers
    val pngTwin = Multimodal
      .extractPngDHash(Multimodal.synthesizePngGifTwin(ids, "doc_id"), side = 8)
      .orderBy("media_id").collect()
    val bmpTwin = Multimodal
      .extractBmpDHash(Multimodal.synthesizeBmpGifTwin(ids, "doc_id"), side = 8)
      .orderBy("media_id").collect()
    val gifTwin = Multimodal
      .extractGifDHash(Multimodal.synthesizeGif(ids, "doc_id"), side = 8)
      .orderBy("media_id").collect()
    for (i <- 0 until 3) {
      assert(pngTwin(i).getAs[String]("dhash") == bmpTwin(i).getAs[String]("dhash"))
      assert(pngTwin(i).getAs[String]("dhash") == gifTwin(i).getAs[String]("dhash"))
    }
    // resize + feature verbs compose on the PNG path like every container
    val small = Multimodal.extractPngFeatures(media, resizeTo = Some((4, 3)))
      .orderBy("media_id").collect()
    assert(small(0).getAs[Long]("n_pixels") == 12L)
  }

  // ---- real AVI (MJPEG) video container -----------------------------------

  test("AviCodec: encode -> decodeFrames round-trips every MJPEG frame") {
    import graft.multimodal.{AviCodec, JpegCodec}
    val w = 16; val h = 16
    val framePayloads = (0 until 4).map { f =>
      val px = Array.tabulate(w * h) { i =>
        val by = (i / w) / 8; val bx = (i % w) / 8
        val v = (f * 67 + by * 71 + bx * 113) % 256
        (v << 16) | (v << 8) | v
      }
      JpegCodec.encode(w, h, px, grayscale = true)
    }
    val avi = AviCodec.encodeMjpeg(w, h, fps = 10, framePayloads)
    assert(new String(avi, 0, 4, "US-ASCII") == "RIFF")
    assert(new String(avi, 8, 4, "US-ASCII") == "AVI ")
    // header-only sniff never touches entropy data
    val inf = AviCodec.info(avi)
    assert(inf.width == w && inf.height == h)
    assert(inf.usPerFrame == 100000 && inf.totalFrames == 4)
    // every container frame decodes to exactly what a bare JPEG decode of
    // the same payload produces — the mux is transparent
    val frames = AviCodec.decodeFrames(avi)
    assert(frames.length == 4)
    for (f <- 0 until 4) {
      val direct = JpegCodec.decode(framePayloads(f))
      assert(frames(f).width == w && frames(f).height == h)
      assert(frames(f).pixels.toSeq == direct.pixels.toSeq, s"frame $f")
    }
  }

  test("AviCodec: structural corruption fails loudly, index is untrusted") {
    import graft.multimodal.{AviCodec, JpegCodec}
    val payload = JpegCodec.encode(8, 8,
      Array.fill(64)(0x7F7F7F), grayscale = true)
    val avi = AviCodec.encodeMjpeg(8, 8, fps = 5, Seq(payload, payload))
    intercept[IllegalArgumentException](AviCodec.decodeFrames("junk".getBytes))
    intercept[IllegalArgumentException](AviCodec.decodeFrames(avi.take(avi.length / 2)))
    intercept[IllegalArgumentException](AviCodec.info(avi.take(20)))
    // dwTotalFrames disagreeing with the movi walk is loud (a stale
    // header must not silently pass as a shorter video)
    val avihAt = (0 until avi.length - 4).indexWhere(j =>
      new String(avi, j, 4, "US-ASCII") == "avih")
    val lied = avi.clone()
    lied(avihAt + 8 + 16) = 9 // dwTotalFrames LE low byte: 2 -> 9
    val e = intercept[IllegalArgumentException](AviCodec.decodeFrames(lied))
    assert(e.getMessage.contains("declares"), e.getMessage)
    // a non-MJPEG vids handler is rejected, not mis-decoded
    val strhAt = (0 until avi.length - 4).indexWhere(j =>
      new String(avi, j, 4, "US-ASCII") == "strh")
    val h264 = avi.clone()
    "H264".getBytes("US-ASCII").copyToArray(h264, strhAt + 8 + 4)
    val e2 = intercept[IllegalArgumentException](AviCodec.decodeFrames(h264))
    assert(e2.getMessage.contains("unsupported"), e2.getMessage)
    // a frame whose JPEG dims disagree with the container header is loud
    val other = JpegCodec.encode(16, 8,
      Array.fill(128)(0x5F5F5F), grayscale = true)
    val mixed = AviCodec.encodeMjpeg(8, 8, fps = 5, Seq(payload, other))
    val e3 = intercept[IllegalArgumentException](AviCodec.decodeFrames(mixed))
    assert(e3.getMessage.contains("header says"), e3.getMessage)
    // idx1 corruption does NOT break decode — the index is never trusted
    val idxAt = (0 until avi.length - 4).indexWhere(j =>
      new String(avi, j, 4, "US-ASCII") == "idx1")
    val badIdx = avi.clone()
    badIdx(idxAt + 12) = 0x5A // garbage offset in the first index entry
    assert(AviCodec.decodeFrames(badIdx).length == 2)
  }

  test("synthesizeAviMjpeg -> extractAviFrameFeatures: scenes survive the lossy round-trip") {
    import graft.multimodal.Multimodal
    val docs = Seq(3L, 8L).toDF("doc_id")
    val ff = Multimodal.extractAviFrameFeatures(
      Multimodal.synthesizeAviMjpeg(docs, "doc_id"))
      .orderBy("media_id", "frame").collect()
    assert(ff.length == 12) // 2 docs x 6 frames
    val d3 = ff.filter(_.getLong(0) == 3L)
    assert(d3.map(_.getLong(1)).toSeq == (0L to 5L))
    // frames within a scene are byte-identical; the boundary moves sums
    val sums = d3.map(r => (r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(sums(0) == sums(1) && sums(1) == sums(2))
    assert(sums(3) == sums(4) && sums(4) == sums(5))
    assert(sums(2) != sums(3), "scene boundary must change channel sums")
    // closed-form check for doc 3, frame 0: the q300 BIGINT chain
    def rec(v: Long): Long = {
      val s = v - 128
      val qdc = (8 * s + 8) >> 4
      val g1 = (qdc * 16 * 370728L + 2048L) >> 12
      val out = ((g1 * 370728L + 134217728L) >> 28) + 128
      math.max(0L, math.min(255L, out))
    }
    val expSum = 64L * (for (by <- 0 until 2; bx <- 0 until 2)
      yield rec((3 * 29 + by * 71 + bx * 113) % 256)).sum
    assert(d3(0).getLong(4) == expSum, "sum_r must equal the DC closed form")
  }

  test("extractAviFrameDHash: a scene shared across two videos collides") {
    import graft.multimodal.Multimodal
    // v = (id·29 + scene·67 + …) mod 256 and 29⁻¹ ≡ 53 (mod 256), so
    // doc+223's scene 0 IS doc's scene 1 (67·53 ≡ 223·29⁻¹… : 29·223 ≡ −67)
    val docs = Seq(10L, 233L).toDF("doc_id")
    val fd = Multimodal.extractAviFrameDHash(
      Multimodal.synthesizeAviMjpeg(docs, "doc_id", blocksW = 4, blocksH = 4))
    def h(id: Long, f: Long): String = fd
      .filter($"media_id" === id && $"frame" === f)
      .select("dhash").head().getString(0)
    assert(h(10L, 3L) == h(233L, 0L), "shared scene must fingerprint equal")
  }

  test("sniffAviInfo: bytes win over metadata; frame profile = features + dhash in one decode") {
    import graft.multimodal.Multimodal
    val media = Multimodal.synthesizeAviMjpeg(Seq(1L, 2L).toDF("doc_id"), "doc_id")
    val lied = media.withColumn("meta",
      when($"media_id" === 2L,
        struct(lit("video").as("modality"), lit("avi").as("format"),
          lit(999).as("width"), lit(16).as("height"),
          lit(null).cast("long").as("duration_ms")))
        .otherwise($"meta"))
    val out = Multimodal.sniffAviInfo(lied).orderBy("media_id").collect()
    assert(out(0).getLong(1) == 16 && out(0).getLong(4) == 6 &&
      out(0).getLong(5) == 600 && out(0).getBoolean(6))
    assert(out(1).getLong(1) == 16 && !out(1).getBoolean(6), "lying meta flagged")
    // the one-decode profile carries exactly the two single-purpose verbs' columns
    val prof = Multimodal.extractAviFrameProfile(media).orderBy("media_id", "frame")
    val ff = Multimodal.extractAviFrameFeatures(media).orderBy("media_id", "frame")
    val fd = Multimodal.extractAviFrameDHash(media).orderBy("media_id", "frame")
    val p = prof.collect(); val f = ff.collect(); val d = fd.collect()
    assert(p.length == f.length && p.length == d.length)
    for (i <- p.indices) {
      assert(p(i).getAs[Long]("sum_r") == f(i).getAs[Long]("sum_r"))
      assert(p(i).getAs[String]("dhash") == d(i).getAs[String]("dhash"))
    }
  }

  test("WavCodec ADPCM: decode equals an independent replay of the state machine") {
    import graft.multimodal.WavCodec
    val samples = Array.tabulate(202)(i =>
      (((5L * 7919L + i * 104729L) % 65536L) - 32768L).toShort)
    val wav = WavCodec.decode(WavCodec.encodeAdpcm(8000, samples, 101))
    assert(wav.sampleRate == 8000 && wav.channels == 1 && wav.bitsPerSample == 16)
    assert(wav.samples.length == 202)
    // independent replay (the q314 oracle's recursion, in Scala): encode
    // quantization + decoder reconstruction per sample, headers at 0/101
    val steps = WavCodec.ImaSteps; val adj = WavCodec.ImaIndexAdjust
    var pred = 0; var idx = 0
    val want = new Array[Short](202)
    for (i <- 0 until 202) {
      if (i % 101 == 0) { pred = samples(i).toInt }
      else {
        val step = steps(idx)
        val d = samples(i) - pred
        var ad = math.abs(d)
        var code = 0
        if (ad >= step) { code |= 4; ad -= step }
        if (ad >= (step >> 1)) { code |= 2; ad -= step >> 1 }
        if (ad >= (step >> 2)) { code |= 1 }
        var diff = step >> 3
        if ((code & 4) != 0) diff += step
        if ((code & 2) != 0) diff += step >> 1
        if ((code & 1) != 0) diff += step >> 2
        pred = math.max(-32768, math.min(32767, if (d < 0) pred - diff else pred + diff))
        idx = math.max(0, math.min(88, idx + adj(code)))
      }
      want(i) = pred.toShort
    }
    assert(wav.samples.toSeq == want.toSeq, "nibble packing / state drift")
    // block headers transmit exactly
    assert(wav.samples(0) == samples(0) && wav.samples(101) == samples(101))
    // a smooth signal decodes CLOSE (the 4-bit codec tracks ramps well)
    val ramp = Array.tabulate(202)(i => (i * 7 - 700).toShort)
    val rdec = WavCodec.decode(WavCodec.encodeAdpcm(8000, ramp, 101)).samples
    assert(ramp.zip(rdec).map(t => math.abs(t._1 - t._2)).max <= 64,
      "ADPCM must track a gentle ramp")
    // loud failures: stereo/odd-spb/partial-blocks/truncation
    intercept[IllegalArgumentException](WavCodec.encodeAdpcm(8000, samples, 100))
    intercept[IllegalArgumentException](WavCodec.encodeAdpcm(8000, samples.take(150), 101))
    val full = WavCodec.encodeAdpcm(8000, samples, 101)
    intercept[IllegalArgumentException](WavCodec.decode(full.dropRight(13)))
    // the PCM path is untouched: tag-1 files still round-trip
    val pcm = WavCodec.decode(WavCodec.encode(8000, 1, samples))
    assert(pcm.samples.toSeq == samples.toSeq)
  }

  test("WavCodec.decimate: pinned boxcar average, tail drop, loud misuse") {
    import graft.multimodal.WavCodec
    val w = graft.multimodal.WavCodec.Wav(6, 1, 16,
      Array[Short](1, 2, 4, -1, -2, -4, 10, 11)) // 8 samples, factor 3 → tail drops
    val d = WavCodec.decimate(w, 3)
    assert(d.sampleRate == 2 && d.samples.length == 2)
    // (1+2+4)=7 → floor((14+3)/6)=2 (round-half-up); (−1−2−4)=−7 → floor(−11/6)=−2
    // — floorDiv pins the NEGATIVE group to round-half-up too (truncation
    // would give −1)
    assert(d.samples.toSeq == Seq[Short](2, -2), d.samples.toSeq.toString)
    intercept[IllegalArgumentException](WavCodec.decimate(w, 4)) // 6 % 4 != 0
    intercept[IllegalArgumentException](
      WavCodec.decimate(w.copy(channels = 2), 3)) // mono only
    // factor 1 is the identity
    assert(WavCodec.decimate(w, 1).samples.toSeq == w.samples.toSeq)
  }

  test("corruptPayloads is PNG-guarded; truncatePayloads poisons every format") {
    import graft.multimodal.Multimodal
    // the last-byte flip is only guaranteed-detected for PNG (IEND CRC):
    // pointing the fixture at GIF payloads must fail fast, not silently
    // produce ok=true "corrupted" rows
    val gif = Multimodal.synthesizeGif(Seq(5L).toDF("doc_id"), "doc_id")
    val ex = intercept[org.apache.spark.SparkException] {
      Multimodal.corruptPayloads(gif, everyN = 5L).collect()
    }
    assert(ex.getCause.getMessage.contains("PNG-only"), ex.getCause.getMessage)
    // truncation is detected by EVERY container walk: GIF and JPEG rows
    // quarantine just like the PNG CRC path
    val truncGif = Multimodal.truncatePayloads(
      Multimodal.synthesizeGif(Seq(4L, 5L, 6L).toDF("doc_id"), "doc_id"),
      everyN = 5L)
    val gOut = Multimodal.extractGifFeaturesQuarantine(truncGif)
      .orderBy("media_id").collect()
    assert(gOut.map(r => r.getLong(0) -> r.getBoolean(1)).toSeq ==
      Seq(4L -> true, 5L -> false, 6L -> true))
    val truncJpeg = Multimodal.truncatePayloads(
      Multimodal.synthesizeJpeg(Seq(9L, 10L).toDF("doc_id"), "doc_id",
        grayscale = true),
      everyN = 2L)
    val jOut = Multimodal.extractJpegFeaturesQuarantine(truncJpeg)
      .orderBy("media_id").collect()
    assert(jOut.map(r => r.getLong(0) -> r.getBoolean(1)).toSeq ==
      Seq(9L -> true, 10L -> false))
  }

  test("segmentUtterances: threshold islands, min-length drop, per-media numbering") {
    val frames = Seq(
      // media 1: islands at 1-3 and 7-8; the single active frame 5 drops
      (1L, 0L, 10L), (1L, 1L, 100L), (1L, 2L, 120L), (1L, 3L, 90L), (1L, 4L, 5L),
      (1L, 5L, 99L), (1L, 6L, 0L), (1L, 7L, 80L), (1L, 8L, 85L), (1L, 9L, 10L),
      // media 2: all silence — no rows out
      (2L, 0L, 1L), (2L, 1L, 2L),
      // media 3: islands touching both boundaries
      (3L, 0L, 70L), (3L, 1L, 70L), (3L, 2L, 0L), (3L, 3L, 70L), (3L, 4L, 70L))
      .toDF("media_id", "frame", "sum_squares")
    val out = Multimodal
      .segmentUtterances(frames, "sum_squares", threshold = 60L, minFrames = 2)
      .orderBy("media_id", "utt").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      (1L, 0L, 1L, 3L, 3L, 310L),
      (1L, 1L, 7L, 8L, 2L, 165L),
      (3L, 0L, 0L, 1L, 2L, 140L),
      (3L, 1L, 3L, 4L, 2L, 140L)))
    // minFrames = 1 keeps the burst
    val all1 = Multimodal
      .segmentUtterances(frames, "sum_squares", threshold = 60L, minFrames = 1)
      .filter(col("media_id") === 1L).orderBy("utt").collect()
    assert(all1.map(r => (r.getLong(2), r.getLong(3))).toSeq ==
      Seq((1L, 3L), (5L, 5L), (7L, 8L)))
  }
}
