package graft.multimodal

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM PNG codec — the DEFLATE raster container of the decode family
  * ([[WavCodec]] audio, [[BmpCodec]] uncompressed images, [[GifCodec]] LZW
  * palettes): chunk walk with CRC32 verification, multi-IDAT reassembly,
  * zlib inflate via the JDK's `java.util.zip.Inflater` (no external libs),
  * per-scanline unfiltering for ALL FIVE filter types
  * (None/Sub/Up/Average/Paeth), and — round 11 — ADAM7 INTERLACING and
  * PALETTED images (color type 3, PLTE):
  *
  *  - Adam7 splits the image into seven progressively-denser sub-images,
  *    each filtered independently (its own filter bytes, predictors
  *    confined to the pass) — the PNG analog of progressive JPEG, and
  *    like it gated by the strongest possible equality: an interlaced
  *    file must decode to PIXEL-IDENTICAL output as the plain encoding
  *    of the same image (q322 reuses q298's oracle verbatim).
  *  - Color type 3 carries one palette index per pixel (8-bit) plus a
  *    PLTE chunk — the GIF-shaped PNG crawled corpora are full of.
  *
  * The encoder deflates real filtered scanlines — the filter type CYCLES
  * over the global row counter mod 5, so every round-trip exercises every
  * unfilter path (in every PASS when interlaced), and the deflated stream
  * is split across multiple IDAT chunks so reassembly is never a
  * degenerate single-chunk case.
  *
  * Decoding lands in [[BmpCodec.Bmp]] — the shared pixel frame — so every
  * downstream image operator (features, resize, aHash/dHash, cross-format
  * near-dup) applies to PNG payloads unchanged: one pixel contract, N
  * containers.
  *
  * Format is public (PNG specification, ISO/IEC 15948: 8-byte signature,
  * length/type/data/CRC chunks, IHDR/PLTE/IDAT/IEND, filter method 0 with
  * the Paeth predictor, Adam7 pass grid). Supported: 8-bit grayscale
  * (type 0), truecolor (2), paletted (3), gray+alpha (4), truecolor+alpha
  * (6 — RGBA, the web's most common PNG shape), plus 16-BIT grayscale
  * (scan/medical/archival corpora), plain or Adam7 throughout — the
  * filter machinery is depth/channel-agnostic (only bpp changes; Paeth is
  * unchanged).
  *
  * '''Alpha policy (round 12)''': alpha-carrying pixels are COMPOSITED
  * over a declared opaque white background into the shared
  * [[BmpCodec.Bmp]] frame — `out = (a·c + (255−a)·255 + 127) / 255` per
  * channel, integer arithmetic only — so every downstream operator keeps
  * the one-pixel-contract; the alternative (a 4th channel) would fork the
  * frame type across the whole image family for a presentation attribute
  * feature extraction does not use. White is the spec's recommended
  * default when no bKGD is honored; a tRNS chunk (palette transparency)
  * is REJECTED loudly rather than silently ignored, since ignoring it
  * would decode those pixels wrong under this policy. 16-bit samples map
  * to the 8-bit frame by their most significant byte (`v >> 8`), the
  * spec's sample-depth-scaling approximation. Everything else non-8-bit
  * stays loudly rejected.
  */
object PngCodec {

  private val Signature =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1A, '\n')

  // Adam7 pass grid: x/y start and step per pass (PNG spec §8.2)
  private val AdamX = Array(0, 4, 0, 2, 0, 1, 0)
  private val AdamY = Array(0, 0, 4, 0, 2, 0, 1)
  private val AdamXS = Array(8, 8, 4, 4, 2, 2, 1)
  private val AdamYS = Array(8, 8, 8, 4, 4, 2, 2)

  /** (width, height) of each NON-EMPTY Adam7 pass, with its index. */
  private def adamPasses(width: Int, height: Int): Seq[(Int, Int, Int)] =
    (0 until 7).flatMap { p =>
      val w = (width - AdamX(p) + AdamXS(p) - 1) / AdamXS(p)
      val h = (height - AdamY(p) + AdamYS(p) - 1) / AdamYS(p)
      if (w > 0 && h > 0) Some((p, w, h)) else None
    }

  private def u32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
      ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)

  private def writeChunk(
      out: ByteArrayOutputStream, kind: String, data: Array[Byte]): Unit = {
    val n = data.length
    out.write((n >> 24) & 0xFF); out.write((n >> 16) & 0xFF)
    out.write((n >> 8) & 0xFF); out.write(n & 0xFF)
    val tag = kind.getBytes("US-ASCII")
    val crc = new CRC32()
    crc.update(tag)
    crc.update(data)
    out.write(tag)
    out.write(data, 0, n)
    val c = crc.getValue
    out.write(((c >> 24) & 0xFF).toInt); out.write(((c >> 16) & 0xFF).toInt)
    out.write(((c >> 8) & 0xFF).toInt); out.write((c & 0xFF).toInt)
  }

  /** The Paeth predictor exactly as specified: nearest of (a, b, c) to
    * a + b − c, ties broken a, then b, then c.
    */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Filter one sub-image's sample bytes (`samples(y)(i)` row-major, all
    * rows `stride` long) into `out`, cycling the filter type over a
    * caller-threaded global row counter so interlaced streams exercise
    * every filter in every pass. Returns the updated row counter.
    */
  private def filterRows(
      out: ByteArrayOutputStream,
      samples: Array[Array[Byte]],
      stride: Int,
      bpp: Int,
      rowCounter: Int): Int = {
    val prev = new Array[Byte](stride)
    var rc = rowCounter
    var y = 0
    while (y < samples.length) {
      val cur = samples(y)
      val ft = rc % 5
      out.write(ft)
      var i = 0
      while (i < stride) {
        val a = if (i >= bpp) cur(i - bpp) & 0xFF else 0
        val b = prev(i) & 0xFF
        val c = if (i >= bpp) prev(i - bpp) & 0xFF else 0
        val v = cur(i) & 0xFF
        val filtered = ft match {
          case 0 => v
          case 1 => v - a
          case 2 => v - b
          case 3 => v - (a + b) / 2
          case 4 => v - paeth(a, b, c)
        }
        out.write(filtered & 0xFF)
        i += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      rc += 1
      y += 1
    }
    rc
  }

  /** Build the filtered (pre-DEFLATE) image stream for one sample plane:
    * `sampleAt(x, y)` returns the bpp bytes of pixel (x, y).
    */
  private def filteredStream(
      width: Int, height: Int, bpp: Int, interlaced: Boolean)(
      sampleAt: (Int, Int) => Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream((width * bpp + 1) * height + 64)
    var rc = 0
    if (!interlaced) {
      val rows = Array.tabulate(height) { y =>
        val row = new Array[Byte](width * bpp)
        var x = 0
        while (x < width) {
          System.arraycopy(sampleAt(x, y), 0, row, x * bpp, bpp)
          x += 1
        }
        row
      }
      filterRows(out, rows, width * bpp, bpp, rc)
    } else {
      for ((p, w, h) <- adamPasses(width, height)) {
        val rows = Array.tabulate(h) { py =>
          val row = new Array[Byte](w * bpp)
          var px = 0
          while (px < w) {
            val gx = AdamX(p) + px * AdamXS(p)
            val gy = AdamY(p) + py * AdamYS(p)
            System.arraycopy(sampleAt(gx, gy), 0, row, px * bpp, bpp)
            px += 1
          }
          row
        }
        rc = filterRows(out, rows, w * bpp, bpp, rc)
      }
    }
    out.toByteArray
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val defl = new Deflater(Deflater.DEFAULT_COMPRESSION, false) // zlib wrapper
    defl.setInput(raw)
    defl.finish()
    val zout = new ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](4096)
    while (!defl.finished()) zout.write(buf, 0, defl.deflate(buf))
    defl.end()
    zout.toByteArray
  }

  private def writePng(
      width: Int, height: Int, colorType: Int, interlaced: Boolean,
      plte: Array[Byte], z: Array[Byte], depth: Int = 8,
      trns: Array[Byte] = null): Array[Byte] = {
    val out = new ByteArrayOutputStream(z.length + 128)
    out.write(Signature, 0, 8)
    val ihdr = new Array[Byte](13)
    ihdr(0) = ((width >> 24) & 0xFF).toByte; ihdr(1) = ((width >> 16) & 0xFF).toByte
    ihdr(2) = ((width >> 8) & 0xFF).toByte; ihdr(3) = (width & 0xFF).toByte
    ihdr(4) = ((height >> 24) & 0xFF).toByte; ihdr(5) = ((height >> 16) & 0xFF).toByte
    ihdr(6) = ((height >> 8) & 0xFF).toByte; ihdr(7) = (height & 0xFF).toByte
    ihdr(8) = depth.toByte
    ihdr(9) = colorType.toByte
    ihdr(10) = 0; ihdr(11) = 0 // deflate, filter method 0
    ihdr(12) = if (interlaced) 1 else 0
    writeChunk(out, "IHDR", ihdr)
    if (plte != null) writeChunk(out, "PLTE", plte)
    if (trns != null) writeChunk(out, "tRNS", trns)
    // split IDAT so multi-chunk reassembly is exercised on every decode
    var off = 0
    while (off < z.length) {
      val n = math.min(2048, z.length - off)
      writeChunk(out, "IDAT", java.util.Arrays.copyOfRange(z, off, off + n))
      off += n
    }
    if (z.isEmpty) writeChunk(out, "IDAT", Array.emptyByteArray)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Encode top-down row-major 0xRRGGBB pixels as an 8-bit truecolor PNG
    * (Adam7 when `interlaced`). Filter types cycle over the global row
    * counter mod 5.
    */
  def encode(
      width: Int, height: Int, pixels: Array[Int],
      interlaced: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    // Long-checked like decode: 65536×65536 wraps the Int product to 0,
    // which would pass an == check against an empty array and then crash
    // untyped on the scanline-buffer allocation
    require(width.toLong * height.toLong <= (1L << 26),
      s"PNG too large: ${width}x$height exceeds 2^26 pixels")
    require(pixels.length == width * height, "pixels must be width*height")
    val buf = new Array[Byte](3)
    val raw = filteredStream(width, height, 3, interlaced) { (x, y) =>
      val p = pixels(y * width + x)
      buf(0) = ((p >> 16) & 0xFF).toByte
      buf(1) = ((p >> 8) & 0xFF).toByte
      buf(2) = (p & 0xFF).toByte
      buf
    }
    writePng(width, height, 2, interlaced, null, deflate(raw))
  }

  /** Encode 8-bit grayscale samples (0–255) as a color-type-0 PNG (Adam7
    * when `interlaced`) — scans, sketches, and document images ship this
    * shape; decode widens each sample to the shared 0xRRGGBB frame
    * (r = g = b = v).
    */
  def encodeGray(
      width: Int, height: Int, gray: Array[Int],
      interlaced: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(width.toLong * height.toLong <= (1L << 26),
      s"PNG too large: ${width}x$height exceeds 2^26 pixels")
    require(gray.length == width * height, "gray must be width*height")
    gray.foreach(v => require(v >= 0 && v <= 255, s"gray sample $v out of range"))
    val buf = new Array[Byte](1)
    val raw = filteredStream(width, height, 1, interlaced) { (x, y) =>
      buf(0) = gray(y * width + x).toByte
      buf
    }
    writePng(width, height, 0, interlaced, null, deflate(raw))
  }

  /** Encode palette indices + a 0xRRGGBB palette as an 8-bit color-type-3
    * PNG (Adam7 when `interlaced`) — the GIF-shaped PNG.
    */
  def encodePalette(
      width: Int, height: Int, indices: Array[Int], palette: Array[Int],
      interlaced: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(width.toLong * height.toLong <= (1L << 26),
      s"PNG too large: ${width}x$height exceeds 2^26 pixels")
    require(indices.length == width * height, "indices must be width*height")
    require(palette.nonEmpty && palette.length <= 256,
      s"palette size ${palette.length} not in 1..256")
    indices.foreach(i => require(i >= 0 && i < palette.length,
      s"palette index $i out of range"))
    val plte = new Array[Byte](3 * palette.length)
    var j = 0
    while (j < palette.length) {
      plte(3 * j) = ((palette(j) >> 16) & 0xFF).toByte
      plte(3 * j + 1) = ((palette(j) >> 8) & 0xFF).toByte
      plte(3 * j + 2) = (palette(j) & 0xFF).toByte
      j += 1
    }
    val buf = new Array[Byte](1)
    val raw = filteredStream(width, height, 1, interlaced) { (x, y) =>
      buf(0) = indices(y * width + x).toByte
      buf
    }
    writePng(width, height, 3, interlaced, plte, deflate(raw))
  }

  /** Encode top-down row-major 0xAARRGGBB pixels as an 8-bit
    * truecolor+alpha PNG (color type 6 — the web's most common PNG shape;
    * Adam7 when `interlaced`). Sample order per spec: R, G, B, A.
    */
  def encodeRgba(
      width: Int, height: Int, argb: Array[Int],
      interlaced: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(width.toLong * height.toLong <= (1L << 26),
      s"PNG too large: ${width}x$height exceeds 2^26 pixels")
    require(argb.length == width * height, "argb must be width*height")
    val buf = new Array[Byte](4)
    val raw = filteredStream(width, height, 4, interlaced) { (x, y) =>
      val p = argb(y * width + x)
      buf(0) = ((p >> 16) & 0xFF).toByte
      buf(1) = ((p >> 8) & 0xFF).toByte
      buf(2) = (p & 0xFF).toByte
      buf(3) = ((p >>> 24) & 0xFF).toByte
      buf
    }
    writePng(width, height, 6, interlaced, null, deflate(raw))
  }

  /** Encode 8-bit gray + alpha sample pairs as a color-type-4 PNG (Adam7
    * when `interlaced`). Sample order per spec: gray, alpha.
    */
  def encodeGrayAlpha(
      width: Int, height: Int, gray: Array[Int], alpha: Array[Int],
      interlaced: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(width.toLong * height.toLong <= (1L << 26),
      s"PNG too large: ${width}x$height exceeds 2^26 pixels")
    require(gray.length == width * height && alpha.length == width * height,
      "gray and alpha must be width*height")
    gray.foreach(v => require(v >= 0 && v <= 255, s"gray sample $v out of range"))
    alpha.foreach(v => require(v >= 0 && v <= 255, s"alpha sample $v out of range"))
    val buf = new Array[Byte](2)
    val raw = filteredStream(width, height, 2, interlaced) { (x, y) =>
      buf(0) = gray(y * width + x).toByte
      buf(1) = alpha(y * width + x).toByte
      buf
    }
    writePng(width, height, 4, interlaced, null, deflate(raw))
  }

  /** Encode 16-BIT grayscale samples (0–65535, big-endian per spec) as a
    * depth-16 color-type-0 PNG (Adam7 when `interlaced`) — the
    * scan/medical/archival shape. Decode maps each sample to the shared
    * 8-bit frame by its most significant byte.
    */
  def encodeGray16(
      width: Int, height: Int, gray: Array[Int],
      interlaced: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(width.toLong * height.toLong <= (1L << 26),
      s"PNG too large: ${width}x$height exceeds 2^26 pixels")
    require(gray.length == width * height, "gray must be width*height")
    gray.foreach(v => require(v >= 0 && v <= 65535, s"gray16 sample $v out of range"))
    val buf = new Array[Byte](2)
    val raw = filteredStream(width, height, 2, interlaced) { (x, y) =>
      val v = gray(y * width + x)
      buf(0) = ((v >> 8) & 0xFF).toByte
      buf(1) = (v & 0xFF).toByte
      buf
    }
    writePng(width, height, 0, interlaced, null, deflate(raw), depth = 16)
  }

  /** Encode 16-bit-per-channel RGB (each channel 0–65535, big-endian per
    * spec) as a depth-16 truecolor PNG — the scan/archival shape in
    * color. Optional `colorKey` (three full-depth samples) emits a tRNS
    * chunk: pixels matching it exactly decode transparent.
    */
  def encodeRgb16(
      width: Int, height: Int,
      r: Array[Int], g: Array[Int], b: Array[Int],
      interlaced: Boolean = false,
      colorKey: Option[(Int, Int, Int)] = None): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(width.toLong * height.toLong <= (1L << 26),
      s"PNG too large: ${width}x$height exceeds 2^26 pixels")
    require(r.length == width * height && g.length == r.length && b.length == r.length,
      "r/g/b must be width*height")
    Seq(r, g, b).foreach(_.foreach(v =>
      require(v >= 0 && v <= 65535, s"16-bit sample $v out of range")))
    val buf = new Array[Byte](6)
    val raw = filteredStream(width, height, 6, interlaced) { (x, y) =>
      val i = y * width + x
      buf(0) = ((r(i) >> 8) & 0xFF).toByte; buf(1) = (r(i) & 0xFF).toByte
      buf(2) = ((g(i) >> 8) & 0xFF).toByte; buf(3) = (g(i) & 0xFF).toByte
      buf(4) = ((b(i) >> 8) & 0xFF).toByte; buf(5) = (b(i) & 0xFF).toByte
      buf
    }
    val trns = colorKey.map { case (kr, kg, kb) =>
      Array(kr, kg, kb).flatMap(k =>
        Array(((k >> 8) & 0xFF).toByte, (k & 0xFF).toByte))
    }.orNull
    writePng(width, height, 2, interlaced, null, deflate(raw), depth = 16, trns = trns)
  }

  /** Encode 16-bit-per-channel RGBA as a depth-16 color-type-6 PNG.
    * Decode composites by the MSB of each sample (the spec's 16→8
    * scaling), so the oracle algebra is the q328 composite on `v // 256`.
    */
  def encodeRgba16(
      width: Int, height: Int,
      r: Array[Int], g: Array[Int], b: Array[Int], a: Array[Int],
      interlaced: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(width.toLong * height.toLong <= (1L << 26),
      s"PNG too large: ${width}x$height exceeds 2^26 pixels")
    require(r.length == width * height && g.length == r.length &&
      b.length == r.length && a.length == r.length, "r/g/b/a must be width*height")
    Seq(r, g, b, a).foreach(_.foreach(v =>
      require(v >= 0 && v <= 65535, s"16-bit sample $v out of range")))
    val buf = new Array[Byte](8)
    val raw = filteredStream(width, height, 8, interlaced) { (x, y) =>
      val i = y * width + x
      buf(0) = ((r(i) >> 8) & 0xFF).toByte; buf(1) = (r(i) & 0xFF).toByte
      buf(2) = ((g(i) >> 8) & 0xFF).toByte; buf(3) = (g(i) & 0xFF).toByte
      buf(4) = ((b(i) >> 8) & 0xFF).toByte; buf(5) = (b(i) & 0xFF).toByte
      buf(6) = ((a(i) >> 8) & 0xFF).toByte; buf(7) = (a(i) & 0xFF).toByte
      buf
    }
    writePng(width, height, 6, interlaced, null, deflate(raw), depth = 16)
  }

  /** [[encodePalette]] plus a tRNS chunk: `alphas(j)` is entry j's alpha
    * (entries past `alphas.length` stay opaque, per spec) — the
    * GIF-transparency-shaped PNG a web crawl is full of.
    */
  def encodePaletteTrns(
      width: Int, height: Int, indices: Array[Int], palette: Array[Int],
      alphas: Array[Int], interlaced: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(width.toLong * height.toLong <= (1L << 26),
      s"PNG too large: ${width}x$height exceeds 2^26 pixels")
    require(indices.length == width * height, "indices must be width*height")
    require(palette.nonEmpty && palette.length <= 256,
      s"palette size ${palette.length} not in 1..256")
    indices.foreach(i => require(i >= 0 && i < palette.length,
      s"palette index $i out of range"))
    require(alphas.nonEmpty && alphas.length <= palette.length,
      s"tRNS size ${alphas.length} not in 1..${palette.length}")
    alphas.foreach(a => require(a >= 0 && a <= 255, s"tRNS alpha $a out of range"))
    val plte = new Array[Byte](3 * palette.length)
    var j = 0
    while (j < palette.length) {
      plte(3 * j) = ((palette(j) >> 16) & 0xFF).toByte
      plte(3 * j + 1) = ((palette(j) >> 8) & 0xFF).toByte
      plte(3 * j + 2) = (palette(j) & 0xFF).toByte
      j += 1
    }
    val buf = new Array[Byte](1)
    val raw = filteredStream(width, height, 1, interlaced) { (x, y) =>
      buf(0) = indices(y * width + x).toByte
      buf
    }
    writePng(width, height, 3, interlaced, plte, deflate(raw),
      trns = alphas.map(_.toByte))
  }

  /** [[encodeGray16]] with a tRNS color key: samples equal to `key`
    * (full 16-bit compare) decode transparent → white under the
    * composite policy.
    */
  def encodeGray16ColorKey(
      width: Int, height: Int, gray: Array[Int], key: Int,
      interlaced: Boolean = false): Array[Byte] = {
    require(key >= 0 && key <= 65535, s"color key $key out of range")
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(width.toLong * height.toLong <= (1L << 26),
      s"PNG too large: ${width}x$height exceeds 2^26 pixels")
    require(gray.length == width * height, "gray must be width*height")
    gray.foreach(v => require(v >= 0 && v <= 65535, s"gray16 sample $v out of range"))
    val buf = new Array[Byte](2)
    val raw = filteredStream(width, height, 2, interlaced) { (x, y) =>
      val v = gray(y * width + x)
      buf(0) = ((v >> 8) & 0xFF).toByte
      buf(1) = (v & 0xFF).toByte
      buf
    }
    writePng(width, height, 0, interlaced, null, deflate(raw), depth = 16,
      trns = Array(((key >> 8) & 0xFF).toByte, (key & 0xFF).toByte))
  }

  /** Parse PNG bytes into the shared pixel frame (alpha composited over
    * white; 16-bit samples frame and composite by MSB — the spec's own
    * 16→8 scaling; tRNS transparency honored: per-entry palette alphas
    * composite, a color key compares at FULL depth and keyed pixels
    * land white). Throws IllegalArgumentException on anything this
    * decoder cannot represent faithfully (sub-byte depths, tRNS on an
    * alpha color type, CRC mismatch, truncation, inflate
    * overrun/underrun, out-of-range palette index) — loud beats silent.
    * Other ancillary chunks are CRC-checked and skipped; IDAT payloads
    * are concatenated in file order per the spec.
    */
  def decode(bytes: Array[Byte]): BmpCodec.Bmp =
    try decode0(bytes)
    catch {
      case _: ArrayIndexOutOfBoundsException =>
        throw new IllegalArgumentException("truncated PNG: chunk walk past end")
      case e: java.util.zip.DataFormatException =>
        // CRC-valid chunks can still carry a corrupt DEFLATE stream (a
        // re-CRC'd crafted file); keep the family's typed loud failure
        throw new IllegalArgumentException(s"corrupt PNG: bad DEFLATE stream (${e.getMessage})")
    }

  private def decode0(bytes: Array[Byte]): BmpCodec.Bmp = {
    require(bytes != null && bytes.length >= 8 + 25, "not a PNG: too short")
    var i = 0
    while (i < 8) {
      require(bytes(i) == Signature(i), "not a PNG: bad signature")
      i += 1
    }
    var pos = 8
    var width = 0; var height = 0
    var colorType = -1
    var depth = 0
    var interlaced = false
    var palette: Array[Int] = null
    var trnsPal: Array[Int] = null // type 3: per-entry alpha, rest opaque
    var trnsKey: Array[Int] = null // types 0/2: full-depth color key
    var seenIhdr = false; var seenIend = false
    val idat = new ByteArrayOutputStream(bytes.length)
    while (pos < bytes.length && !seenIend) {
      val len = u32(bytes, pos).toInt
      require(len >= 0 && pos + 12L + len <= bytes.length,
        s"truncated PNG: chunk length $len past end")
      val kind = new String(bytes, pos + 4, 4, "US-ASCII")
      val crc = new CRC32()
      crc.update(bytes, pos + 4, 4 + len)
      require(crc.getValue == u32(bytes, pos + 8 + len),
        s"PNG CRC mismatch in $kind chunk")
      kind match {
        case "IHDR" =>
          require(!seenIhdr, "duplicate IHDR")
          require(len == 13, s"bad IHDR length $len")
          seenIhdr = true
          width = u32(bytes, pos + 8).toInt
          height = u32(bytes, pos + 12).toInt
          require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
          // Long-checked pixel bound BEFORE any allocation: a CRC-valid
          // crafted IHDR with huge dimensions would otherwise wrap the
          // Int products below (width*height, (stride+1)*height) into
          // small or negative sizes — an untyped crash or a malformed
          // frame — or legitimately demand multi-GB buffers from a
          // kilobyte input. 2^26 pixels (64 MP, a 256 MB pixel array) is
          // far past any fingerprint/feature use of this codec.
          require(width.toLong * height.toLong <= (1L << 26),
            s"PNG too large: ${width}x$height exceeds 2^26 pixels")
          depth = bytes(pos + 16) & 0xFF
          colorType = bytes(pos + 17) & 0xFF
          require(
            (depth == 8 && Set(0, 2, 3, 4, 6).contains(colorType)) ||
              (depth == 16 && Set(0, 2, 4, 6).contains(colorType)),
            s"unsupported PNG: depth=$depth colorType=$colorType " +
              "(8-bit types 0/2/3/4/6 or 16-bit types 0/2/4/6 only)")
          require((bytes(pos + 18) & 0xFF) == 0, "unknown compression method")
          require((bytes(pos + 19) & 0xFF) == 0, "unknown filter method")
          val im = bytes(pos + 20) & 0xFF
          require(im <= 1, s"unknown PNG interlace method $im")
          interlaced = im == 1
        case "PLTE" =>
          require(seenIhdr, "PLTE before IHDR")
          require(palette == null, "duplicate PLTE")
          require(len % 3 == 0 && len >= 3 && len <= 768, s"bad PLTE length $len")
          palette = Array.tabulate(len / 3) { j =>
            ((bytes(pos + 8 + 3 * j) & 0xFF) << 16) |
              ((bytes(pos + 9 + 3 * j) & 0xFF) << 8) |
              (bytes(pos + 10 + 3 * j) & 0xFF)
          }
        case "IDAT" =>
          require(seenIhdr, "IDAT before IHDR")
          idat.write(bytes, pos + 8, len)
        case "IEND" =>
          seenIend = true
        case "tRNS" =>
          // transparency WITHOUT an alpha channel: per-palette-entry
          // alphas (type 3) or a single full-depth color key (types
          // 0/2). Parsed and honored — silently skipping it would
          // decode those pixels fully-opaque where the author declared
          // transparency. tRNS is forbidden with the alpha types.
          require(seenIhdr, "tRNS before IHDR")
          colorType match {
            case 3 =>
              require(palette != null, "tRNS before PLTE in paletted PNG")
              require(len >= 1 && len <= palette.length,
                s"tRNS length $len exceeds palette size ${palette.length}")
              trnsPal = Array.tabulate(len)(j => bytes(pos + 8 + j) & 0xFF)
            case 0 =>
              require(len == 2, s"bad tRNS length $len for grayscale")
              trnsKey = Array(
                ((bytes(pos + 8) & 0xFF) << 8) | (bytes(pos + 9) & 0xFF))
            case 2 =>
              require(len == 6, s"bad tRNS length $len for truecolor")
              trnsKey = Array.tabulate(3)(c =>
                ((bytes(pos + 8 + 2 * c) & 0xFF) << 8) |
                  (bytes(pos + 9 + 2 * c) & 0xFF))
            case _ =>
              throw new IllegalArgumentException(
                "invalid PNG: tRNS with an alpha color type")
          }
        case _ => // ancillary chunk: CRC checked above, content skipped
      }
      pos += 12 + len
    }
    require(seenIhdr && seenIend, "truncated PNG: missing IHDR or IEND")
    if (colorType == 3)
      require(palette != null, "paletted PNG missing its PLTE chunk")

    // bytes per pixel = channels × bytes-per-sample: the only thing
    // depth/channels change — the filter and Adam7 machinery below is
    // shared across every supported shape (PNG filters are BYTE-wise
    // with a bpp lookback, so Paeth is depth-agnostic by spec design)
    val channels = colorType match {
      case 2 => 3 // truecolor
      case 6 => 4 // truecolor + alpha
      case 4 => 2 // gray + alpha
      case _ => 1 // gray, paletted
    }
    val sb = depth / 8 // bytes per sample (type 3 is always depth 8)
    val bpp = channels * sb
    val passes =
      if (interlaced) adamPasses(width, height)
      else Seq((-1, width, height))
    val rawLen = passes.map { case (_, w, h) => (w.toLong * bpp + 1) * h }.sum
    require(rawLen <= Int.MaxValue, "PNG raw stream too large")
    val raw = new Array[Byte](rawLen.toInt)
    val infl = new Inflater(false)
    infl.setInput(idat.toByteArray)
    var got = 0
    while (got < raw.length && !infl.finished()) {
      val n = infl.inflate(raw, got, raw.length - got)
      require(n > 0 || infl.finished(),
        "corrupt PNG: inflate stalled (dictionary or truncation)")
      got += n
    }
    val leftover = infl.inflate(new Array[Byte](1))
    infl.end()
    require(got == raw.length, s"corrupt PNG: inflated $got of ${raw.length} bytes")
    require(leftover == 0, "corrupt PNG: inflate output exceeds image size")

    // unfilter pass by pass, scattering into the final pixel grid
    val pixels = new Array[Int](width * height)
    var base = 0
    for ((p, w, h) <- passes) {
      val stride = w * bpp
      val prev = new Array[Int](stride)
      val cur = new Array[Int](stride)
      java.util.Arrays.fill(prev, 0)
      var y = 0
      while (y < h) {
        val ft = raw(base) & 0xFF
        require(ft <= 4, s"bad PNG filter type $ft")
        var k = 0
        while (k < stride) {
          val f = raw(base + 1 + k) & 0xFF
          val a = if (k >= bpp) cur(k - bpp) else 0
          val b = prev(k)
          val c = if (k >= bpp) prev(k - bpp) else 0
          cur(k) = (ft match {
            case 0 => f
            case 1 => f + a
            case 2 => f + b
            case 3 => f + (a + b) / 2
            case 4 => f + paeth(a, b, c)
          }) & 0xFF
          k += 1
        }
        var x = 0
        while (x < w) {
          // composite one channel over the declared white background:
          // out = (a·c + (255−a)·255 + 127) / 255, integer truncation —
          // SQL-replayable with // and exact for a=255 (c) and a=0 (255)
          def comp(c: Int, a: Int): Int = (a * c + (255 - a) * 255 + 127) / 255
          // channel `ch`, 8-bit view: the most significant byte (the
          // spec's own 16→8 scaling); 16-bit samples composite and
          // frame by MSB, but color-KEY matching below compares at FULL
          // depth (a key match is exact per spec, not approximate)
          def msb(ch: Int): Int = cur(x * bpp + ch * sb)
          def full(ch: Int): Int =
            if (sb == 2) (cur(x * bpp + 2 * ch) << 8) | cur(x * bpp + 2 * ch + 1)
            else cur(x * bpp + ch)
          val v = colorType match {
            case 2 =>
              if (trnsKey != null && full(0) == trnsKey(0) &&
                full(1) == trnsKey(1) && full(2) == trnsKey(2)) 0xFFFFFF
              else (msb(0) << 16) | (msb(1) << 8) | msb(2)
            case 6 =>
              val a = msb(3)
              (comp(msb(0), a) << 16) | (comp(msb(1), a) << 8) | comp(msb(2), a)
            case 4 =>
              val g = comp(msb(0), msb(1))
              (g << 16) | (g << 8) | g
            case 0 =>
              val g =
                if (trnsKey != null && full(0) == trnsKey(0)) 255
                else msb(0)
              (g << 16) | (g << 8) | g
            case _ =>
              val idx = cur(x)
              require(idx < palette.length,
                s"corrupt PNG: palette index $idx >= ${palette.length} entries")
              if (trnsPal == null) palette(idx)
              else {
                val a = if (idx < trnsPal.length) trnsPal(idx) else 255
                val p = palette(idx)
                (comp((p >> 16) & 0xFF, a) << 16) |
                  (comp((p >> 8) & 0xFF, a) << 8) | comp(p & 0xFF, a)
              }
          }
          val (gx, gy) =
            if (p < 0) (x, y)
            else (AdamX(p) + x * AdamXS(p), AdamY(p) + y * AdamYS(p))
          pixels(gy * width + gx) = v
          x += 1
        }
        System.arraycopy(cur, 0, prev, 0, stride)
        base += 1 + stride
        y += 1
      }
    }
    BmpCodec.Bmp(width, height, pixels)
  }
}
