package graft.multimodal

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM PNG codec (8-bit truecolor, color type 2) — the first
  * COMPRESSED raster container in the decode family ([[WavCodec]] audio,
  * [[BmpCodec]] uncompressed images, [[GifCodec]] LZW palettes): chunk
  * walk with CRC32 verification, multi-IDAT reassembly, zlib inflate via
  * the JDK's `java.util.zip.Inflater` (no external libs), and per-scanline
  * unfiltering for ALL FIVE filter types (None/Sub/Up/Average/Paeth). The
  * encoder deflates real filtered scanlines — the filter type CYCLES
  * y mod 5, so every round-trip exercises every unfilter path, and the
  * deflated stream is split across multiple IDAT chunks so reassembly is
  * never a degenerate single-chunk case.
  *
  * Decoding lands in [[BmpCodec.Bmp]] — the shared pixel frame — so every
  * downstream image operator (features, resize, aHash/dHash, cross-format
  * near-dup) applies to PNG payloads unchanged: one pixel contract, N
  * containers. PNG matters because it is the raster format real crawled
  * training data actually carries; BMP/GIF covered the uncompressed and
  * dictionary-coded cases, this adds the DEFLATE case.
  *
  * Format is public (PNG specification, ISO/IEC 15948: 8-byte signature,
  * length/type/data/CRC chunks, IHDR/IDAT/IEND, filter method 0 with the
  * Paeth predictor as specified). Interlaced (Adam7), paletted, grayscale,
  * alpha, and non-8-bit depths are rejected loudly rather than decoded
  * wrong.
  */
object PngCodec {

  private val Signature =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1A, '\n')

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

  /** Encode top-down row-major 0xRRGGBB pixels as an 8-bit truecolor PNG.
    * Scanline y gets filter type y mod 5 — a REAL exercise of Sub/Up/
    * Average/Paeth on both sides of every round-trip, not a None-only
    * degenerate stream.
    */
  def encode(width: Int, height: Int, pixels: Array[Int]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    // Long-checked like decode: 65536×65536 wraps the Int product to 0,
    // which would pass an == check against an empty array and then crash
    // untyped on the scanline-buffer allocation
    require(width.toLong * height.toLong <= (1L << 26),
      s"PNG too large: ${width}x$height exceeds 2^26 pixels")
    require(pixels.length == width * height, "pixels must be width*height")
    val stride = width * 3
    // filtered image: one filter-type byte + stride bytes per scanline
    val raw = new Array[Byte]((stride + 1) * height)
    val cur = new Array[Byte](stride)
    val prev = new Array[Byte](stride) // zeros above row 0, per spec
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val p = pixels(y * width + x)
        cur(3 * x) = ((p >> 16) & 0xFF).toByte
        cur(3 * x + 1) = ((p >> 8) & 0xFF).toByte
        cur(3 * x + 2) = (p & 0xFF).toByte
        x += 1
      }
      val ft = y % 5
      val base = y * (stride + 1)
      raw(base) = ft.toByte
      var i = 0
      while (i < stride) {
        val a = if (i >= 3) cur(i - 3) & 0xFF else 0 // left
        val b = prev(i) & 0xFF // above
        val c = if (i >= 3) prev(i - 3) & 0xFF else 0 // upper-left
        val v = cur(i) & 0xFF
        val filtered = ft match {
          case 0 => v
          case 1 => v - a
          case 2 => v - b
          case 3 => v - (a + b) / 2
          case 4 => v - paeth(a, b, c)
        }
        raw(base + 1 + i) = filtered.toByte
        i += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    // zlib-deflate the filtered stream
    val defl = new Deflater(Deflater.DEFAULT_COMPRESSION, false) // zlib wrapper
    defl.setInput(raw)
    defl.finish()
    val zout = new ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](4096)
    while (!defl.finished()) zout.write(buf, 0, defl.deflate(buf))
    defl.end()
    val z = zout.toByteArray

    val out = new ByteArrayOutputStream(z.length + 128)
    out.write(Signature, 0, 8)
    val ihdr = new Array[Byte](13)
    ihdr(0) = ((width >> 24) & 0xFF).toByte; ihdr(1) = ((width >> 16) & 0xFF).toByte
    ihdr(2) = ((width >> 8) & 0xFF).toByte; ihdr(3) = (width & 0xFF).toByte
    ihdr(4) = ((height >> 24) & 0xFF).toByte; ihdr(5) = ((height >> 16) & 0xFF).toByte
    ihdr(6) = ((height >> 8) & 0xFF).toByte; ihdr(7) = (height & 0xFF).toByte
    ihdr(8) = 8 // bit depth
    ihdr(9) = 2 // color type: truecolor RGB
    ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0 // deflate, filter 0, no interlace
    writeChunk(out, "IHDR", ihdr)
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

  /** The Paeth predictor exactly as specified: nearest of (a, b, c) to
    * a + b − c, ties broken a, then b, then c.
    */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Parse PNG bytes into the shared pixel frame; throws
    * IllegalArgumentException on anything this decoder cannot represent
    * faithfully (interlace, palette/grayscale/alpha, depth ≠ 8, CRC
    * mismatch, truncation, inflate overrun/underrun) — loud beats silent.
    * Ancillary chunks are CRC-checked and skipped; IDAT payloads are
    * concatenated in file order per the spec.
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
          val depth = bytes(pos + 16) & 0xFF
          val color = bytes(pos + 17) & 0xFF
          require(depth == 8 && color == 2,
            s"unsupported PNG: depth=$depth colorType=$color (8-bit truecolor only)")
          require((bytes(pos + 18) & 0xFF) == 0, "unknown compression method")
          require((bytes(pos + 19) & 0xFF) == 0, "unknown filter method")
          require((bytes(pos + 20) & 0xFF) == 0, "interlaced PNG not supported")
        case "IDAT" =>
          require(seenIhdr, "IDAT before IHDR")
          idat.write(bytes, pos + 8, len)
        case "IEND" =>
          seenIend = true
        case _ => // ancillary chunk: CRC checked above, content skipped
      }
      pos += 12 + len
    }
    require(seenIhdr && seenIend, "truncated PNG: missing IHDR or IEND")

    val stride = width * 3
    val raw = new Array[Byte]((stride + 1) * height)
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

    // unfilter in place, then pack pixels
    val pixels = new Array[Int](width * height)
    val prev = new Array[Int](stride) // reconstructed row above (0 for row 0)
    val cur = new Array[Int](stride)
    var y = 0
    while (y < height) {
      val base = y * (stride + 1)
      val ft = raw(base) & 0xFF
      require(ft <= 4, s"bad PNG filter type $ft on row $y")
      var k = 0
      while (k < stride) {
        val f = raw(base + 1 + k) & 0xFF
        val a = if (k >= 3) cur(k - 3) else 0
        val b = prev(k)
        val c = if (k >= 3) prev(k - 3) else 0
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
      while (x < width) {
        pixels(y * width + x) =
          (cur(3 * x) << 16) | (cur(3 * x + 1) << 8) | cur(3 * x + 2)
        x += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    BmpCodec.Bmp(width, height, pixels)
  }
}
