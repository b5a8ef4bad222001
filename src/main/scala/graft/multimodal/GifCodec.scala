package graft.multimodal

import java.io.ByteArrayOutputStream

/** Pure-JVM GIF codec (GIF87a/89a) — the third REAL container this
  * environment can decode (see [[WavCodec]] for audio, [[BmpCodec]] for
  * uncompressed images): logical-screen + image-descriptor parse, global
  * or local color table, and full LZW decompression (variable code width
  * 3–12 bits LSB-first, clear/EOD codes, the KwKwK self-reference case,
  * table-full reset). The encoder is a real LZW compressor (prefix-table
  * growth, width bumps synchronized to the decoder's, clear-and-reset at
  * 4096 entries), so round-trips exercise the whole dictionary machinery,
  * not a degenerate uncompressed path.
  *
  * Decoding lands in [[BmpCodec.Bmp]] — the shared pixel frame — so every
  * downstream image operator (features, resize, aHash/dHash, near-dup)
  * applies to GIF payloads unchanged: one pixel contract, N containers.
  *
  * Format is public (GIF87a specification; LZW per the GIF application
  * note: initial code width = minCodeSize+1, codes grow when the table
  * reaches 2^width, max 12 bits). [[decode]] returns the FIRST image
  * block; [[decodeFrames]] decodes every frame of an animation, but only
  * the full-replacement shape (each frame at (0,0) covering the whole
  * screen) — interlace and partial-frame disposal compositing are
  * rejected loudly rather than decoded wrong.
  */
object GifCodec {

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)

  /** Encode palette-indexed pixels as a single-frame GIF87a.
    *
    * @param width    image width
    * @param height   image height
    * @param palBits  bits per palette index (1–8); palette size = 2^palBits
    * @param palette  0xRRGGBB entries, length exactly 2^palBits
    * @param indices  row-major top-down palette indices, width·height long
    */
  def encode(
      width: Int,
      height: Int,
      palBits: Int,
      palette: Array[Int],
      indices: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(palBits >= 1 && palBits <= 8, s"palBits=$palBits out of range 1..8")
    require(palette.length == (1 << palBits), "palette must have 2^palBits entries")
    require(indices.length == width * height, "indices must be width*height")
    require(indices.forall(i => (i & 0xFF) < palette.length), "index out of palette")
    val out = new ByteArrayOutputStream(64 + indices.length / 2)
    out.write("GIF87a".getBytes("US-ASCII"))
    // logical screen descriptor: size, GCT flag + color-res + GCT size
    out.write(width & 0xFF); out.write(width >> 8)
    out.write(height & 0xFF); out.write(height >> 8)
    out.write(0x80 | ((palBits - 1) << 4) | (palBits - 1))
    out.write(0) // background color index
    out.write(0) // aspect ratio
    palette.foreach { p =>
      out.write((p >> 16) & 0xFF); out.write((p >> 8) & 0xFF); out.write(p & 0xFF)
    }
    // image descriptor at (0,0), no local table, not interlaced
    out.write(0x2C)
    out.write(0); out.write(0); out.write(0); out.write(0)
    out.write(width & 0xFF); out.write(width >> 8)
    out.write(height & 0xFF); out.write(height >> 8)
    out.write(0)
    // LZW-compressed index stream
    val minCode = math.max(2, palBits) // GIF requires minimum code size >= 2
    out.write(minCode)
    writeSubBlocks(out, lzwCompress(indices, minCode))
    out.write(0) // block terminator
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** Encode an ANIMATED GIF89a: the same global palette and full-screen
    * frame geometry, one graphic-control extension (delay `delayCs`
    * hundredths, disposal 1 = leave in place) + image descriptor + LZW
    * stream per frame, and the NETSCAPE2.0 loop-forever application
    * extension — the multi-frame container shape that makes GIF the one
    * VIDEO-like format this environment decodes for real (frame
    * sampling, per-frame features, temporal scene detection all run on
    * genuine bytes).
    */
  def encodeAnimation(
      width: Int,
      height: Int,
      palBits: Int,
      palette: Array[Int],
      frames: Seq[Array[Byte]],
      delayCs: Int = 10): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(palBits >= 1 && palBits <= 8, s"palBits=$palBits out of range 1..8")
    require(palette.length == (1 << palBits), "palette must have 2^palBits entries")
    require(frames.nonEmpty, "animation needs at least one frame")
    require(delayCs >= 0 && delayCs <= 0xFFFF, s"bad frame delay $delayCs (0..65535 cs)")
    frames.foreach { f =>
      require(f.length == width * height, "every frame must be width*height")
      require(f.forall(i => (i & 0xFF) < palette.length), "index out of palette")
    }
    val out = new ByteArrayOutputStream(64 + frames.length * width * height / 2)
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(width & 0xFF); out.write(width >> 8)
    out.write(height & 0xFF); out.write(height >> 8)
    out.write(0x80 | ((palBits - 1) << 4) | (palBits - 1))
    out.write(0); out.write(0)
    palette.foreach { p =>
      out.write((p >> 16) & 0xFF); out.write((p >> 8) & 0xFF); out.write(p & 0xFF)
    }
    // NETSCAPE2.0 application extension: loop forever
    out.write(0x21); out.write(0xFF); out.write(11)
    out.write("NETSCAPE2.0".getBytes("US-ASCII"))
    out.write(3); out.write(1); out.write(0); out.write(0) // sub-block: loop 0
    out.write(0) // terminator
    frames.foreach { indices =>
      // graphic control: disposal 1 (do not dispose), no transparency
      out.write(0x21); out.write(0xF9); out.write(4)
      out.write(0x04) // packed: disposal 1
      out.write(delayCs & 0xFF); out.write((delayCs >> 8) & 0xFF)
      out.write(0); out.write(0) // transparent index unused; terminator
      out.write(0x2C)
      out.write(0); out.write(0); out.write(0); out.write(0)
      out.write(width & 0xFF); out.write(width >> 8)
      out.write(height & 0xFF); out.write(height >> 8)
      out.write(0)
      val minCode = math.max(2, palBits)
      out.write(minCode)
      writeSubBlocks(out, lzwCompress(indices, minCode))
      out.write(0)
    }
    out.write(0x3B)
    out.toByteArray
  }

  /** Real LZW: prefix dictionary keyed (prefixCode << 8 | byte), emitted
    * LSB-first. Width bumps AFTER a code is written when the number of
    * assigned codes exceeds the current width's range — the exact mirror
    * of the decoder's bump-after-add rule, so both sides widen at the same
    * code boundary. At 4096 entries: clear code, reset, start over.
    */
  private def lzwCompress(data: Array[Byte], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eod = clear + 1
    val out = new ByteArrayOutputStream(data.length / 2 + 16)
    var cur = 0L
    var curBits = 0
    var codeSize = minCode + 1
    var nextFree = eod + 1
    val dict = new java.util.HashMap[Integer, Integer](4096)

    def put(code: Int): Unit = {
      cur |= code.toLong << curBits
      curBits += codeSize
      while (curBits >= 8) {
        out.write((cur & 0xFF).toInt); cur >>= 8; curBits -= 8
      }
      // bump AFTER writing: the entry added for THIS code is visible to
      // the width of the NEXT one (Poskanzer timing, decoder-symmetric)
      if (nextFree > (1 << codeSize) - 1 && codeSize < 12) codeSize += 1
    }

    put(clear)
    var prefix = data(0) & 0xFF
    var i = 1
    while (i < data.length) {
      val k = data(i) & 0xFF
      val key = Integer.valueOf((prefix << 8) | k)
      val hit = dict.get(key)
      if (hit != null) prefix = hit.intValue()
      else {
        put(prefix)
        if (nextFree < 4096) {
          dict.put(key, Integer.valueOf(nextFree)); nextFree += 1
        } else {
          put(clear)
          dict.clear()
          codeSize = minCode + 1
          nextFree = eod + 1
        }
        prefix = k
      }
      i += 1
    }
    put(prefix)
    put(eod)
    if (curBits > 0) out.write((cur & 0xFF).toInt)
    out.toByteArray
  }

  private def writeSubBlocks(out: ByteArrayOutputStream, data: Array[Byte]): Unit = {
    var off = 0
    while (off < data.length) {
      val n = math.min(255, data.length - off)
      out.write(n)
      out.write(data, off, n)
      off += n
    }
  }

  /** Parse GIF bytes into the shared pixel frame; throws
    * IllegalArgumentException on anything this decoder cannot represent
    * faithfully (interlace, zero-size, truncation) — loud beats silent.
    * GIF89a extension blocks (graphic control, comment, application) are
    * skipped; the FIRST image descriptor is decoded.
    */
  def decode(bytes: Array[Byte]): BmpCodec.Bmp =
    try decode0(bytes, all = false).head
    catch { // any walk past the buffer is a truncation, reported as such
      case _: ArrayIndexOutOfBoundsException =>
        throw new IllegalArgumentException("truncated GIF: block walk past end")
    }

  /** ALL image descriptors of an animated GIF, in stream order — frame
    * sampling on the one video-like container this environment decodes
    * for real. Only full-replacement frames are represented faithfully
    * (every descriptor at (0, 0) covering the whole screen — what
    * [[encodeAnimation]] emits); partial-frame compositing with disposal
    * is rejected loudly rather than composed wrong.
    */
  def decodeFrames(bytes: Array[Byte]): Seq[BmpCodec.Bmp] =
    try decode0(bytes, all = true) // full-coverage enforced per frame inside
    catch {
      case _: ArrayIndexOutOfBoundsException =>
        throw new IllegalArgumentException("truncated GIF: block walk past end")
    }

  private def decode0(bytes: Array[Byte], all: Boolean): Seq[BmpCodec.Bmp] = {
    require(bytes != null && bytes.length >= 14, "not a GIF: too short")
    val sig = new String(bytes, 0, 6, "US-ASCII")
    require(sig == "GIF87a" || sig == "GIF89a", s"not a GIF: signature '$sig'")
    var pos = 6
    val sw = u16(bytes, pos); val sh = u16(bytes, pos + 2)
    val packed = bytes(pos + 4) & 0xFF
    pos += 7
    var palette: Array[Int] = null
    if ((packed & 0x80) != 0) {
      val n = 1 << ((packed & 0x07) + 1)
      palette = readPalette(bytes, pos, n)
      pos += 3 * n
    }
    val frames = scala.collection.mutable.ArrayBuffer.empty[BmpCodec.Bmp]
    while (pos < bytes.length) {
      (bytes(pos) & 0xFF) match {
        case 0x21 => // extension: label byte + sub-blocks
          pos += 2
          while ((bytes(pos) & 0xFF) != 0) pos += 1 + (bytes(pos) & 0xFF)
          pos += 1
        case 0x2C => // image descriptor
          val left = u16(bytes, pos + 1); val top = u16(bytes, pos + 3)
          val w = u16(bytes, pos + 5); val h = u16(bytes, pos + 7)
          val ip = bytes(pos + 9) & 0xFF
          pos += 10
          require((ip & 0x40) == 0, "interlaced GIF not supported")
          if (all) {
            // the multi-frame contract is full-replacement only: every
            // frame at (0,0) covering the WHOLE screen. An offset or
            // undersized frame means disposal compositing — the canvas
            // outside the block is background/prior content, so decoding
            // the block alone would misrepresent the video. The single-
            // frame decode keeps its original lenient contract (the
            // first image block's own pixels, wherever it sits).
            require(left == 0 && top == 0,
              "offset image blocks (partial-frame compositing) not supported")
            require(w == sw && h == sh,
              s"undersized frame ${w}x$h on a ${sw}x$sh screen " +
                "(partial-frame compositing) not supported")
          }
          var pal = palette
          if ((ip & 0x80) != 0) {
            val n = 1 << ((ip & 0x07) + 1)
            pal = readPalette(bytes, pos, n)
            pos += 3 * n
          }
          require(pal != null, "GIF image without a color table")
          require(w > 0 && h > 0 && w <= sw && h <= sh,
            s"bad image block ${w}x$h in ${sw}x$sh screen")
          val minCode = bytes(pos) & 0xFF
          pos += 1
          // gather sub-block payload
          val buf = new ByteArrayOutputStream(w * h / 2 + 16)
          while ((bytes(pos) & 0xFF) != 0) {
            val n = bytes(pos) & 0xFF
            buf.write(bytes, pos + 1, n)
            pos += 1 + n
          }
          pos += 1 // block terminator
          val indices = lzwDecompress(buf.toByteArray, minCode, w * h)
          val pixels = Array.tabulate(w * h)(i => pal(indices(i) & 0xFF))
          frames += BmpCodec.Bmp(w, h, pixels)
          if (!all) return frames.toSeq
        case 0x3B =>
          if (frames.isEmpty)
            throw new IllegalArgumentException("GIF trailer before any image data")
          return frames.toSeq
        case other =>
          throw new IllegalArgumentException(f"unknown GIF block 0x$other%02X")
      }
    }
    if (all && frames.nonEmpty) frames.toSeq
    else throw new IllegalArgumentException("truncated GIF: no image descriptor")
  }

  private def readPalette(bytes: Array[Byte], off: Int, n: Int): Array[Int] =
    Array.tabulate(n) { i =>
      ((bytes(off + 3 * i) & 0xFF) << 16) |
        ((bytes(off + 3 * i + 1) & 0xFF) << 8) |
        (bytes(off + 3 * i + 2) & 0xFF)
    }

  /** LZW decompression with the standard delayed-dictionary rule: each
    * code after the first adds entry (prev-string + first byte of current
    * string); `code == nextFree` is the KwKwK case (prev + prev's first
    * byte). Width bumps when the table reaches 2^width (cap 12); clear
    * codes reset everything.
    */
  private def lzwDecompress(data: Array[Byte], minCode: Int, expect: Int): Array[Byte] = {
    require(minCode >= 2 && minCode <= 11, s"bad LZW minimum code size $minCode")
    val clear = 1 << minCode
    val eod = clear + 1
    val out = new Array[Byte](expect)
    var outLen = 0
    // dictionary as (prefix link, appended byte): O(1) append, strings
    // materialized by walking links backward
    val prefixOf = new Array[Int](4096)
    val byteOf = new Array[Byte](4096)
    val lenOf = new Array[Int](4096)
    var j = 0
    while (j < clear) { prefixOf(j) = -1; byteOf(j) = j.toByte; lenOf(j) = 1; j += 1 }
    var nextFree = eod + 1
    var codeSize = minCode + 1
    var prev = -1
    var cur = 0L
    var curBits = 0
    var pos = 0

    def firstByte(code: Int): Byte = {
      var c = code
      while (prefixOf(c) >= 0) c = prefixOf(c)
      byteOf(c)
    }
    def emit(code: Int): Unit = {
      val n = lenOf(code)
      require(outLen + n <= expect, "LZW output overruns pixel count")
      var c = code
      var k = n - 1
      while (k >= 0) { out(outLen + k) = byteOf(c); c = prefixOf(c); k -= 1 }
      outLen += n
    }

    while (outLen < expect) {
      while (curBits < codeSize) {
        require(pos < data.length, "truncated LZW stream")
        cur |= (data(pos) & 0xFFL) << curBits
        curBits += 8
        pos += 1
      }
      val code = (cur & ((1L << codeSize) - 1)).toInt
      cur >>= codeSize
      curBits -= codeSize
      if (code == clear) {
        nextFree = eod + 1
        codeSize = minCode + 1
        prev = -1
      } else if (code == eod) {
        require(outLen == expect, s"early EOD at $outLen of $expect pixels")
      } else if (prev < 0) {
        require(code < clear, s"first code $code must be a literal")
        emit(code)
        prev = code
      } else {
        require(code <= nextFree && code < 4096, s"LZW code $code beyond table")
        if (code == nextFree) {
          // KwKwK: current string = prev-string + its own first byte
          require(nextFree < 4096, "KwKwK with a full table")
          prefixOf(nextFree) = prev
          byteOf(nextFree) = firstByte(prev)
          lenOf(nextFree) = lenOf(prev) + 1
          nextFree += 1
          emit(code)
        } else {
          emit(code)
          if (nextFree < 4096) {
            prefixOf(nextFree) = prev
            byteOf(nextFree) = firstByte(code)
            lenOf(nextFree) = lenOf(prev) + 1
            nextFree += 1
          }
        }
        if (nextFree == (1 << codeSize) && codeSize < 12) codeSize += 1
        prev = code
      }
    }
    out
  }
}
