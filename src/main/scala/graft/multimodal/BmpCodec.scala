package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM BMP (Windows DIB) codec for uncompressed 24-bit images — the
  * second modality this container can decode for REAL (see [[WavCodec]] for
  * audio): BITMAPFILEHEADER + BITMAPINFOHEADER parse, bottom-up row order,
  * 4-byte row padding, BGR byte order. Only integer arithmetic touches the
  * pixels, so every derived feature is exactly reproducible by the DuckDB
  * oracle.
  *
  * Format is public (Windows 3.x DIB layout: 14-byte file header, 40-byte
  * info header, `bfOffBits` pointing at the pixel array).
  */
object BmpCodec {

  /** Decoded image: pixels in row-major TOP-DOWN order, one (r,g,b) triple
    * per pixel, values 0–255.
    */
  final case class Bmp(width: Int, height: Int, pixels: Array[Int]) {
    // pixels packed as 0xRRGGBB ints, length = width*height
    def r(i: Int): Int = (pixels(i) >> 16) & 0xFF
    def g(i: Int): Int = (pixels(i) >> 8) & 0xFF
    def b(i: Int): Int = pixels(i) & 0xFF
  }

  /** Exact integer features: dimensions, per-channel sums, min/max luma
    * (ITU-R BT.601 integer approximation `(299r + 587g + 114b)`, kept
    * ×1000 to stay integral), and the count of "edge" transitions where
    * adjacent horizontal pixels differ in scaled luma by > 50000.
    */
  final case class Features(
      width: Long,
      height: Long,
      nPixels: Long,
      sumR: Long,
      sumG: Long,
      sumB: Long,
      lumaMin: Long,
      lumaMax: Long,
      edgeCount: Long)

  private def luma1000(r: Int, g: Int, b: Int): Long = 299L * r + 587L * g + 114L * b

  /** Encode top-down row-major 0xRRGGBB pixels as a bottom-up 24-bit BMP. */
  def encode(width: Int, height: Int, pixels: Array[Int]): Array[Byte] = {
    require(width > 0 && height > 0 && pixels.length == width * height,
      "pixels must be width*height")
    val rowBytes = width * 3
    val pad = (4 - rowBytes % 4) % 4
    val dataLen = (rowBytes + pad) * height
    val bb = ByteBuffer.allocate(54 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
    bb.putShort(0).putShort(0).putInt(54) // reserved, bfOffBits
    bb.putInt(40).putInt(width).putInt(height) // BITMAPINFOHEADER, positive height = bottom-up
    bb.putShort(1).putShort(24).putInt(0) // planes, bpp, BI_RGB
    bb.putInt(dataLen).putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 DPI, no palette
    var y = height - 1
    while (y >= 0) { // bottom-up
      var x = 0
      while (x < width) {
        val p = pixels(y * width + x)
        bb.put((p & 0xFF).toByte).put(((p >> 8) & 0xFF).toByte).put(((p >> 16) & 0xFF).toByte)
        x += 1
      }
      var i = 0
      while (i < pad) { bb.put(0.toByte); i += 1 }
      y -= 1
    }
    bb.array()
  }

  /** Parse BMP bytes; throws IllegalArgumentException on anything that is
    * not uncompressed 24-bit (loud beats silent — see [[WavCodec.decode]]).
    * Handles both bottom-up (positive biHeight) and top-down (negative)
    * pixel orders and arbitrary `bfOffBits` gaps.
    */
  def decode(bytes: Array[Byte]): Bmp = {
    require(bytes != null && bytes.length >= 54, "not a BMP: too short")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bb.get() == 'B'.toByte && bb.get() == 'M'.toByte, "not a BMP: missing BM magic")
    bb.getInt // file size (untrusted)
    bb.getShort; bb.getShort
    val offBits = bb.getInt
    val hdrSize = bb.getInt
    require(hdrSize >= 40, s"unsupported DIB header size $hdrSize (BITMAPINFOHEADER+ only)")
    val width = bb.getInt
    val rawHeight = bb.getInt
    val planes = bb.getShort
    val bpp = bb.getShort
    val compression = bb.getInt
    require(planes == 1, s"corrupt BMP: planes=$planes")
    require(bpp == 24, s"unsupported bits-per-pixel $bpp (24 only)")
    require(compression == 0, s"unsupported compression $compression (BI_RGB only)")
    require(width > 0 && rawHeight != 0, s"corrupt BMP dimensions ${width}x$rawHeight")
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    val rowBytes = width * 3
    val stride = rowBytes + (4 - rowBytes % 4) % 4
    require(offBits >= 54 && offBits.toLong + stride.toLong * height <= bytes.length,
      "corrupt BMP: pixel array out of bounds")
    val pixels = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      val srcRow = if (topDown) y else height - 1 - y
      var x = 0
      var o = offBits + srcRow * stride
      while (x < width) {
        val b = bytes(o) & 0xFF
        val g = bytes(o + 1) & 0xFF
        val r = bytes(o + 2) & 0xFF
        pixels(y * width + x) = (r << 16) | (g << 8) | b
        x += 1
        o += 3
      }
      y += 1
    }
    Bmp(width, height, pixels)
  }

  /** Nearest-neighbor resize (the multimodal "resize" verb): output pixel
    * (x, y) samples input pixel (x·wIn/wOut, y·hIn/hOut), floor mapping —
    * all-integer, so an oracle can replay the index arithmetic exactly.
    * Nearest-neighbor rather than bilinear ON PURPOSE: interpolation would
    * average channels in floating point and break exact cross-engine
    * reproducibility; for thumbnail/feature-pipeline use the sampling
    * variant is standard.
    */
  def resizeNearest(img: Bmp, wOut: Int, hOut: Int): Bmp = {
    require(wOut > 0 && hOut > 0, "target dimensions must be positive")
    val out = new Array[Int](wOut * hOut)
    var y = 0
    while (y < hOut) {
      val sy = (y.toLong * img.height / hOut).toInt
      var x = 0
      while (x < wOut) {
        val sx = (x.toLong * img.width / wOut).toInt
        out(y * wOut + x) = img.pixels(sy * img.width + sx)
        x += 1
      }
      y += 1
    }
    Bmp(wOut, hOut, out)
  }

  /** Upright-normalize per the EXIF orientation tag (TIFF 6.0 §Image
    * Orientation / EXIF 0x0112) — the integer pixel remap that makes a
    * phone photo's STORED pixel order match its displayed geometry.
    * Without this, a rotated duplicate photo (orientations 3/6/8 — every
    * phone camera) lands a different perceptual hash and cross-orientation
    * near-dups are missed. Pure index arithmetic, no resampling:
    * orientations 5–8 swap the output dimensions.
    *
    *   1 identity · 2 mirror-H · 3 rotate 180 · 4 mirror-V ·
    *   5 transpose · 6 rotate 90 CW · 7 transverse · 8 rotate 270 CW
    */
  def applyOrientation(img: Bmp, orientation: Int): Bmp = {
    require(orientation >= 1 && orientation <= 8,
      s"exif orientation must be 1..8, got $orientation")
    if (orientation == 1) return img
    val w = img.width; val h = img.height
    val swap = orientation >= 5
    val wOut = if (swap) h else w
    val hOut = if (swap) w else h
    val out = new Array[Int](w * h)
    var y = 0
    while (y < hOut) {
      var x = 0
      while (x < wOut) {
        val src = orientation match {
          case 2 => y * w + (w - 1 - x)
          case 3 => (h - 1 - y) * w + (w - 1 - x)
          case 4 => (h - 1 - y) * w + x
          case 5 => x * w + y
          case 6 => (h - 1 - x) * w + y
          case 7 => (h - 1 - x) * w + (w - 1 - y)
          case _ => x * w + (w - 1 - y) // 8
        }
        out(y * wOut + x) = img.pixels(src)
        x += 1
      }
      y += 1
    }
    Bmp(wOut, hOut, out)
  }

  /** The orientation whose [[applyOrientation]] UNDOES `o` — what a
    * synthesizer uses to produce the camera-stored pixel order from an
    * upright image. 6 and 8 (the quarter turns) are mutual inverses;
    * every other orientation is an involution.
    */
  def inverseOrientation(o: Int): Int = o match {
    case 6 => 8
    case 8 => 6
    case x => x
  }

  /** Exact features over the decoded pixels (top-down row-major scan). */
  def features(img: Bmp): Features = {
    val n = img.pixels.length
    var sr = 0L; var sg = 0L; var sb = 0L
    var lmn = Long.MaxValue; var lmx = Long.MinValue
    var edges = 0L
    var i = 0
    while (i < n) {
      val r = img.r(i); val g = img.g(i); val b = img.b(i)
      sr += r; sg += g; sb += b
      val l = luma1000(r, g, b)
      if (l < lmn) lmn = l
      if (l > lmx) lmx = l
      // horizontal neighbor within the same row
      if (i % img.width > 0) {
        val pl = luma1000(img.r(i - 1), img.g(i - 1), img.b(i - 1))
        if (math.abs(l - pl) > 50000L) edges += 1
      }
      i += 1
    }
    Features(img.width.toLong, img.height.toLong, n.toLong, sr, sg, sb,
      if (n == 0) 0L else lmn, if (n == 0) 0L else lmx, edges)
  }

  /** Average-hash perceptual fingerprint over the decoded (usually resized)
    * pixels: one bit per pixel, set when the pixel's luma exceeds the image
    * mean, row-major order. The mean comparison is the INTEGER cross-product
    * form `luma·n > Σluma` — no division, no rounding mode, so the bitstring
    * is reproducible in any engine from the pixel values alone. Returns
    * (bitstring, popcount).
    */
  def aHash(img: Bmp): (String, Long) = {
    val n = img.pixels.length
    val l = Array.tabulate(n)(i => luma1000(img.r(i), img.g(i), img.b(i)))
    var total = 0L
    var i = 0
    while (i < n) { total += l(i); i += 1 }
    val bits = new Array[Char](n)
    var ones = 0L
    i = 0
    while (i < n) {
      if (l(i) * n > total) { bits(i) = '1'; ones += 1 } else bits(i) = '0'
      i += 1
    }
    (new String(bits), ones)
  }

  /** Difference-hash perceptual fingerprint: over a (w+1)×h image, one bit
    * per (x, y) with x < w−1… precisely, bit(y, x) = luma(x+1, y) >
    * luma(x, y) — the horizontal GRADIENT sign, row-major. Gradient hashes
    * survive global brightness/contrast shifts that move [[aHash]]'s mean
    * cut, which is why dHash is the second standard member of the
    * perceptual family. Pure integer compares — engine-reproducible.
    * Returns (bitstring of (width−1)·height bits, popcount).
    */
  def dHash(img: Bmp): (String, Long) = {
    val w = img.width; val h = img.height
    require(w >= 2, s"dHash needs width >= 2, got $w")
    val bits = new Array[Char]((w - 1) * h)
    var ones = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w - 1) {
        val i = y * w + x
        val a = luma1000(img.r(i), img.g(i), img.b(i))
        val b = luma1000(img.r(i + 1), img.g(i + 1), img.b(i + 1))
        val k = y * (w - 1) + x
        if (b > a) { bits(k) = '1'; ones += 1 } else bits(k) = '0'
        x += 1
      }
      y += 1
    }
    (new String(bits), ones)
  }
}
