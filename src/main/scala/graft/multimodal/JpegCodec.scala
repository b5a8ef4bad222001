package graft.multimodal

import java.io.ByteArrayOutputStream

/** Pure-JVM baseline JPEG codec (ITU T.81 sequential DCT, Huffman coding) —
  * the first LOSSY, transform-coded container in the decode family
  * ([[WavCodec]] audio, [[BmpCodec]] uncompressed, [[GifCodec]] LZW,
  * [[PngCodec]] DEFLATE): marker segment walk, DQT/DHT/SOF0/SOS parse,
  * canonical Huffman entropy decode with 0xFF00 byte unstuffing, zigzag
  * coefficient order, dequantization, and an 8×8 inverse DCT — all of it
  * integer fixed-point, so a decode is bit-identical on every JVM and the
  * DC-only path has a CLOSED FORM a SQL oracle can replay (see the scale
  * notes on [[Fix]]). Grayscale (1 component), YCbCr 4:4:4 (3
  * components at 1×1), and YCbCr 4:2:0 (Y at 2×2, chroma quarter-sized,
  * 16×16 MCUs — the layout real camera files carry) are supported, with
  * DRI restart intervals (byte-aligned RSTm markers, DC prediction
  * reset). PROGRESSIVE (SOF2) decodes too — the majority encoding of
  * real crawled photos: multi-scan spectral selection and successive
  * approximation per T.81 Annex G (EOB runs, ZRL crossings, correction
  * bits), coefficients accumulated across scans and rendered at EOI
  * through the same fixed-point IDCT, so a fully-transmitted progressive
  * stream decodes to EXACTLY the sequential pixels ([[encodeProgressive]]
  * round-trips prove it). Other sampling layouts, 12-bit precision, and
  * arithmetic coding are rejected loudly rather than decoded wrong.
  *
  * The encoder is a real entropy coder, not a fixture: forward fixed-point
  * DCT, Annex-K sample quantization tables, canonical Huffman tables
  * (repo-designed lengths, Kraft-checked at init — the DECODER builds its
  * tables from the DHT segments in the file per the spec, so any valid
  * table round-trips; Annex K's exact AC code lengths are an interop
  * convention this closed loop does not need), DC prediction, run-length
  * AC coding with ZRL/EOB, and 0xFF byte stuffing.
  *
  * Color is the pinned integer BT.601 transform in micro-units
  * (floorDiv by 10⁶ after +500000 rounding), both directions, so the
  * oracle replays it exactly with offset floor-division.
  *
  * Format is public (ITU-T T.81 / ISO 10918-1: marker structure, canonical
  * Huffman code generation from BITS/HUFFVAL, the EXTEND sign convention,
  * zigzag scan, byte stuffing, Annex K sample quantization tables).
  */
object JpegCodec {

  /** Fixed-point 8-point DCT basis shared by the forward and inverse
    * transforms: `T(u)(x) = round(2^20 · c(u)/2 · cos((2x+1)uπ/16))` with
    * c(0)=1/√2, else 1 (StrictMath, so the table is identical on every
    * JVM). The 1D passes descale with rounding arithmetic shifts
    * (`(acc + 2^(n−1)) >> n` — floor semantics both here and in DuckDB's
    * `>>`), which makes the whole transform integer-deterministic:
    *
    *  - inverse: `G1 = (Σ_u F(u)·T(u)(x) + 2^11) >> 12` (scale 2^8), then
    *    `out = ((Σ_v G1(v)·T(v)(y) + 2^27) >> 28) + 128`, clamped. |acc|
    *    stays under 2^54 because the SCAN bounds every dequantized
    *    coefficient: the DC predictor is required within ±2048 and AC
    *    categories within size ≤ 10, so |coef| ≤ 2048·255 < 2^20 — a
    *    crafted stream that would overflow the accumulators fails loudly
    *    at those requires instead.
    *  - forward: `P = (Σ_x f(x)·T(u)(x) + 2^7) >> 8` (scale 2^12), then
    *    `F = (Σ_y P(y)·T(u)(y) + 2^31) >> 32` — an integer coefficient.
    *
    * For a CONSTANT block (value v, level-shifted s = v−128) the forward
    * transform lands exactly on F(0,0) = 8s with all AC quantizing to 0
    * (JpegSpec proves it for all 256 values), so the decode of a block-
    * constant image is the closed form
    * `clamp((((qdc·Q00·T00 + 2^11 >> 12)·T00 + 2^27) >> 28) + 128)` with
    * `qdc = floor((2·8s + Q00) / (2·Q00))` and T00 = 370728 — pure BIGINT
    * arithmetic for the q300/q301 oracles.
    */
  private[graft] object Fix {
    val Shift = 20
    val T: Array[Array[Long]] = Array.tabulate(8, 8) { (u, x) =>
      val c = if (u == 0) 1.0 / StrictMath.sqrt(2.0) else 1.0
      StrictMath.round(
        (1L << Shift) * c / 2.0 * StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0))
    }
    /** T(0)(x) — the DC basis entry the oracle closed form uses. */
    val T00: Long = T(0)(0)

    def rshift(x: Long, n: Int): Long = (x + (1L << (n - 1))) >> n

    /** Inverse DCT of one dequantized block (raster order), output = level-
      * shifted clamped samples 0..255 written into `out` (raster order).
      */
    def idct(coef: Array[Long], out: Array[Int]): Unit = {
      val g1 = new Array[Long](64)
      var v = 0
      while (v < 8) {
        var x = 0
        while (x < 8) {
          var acc = 0L
          var u = 0
          while (u < 8) { acc += coef(v * 8 + u) * T(u)(x); u += 1 }
          g1(v * 8 + x) = rshift(acc, 12)
          x += 1
        }
        v += 1
      }
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          var acc = 0L
          var vv = 0
          while (vv < 8) { acc += g1(vv * 8 + x) * T(vv)(y); vv += 1 }
          val s = rshift(acc, 28) + 128
          out(y * 8 + x) = if (s < 0) 0 else if (s > 255) 255 else s.toInt
          x += 1
        }
        y += 1
      }
    }

    /** Forward DCT of one level-shifted block (raster order, values
      * −128..127) into integer coefficients (raster order).
      */
    def fdct(samples: Array[Int], out: Array[Long]): Unit = {
      val p = new Array[Long](64)
      var y = 0
      while (y < 8) {
        var u = 0
        while (u < 8) {
          var acc = 0L
          var x = 0
          while (x < 8) { acc += samples(y * 8 + x).toLong * T(u)(x); x += 1 }
          p(y * 8 + u) = rshift(acc, 8)
          u += 1
        }
        y += 1
      }
      var u = 0
      while (u < 8) {
        var vv = 0
        while (vv < 8) {
          var acc = 0L
          var yy = 0
          while (yy < 8) { acc += p(yy * 8 + u) * T(vv)(yy); yy += 1 }
          out(vv * 8 + u) = rshift(acc, 32)
          vv += 1
        }
        u += 1
      }
    }
  }

  /** Zigzag scan: `Zigzag(k)` = raster index (8·row + col) of zigzag
    * position k. Generated from the T.81 diagonal walk (even anti-
    * diagonals run bottom-left → top-right, odd ones the reverse) instead
    * of a transcribed constant table.
    */
  private[graft] val Zigzag: Array[Int] = {
    val out = new Array[Int](64)
    var k = 0
    var s = 0
    while (s <= 14) {
      val lo = math.max(0, s - 7); val hi = math.min(s, 7)
      if (s % 2 == 0) {
        var r = hi
        while (r >= lo) { out(k) = r * 8 + (s - r); k += 1; r -= 1 }
      } else {
        var r = lo
        while (r <= hi) { out(k) = r * 8 + (s - r); k += 1; r += 1 }
      }
      s += 1
    }
    out
  }

  /** Annex K sample quantization tables (T.81 tables K.1/K.2), zigzag-
    * serialized into DQT by the encoder. Only Q(0,0) — 16 luma, 17
    * chroma — enters the oracle closed form.
    */
  private[graft] val QLuma: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  private[graft] val QChroma: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** Quantize one coefficient: floor(F/Q + 1/2) for ANY sign —
    * `floorDiv(2F + Q, 2Q)`, the form the oracle replays with an offset
    * floor-division (DuckDB `//` truncates; `(x + K·2Q) // 2Q − K` floors).
    */
  private def quant(f: Long, q: Int): Int =
    Math.floorDiv(2 * f + q, 2L * q).toInt

  // ---------------------------------------------------------------- Huffman

  /** A canonical Huffman table: `bits(i)` codes of length i+1 (i = 0..15),
    * `vals` the symbols in code order (T.81 BITS/HUFFVAL). Kraft-checked at
    * construction so a malformed table fails at init, not mid-decode.
    */
  private[graft] final case class HuffTable(bits: Array[Int], vals: Array[Int]) {
    require(bits.length == 16, "BITS must have 16 entries")
    require(bits.sum == vals.length, s"BITS sums ${bits.sum} != ${vals.length} values")
    private val kraft = (0 until 16).map(i => bits(i).toLong << (15 - i)).sum
    require(kraft <= (1L << 16), s"over-subscribed Huffman table (Kraft $kraft > 2^16)")

    /** (code, length) per symbol index — encoder side. */
    val codes: Array[(Int, Int)] = {
      val out = new Array[(Int, Int)](vals.length)
      var code = 0; var k = 0
      var len = 1
      while (len <= 16) {
        var i = 0
        while (i < bits(len - 1)) { out(k) = (code, len); code += 1; k += 1; i += 1 }
        code <<= 1
        len += 1
      }
      out
    }
    /** symbol → (code, length), for emit. */
    val encode: Map[Int, (Int, Int)] =
      vals.zipWithIndex.map { case (s, i) => s -> codes(i) }.toMap

    // T.81 F.2.2.3 DECODE tables: min/max code value and value-pointer per length
    val minCode: Array[Int] = new Array[Int](17)
    val maxCode: Array[Int] = Array.fill(17)(-1)
    val valPtr: Array[Int] = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var len = 1
      while (len <= 16) {
        if (bits(len - 1) > 0) {
          valPtr(len) = k
          minCode(len) = code
          code += bits(len - 1); k += bits(len - 1)
          maxCode(len) = code - 1
        }
        code <<= 1
        len += 1
      }
    }
  }

  /** Encoder-side static tables. DC lengths follow Annex K's shape
    * (sizes 0..11 at lengths 2,3,3,3,3,3,4,5,6,7,8,9 for luma); the AC
    * table is a repo-designed canonical code over exactly the emittable
    * alphabet — EOB, ZRL, and (run 0..15)×(size 1..10) — with short codes
    * on the low-run/low-size symbols real residuals are made of.
    */
  private[graft] val DcLumaTable = HuffTable(
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0),
    Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11))

  private[graft] val DcChromaTable = HuffTable(
    Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0),
    Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11))

  private[graft] val AcTable: HuffTable = {
    def sym(run: Int, size: Int) = (run << 4) | size
    val byLen: Seq[(Int, Seq[Int])] = Seq(
      2 -> Seq(0x00), // EOB
      3 -> Seq(sym(0, 1)),
      4 -> Seq(sym(0, 2), sym(1, 1)),
      5 -> Seq(sym(0, 3), sym(2, 1), sym(3, 1)),
      6 -> Seq(sym(1, 2), sym(4, 1), sym(0, 4)),
      7 -> Seq(sym(5, 1), sym(6, 1), sym(2, 2)),
      8 -> Seq(sym(0, 5), sym(7, 1), sym(3, 2), sym(1, 3)),
      9 -> Seq(sym(8, 1), sym(9, 1), sym(2, 3), sym(4, 2)),
      10 -> Seq(0xF0, sym(10, 1), sym(11, 1), sym(1, 4), sym(0, 6)))
    val placed = byLen.flatMap(_._2).toSet
    val rest = (for {
      run <- 0 to 15; size <- 1 to 10
      s = sym(run, size) if !placed(s)
    } yield s).sorted
    val bits = new Array[Int](16)
    byLen.foreach { case (len, ss) => bits(len - 1) = ss.size }
    bits(11) = rest.size // everything else at length 12
    HuffTable(bits, (byLen.flatMap(_._2) ++ rest).toArray)
  }

  /** AC table for PROGRESSIVE scans: [[AcTable]]'s alphabet plus the EOBn
    * symbols (r<<4, r = 1..14) progressive end-of-band run coding needs —
    * EOB0 (0x00) is already the baseline EOB. Same canonical-code
    * discipline; the decoder rebuilds whatever tables the DHT carries, so
    * this is an encoder convention, not a format constraint.
    */
  private[graft] val AcProgTable: HuffTable = {
    def sym(run: Int, size: Int) = (run << 4) | size
    val byLen: Seq[(Int, Seq[Int])] = Seq(
      2 -> Seq(0x00), // EOB0
      3 -> Seq(sym(0, 1)),
      4 -> Seq(sym(0, 2), sym(1, 1)),
      5 -> Seq(sym(0, 3), sym(2, 1), sym(3, 1)),
      6 -> Seq(0x10, sym(4, 1), sym(0, 4)), // EOB1 gets a short code
      7 -> Seq(0x20, 0x30, sym(1, 2)),
      8 -> Seq(0x40, sym(5, 1), sym(2, 2), sym(0, 5)),
      9 -> Seq(0x50, 0x60, sym(6, 1), sym(7, 1)),
      10 -> Seq(0xF0, 0x70, 0x80, sym(1, 3), sym(0, 6)))
    val placed = byLen.flatMap(_._2).toSet
    val rest = ((for {
      run <- 0 to 15; size <- 1 to 10
      s = sym(run, size) if !placed(s)
    } yield s) ++ (for (r <- 1 to 14; s = r << 4 if !placed(s)) yield s)).sorted
    val bits = new Array[Int](16)
    byLen.foreach { case (len, ss) => bits(len - 1) = ss.size }
    bits(11) = rest.size // everything else at length 12
    HuffTable(bits, (byLen.flatMap(_._2) ++ rest).toArray)
  }

  private[graft] final class BitWriter(out: ByteArrayOutputStream) {
    private var acc = 0L
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      require(len > 0 && len <= 26, s"bad bit run $len")
      acc = (acc << len) | (code & ((1L << len) - 1))
      nbits += len
      while (nbits >= 8) {
        val b = ((acc >> (nbits - 8)) & 0xFF).toInt
        out.write(b)
        if (b == 0xFF) out.write(0x00) // byte stuffing
        nbits -= 8
      }
    }
    /** flush with 1-padding per the spec */
    def finish(): Unit = if (nbits > 0) put(0x7F, 8 - nbits)
  }

  private[graft] final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0L
    private var nbits = 0
    private def fill(): Unit = {
      require(pos < bytes.length, "truncated JPEG: entropy stream ran out")
      val b = bytes(pos) & 0xFF
      pos += 1
      if (b == 0xFF) {
        require(pos < bytes.length, "truncated JPEG: dangling 0xFF")
        val m = bytes(pos) & 0xFF
        require(m == 0x00,
          f"unexpected marker 0xFF$m%02X inside entropy-coded data")
        pos += 1 // consume the stuffed zero
      }
      acc = (acc << 8) | b
      nbits += 8
    }
    def bit(): Int = {
      if (nbits == 0) fill()
      nbits -= 1
      ((acc >> nbits) & 1L).toInt
    }
    def bitsVal(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Consume an RSTm marker at an MCU boundary: discard the pad bits of
      * the current byte, then require exactly 0xFF 0xD0+m — a wrong or
      * missing restart marker is corruption, not something to resync past.
      */
    def restart(m: Int): Unit = {
      acc = 0L
      nbits = 0
      require(pos + 2 <= bytes.length, "truncated JPEG: missing restart marker")
      val got = ((bytes(pos) & 0xFF) << 8) | (bytes(pos + 1) & 0xFF)
      require(got == (0xFFD0 | m),
        f"corrupt JPEG: expected RST$m%d, found 0x$got%04X")
      pos += 2
    }

    /** T.81 F.2.2.3 DECODE: one Huffman symbol. */
    def symbol(t: HuffTable): Int = {
      var len = 1
      var code = bit()
      while (code > t.maxCode(len)) {
        require(len < 16, "corrupt JPEG: Huffman code over 16 bits")
        code = (code << 1) | bit()
        len += 1
      }
      t.vals(t.valPtr(len) + code - t.minCode(len))
    }
  }

  /** T.81 EXTEND: map `size` received magnitude bits to a signed value. */
  private def extend(v: Int, size: Int): Int =
    if (size == 0) 0 else if (v < (1 << (size - 1))) v - (1 << size) + 1 else v

  private def bitSize(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  // ----------------------------------------------------------------- encode

  /** Integer BT.601 RGB→YCbCr in micro-units, round-half-up via floorDiv —
    * the exact transform the q301 oracle replays.
    */
  private[graft] def rgbToYcc(r: Int, g: Int, b: Int): (Int, Int, Int) = {
    def fd(x: Long) = Math.floorDiv(x + 500000L, 1000000L).toInt
    def clamp(x: Int) = if (x < 0) 0 else if (x > 255) 255 else x
    val y = fd(299000L * r + 587000L * g + 114000L * b)
    val cb = clamp(128 + fd(-168736L * r - 331264L * g + 500000L * b))
    val cr = clamp(128 + fd(500000L * r - 418688L * g - 81312L * b))
    (clamp(y), cb, cr)
  }

  /** Inverse: YCbCr→RGB, same micro-unit pinning (decoder side). */
  private[graft] def yccToRgb(y: Int, cb: Int, cr: Int): (Int, Int, Int) = {
    def fd(x: Long) = Math.floorDiv(x + 500000L, 1000000L).toInt
    def clamp(x: Int) = if (x < 0) 0 else if (x > 255) 255 else x
    val r = fd(1000000L * y + 1402000L * (cr - 128))
    val g = fd(1000000L * y - 344136L * (cb - 128) - 714136L * (cr - 128))
    val b = fd(1000000L * y + 1772000L * (cb - 128))
    (clamp(r), clamp(g), clamp(b))
  }

  private def writeMarker(out: ByteArrayOutputStream, m: Int): Unit = {
    out.write(0xFF); out.write(m)
  }

  private def writeSegment(out: ByteArrayOutputStream, m: Int, data: Array[Byte]): Unit = {
    writeMarker(out, m)
    val n = data.length + 2
    out.write((n >> 8) & 0xFF); out.write(n & 0xFF)
    out.write(data, 0, data.length)
  }

  private def dhtPayload(tableClass: Int, id: Int, t: HuffTable): Array[Byte] = {
    val b = new ByteArrayOutputStream()
    b.write((tableClass << 4) | id)
    t.bits.foreach(b.write)
    t.vals.foreach(b.write)
    b.toByteArray
  }

  /** Encode top-down 0xRRGGBB pixels as a baseline JFIF JPEG.
    * `grayscale = true` emits a single-component scan of the pinned
    * integer luma; otherwise three YCbCr 4:4:4 components.
    * `restartInterval > 0` emits a DRI segment and an RSTm marker after
    * every that-many MCUs (byte-aligned, DC predictors reset — the
    * error-resilience structure camera JPEGs carry).
    * `subsample420 = true` emits the 4:2:0 layout real camera files use:
    * Y at 2×2 sampling, chroma downsampled 2× each way (pinned
    * round-half-up 2×2 average), 16×16-pixel MCUs of 4 Y + Cb + Cr
    * blocks.
    */
  def encode(
      width: Int, height: Int, pixels: Array[Int],
      grayscale: Boolean = false,
      restartInterval: Int = 0,
      subsample420: Boolean = false): Array[Byte] = {
    require(restartInterval >= 0 && restartInterval <= 0xFFFF,
      s"bad restart interval $restartInterval")
    require(!(grayscale && subsample420), "4:2:0 needs chroma components")
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(width.toLong * height.toLong <= (1L << 26),
      s"JPEG too large: ${width}x$height exceeds 2^26 pixels")
    require(pixels.length == width * height, "pixels must be width*height")
    require(width <= 0xFFFF && height <= 0xFFFF, "JPEG dimensions are 16-bit")

    val n = width * height
    val yP = new Array[Int](n)
    val cbP = if (grayscale) null else new Array[Int](n)
    val crP = if (grayscale) null else new Array[Int](n)
    var i = 0
    while (i < n) {
      val p = pixels(i)
      val (y, cb, cr) = rgbToYcc((p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF)
      yP(i) = y
      if (!grayscale) { cbP(i) = cb; crP(i) = cr }
      i += 1
    }

    val out = new ByteArrayOutputStream(n / 2 + 1024)
    writeMarker(out, 0xD8) // SOI
    // JFIF APP0
    writeSegment(out, 0xE0, Array[Byte](
      'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    // DQT (two tables in one segment for color, one for gray)
    val dqt = new ByteArrayOutputStream()
    dqt.write(0x00); Zigzag.foreach(z => dqt.write(QLuma(z)))
    if (!grayscale) { dqt.write(0x01); Zigzag.foreach(z => dqt.write(QChroma(z))) }
    writeSegment(out, 0xDB, dqt.toByteArray)
    // SOF0
    val nc = if (grayscale) 1 else 3
    val sof = new ByteArrayOutputStream()
    sof.write(8) // precision
    sof.write((height >> 8) & 0xFF); sof.write(height & 0xFF)
    sof.write((width >> 8) & 0xFF); sof.write(width & 0xFF)
    sof.write(nc)
    var c = 0
    while (c < nc) {
      sof.write(c + 1) // component id
      sof.write(if (subsample420 && c == 0) 0x22 else 0x11) // sampling h|v
      sof.write(if (c == 0) 0 else 1) // quant table id
      c += 1
    }
    writeSegment(out, 0xC0, sof.toByteArray)
    // DHT
    writeSegment(out, 0xC4, dhtPayload(0, 0, DcLumaTable))
    writeSegment(out, 0xC4, dhtPayload(1, 0, AcTable))
    if (!grayscale) writeSegment(out, 0xC4, dhtPayload(0, 1, DcChromaTable))
    // SOS
    val sos = new ByteArrayOutputStream()
    sos.write(nc)
    c = 0
    while (c < nc) {
      sos.write(c + 1)
      sos.write(((if (c == 0) 0 else 1) << 4) | 0) // DC table | AC table 0
      c += 1
    }
    sos.write(0); sos.write(63); sos.write(0) // Ss/Se/AhAl (baseline)
    if (restartInterval > 0) {
      // DRI precedes SOS per T.81 (applies to the following scans)
      writeSegment(out, 0xDD, Array[Byte](
        ((restartInterval >> 8) & 0xFF).toByte, (restartInterval & 0xFF).toByte))
    }
    writeSegment(out, 0xDA, sos.toByteArray)

    // entropy-coded data, interleaved in MCU order: 4:4:4/gray MCUs are
    // one 8×8 block per component; 4:2:0 MCUs are 16×16 pixels — 4 Y
    // blocks then the downsampled Cb and Cr blocks
    val w = new BitWriter(out)
    val enc =
      if (grayscale)
        Array(new PlaneEncoder(yP, width, height, QLuma, DcLumaTable, AcTable, w))
      else if (!subsample420) Array(
        new PlaneEncoder(yP, width, height, QLuma, DcLumaTable, AcTable, w),
        new PlaneEncoder(cbP, width, height, QChroma, DcChromaTable, AcTable, w),
        new PlaneEncoder(crP, width, height, QChroma, DcChromaTable, AcTable, w))
      else {
        // pinned 2×2 round-half-up average, edge-replicated at odd dims —
        // constant tiles downsample to the constant (the q303 oracle's
        // exactness hinges on that)
        val cw = (width + 1) / 2; val ch = (height + 1) / 2
        def down(src: Array[Int]): Array[Int] = Array.tabulate(cw * ch) { i =>
          val cy = i / cw; val cx = i % cw
          var s = 0
          var dy = 0
          while (dy < 2) {
            var dx = 0
            while (dx < 2) {
              s += src(math.min(2 * cy + dy, height - 1) * width +
                math.min(2 * cx + dx, width - 1))
              dx += 1
            }
            dy += 1
          }
          (s + 2) / 4
        }
        Array(
          new PlaneEncoder(yP, width, height, QLuma, DcLumaTable, AcTable, w),
          new PlaneEncoder(down(cbP), cw, ch, QChroma, DcChromaTable, AcTable, w),
          new PlaneEncoder(down(crP), cw, ch, QChroma, DcChromaTable, AcTable, w))
      }
    val mcuCols = if (subsample420) (width + 15) / 16 else (width + 7) / 8
    val mcuRows = if (subsample420) (height + 15) / 16 else (height + 7) / 8
    val totalMcu = mcuCols * mcuRows
    var mcu = 0
    var rst = 0
    while (mcu < totalMcu) {
      val my = mcu / mcuCols; val mx = mcu % mcuCols
      if (subsample420) {
        // T.81 interleave: Y blocks raster within the MCU, then chroma
        enc(0).block(2 * mx, 2 * my); enc(0).block(2 * mx + 1, 2 * my)
        enc(0).block(2 * mx, 2 * my + 1); enc(0).block(2 * mx + 1, 2 * my + 1)
        enc(1).block(mx, my); enc(2).block(mx, my)
      } else {
        var c = 0
        while (c < enc.length) { enc(c).block(mx, my); c += 1 }
      }
      mcu += 1
      if (restartInterval > 0 && mcu % restartInterval == 0 && mcu < totalMcu) {
        // byte-align with 1-padding, then the bare RSTm marker (m cycles
        // 0..7); every component's DC predictor resets
        w.finish()
        out.write(0xFF); out.write(0xD0 + (rst % 8))
        rst += 1
        var k = 0
        while (k < enc.length) { enc(k).resetPred(); k += 1 }
      }
    }
    w.finish()
    writeMarker(out, 0xD9) // EOI
    out.toByteArray
  }

  /** Stateful per-component block encoder for interleaved MCUs (carries
    * the DC predictor across blocks of ONE component).
    */
  private final class PlaneEncoder(
      plane: Array[Int], width: Int, height: Int, q: Array[Int],
      dcT: HuffTable, acT: HuffTable, w: BitWriter) {
    private val samples = new Array[Int](64)
    private val coef = new Array[Long](64)
    private val zz = new Array[Int](64)
    private var pred = 0

    /** restart-marker boundary: DC prediction starts over */
    def resetPred(): Unit = pred = 0

    def block(bx: Int, by: Int): Unit = {
      var j = 0
      while (j < 64) {
        val yy = math.min(by * 8 + j / 8, height - 1)
        val xx = math.min(bx * 8 + j % 8, width - 1)
        samples(j) = plane(yy * width + xx) - 128
        j += 1
      }
      Fix.fdct(samples, coef)
      var k = 0
      while (k < 64) { zz(k) = quant(coef(Zigzag(k)), q(Zigzag(k))); k += 1 }
      val diff = zz(0) - pred
      pred = zz(0)
      val s = bitSize(diff)
      val (dc, dl) = dcT.encode(s)
      w.put(dc, dl)
      if (s > 0) w.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      var run = 0
      k = 1
      while (k < 64) {
        if (zz(k) == 0) run += 1
        else {
          while (run >= 16) { val (c, l) = acT.encode(0xF0); w.put(c, l); run -= 16 }
          val sz = bitSize(zz(k))
          require(sz <= 10, s"AC coefficient out of the table's size range: ${zz(k)}")
          val (c, l) = acT.encode((run << 4) | sz)
          w.put(c, l)
          w.put(if (zz(k) < 0) zz(k) + (1 << sz) - 1 else zz(k), sz)
          run = 0
        }
        k += 1
      }
      if (run > 0) { val (c, l) = acT.encode(0x00); w.put(c, l) }
    }
  }

  // ---------------------------------------------------- progressive encode

  /** Quantized coefficients of one component plane over the MCU-padded
    * block grid, zigzag order per block (the layout both progressive
    * sides share): block (bx,by) occupies `(by·gridW + bx)·64 + k`,
    * k = zigzag position. Edge-replicated sampling like the baseline
    * encoder, so padded blocks are well-defined (and fully outside the
    * visible image — non-interleaved scans never touch them).
    */
  private def quantizePlane(
      plane: Array[Int], width: Int, height: Int, q: Array[Int],
      gridW: Int, gridH: Int): Array[Int] = {
    val out = new Array[Int](gridW * gridH * 64)
    val samples = new Array[Int](64)
    val coef = new Array[Long](64)
    var by = 0
    while (by < gridH) {
      var bx = 0
      while (bx < gridW) {
        var j = 0
        while (j < 64) {
          val yy = math.min(by * 8 + j / 8, height - 1)
          val xx = math.min(bx * 8 + j % 8, width - 1)
          samples(j) = plane(yy * width + xx) - 128
          j += 1
        }
        Fix.fdct(samples, coef)
        val base = (by * gridW + bx) * 64
        var k = 0
        while (k < 64) { out(base + k) = quant(coef(Zigzag(k)), q(Zigzag(k))); k += 1 }
        bx += 1
      }
      by += 1
    }
    out
  }

  /** AC point transform (T.81 G.1.2.1): divide the MAGNITUDE by 2^Al,
    * truncating toward zero — NOT an arithmetic shift for negatives.
    */
  private def acPt(v: Int, al: Int): Int =
    if (v >= 0) v >> al else -((-v) >> al)

  /** One scan's entropy writer for progressive encoding: EOB-run state,
    * buffered correction bits, the four scan kinds of T.81 Annex G.
    */
  private final class ProgWriter(w: BitWriter, acT: HuffTable) {
    private var eobrun = 0
    // TWO correction-bit buffers (T.81 G.1.2.3 bit ordering): `be` holds
    // bits owned by the PENDING EOB RUN (the decoder reads them right
    // after the EOBn, block by block), `br` holds the CURRENT block's
    // bits (the decoder reads them while crossing coefficients after
    // this block's next symbol). Folding a block into the EOB run moves
    // its bits br → be. A single shared buffer misaligns the stream the
    // first time a block buffers bits before its first insertion while
    // an EOB run is pending.
    private val be = new java.util.ArrayList[Integer]()
    private val br = new java.util.ArrayList[Integer]()

    private def flushBits(buf: java.util.ArrayList[Integer]): Unit = {
      var i = 0
      while (i < buf.size()) { w.put(buf.get(i), 1); i += 1 }
      buf.clear()
    }

    private def flushBr(): Unit = flushBits(br)

    /** Fold the just-finished block into the pending EOB run: its
      * buffered correction bits now belong to the run.
      */
    private def foldIntoEobrun(): Unit = {
      eobrun += 1
      while (br.size() > 0) { be.add(br.remove(0)) }
      if (eobrun == 0x7FFF) flushEob()
    }

    /** Emit the pending EOBn plus the RUN's buffered correction bits. */
    def flushEob(): Unit = if (eobrun > 0) {
      val r = 31 - Integer.numberOfLeadingZeros(eobrun)
      val (c, l) = acT.encode(r << 4)
      w.put(c, l)
      if (r > 0) w.put(eobrun - (1 << r), r)
      eobrun = 0
      flushBits(be)
    }

    /** First AC scan of a band (Ah = 0): run/EOB-run coding of the
      * point-transformed coefficients.
      */
    def acFirstBlock(coefs: Array[Int], base: Int, ss: Int, se: Int, al: Int): Unit = {
      var last = se
      while (last >= ss && acPt(coefs(base + last), al) == 0) last -= 1
      if (last < ss) {
        foldIntoEobrun()
      } else {
        flushEob()
        var run = 0
        var k = ss
        while (k <= last) {
          val v = acPt(coefs(base + k), al)
          if (v == 0) run += 1
          else {
            while (run >= 16) { val (c, l) = acT.encode(0xF0); w.put(c, l); run -= 16 }
            val sz = bitSize(v)
            require(sz <= 10, s"AC coefficient out of the table's size range: $v")
            val (c, l) = acT.encode((run << 4) | sz)
            w.put(c, l)
            w.put(if (v < 0) v + (1 << sz) - 1 else v, sz)
            run = 0
          }
          k += 1
        }
        if (last < se) { // trailing zeros: this block contributes an EOB
          foldIntoEobrun()
        }
      }
    }

    /** Refinement AC scan (Ah = Al + 1): correction bits for history-
      * nonzero coefficients, run-coded insertion of newly-significant
      * ones — the T.81 G.1.2.3 successive-approximation pass.
      */
    def acRefineBlock(
        coefs: Array[Int], base: Int, ss: Int, se: Int, ah: Int, al: Int): Unit = {
      // absolute values after this scan's point transform; newly
      // significant ⇔ the value is exactly 1 at this precision
      val abs = new Array[Int](se + 1)
      var eob = ss - 1 // last newly-significant position
      var k = ss
      while (k <= se) {
        val a = math.abs(coefs(base + k)) >> al
        abs(k) = a
        if (a == 1) eob = k
        k += 1
      }
      var run = 0
      k = ss
      while (k <= se) {
        val a = abs(k)
        if (a == 0) { run += 1 }
        else {
          // ZRLs due are emitted BEFORE buffering this coefficient's bit,
          // whatever its kind (T.81 G.7 ordering): the decoder consumes
          // correction bits positionally while crossing the ZRL's 16
          // zeros, so a bit buffered past that crossing must come after
          // the NEXT symbol, not glued to this ZRL's flush. Runs past the
          // last insertion point fold into the EOB run instead.
          while (run > 15 && k <= eob) {
            flushEob()
            val (c, l) = acT.encode(0xF0)
            w.put(c, l)
            run -= 16
            flushBr()
          }
          if (a > 1) {
            // history-nonzero: buffer its correction bit (emitted after
            // the next symbol)
            br.add(a & 1)
          } else {
            // newly significant
            flushEob()
            val (c, l) = acT.encode((run << 4) | 1)
            w.put(c, l)
            w.put(if (coefs(base + k) < 0) 0 else 1, 1)
            run = 0
            flushBr()
          }
        }
        k += 1
      }
      if (run > 0 || br.size() > 0) foldIntoEobrun()
    }
  }

  /** Encode top-down 0xRRGGBB pixels as a PROGRESSIVE (SOF2) JFIF JPEG —
    * the majority encoding of real crawled photos. Same pixel math as
    * [[encode]] (identical FDCT, quantizers, color transforms), so the
    * fully-transmitted progressive stream decodes to EXACTLY the pixels
    * of the sequential encoding — the spectral-selection + successive-
    * approximation scan script only reorders WHEN coefficient bits
    * arrive. Scan script (the classic shape): DC of all components at
    * Al=1; chroma AC 1–63 at Al=1; luma AC 1–5 then 6–63 at Al=2; luma
    * AC refinement 2→1; DC refinement to full precision; AC refinements
    * of every component to Al=0.
    */
  def encodeProgressive(
      width: Int, height: Int, pixels: Array[Int],
      grayscale: Boolean = false,
      subsample420: Boolean = false,
      script: Seq[(Int, Int, Int, Int, Int)] = null): Array[Byte] = {
    require(!(grayscale && subsample420), "4:2:0 needs chroma components")
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(width.toLong * height.toLong <= (1L << 26),
      s"JPEG too large: ${width}x$height exceeds 2^26 pixels")
    require(pixels.length == width * height, "pixels must be width*height")
    require(width <= 0xFFFF && height <= 0xFFFF, "JPEG dimensions are 16-bit")

    val n = width * height
    val yP = new Array[Int](n)
    val cbP = if (grayscale) null else new Array[Int](n)
    val crP = if (grayscale) null else new Array[Int](n)
    var i = 0
    while (i < n) {
      val p = pixels(i)
      val (y, cb, cr) = rgbToYcc((p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF)
      yP(i) = y
      if (!grayscale) { cbP(i) = cb; crP(i) = cr }
      i += 1
    }

    val nc = if (grayscale) 1 else 3
    // component planes at their own resolution (4:2:0 chroma downsampled
    // with the same pinned round-half-up average as the baseline encoder)
    val (planes, planeWh): (Array[Array[Int]], Array[(Int, Int)]) =
      if (grayscale) (Array(yP), Array((width, height)))
      else if (!subsample420)
        (Array(yP, cbP, crP), Array.fill(3)((width, height)))
      else {
        val cw = (width + 1) / 2; val ch = (height + 1) / 2
        def down(src: Array[Int]): Array[Int] = Array.tabulate(cw * ch) { i =>
          val cy = i / cw; val cx = i % cw
          var s = 0
          var dy = 0
          while (dy < 2) {
            var dx = 0
            while (dx < 2) {
              s += src(math.min(2 * cy + dy, height - 1) * width +
                math.min(2 * cx + dx, width - 1))
              dx += 1
            }
            dy += 1
          }
          (s + 2) / 4
        }
        (Array(yP, down(cbP), down(crP)),
          Array((width, height), (cw, ch), (cw, ch)))
      }
    val compH = Array.tabulate(nc)(c => if (subsample420 && c == 0) 2 else 1)
    val compV = compH.clone()
    val hMax = compH.max; val vMax = compV.max
    val mcuCols = (width + 8 * hMax - 1) / (8 * hMax)
    val mcuRows = (height + 8 * vMax - 1) / (8 * vMax)
    val gridW = Array.tabulate(nc)(c => mcuCols * compH(c))
    val gridH = Array.tabulate(nc)(c => mcuRows * compV(c))
    val specBW = Array.tabulate(nc)(c => (planeWh(c)._1 + 7) / 8)
    val specBH = Array.tabulate(nc)(c => (planeWh(c)._2 + 7) / 8)
    val qTab = Array.tabulate(nc)(c => if (c == 0) QLuma else QChroma)
    val coefs = Array.tabulate(nc) { c =>
      quantizePlane(planes(c), planeWh(c)._1, planeWh(c)._2, qTab(c),
        gridW(c), gridH(c))
    }
    val dcTab = Array.tabulate(nc)(c => if (c == 0) DcLumaTable else DcChromaTable)

    val out = new ByteArrayOutputStream(n / 2 + 1024)
    writeMarker(out, 0xD8) // SOI
    writeSegment(out, 0xE0, Array[Byte](
      'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    val dqt = new ByteArrayOutputStream()
    dqt.write(0x00); Zigzag.foreach(z => dqt.write(QLuma(z)))
    if (!grayscale) { dqt.write(0x01); Zigzag.foreach(z => dqt.write(QChroma(z))) }
    writeSegment(out, 0xDB, dqt.toByteArray)
    // SOF2 — same frame-header layout as SOF0, progressive coding process
    val sof = new ByteArrayOutputStream()
    sof.write(8)
    sof.write((height >> 8) & 0xFF); sof.write(height & 0xFF)
    sof.write((width >> 8) & 0xFF); sof.write(width & 0xFF)
    sof.write(nc)
    var c = 0
    while (c < nc) {
      sof.write(c + 1)
      sof.write(if (subsample420 && c == 0) 0x22 else 0x11)
      sof.write(if (c == 0) 0 else 1)
      c += 1
    }
    writeSegment(out, 0xC2, sof.toByteArray)
    writeSegment(out, 0xC4, dhtPayload(0, 0, DcLumaTable))
    writeSegment(out, 0xC4, dhtPayload(1, 0, AcProgTable))
    if (!grayscale) writeSegment(out, 0xC4, dhtPayload(0, 1, DcChromaTable))

    def sosHeader(comps: Seq[Int], ss: Int, se: Int, ah: Int, al: Int): Unit = {
      val b = new ByteArrayOutputStream()
      b.write(comps.size)
      comps.foreach { ci =>
        b.write(ci + 1)
        b.write(((if (ci == 0) 0 else 1) << 4) | 0) // DC table id | AC table 0
      }
      b.write(ss); b.write(se); b.write((ah << 4) | al)
      writeSegment(out, 0xDA, b.toByteArray)
    }

    /** Interleaved (or single-component) DC scan: Ah = 0 first pass
      * (prediction on the point-transformed values), Ah > 0 one
      * refinement bit per block.
      */
    def dcScan(ah: Int, al: Int): Unit = {
      sosHeader(0 until nc, 0, 0, ah, al)
      val w = new BitWriter(out)
      val pred = new Array[Int](nc)
      var mcu = 0
      val total = mcuCols * mcuRows
      while (mcu < total) {
        val my = mcu / mcuCols; val mx = mcu % mcuCols
        var c = 0
        while (c < nc) {
          var by2 = 0
          while (by2 < compV(c)) {
            var bx2 = 0
            while (bx2 < compH(c)) {
              val bi = (my * compV(c) + by2) * gridW(c) + mx * compH(c) + bx2
              val dc = coefs(c)(bi * 64)
              if (ah == 0) {
                val t = dc >> al // DC point transform IS arithmetic shift
                val diff = t - pred(c)
                pred(c) = t
                val s = bitSize(diff)
                val (cd, l) = dcTab(c).encode(s)
                w.put(cd, l)
                if (s > 0) w.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
              } else {
                w.put((dc >> al) & 1, 1)
              }
              bx2 += 1
            }
            by2 += 1
          }
          c += 1
        }
        mcu += 1
      }
      w.finish()
    }

    /** Non-interleaved AC scan over component `c`'s OWN block raster
      * (ceil dims — padded grid blocks are never AC-scanned; they sit
      * fully outside the image).
      */
    def acScan(c: Int, ss: Int, se: Int, ah: Int, al: Int): Unit = {
      sosHeader(Seq(c), ss, se, ah, al)
      val w = new BitWriter(out)
      val pw = new ProgWriter(w, AcProgTable)
      var by = 0
      while (by < specBH(c)) {
        var bx = 0
        while (bx < specBW(c)) {
          val base = (by * gridW(c) + bx) * 64
          if (ah == 0) pw.acFirstBlock(coefs(c), base, ss, se, al)
          else pw.acRefineBlock(coefs(c), base, ss, se, ah, al)
          bx += 1
        }
        by += 1
      }
      pw.flushEob()
      w.finish()
    }

    // the classic scan script: coarse DC + low-frequency luma first (the
    // "picture appears, then sharpens" order), full precision by the end.
    // Script rows: (comp, Ss, Se, Ah, Al); comp = -1 is the interleaved
    // DC scan of all components.
    val scanScript: Seq[(Int, Int, Int, Int, Int)] =
      if (script != null) script
      else if (nc == 1) Seq(
        (-1, 0, 0, 0, 1),
        (0, 1, 5, 0, 2), (0, 6, 63, 0, 2),
        (0, 1, 63, 2, 1),
        (-1, 0, 0, 1, 0),
        (0, 1, 63, 1, 0))
      else Seq(
        (-1, 0, 0, 0, 1),
        (1, 1, 63, 0, 1), (2, 1, 63, 0, 1),
        (0, 1, 5, 0, 2), (0, 6, 63, 0, 2),
        (0, 1, 63, 2, 1),
        (-1, 0, 0, 1, 0),
        (1, 1, 63, 1, 0), (2, 1, 63, 1, 0), (0, 1, 63, 1, 0))
    scanScript.foreach {
      case (-1, 0, 0, ah, al) => dcScan(ah, al)
      case (c, ss, se, ah, al) => acScan(c, ss, se, ah, al)
    }
    writeMarker(out, 0xD9) // EOI
    out.toByteArray
  }

  // ----------------------------------------------------------------- decode

  /** Header-only sniff: walk markers to SOF and return
    * (width, height, components) WITHOUT touching the entropy stream —
    * the O(header) metadata probe a media pipeline filters on before
    * paying for a decode (dimension gates, aspect filters, meta-vs-bytes
    * consistency checks). Accepts any SOF0/SOF1 frame header, including
    * layouts [[decode]] would reject — sniffing is cheaper than decoding
    * and deliberately laxer. Throws IllegalArgumentException on
    * non-JPEG/truncated input.
    */
  def dims(bytes: Array[Byte]): (Int, Int, Int) =
    try dims0(bytes)
    catch {
      case _: ArrayIndexOutOfBoundsException =>
        throw new IllegalArgumentException("truncated JPEG: segment walk past end")
    }

  private def dims0(bytes: Array[Byte]): (Int, Int, Int) = {
    require(bytes != null && bytes.length >= 4, "not a JPEG: too short")
    require((bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xD8,
      "not a JPEG: missing SOI")
    var pos = 2
    while (pos + 4 <= bytes.length) {
      require((bytes(pos) & 0xFF) == 0xFF, f"expected marker at $pos")
      val m = bytes(pos + 1) & 0xFF
      pos += 2
      if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) {
        // any SOFn carries the same frame-header prefix
        require(pos + 8 <= bytes.length, "truncated SOF")
        return (u16(bytes, pos + 5), u16(bytes, pos + 3), bytes(pos + 7) & 0xFF)
      }
      if (m == 0xD9 || m == 0xDA)
        throw new IllegalArgumentException("JPEG has no frame header before scan/EOI")
      require(m != 0x01 && !(m >= 0xD0 && m <= 0xD7),
        f"standalone marker 0xFF$m%02X outside a scan")
      val n = u16(bytes, pos)
      require(n >= 2 && pos + n <= bytes.length, s"truncated JPEG segment at $pos")
      pos += n
    }
    throw new IllegalArgumentException("truncated JPEG: no SOF marker")
  }

  /** Parse JPEG bytes (baseline SOF0/SOF1 or progressive SOF2) into the
    * shared pixel frame; throws IllegalArgumentException on anything this
    * decoder cannot represent faithfully (non-4:2:0 subsampling layouts,
    * 12-bit, arithmetic coding, truncation, corrupt Huffman data) — loud
    * beats silent. Grayscale decodes with r = g = b = Y.
    */
  def decode(bytes: Array[Byte]): BmpCodec.Bmp =
    try decode0(bytes)
    catch {
      case _: ArrayIndexOutOfBoundsException =>
        throw new IllegalArgumentException("truncated JPEG: segment walk past end")
    }

  private def u16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)

  private def decode0(bytes: Array[Byte]): BmpCodec.Bmp = {
    require(bytes != null && bytes.length >= 4, "not a JPEG: too short")
    require((bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xD8,
      "not a JPEG: missing SOI")
    var pos = 2
    val quantTables = new Array[Array[Int]](4)
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var width = 0; var height = 0
    var nc = 0
    // per component: (id, quant table id)
    var compQ: Array[Int] = null
    var sofSeen = false
    var restartInterval = 0 // 0 = disabled (no DRI, or DRI with Ri=0)
    var compH: Array[Int] = null
    var compV: Array[Int] = null
    var compIds: Array[Int] = null
    // progressive (SOF2) state: per-component coefficient grids persist
    // across scans; rendered at EOI
    var progressive = false
    var progCoefs: Array[Array[Int]] = null
    var progScans = 0
    var gridW: Array[Int] = null
    var gridH: Array[Int] = null
    var specBW: Array[Int] = null
    var specBH: Array[Int] = null
    var mcuCols = 0; var mcuRows = 0

    def segLen(at: Int): Int = {
      val n = u16(bytes, at)
      require(n >= 2 && at + n <= bytes.length, s"truncated JPEG segment at $at")
      n
    }

    while (pos < bytes.length) {
      require((bytes(pos) & 0xFF) == 0xFF, f"expected marker at $pos")
      val m = bytes(pos + 1) & 0xFF
      pos += 2
      m match {
        case 0xD9 => // EOI: progressive render point, corrupt otherwise
          if (progressive && progScans > 0)
            return finishProgressive(
              width, height, nc, progCoefs, compQ.map(quantTables(_)),
              gridW, gridH, compH, compV)
          throw new IllegalArgumentException("JPEG has no scan (EOI before SOS)")
        case 0xDB => // DQT
          val n = segLen(pos)
          var p = pos + 2
          while (p < pos + n) {
            val pq = (bytes(p) & 0xFF) >> 4
            val tq = bytes(p) & 0x0F
            require(pq == 0, "12-bit quantization tables not supported")
            require(p + 65 <= pos + n, "truncated DQT")
            val t = new Array[Int](64)
            var k = 0
            while (k < 64) { t(Zigzag(k)) = bytes(p + 1 + k) & 0xFF; k += 1 }
            quantTables(tq) = t
            p += 65
          }
          pos += n
        case 0xC4 => // DHT
          val n = segLen(pos)
          var p = pos + 2
          while (p < pos + n) {
            val tc = (bytes(p) & 0xFF) >> 4
            val th = bytes(p) & 0x0F
            require(tc <= 1 && th <= 3, s"bad DHT header ${bytes(p)}")
            val bits = Array.tabulate(16)(i => bytes(p + 1 + i) & 0xFF)
            val total = bits.sum
            require(p + 17 + total <= pos + n, "truncated DHT")
            val vals = Array.tabulate(total)(i => bytes(p + 17 + i) & 0xFF)
            val t = HuffTable(bits, vals)
            if (tc == 0) dcTables(th) = t else acTables(th) = t
            p += 17 + total
          }
          pos += n
        case 0xC0 | 0xC1 | 0xC2 =>
          // SOF0 baseline / SOF1 extended-sequential / SOF2 progressive —
          // identical frame-header layout; SOF2 switches the scan loop to
          // coefficient accumulation across multiple scans
          val n = segLen(pos)
          require(!sofSeen, "multiple SOF segments")
          sofSeen = true
          progressive = m == 0xC2
          require((bytes(pos + 2) & 0xFF) == 8, "only 8-bit precision supported")
          height = u16(bytes, pos + 3)
          width = u16(bytes, pos + 5)
          require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
          require(width.toLong * height.toLong <= (1L << 26),
            s"JPEG too large: ${width}x$height exceeds 2^26 pixels")
          nc = bytes(pos + 7) & 0xFF
          require(nc == 1 || nc == 3, s"unsupported component count $nc")
          compQ = new Array[Int](nc)
          compH = new Array[Int](nc)
          compV = new Array[Int](nc)
          compIds = new Array[Int](nc)
          var c = 0
          while (c < nc) {
            compIds(c) = bytes(pos + 8 + 3 * c) & 0xFF
            val hv = bytes(pos + 9 + 3 * c) & 0xFF
            compH(c) = hv >> 4
            compV(c) = hv & 0x0F
            compQ(c) = bytes(pos + 10 + 3 * c) & 0x0F
            c += 1
          }
          // the two layouts real files carry: 1x1 everywhere (gray /
          // 4:4:4) and 4:2:0 (Y at 2x2, chroma at 1x1)
          val all11 = (0 until nc).forall(i => compH(i) == 1 && compV(i) == 1)
          val is420 = nc == 3 &&
            compH(0) == 2 && compV(0) == 2 &&
            compH(1) == 1 && compV(1) == 1 && compH(2) == 1 && compV(2) == 1
          require(all11 || is420,
            s"unsupported sampling layout ${compH.zip(compV).mkString(",")} " +
              "(gray/4:4:4/4:2:0 only)")
          if (progressive) {
            val hMax = compH.max; val vMax = compV.max
            mcuCols = (width + 8 * hMax - 1) / (8 * hMax)
            mcuRows = (height + 8 * vMax - 1) / (8 * vMax)
            gridW = Array.tabulate(nc)(c => mcuCols * compH(c))
            gridH = Array.tabulate(nc)(c => mcuRows * compV(c))
            // non-interleaved scans cover the component's OWN ceil dims
            // (T.81 A.1.1), which can be smaller than the padded grid
            specBW = Array.tabulate(nc)(c =>
              ((width * compH(c) + hMax - 1) / hMax + 7) / 8)
            specBH = Array.tabulate(nc)(c =>
              ((height * compV(c) + vMax - 1) / vMax + 7) / 8)
            progCoefs = Array.tabulate(nc)(c =>
              new Array[Int](gridW(c) * gridH(c) * 64))
          }
          pos += n
        case x if x >= 0xC3 && x <= 0xCF && x != 0xC4 && x != 0xC8 =>
          throw new IllegalArgumentException(f"unsupported SOF marker 0xFF$x%02X")
        case 0xDD => // DRI: restart every Ri MCUs in the following scans
          val n = segLen(pos)
          restartInterval = u16(bytes, pos + 2)
          pos += n
        case 0xDA if !progressive => // baseline SOS — decode and finish
          val n = segLen(pos)
          require(sofSeen, "SOS before SOF")
          val ns = bytes(pos + 2) & 0xFF
          require(ns == nc, s"scan components $ns != frame components $nc")
          val compDc = new Array[HuffTable](nc)
          val compAc = new Array[HuffTable](nc)
          var c = 0
          while (c < nc) {
            val td = (bytes(pos + 4 + 2 * c) & 0xFF) >> 4
            val ta = bytes(pos + 4 + 2 * c) & 0x0F
            require(dcTables(td) != null, s"scan references missing DC table $td")
            require(acTables(ta) != null, s"scan references missing AC table $ta")
            compDc(c) = dcTables(td); compAc(c) = acTables(ta)
            require(quantTables(compQ(c)) != null,
              s"frame references missing quant table ${compQ(c)}")
            c += 1
          }
          val scanStart = pos + n
          return decodeScan(
            bytes, scanStart, width, height, nc,
            compDc, compAc, compQ.map(quantTables(_)), compH, compV,
            restartInterval)
        case 0xDA => // progressive SOS — accumulate and continue to EOI
          val n = segLen(pos)
          require(sofSeen, "SOS before SOF")
          val ns = bytes(pos + 2) & 0xFF
          require(ns >= 1 && ns <= nc, s"bad scan component count $ns")
          val scanComps = new Array[Int](ns)
          val scanDc = new Array[HuffTable](ns)
          val scanAc = new Array[HuffTable](ns)
          val ss = bytes(pos + 3 + 2 * ns) & 0xFF
          val se = bytes(pos + 4 + 2 * ns) & 0xFF
          val ahal = bytes(pos + 5 + 2 * ns) & 0xFF
          val ah = ahal >> 4; val al = ahal & 0x0F
          if (ss == 0) require(se == 0,
            s"corrupt progressive scan: DC band must be 0..0, got 0..$se")
          else {
            require(ns == 1, "corrupt progressive scan: interleaved AC band")
            require(se >= ss && se <= 63, s"corrupt scan band $ss..$se")
          }
          require(ah == 0 || ah == al + 1,
            s"corrupt successive approximation Ah=$ah Al=$al")
          require(al <= 10, s"unsupported point transform Al=$al")
          var j = 0
          while (j < ns) {
            val id = bytes(pos + 3 + 2 * j) & 0xFF
            val ci = compIds.indexOf(id)
            require(ci >= 0, s"scan references unknown component id $id")
            scanComps(j) = ci
            val td = (bytes(pos + 4 + 2 * j) & 0xFF) >> 4
            val ta = bytes(pos + 4 + 2 * j) & 0x0F
            if (ss == 0 && ah == 0) {
              require(dcTables(td) != null, s"scan references missing DC table $td")
              scanDc(j) = dcTables(td)
            }
            if (ss > 0) {
              require(acTables(ta) != null, s"scan references missing AC table $ta")
              scanAc(j) = acTables(ta)
            }
            require(quantTables(compQ(ci)) != null,
              s"frame references missing quant table ${compQ(ci)}")
            j += 1
          }
          pos = decodeProgScan(
            bytes, pos + n, scanComps, scanDc, scanAc, ss, se, ah, al,
            progCoefs, gridW, gridH, specBW, specBH, compH, compV,
            mcuCols, mcuRows, restartInterval)
          progScans += 1
        case x if x == 0x01 || (x >= 0xD0 && x <= 0xD7) =>
          throw new IllegalArgumentException(
            f"standalone marker 0xFF$x%02X outside a scan")
        case x if (x >= 0xE0 && x <= 0xEF) || x == 0xFE => // APPn / COM
          pos += segLen(pos)
        case x =>
          throw new IllegalArgumentException(f"unsupported JPEG marker 0xFF$x%02X")
      }
    }
    throw new IllegalArgumentException(
      if (progressive) "truncated JPEG: no EOI after progressive scans"
      else "truncated JPEG: no SOS marker")
  }

  /** Advance from the end of an entropy-coded segment to the next marker
    * (skipping stuffed 0xFF00 pairs) — progressive files hold one such
    * segment per scan.
    */
  private def skipToMarker(bytes: Array[Byte], from: Int): Int = {
    var p = from
    while (p + 1 < bytes.length &&
      !((bytes(p) & 0xFF) == 0xFF && (bytes(p + 1) & 0xFF) != 0x00)) p += 1
    require(p + 1 < bytes.length, "truncated JPEG: entropy stream ran out")
    p
  }

  /** One progressive scan (T.81 Annex G decode): updates the coefficient
    * grids in place, returns the position of the next marker. DC scans
    * may interleave components in MCU order; AC scans are single-
    * component over its own ceil-dims block raster. EOB runs, ZRL
    * crossings and correction bits follow the spec's figure G.7 bit
    * ordering exactly (the encoder's mirror).
    */
  private def decodeProgScan(
      bytes: Array[Byte], start: Int,
      scanComps: Array[Int], scanDc: Array[HuffTable], scanAc: Array[HuffTable],
      ss: Int, se: Int, ah: Int, al: Int,
      coefs: Array[Array[Int]],
      gridW: Array[Int], gridH: Array[Int],
      specBW: Array[Int], specBH: Array[Int],
      compH: Array[Int], compV: Array[Int],
      mcuCols: Int, mcuRows: Int,
      restartInterval: Int): Int = {
    val r = new BitReader(bytes, start)
    val pred = new Array[Int](scanComps.length)
    var eobrun = 0
    var rst = 0
    val p1 = 1 << al

    def dcUnit(j: Int, c: Int, bi: Int): Unit =
      if (ah == 0) {
        val s = r.symbol(scanDc(j))
        require(s <= 11, s"corrupt JPEG: DC size $s")
        pred(j) += extend(r.bitsVal(s), s)
        require(math.abs(pred(j).toLong << al) <= 2048,
          s"corrupt JPEG: DC predictor ${pred(j)} out of 8-bit range")
        coefs(c)(bi * 64) = pred(j) << al
      } else {
        if (r.bit() == 1) coefs(c)(bi * 64) |= p1
      }

    def acFirst(c: Int, base: Int): Unit =
      if (eobrun > 0) eobrun -= 1
      else {
        var k = ss
        while (k <= se) {
          val rs = r.symbol(scanAc(0))
          val run = rs >> 4
          val s = rs & 0x0F
          if (s == 0) {
            if (run < 15) {
              eobrun = (1 << run) - 1
              if (run > 0) eobrun += r.bitsVal(run)
              k = 64 // band ends
            } else {
              k += 16 // ZRL
              require(k <= se + 1, "corrupt JPEG: ZRL past band end")
            }
          } else {
            require(s <= 10, s"corrupt JPEG: AC size $s")
            k += run
            require(k <= se, "corrupt JPEG: AC run past band end")
            coefs(c)(base + k) = extend(r.bitsVal(s), s) << al
            k += 1
          }
        }
      }

    def refineNonzero(c: Int, idx: Int): Unit =
      if (r.bit() == 1 && (coefs(c)(idx) & p1) == 0)
        coefs(c)(idx) += (if (coefs(c)(idx) >= 0) p1 else -p1)

    def acRefine(c: Int, base: Int): Unit = {
      var k = ss
      if (eobrun == 0) {
        var done = false
        while (k <= se && !done) {
          val rs = r.symbol(scanAc(0))
          var run = rs >> 4
          val s = rs & 0x0F
          var newval = 0
          if (s == 0) {
            if (run < 15) {
              eobrun = (1 << run) + (if (run > 0) r.bitsVal(run) else 0)
              done = true // tail below handles the rest of this band
            }
            // run == 15: ZRL — cross 16 zero-history coefficients
          } else {
            require(s == 1, s"corrupt JPEG: refinement AC size $s (must be 1)")
            newval = if (r.bit() == 1) p1 else -p1
          }
          if (!done) {
            var stop = false
            while (k <= se && !stop) {
              val idx = base + k
              if (coefs(c)(idx) != 0) {
                refineNonzero(c, idx)
                k += 1
              } else {
                run -= 1
                if (run < 0) stop = true else k += 1
              }
            }
            if (newval != 0) {
              require(k <= se, "corrupt JPEG: refinement run past band end")
              coefs(c)(base + k) = newval
            }
            k += 1
          }
        }
      }
      if (eobrun > 0) {
        while (k <= se) {
          val idx = base + k
          if (coefs(c)(idx) != 0) refineNonzero(c, idx)
          k += 1
        }
        eobrun -= 1
      }
    }

    def maybeRestart(unitsDone: Int, totalUnits: Int): Unit =
      if (restartInterval > 0 && unitsDone % restartInterval == 0 &&
        unitsDone < totalUnits) {
        r.restart(rst % 8)
        rst += 1
        java.util.Arrays.fill(pred, 0)
        eobrun = 0
      }

    if (ss == 0 && scanComps.length > 1) {
      // interleaved DC scan, MCU order over the padded grid
      val total = mcuCols * mcuRows
      var mcu = 0
      while (mcu < total) {
        val my = mcu / mcuCols; val mx = mcu % mcuCols
        var j = 0
        while (j < scanComps.length) {
          val c = scanComps(j)
          var by2 = 0
          while (by2 < compV(c)) {
            var bx2 = 0
            while (bx2 < compH(c)) {
              dcUnit(j, c, (my * compV(c) + by2) * gridW(c) + mx * compH(c) + bx2)
              bx2 += 1
            }
            by2 += 1
          }
          j += 1
        }
        mcu += 1
        maybeRestart(mcu, total)
      }
    } else {
      // single-component scan over the component's own block raster
      val c = scanComps(0)
      val total = specBW(c) * specBH(c)
      var b = 0
      while (b < total) {
        val by = b / specBW(c); val bx = b % specBW(c)
        val bi = by * gridW(c) + bx
        if (ss == 0) dcUnit(0, c, bi)
        else if (ah == 0) acFirst(c, bi * 64)
        else acRefine(c, bi * 64)
        b += 1
        maybeRestart(b, total)
      }
    }
    skipToMarker(bytes, r.pos)
  }

  /** Render the accumulated progressive coefficients: dequantize + IDCT
    * every grid block into component planes, then the shared upsample /
    * color-convert assembly — identical output math to the baseline path.
    */
  private def finishProgressive(
      width: Int, height: Int, nc: Int,
      coefs: Array[Array[Int]], q: Array[Array[Int]],
      gridW: Array[Int], gridH: Array[Int],
      compH: Array[Int], compV: Array[Int]): BmpCodec.Bmp = {
    val planeW = Array.tabulate(nc)(c => gridW(c) * 8)
    val planes = Array.tabulate(nc)(c => new Array[Int](planeW(c) * gridH(c) * 8))
    val coefRaster = new Array[Long](64)
    val block = new Array[Int](64)
    var c = 0
    while (c < nc) {
      var bi = 0
      val nBlocks = gridW(c) * gridH(c)
      while (bi < nBlocks) {
        val base = bi * 64
        var k = 0
        while (k < 64) {
          coefRaster(Zigzag(k)) = coefs(c)(base + k).toLong * q(c)(Zigzag(k))
          k += 1
        }
        Fix.idct(coefRaster, block)
        val rowBase = (bi / gridW(c)) * 8
        val colBase = (bi % gridW(c)) * 8
        var j = 0
        while (j < 64) {
          planes(c)((rowBase + j / 8) * planeW(c) + colBase + j % 8) = block(j)
          j += 1
        }
        bi += 1
      }
      c += 1
    }
    assemble(planes, planeW, width, height, nc, compH, compV)
  }

  private def decodeScan(
      bytes: Array[Byte], start: Int,
      width: Int, height: Int, nc: Int,
      dcT: Array[HuffTable], acT: Array[HuffTable],
      q: Array[Array[Int]], compH: Array[Int], compV: Array[Int],
      restartInterval: Int): BmpCodec.Bmp = {
    val hMax = compH.max; val vMax = compV.max
    val mcuCols = (width + 8 * hMax - 1) / (8 * hMax)
    val mcuRows = (height + 8 * vMax - 1) / (8 * vMax)
    // per-component plane, padded to whole MCUs at the component's own
    // sampling resolution (4:2:0 chroma planes are quarter-sized)
    val planeW = Array.tabulate(nc)(c => mcuCols * 8 * compH(c))
    val planes = Array.tabulate(nc)(c =>
      new Array[Int](planeW(c) * mcuRows * 8 * compV(c)))
    val pred = new Array[Int](nc)
    val coef = new Array[Long](64)
    val block = new Array[Int](64)
    val r = new BitReader(bytes, start)
    val totalMcu = mcuRows * mcuCols
    var mcuDone = 0
    var rst = 0

    var my = 0
    while (my < mcuRows) {
      var mx = 0
      while (mx < mcuCols) {
        var c = 0
        while (c < nc) {
          // component c contributes compH(c)×compV(c) blocks per MCU,
          // raster order within the MCU (T.81 interleave)
          var by2 = 0
          while (by2 < compV(c)) {
            var bx2 = 0
            while (bx2 < compH(c)) {
              java.util.Arrays.fill(coef, 0L)
              // DC
              val s = r.symbol(dcT(c))
              require(s <= 11, s"corrupt JPEG: DC size $s")
              pred(c) += extend(r.bitsVal(s), s)
              // a legit 8-bit stream keeps the cumulative DC in
              // [-1024, 1016] at ANY quantizer (F00 = 8·mean of
              // level-shifted samples); 2048 is generous slack. Without
              // this, a crafted max-diff stream over ~10^6 blocks wraps
              // the Int predictor and overflows the IDCT's Long
              // accumulator into silent garbage — the containment
              // contract says corruption fails LOUDLY instead.
              require(math.abs(pred(c)) <= 2048,
                s"corrupt JPEG: DC predictor ${pred(c)} out of 8-bit range")
              coef(0) = pred(c).toLong * q(c)(0)
              // AC
              var k = 1
              while (k < 64) {
                val rs = r.symbol(acT(c))
                val run = rs >> 4
                val size = rs & 0x0F
                if (size == 0) {
                  if (rs == 0x00) k = 64 // EOB
                  else if (rs == 0xF0) {
                    k += 16 // ZRL: sixteen zeros (landing exactly on 64 is legal)
                    require(k <= 64, "corrupt JPEG: ZRL past block end")
                  } else throw new IllegalArgumentException(
                    f"corrupt JPEG: bad AC symbol 0x$rs%02X")
                } else {
                  // 8-bit baseline AC categories stop at 10 (T.81 F.1.2.2);
                  // 11-15 would feed ±32767 coefficients into the IDCT
                  require(size <= 10, s"corrupt JPEG: AC size $size")
                  k += run
                  require(k < 64, "corrupt JPEG: AC run past block end")
                  val v = extend(r.bitsVal(size), size)
                  coef(Zigzag(k)) = v.toLong * q(c)(Zigzag(k))
                  k += 1
                }
              }
              Fix.idct(coef, block)
              val plane = planes(c)
              val rowBase = (my * compV(c) + by2) * 8
              val colBase = (mx * compH(c) + bx2) * 8
              var j = 0
              while (j < 64) {
                plane((rowBase + j / 8) * planeW(c) + colBase + j % 8) = block(j)
                j += 1
              }
              bx2 += 1
            }
            by2 += 1
          }
          c += 1
        }
        mcuDone += 1
        if (restartInterval > 0 && mcuDone % restartInterval == 0 &&
          mcuDone < totalMcu) {
          // byte-align, require the cycling RSTm, reset all DC predictors
          r.restart(rst % 8)
          rst += 1
          java.util.Arrays.fill(pred, 0)
        }
        mx += 1
      }
      my += 1
    }

    assemble(planes, planeW, width, height, nc, compH, compV)
  }

  /** Component planes → output pixels: the sample for pixel (x, y) sits
    * at the component's own resolution (x·h/hMax, y·v/vMax) — identity
    * for 1x1 layouts, nearest (replicated) upsampling for 4:2:0 chroma.
    * Shared by the baseline and progressive render paths.
    */
  private def assemble(
      planes: Array[Array[Int]], planeW: Array[Int],
      width: Int, height: Int, nc: Int,
      compH: Array[Int], compV: Array[Int]): BmpCodec.Bmp = {
    val hMax = compH.max; val vMax = compV.max
    val pixels = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val p =
          if (nc == 1) {
            val v = planes(0)(y * planeW(0) + x)
            (v << 16) | (v << 8) | v
          } else {
            val yv = planes(0)(
              (y * compV(0) / vMax) * planeW(0) + x * compH(0) / hMax)
            val cb = planes(1)(
              (y * compV(1) / vMax) * planeW(1) + x * compH(1) / hMax)
            val cr = planes(2)(
              (y * compV(2) / vMax) * planeW(2) + x * compH(2) / hMax)
            val (rr, gg, bb) = yccToRgb(yv, cb, cr)
            (rr << 16) | (gg << 8) | bb
          }
        pixels(y * width + x) = p
        x += 1
      }
      y += 1
    }
    BmpCodec.Bmp(width, height, pixels)
  }
}
