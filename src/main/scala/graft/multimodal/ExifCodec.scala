package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.ISO_8859_1

/** EXIF metadata over JPEG APP1 (TIFF/Exif, CIPA DC-008 / TIFF 6.0) —
  * the image-curation privacy surface: crawled photos carry camera
  * orientation (needed to decode geometry right), timestamps, and GPS
  * COORDINATES, and a training pipeline must be able to (a) READ them to
  * route/normalize and (b) STRIP them before the image enters a corpus
  * (geo PII removal — the standard "strip metadata" pass). The strip is
  * a pure marker-segment filter: APP1/COM segments drop, everything
  * from SOS on is untouched, so the decoded pixels are bit-identical —
  * asserted, not assumed.
  *
  * Writer emits the canonical little-endian layout (header, IFD0 with
  * ascending tags, values area, GPS IFD); the parser additionally
  * accepts big-endian ("MM") TIFF and values-by-offset vs in-entry —
  * the shapes real cameras emit. Malformed EXIF throws typed
  * IllegalArgumentException (quarantine discipline); a JPEG without
  * EXIF sniffs to the absent record, not an error.
  */
object ExifCodec {

  final case class Gps(
      latRef: String, latDeg: Long, latMin: Long, latSecMilli: Long,
      lonRef: String, lonDeg: Long, lonMin: Long, lonSecMilli: Long)

  final case class Exif(
      orientation: Option[Int],
      dateTime: Option[String],
      gps: Option[Gps])

  // ---------------------------------------------------------------- write

  private def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def entry(tag: Int, typ: Int, count: Long, value: Array[Byte]): Array[Byte] = {
    require(value.length == 4, "entry value field must be 4 bytes")
    le16(tag) ++ le16(typ) ++ le32(count) ++ value
  }

  private def rational(num: Long, den: Long): Array[Byte] = le32(num) ++ le32(den)

  /** Build the APP1 payload ("Exif\0\0" + TIFF): IFD0 carries
    * Orientation (0x0112), DateTime (0x0132, 20-char ASCII), and — when
    * `gps` is set — the GPSInfo pointer (0x8825) to a GPS IFD with
    * ref/deg/min/sec-milli rationals for both axes.
    */
  def buildApp1(orientation: Int, dateTime: String, gps: Option[Gps]): Array[Byte] = {
    require(dateTime.length == 19, "EXIF DateTime must be 'YYYY:MM:DD HH:MM:SS'")
    val n0 = 2 + (if (gps.isDefined) 1 else 0)
    val ifd0Size = 2 + n0 * 12 + 4
    val dtOff = 8 + ifd0Size // values area right after IFD0
    val gpsIfdOff = dtOff + 20
    val out = new ByteArrayOutputStream()
    out.write("Exif\u0000\u0000".getBytes(ISO_8859_1))
    out.write("II".getBytes(ISO_8859_1)); out.write(le16(42)); out.write(le32(8))
    // IFD0, tags ascending
    out.write(le16(n0))
    out.write(entry(0x0112, 3, 1, le16(orientation) ++ Array[Byte](0, 0)))
    out.write(entry(0x0132, 2, 20, le32(dtOff.toLong)))
    gps.foreach(_ => out.write(entry(0x8825, 4, 1, le32(gpsIfdOff.toLong))))
    out.write(le32(0)) // no next IFD
    out.write((dateTime + "\u0000").getBytes(ISO_8859_1))
    gps.foreach { g =>
      val nG = 4
      val gpsIfdSize = 2 + nG * 12 + 4
      val latOff = gpsIfdOff + gpsIfdSize
      val lonOff = latOff + 24
      out.write(le16(nG))
      out.write(entry(0x0001, 2, 2, (g.latRef + "\u0000").getBytes(ISO_8859_1) ++ Array[Byte](0, 0)))
      out.write(entry(0x0002, 5, 3, le32(latOff.toLong)))
      out.write(entry(0x0003, 2, 2, (g.lonRef + "\u0000").getBytes(ISO_8859_1) ++ Array[Byte](0, 0)))
      out.write(entry(0x0004, 5, 3, le32(lonOff.toLong)))
      out.write(le32(0))
      out.write(rational(g.latDeg, 1)); out.write(rational(g.latMin, 1))
      out.write(rational(g.latSecMilli, 1000))
      out.write(rational(g.lonDeg, 1)); out.write(rational(g.lonMin, 1))
      out.write(rational(g.lonSecMilli, 1000))
    }
    out.toByteArray
  }

  /** Insert an APP1 segment into a JPEG right after SOI (before any
    * other segment — the position cameras use).
    */
  def insertApp1(jpeg: Array[Byte], app1Payload: Array[Byte]): Array[Byte] = {
    require(jpeg.length >= 2 && (jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8,
      "exif: not a JPEG (missing SOI)")
    val out = new ByteArrayOutputStream(jpeg.length + app1Payload.length + 4)
    out.write(jpeg, 0, 2)
    out.write(0xff); out.write(0xe1)
    val len = app1Payload.length + 2
    out.write((len >> 8) & 0xff); out.write(len & 0xff)
    out.write(app1Payload)
    out.write(jpeg, 2, jpeg.length - 2)
    out.toByteArray
  }

  // ---------------------------------------------------------------- strip

  /** Drop every APP1 (EXIF/XMP) and COM segment before SOS; bytes from
    * SOS on (entropy data, EOI) copy verbatim — the pixels cannot
    * change. The metadata-privacy pass.
    */
  def stripMetadata(jpeg: Array[Byte]): Array[Byte] = {
    require(jpeg.length >= 2 && (jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8,
      "exif: not a JPEG (missing SOI)")
    val out = new ByteArrayOutputStream(jpeg.length)
    out.write(jpeg, 0, 2)
    var p = 2
    var done = false
    while (!done) {
      require(p + 4 <= jpeg.length, "exif: truncated segment header")
      require((jpeg(p) & 0xff) == 0xff, f"exif: expected marker at byte $p")
      val m = jpeg(p + 1) & 0xff
      if (m == 0xda) { // SOS: rest is entropy data — copy verbatim
        out.write(jpeg, p, jpeg.length - p)
        done = true
      } else {
        val len = ((jpeg(p + 2) & 0xff) << 8) | (jpeg(p + 3) & 0xff)
        require(p + 2 + len <= jpeg.length, "exif: segment overruns file")
        if (m != 0xe1 && m != 0xfe) out.write(jpeg, p, 2 + len)
        p += 2 + len
      }
    }
    out.toByteArray
  }

  // ---------------------------------------------------------------- sniff

  /** Count APP1 segments (cheap pre/post-strip audit). */
  def countApp1(jpeg: Array[Byte]): Int = {
    var p = 2; var n = 0
    while (p + 4 <= jpeg.length && (jpeg(p) & 0xff) == 0xff && (jpeg(p + 1) & 0xff) != 0xda) {
      if ((jpeg(p + 1) & 0xff) == 0xe1) n += 1
      p += 2 + (((jpeg(p + 2) & 0xff) << 8) | (jpeg(p + 3) & 0xff))
    }
    n
  }

  /** Parse the first EXIF APP1 of a JPEG; `Exif(None, None, None)` when
    * the file carries none. Accepts both byte orders; malformed TIFF
    * structures throw typed.
    */
  def sniff(jpeg: Array[Byte]): Exif = {
    require(jpeg.length >= 2 && (jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8,
      "exif: not a JPEG (missing SOI)")
    var p = 2
    while (p + 4 <= jpeg.length && (jpeg(p) & 0xff) == 0xff && (jpeg(p + 1) & 0xff) != 0xda) {
      val m = jpeg(p + 1) & 0xff
      val len = ((jpeg(p + 2) & 0xff) << 8) | (jpeg(p + 3) & 0xff)
      require(p + 2 + len <= jpeg.length, "exif: segment overruns file")
      if (m == 0xe1 && len >= 8 &&
        new String(jpeg, p + 4, 6, ISO_8859_1) == "Exif\u0000\u0000")
        return parseTiff(jpeg, p + 10, len - 8)
      p += 2 + len
    }
    Exif(None, None, None)
  }

  private def parseTiff(b: Array[Byte], off: Int, size: Int): Exif = {
    require(size >= 8, "exif: truncated TIFF header")
    val order = new String(b, off, 2, ISO_8859_1)
    val le = order match {
      case "II" => true
      case "MM" => false
      case o => throw new IllegalArgumentException(s"exif: bad TIFF byte order '$o'")
    }
    def u16(q: Int): Int = {
      require(q + 2 <= off + size, "exif: read past TIFF end")
      if (le) (b(q) & 0xff) | ((b(q + 1) & 0xff) << 8)
      else ((b(q) & 0xff) << 8) | (b(q + 1) & 0xff)
    }
    def u32(q: Int): Long = {
      require(q + 4 <= off + size, "exif: read past TIFF end")
      if (le) (b(q) & 0xffL) | ((b(q + 1) & 0xffL) << 8) |
        ((b(q + 2) & 0xffL) << 16) | ((b(q + 3) & 0xffL) << 24)
      else ((b(q) & 0xffL) << 24) | ((b(q + 1) & 0xffL) << 16) |
        ((b(q + 2) & 0xffL) << 8) | (b(q + 3) & 0xffL)
    }
    require(u16(off + 2) == 42, "exif: bad TIFF magic")
    final case class Ent(tag: Int, typ: Int, count: Long, at: Int)
    def readIfd(ifdOff: Long): Seq[Ent] = {
      val base = off + ifdOff.toInt
      val n = u16(base)
      (0 until n).map { i =>
        val e = base + 2 + i * 12
        Ent(u16(e), u16(e + 2), u32(e + 4), e + 8)
      }
    }
    def valueOff(e: Ent): Int = {
      val byteLen = e.typ match {
        case 1 | 2 | 7 => 1
        case 3 => 2
        case 4 => 4
        case 5 | 10 => 8
        case t => throw new IllegalArgumentException(s"exif: unsupported TIFF type $t")
      }
      if (byteLen * e.count <= 4) e.at else off + u32(e.at).toInt
    }
    def ascii(e: Ent): String = {
      val v = valueOff(e)
      val raw = new String(b, v, e.count.toInt, ISO_8859_1)
      raw.takeWhile(_ != '\u0000')
    }
    def rationals(e: Ent): Seq[(Long, Long)] = {
      val v = valueOff(e)
      (0 until e.count.toInt).map(i => (u32(v + i * 8), u32(v + i * 8 + 4)))
    }
    val ifd0 = readIfd(u32(off + 4))
    val orientation = ifd0.find(_.tag == 0x0112).map(e => u16(valueOff(e)))
    val dateTime = ifd0.find(_.tag == 0x0132).map(ascii)
    val gps = ifd0.find(_.tag == 0x8825).map { ptr =>
      val g = readIfd(u32(valueOff(ptr))).map(e => e.tag -> e).toMap
      def axis(refTag: Int, valTag: Int): (String, Long, Long, Long) = {
        val ref = g.get(refTag).map(ascii).getOrElse(
          throw new IllegalArgumentException("exif: GPS ref missing"))
        val rs = g.get(valTag).map(rationals).getOrElse(
          throw new IllegalArgumentException("exif: GPS coordinate missing"))
        require(rs.length == 3 && rs.forall(_._2 != 0), "exif: bad GPS rationals")
        // normalize to (deg, min, sec-milli): the writer's exact layout
        // (d/1, m/1, s/1000); other denominators reduce via * 1000 / den
        (ref, rs(0)._1 * 1 / rs(0)._2, rs(1)._1 / rs(1)._2,
          rs(2)._1 * 1000L / rs(2)._2)
      }
      val (laR, laD, laM, laS) = axis(0x0001, 0x0002)
      val (loR, loD, loM, loS) = axis(0x0003, 0x0004)
      Gps(laR, laD, laM, laS, loR, loD, loM, loS)
    }
    Exif(orientation, dateTime, gps)
  }
}
