package graft.ingest

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import java.util.zip.{CRC32, Deflater, Inflater}

/** WARC (Web ARChive, ISO 28500 / the WARC/1.0-1.1 spec) reader + writer —
  * the container every web-crawl corpus ships in (Common Crawl publishes
  * ~100 TB of exactly these files per snapshot), and therefore the intake
  * front door of a crawl-fed training pipeline. Pure JVM, zero deps: gzip
  * members go through [[java.util.zip.Inflater]]/[[java.util.zip.Deflater]]
  * with a hand-parsed RFC 1952 header/trailer, because record-level
  * splitting needs MEMBER BOUNDARIES and `GZIPInputStream` hides them.
  *
  * Framing (spec §4): each record is a version line (`WARC/1.0`), named
  * fields (`Name: value` — `Content-Length` is mandatory and counts the
  * BLOCK only), one empty line, the block, then exactly two CRLFs. The
  * Common Crawl convention compresses EACH RECORD AS ITS OWN GZIP MEMBER
  * and concatenates the members — that per-record independence is what
  * makes a 1 GB .warc.gz splittable: any task that can find a member
  * boundary can start parsing there with no upstream state. [[memberOffsets]]
  * is that split map (the AVI `frameOffsets` contract: offsets are the
  * interface, ranged reads are the transport), and [[splitPoints]] recovers
  * boundaries from an ARBITRARY byte range by magic-scan + bounded-inflate
  * validation, so a cluster can split on naive byte ranges without any
  * driver-side pre-pass at all.
  *
  * Malformed input throws IllegalArgumentException with a typed message —
  * the quarantine discipline shared with the media codecs (crawled
  * archives are hostile input; a torn record must land in the quarantine
  * table, not take down the batch).
  *
  * Reference behavior anchor: the reference system ingests only ZIP'd CSV
  * (data_processing.py:69's zipfile walk); WARC is the beyond-reference
  * crawl-intake analog of that same "open container, pull the payload,
  * validate, route" loop.
  */
object WarcCodec {

  /** One WARC record: the named fields a pipeline routes on, the full
    * header list in file order (fidelity for audit/rewrite), and the raw
    * block bytes.
    */
  final case class WarcRecord(
      warcType: String,
      recordId: String,
      targetUri: Option[String],
      date: String,
      contentType: String,
      headers: Seq[(String, String)],
      block: Array[Byte])

  /** An HTTP response message split out of a `response` record's block:
    * status + headers + body (the entity a text pipeline actually wants).
    */
  final case class HttpResponse(
      status: Int,
      reason: String,
      headers: Seq[(String, String)],
      contentType: Option[String],
      body: Array[Byte])

  private val CRLF = "\r\n".getBytes(ISO_8859_1)

  // ---------------------------------------------------------------- write

  /** Serialize one record (uncompressed framing). Field order: the four
    * routing fields first, then any extras, then Content-Length — fixed
    * order keeps output byte-deterministic for tests and oracles.
    */
  def writeRecord(r: WarcRecord): Array[Byte] = {
    val out = new ByteArrayOutputStream(r.block.length + 256)
    def line(s: String): Unit = { out.write(s.getBytes(UTF_8)); out.write(CRLF) }
    line("WARC/1.0")
    line(s"WARC-Type: ${r.warcType}")
    line(s"WARC-Record-ID: ${r.recordId}")
    line(s"WARC-Date: ${r.date}")
    r.targetUri.foreach(u => line(s"WARC-Target-URI: $u"))
    line(s"Content-Type: ${r.contentType}")
    r.headers.foreach { case (k, v) =>
      if (!reservedHeader(k)) line(s"$k: $v")
    }
    line(s"Content-Length: ${r.block.length}")
    out.write(CRLF)
    out.write(r.block)
    out.write(CRLF); out.write(CRLF)
    out.toByteArray
  }

  private def reservedHeader(k: String): Boolean = {
    val l = k.toLowerCase
    l == "warc-type" || l == "warc-record-id" || l == "warc-date" ||
      l == "warc-target-uri" || l == "content-type" || l == "content-length"
  }

  /** Serialize a whole file. `gzipPerRecord = true` is the Common Crawl
    * shape (one gzip member per record, members concatenated — splittable);
    * `false` writes the plain concatenation (the uncompressed .warc shape).
    */
  def build(records: Seq[WarcRecord], gzipPerRecord: Boolean = true): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    records.foreach { r =>
      val raw = writeRecord(r)
      out.write(if (gzipPerRecord) gzipMember(raw) else raw)
    }
    out.toByteArray
  }

  /** One RFC 1952 gzip member: minimal 10-byte header (no name/extra,
    * MTIME = 0 for byte determinism), raw deflate body, CRC32 + ISIZE
    * trailer.
    */
  def gzipMember(raw: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(raw.length / 2 + 64)
    out.write(Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0))
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    val crc = new CRC32(); crc.update(raw)
    writeLe32(out, crc.getValue); writeLe32(out, raw.length.toLong)
    out.toByteArray
  }

  private def writeLe32(out: ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
    out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
  }

  // ---------------------------------------------------------------- gzip

  /** True iff the bytes open with the gzip magic. */
  def isGzip(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && bytes(0) == 0x1f.toByte && bytes(1) == 0x8b.toByte

  /** Inflate ONE gzip member starting at `off`; returns (decompressed,
    * compressed member length). Parses the RFC 1952 header by hand
    * (FEXTRA/FNAME/FCOMMENT/FHCRC all handled — crawled archives carry
    * them) and VERIFIES the CRC32 + ISIZE trailer: a torn or corrupted
    * member throws here, not as garbage records downstream.
    */
  def inflateMember(bytes: Array[Byte], off: Int): (Array[Byte], Int) = {
    val dataOff = memberDataOffset(bytes, off)
    val inf = new Inflater(true)
    inf.setInput(bytes, dataOff, bytes.length - dataOff)
    // pre-size for the TYPICAL member (one record, a few KiB), never from
    // the remaining-file length: a per-record-gzipped archive calls this
    // once per member, and a file-sized hint would allocate O(file) bytes
    // per member — O(file²) churn across the walk
    val out = new ByteArrayOutputStream(8192)
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput())
          throw new IllegalArgumentException("warc: truncated gzip member (deflate ran dry)")
        out.write(buf, 0, n)
      }
      val raw = out.toByteArray
      val trailerOff = dataOff + inf.getBytesRead.toInt
      if (trailerOff + 8 > bytes.length)
        throw new IllegalArgumentException("warc: truncated gzip member (missing trailer)")
      val crc = new CRC32(); crc.update(raw)
      if (readLe32(bytes, trailerOff) != crc.getValue)
        throw new IllegalArgumentException("warc: gzip member CRC mismatch")
      if (readLe32(bytes, trailerOff + 4) != (raw.length.toLong & 0xffffffffL))
        throw new IllegalArgumentException("warc: gzip member ISIZE mismatch")
      (raw, trailerOff + 8 - off)
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException(s"warc: corrupt deflate stream (${e.getMessage})")
    } finally inf.end()
  }

  /** Offset of the deflate data within a member at `off` (after the RFC
    * 1952 header + optional fields).
    */
  private def memberDataOffset(bytes: Array[Byte], off: Int): Int = {
    require(off + 10 <= bytes.length, "warc: truncated gzip header")
    require(bytes(off) == 0x1f.toByte && bytes(off + 1) == 0x8b.toByte,
      "warc: bad gzip magic")
    require(bytes(off + 2) == 8, s"warc: unsupported gzip method ${bytes(off + 2)}")
    val flg = bytes(off + 3) & 0xff
    var p = off + 10
    if ((flg & 4) != 0) { // FEXTRA
      require(p + 2 <= bytes.length, "warc: truncated FEXTRA")
      val xlen = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
      p += 2 + xlen
    }
    if ((flg & 8) != 0) p = skipZeroTerminated(bytes, p) // FNAME
    if ((flg & 16) != 0) p = skipZeroTerminated(bytes, p) // FCOMMENT
    if ((flg & 2) != 0) p += 2 // FHCRC
    require(p <= bytes.length, "warc: truncated gzip header fields")
    p
  }

  private def skipZeroTerminated(bytes: Array[Byte], from: Int): Int = {
    var p = from
    while (p < bytes.length && bytes(p) != 0) p += 1
    require(p < bytes.length, "warc: unterminated gzip header string")
    p + 1
  }

  private def readLe32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  /** The split map of a per-record-gzipped WARC: (offset, compressedLen)
    * of every member, by walking member-to-member from byte 0. O(file)
    * ONCE driver-side, then each (offset, len) is an independent ranged
    * read + [[parseMemberAt]] — the contract that lets 32 tasks (or 1000
    * executors) share one 1 GB .warc.gz.
    */
  def memberOffsets(bytes: Array[Byte]): Array[(Int, Int)] = {
    require(isGzip(bytes), "warc: memberOffsets needs a gzipped warc")
    val offs = Array.newBuilder[(Int, Int)]
    var p = 0
    while (p < bytes.length) {
      val (_, clen) = inflateMember(bytes, p)
      offs += ((p, clen))
      p += clen
    }
    offs.result()
  }

  /** Recover member boundaries from an ARBITRARY byte range [from, to) —
    * no driver pre-pass: scan for the gzip magic, validate each candidate
    * by bounded inflate (first bytes must decompress to `WARC/`), claim
    * members whose START lies in the range (a member spanning `to` belongs
    * to the task that owns its start — the standard split-ownership rule,
    * so ranges tile the file with no record read twice or dropped).
    */
  def splitPoints(bytes: Array[Byte], from: Int, to: Int): Array[Int] = {
    val pts = Array.newBuilder[Int]
    var p = math.max(from, 0)
    val end = math.min(to, bytes.length)
    while (p < end) {
      if (p + 3 <= bytes.length && bytes(p) == 0x1f.toByte &&
        bytes(p + 1) == 0x8b.toByte && bytes(p + 2) == 8 && validMemberAt(bytes, p)) {
        // skip the whole member: a deflate body can contain 1f 8b 08.
        // A candidate can pass the 5-byte prefix probe yet fail the full
        // inflate/CRC (hostile or corrupt data) — that is NOT a member:
        // drop it and resume scanning one byte on, so a false positive
        // can't abort the whole range scan.
        try {
          val (_, clen) = inflateMember(bytes, p)
          pts += p
          p += clen
        } catch { case _: IllegalArgumentException => p += 1 }
      } else p += 1
    }
    pts.result()
  }

  /** Cheap candidate validation: inflate just enough of the member at
    * `off` to check the decompressed prefix is `WARC/`. False positives
    * from magic bytes inside a deflate body fail either the header walk,
    * the inflate, or the prefix check.
    */
  private def validMemberAt(bytes: Array[Byte], off: Int): Boolean =
    try {
      val dataOff = memberDataOffset(bytes, off)
      val inf = new Inflater(true)
      try {
        inf.setInput(bytes, dataOff, math.min(bytes.length - dataOff, 4096))
        val buf = new Array[Byte](5)
        var got = 0
        var stalled = false
        while (got < 5 && !inf.finished() && !stalled) {
          val n = inf.inflate(buf, got, 5 - got)
          if (n == 0) stalled = true else got += n
        }
        got == 5 && new String(buf, ISO_8859_1) == "WARC/"
      } finally inf.end()
    } catch { case _: Exception => false }

  /** Parse the single record in the gzip member at `offset` — the
    * range-parallel unit ([[AviCodec.decodeFrameAt]]'s contract).
    */
  def parseMemberAt(bytes: Array[Byte], offset: Int): WarcRecord = {
    val (raw, _) = inflateMember(bytes, offset)
    val (rec, next) = parseRecordAt(raw, 0)
    require(next >= raw.length, "warc: gzip member holds more than one record")
    rec
  }

  // ---------------------------------------------------------------- parse

  /** Parse a whole WARC file (gzipped — any member granularity — or
    * plain) into records, in file order.
    */
  def parse(bytes: Array[Byte]): Seq[WarcRecord] = {
    val raw =
      if (isGzip(bytes)) {
        val out = new ByteArrayOutputStream(
          math.min(bytes.length.toLong * 3L, 1L << 26).toInt)
        var p = 0
        while (p < bytes.length) {
          val (d, clen) = inflateMember(bytes, p)
          out.write(d)
          p += clen
        }
        out.toByteArray
      } else bytes
    val recs = Seq.newBuilder[WarcRecord]
    var p = 0
    while (p < raw.length) {
      val (rec, next) = parseRecordAt(raw, p)
      recs += rec
      p = next
    }
    recs.result()
  }

  /** Parse one record at `p` in DECOMPRESSED bytes; returns (record,
    * offset after its trailing CRLF CRLF).
    */
  private def parseRecordAt(raw: Array[Byte], p0: Int): (WarcRecord, Int) = {
    var p = p0
    val (version, p1) = readLine(raw, p)
    require(version == "WARC/1.0" || version == "WARC/1.1",
      s"warc: bad version line '${version.take(20)}'")
    p = p1
    val headers = Seq.newBuilder[(String, String)]
    var done = false
    while (!done) {
      val (line, pn) = readLine(raw, p)
      p = pn
      if (line.isEmpty) done = true
      else {
        val i = line.indexOf(':')
        require(i > 0, s"warc: malformed header line '${line.take(40)}'")
        headers += ((line.substring(0, i).trim, line.substring(i + 1).trim))
      }
    }
    val hs = headers.result()
    def field(n: String): Option[String] =
      hs.collectFirst { case (k, v) if k.equalsIgnoreCase(n) => v }
    val len = field("Content-Length")
      .getOrElse(throw new IllegalArgumentException("warc: missing Content-Length"))
      .toInt
    require(len >= 0 && p + len <= raw.length, "warc: block overruns file")
    val block = java.util.Arrays.copyOfRange(raw, p, p + len)
    p += len
    require(p + 4 <= raw.length &&
      raw(p) == '\r' && raw(p + 1) == '\n' && raw(p + 2) == '\r' && raw(p + 3) == '\n',
      "warc: record not terminated by CRLF CRLF")
    p += 4
    val rec = WarcRecord(
      warcType = field("WARC-Type").getOrElse(
        throw new IllegalArgumentException("warc: missing WARC-Type")),
      recordId = field("WARC-Record-ID").getOrElse(""),
      targetUri = field("WARC-Target-URI"),
      date = field("WARC-Date").getOrElse(""),
      contentType = field("Content-Type").getOrElse(""),
      headers = hs,
      block = block)
    (rec, p)
  }

  private def readLine(raw: Array[Byte], from: Int): (String, Int) = {
    var p = from
    while (p + 1 < raw.length && !(raw(p) == '\r' && raw(p + 1) == '\n')) p += 1
    require(p + 1 < raw.length, "warc: unterminated header line")
    (new String(raw, from, p - from, UTF_8), p + 2)
  }

  // ---------------------------------------------------------------- http

  /** Split an `application/http;msgtype=response` block into status +
    * headers + entity body. Tolerant where crawls are dirty (missing
    * reason phrase, LF-only header endings are NOT tolerated — WARC
    * blocks are captured wire bytes, CRLF by construction), strict where
    * routing correctness needs it (parsable status line).
    */
  def parseHttpResponse(block: Array[Byte]): HttpResponse = {
    def lineEnd(from: Int): Int = {
      var q = from
      while (q + 1 < block.length && !(block(q) == '\r' && block(q + 1) == '\n')) q += 1
      if (q + 1 < block.length) q else block.length
    }
    val e0 = lineEnd(0)
    val statusLine = new String(block, 0, e0, UTF_8)
    val p1 = math.min(e0 + 2, block.length)
    val parts = statusLine.split(" ", 3)
    require(parts.length >= 2 && parts(0).startsWith("HTTP/"),
      s"warc: bad http status line '${statusLine.take(40)}'")
    val status = parts(1).toInt
    val reason = if (parts.length == 3) parts(2) else ""
    val headers = Seq.newBuilder[(String, String)]
    var p = p1
    var done = false
    while (!done && p < block.length) {
      if (p + 1 < block.length && block(p) == '\r' && block(p + 1) == '\n') {
        p += 2; done = true
      } else {
        var q = p
        while (q + 1 < block.length && !(block(q) == '\r' && block(q + 1) == '\n')) q += 1
        require(q + 1 < block.length, "warc: unterminated http header")
        val line = new String(block, p, q - p, UTF_8)
        val i = line.indexOf(':')
        require(i > 0, s"warc: malformed http header '${line.take(40)}'")
        headers += ((line.substring(0, i).trim, line.substring(i + 1).trim))
        p = q + 2
      }
    }
    val hs = headers.result()
    val body = java.util.Arrays.copyOfRange(block, p, block.length)
    val ct = hs.collectFirst { case (k, v) if k.equalsIgnoreCase("Content-Type") => v }
    HttpResponse(status, reason, hs, ct, body)
  }

  /** Decode the ENTITY of a captured response: real crawls store wire
    * bytes, so the body is frequently `Transfer-Encoding: chunked`
    * framing and/or a `Content-Encoding: gzip` stream — feeding either
    * raw to text extraction poisons the corpus with framing bytes.
    * Transfer coding is undone FIRST (it is applied last on the wire),
    * then content coding; the CRC-verified gzip path is
    * [[inflateMember]]. Unknown codings throw typed (quarantine, not
    * silent garbage).
    */
  def decodeEntity(h: HttpResponse): Array[Byte] = {
    def header(n: String): Option[String] =
      h.headers.collectFirst { case (k, v) if k.equalsIgnoreCase(n) => v }
    var body = h.body
    header("Transfer-Encoding").foreach { te =>
      te.toLowerCase.trim match {
        case "chunked" => body = dechunk(body)
        case "identity" => ()
        case other =>
          throw new IllegalArgumentException(s"warc: unsupported transfer-encoding '$other'")
      }
    }
    header("Content-Encoding").foreach { ce =>
      ce.toLowerCase.trim match {
        case "gzip" | "x-gzip" => body = inflateMember(body, 0)._1
        case "identity" => ()
        case other =>
          throw new IllegalArgumentException(s"warc: unsupported content-encoding '$other'")
      }
    }
    body
  }

  /** Undo chunked transfer framing: hex-size line (chunk extensions
    * after `;` ignored per RFC 9112), CRLF, data, CRLF, …, 0-size chunk,
    * optional trailer section, final CRLF. Malformed framing throws
    * typed.
    */
  private def dechunk(b: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(b.length)
    var p = 0
    var done = false
    def line(): String = {
      var q = p
      while (q + 1 < b.length && !(b(q) == '\r' && b(q + 1) == '\n')) q += 1
      require(q + 1 < b.length, "warc: unterminated chunk-size line")
      val s = new String(b, p, q - p, ISO_8859_1)
      p = q + 2
      s
    }
    while (!done) {
      val sizeStr = line().split(";", 2)(0).trim
      require(sizeStr.nonEmpty && sizeStr.forall(c =>
        Character.digit(c, 16) >= 0), s"warc: bad chunk size '${sizeStr.take(16)}'")
      val size = java.lang.Long.parseLong(sizeStr, 16)
      require(size >= 0 && size <= Int.MaxValue, "warc: absurd chunk size")
      if (size == 0) {
        // trailer section: header lines until the final empty line
        var trailerDone = false
        while (!trailerDone) {
          if (p >= b.length) trailerDone = true // lenient: EOF after 0-chunk
          else if (line().isEmpty) trailerDone = true
        }
        done = true
      } else {
        require(p + size + 2 <= b.length, "warc: chunk overruns body")
        out.write(b, p, size.toInt)
        p += size.toInt
        require(b(p) == '\r' && b(p + 1) == '\n', "warc: chunk not CRLF-terminated")
        p += 2
      }
    }
    out.toByteArray
  }
}
