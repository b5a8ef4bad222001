package graft.ingest

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Spark plumbing for [[WarcCodec]]: crawl archives travel as opaque
  * `binary` columns (one .warc.gz per row — the per-capture shape) or as
  * one huge shared file decoded range-parallel; parsing runs in the
  * one-decoder-per-partition mapPartitions batch shape shared with the
  * media codecs, and the outputs are plain relational tables the rest of
  * the curation pipeline (HTML extraction, URL canonicalization, dedup,
  * quality scoring) composes onto unchanged.
  */
object Warc {

  val WarcFileSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** The per-record relational projection — what a crawl intake routes on. */
  val RecordSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("rec_idx", LongType, nullable = false),
    StructField("warc_type", StringType, nullable = false),
    StructField("target_uri", StringType, nullable = true),
    StructField("content_type", StringType, nullable = false),
    StructField("content_length", LongType, nullable = false),
    StructField("http_status", LongType, nullable = true),
    StructField("http_content_type", StringType, nullable = true)))

  // ------------------------------------------------------------ synthesize

  /** Fixed warcinfo block — every synthesized archive opens with it. */
  val WarcinfoBlock: String =
    "software: graft-crawler/1.0\r\nformat: WARC File Format 1.0\r\n"

  /** The capture request for doc `id` (the crawl's own GET). */
  def requestBlock(id: Long): String =
    s"GET /doc/$id HTTP/1.1\r\nHost: example.com\r\nUser-Agent: graftbot/1.0\r\n\r\n"

  /** The HTML entity for doc `id` — the q-HTML recipe shape (script +
    * comment + entities) so the archive exercises the full extraction
    * chain downstream.
    */
  def htmlBody(id: Long, lang: String, text: String): String =
    s"<html><head><title>Doc $id</title><script>var x=1;</script></head>" +
      s"<body><h1>${lang.toUpperCase}</h1><p>$text &amp; more</p>" +
      "<!-- note --></body></html>"

  /** The captured HTTP response: docs with id % 4 == 3 404 (crawls are
    * full of misses — the router must not feed them to extraction),
    * everything else 200 text/html with the recipe body.
    */
  def responseBlock(id: Long, lang: String, text: String): String =
    if (id % 4 == 3)
      "HTTP/1.1 404 Not Found\r\nContent-Type: text/plain\r\n" +
        "Content-Length: 9\r\n\r\nnot found"
    else {
      val b = htmlBody(id, lang, text)
      // Content-Length counts UTF-8 BYTES (the block is serialized with
      // getBytes(UTF_8) downstream), not String chars — non-ASCII text
      // would otherwise misstate the entity length on the wire.
      s"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n" +
        s"Content-Length: ${b.getBytes(UTF_8).length}\r\n\r\n$b"
    }

  /** The three records of doc `id`'s synthesized archive, in capture
    * order (warcinfo, request, response) — deterministic ids and a pinned
    * date, zero randomness (the media-synthesizer discipline: the oracle
    * replays the recipe arithmetically, so the bytes must be a pure
    * function of the row).
    */
  def docRecords(id: Long, lang: String, text: String): Seq[WarcCodec.WarcRecord] = {
    val uri = s"https://example.com/doc/$id"
    val date = "2026-08-12T00:00:00Z"
    Seq(
      WarcCodec.WarcRecord("warcinfo", s"<urn:graft:$id:0>", None, date,
        "application/warc-fields", Nil, WarcinfoBlock.getBytes(UTF_8)),
      WarcCodec.WarcRecord("request", s"<urn:graft:$id:1>", Some(uri), date,
        "application/http;msgtype=request", Nil, requestBlock(id).getBytes(UTF_8)),
      WarcCodec.WarcRecord("response", s"<urn:graft:$id:2>", Some(uri), date,
        "application/http;msgtype=response", Nil,
        responseBlock(id, lang, text).getBytes(UTF_8)))
  }

  /** The captured response with a WIRE-ENCODED entity — what real
    * crawls actually store: even ids carry `Transfer-Encoding: chunked`
    * framing (64-byte chunks, an extension on the first size line), odd
    * ids a `Content-Encoding: gzip` body; ids ≡ 5 (mod 10) stack BOTH
    * (chunked over gzip). The HTML inside is [[htmlBody]] verbatim, so
    * losslessness of the decode chain keeps downstream oracles
    * framing-free.
    */
  def responseBlockEncoded(id: Long, lang: String, text: String): Array[Byte] = {
    val html = htmlBody(id, lang, text).getBytes(UTF_8)
    def chunked(body: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(body.length + 64)
      var p = 0
      var first = true
      while (p < body.length) {
        val n = math.min(64, body.length - p)
        val ext = if (first) ";graft=1" else ""
        out.write(f"$n%x$ext\r\n".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
        out.write(body, p, n)
        out.write('\r'); out.write('\n')
        p += n
        first = false
      }
      out.write("0\r\n\r\n".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      out.toByteArray
    }
    val (headers, body) =
      if (id % 10 == 5) {
        val b = chunked(WarcCodec.gzipMember(html))
        ("Content-Type: text/html; charset=utf-8\r\n" +
          "Content-Encoding: gzip\r\nTransfer-Encoding: chunked\r\n", b)
      } else if (id % 2 == 0) {
        val b = chunked(html)
        ("Content-Type: text/html; charset=utf-8\r\nTransfer-Encoding: chunked\r\n", b)
      } else {
        val b = WarcCodec.gzipMember(html)
        (s"Content-Type: text/html; charset=utf-8\r\nContent-Encoding: gzip\r\n" +
          s"Content-Length: ${b.length}\r\n", b)
      }
    ("HTTP/1.1 200 OK\r\n" + headers + "\r\n").getBytes(UTF_8) ++ body
  }

  /** [[synthesizeWarc]]'s wire-encoded twin: response entities arrive
    * chunked / gzipped / both, per [[responseBlockEncoded]].
    */
  def synthesizeWarcEncoded(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val src = df.select(
      col(idCol).cast("long").as("media_id"), col("lang"), col("text"))
    val rdd = src.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val uri = s"https://example.com/doc/$id"
        val date = "2026-08-12T00:00:00Z"
        val recs = Seq(
          WarcCodec.WarcRecord("warcinfo", s"<urn:graft:$id:0>", None, date,
            "application/warc-fields", Nil, WarcinfoBlock.getBytes(UTF_8)),
          WarcCodec.WarcRecord("response", s"<urn:graft:$id:1>", Some(uri), date,
            "application/http;msgtype=response", Nil,
            responseBlockEncoded(id, r.getString(1), r.getString(2))))
        Row(id, WarcCodec.build(recs, gzipPerRecord = true))
      }
    }
    spark.createDataFrame(rdd, WarcFileSchema)
  }

  /** [[htmlResponses]] with ENTITY DECODING ([[WarcCodec.decodeEntity]]):
    * chunked framing undone, content codings inflated — the feed real
    * captures need before extraction sees a byte.
    */
  def htmlResponsesDecoded(warcFiles: DataFrame): DataFrame = {
    val spark = warcFiles.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("encoding", StringType, nullable = false),
      StructField("html", StringType, nullable = false)))
    val idIdx = warcFiles.schema.fieldIndex("media_id")
    val payloadIdx = warcFiles.schema.fieldIndex("payload")
    val rdd = warcFiles.rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        WarcCodec.parse(r.getAs[Array[Byte]](payloadIdx)).iterator
          .filter(rec => rec.warcType == "response" &&
            rec.contentType.startsWith("application/http"))
          .map(rec => WarcCodec.parseHttpResponse(rec.block))
          .filter(h => h.status == 200 &&
            h.contentType.exists(_.toLowerCase.startsWith("text/html")))
          .map { h =>
            def has(n: String, v: String) = h.headers.exists { case (k, hv) =>
              k.equalsIgnoreCase(n) && hv.toLowerCase.contains(v)
            }
            val enc = Seq(
              if (has("Transfer-Encoding", "chunked")) Some("chunked") else None,
              if (has("Content-Encoding", "gzip")) Some("gzip") else None)
              .flatten match {
              case Nil => "identity"
              case es => es.mkString("+")
            }
            Row(id, enc, new String(WarcCodec.decodeEntity(h), UTF_8))
          }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** One synthesized .warc.gz per document row (per-record gzip members —
    * the Common Crawl shape), payload a pure function of (doc_id, lang,
    * text).
    */
  def synthesizeWarc(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val src = df.select(
      col(idCol).cast("long").as("media_id"), col("lang"), col("text"))
    val rdd = src.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload = WarcCodec.build(
          docRecords(id, r.getString(1), r.getString(2)), gzipPerRecord = true)
        Row(id, payload)
      }
    }
    spark.createDataFrame(rdd, WarcFileSchema)
  }

  // ----------------------------------------------------------------- parse

  /** Record inventory: every record of every archive as one relational
    * row — type, URI, declared content type, block length, and (for HTTP
    * records) the parsed status + entity content type. The route table a
    * crawl intake filters on BEFORE any payload decode.
    */
  def records(warcFiles: DataFrame): DataFrame = {
    val spark = warcFiles.sparkSession
    val idIdx = warcFiles.schema.fieldIndex("media_id")
    val payloadIdx = warcFiles.schema.fieldIndex("payload")
    val rdd = warcFiles.rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        WarcCodec.parse(r.getAs[Array[Byte]](payloadIdx)).zipWithIndex.map {
          case (rec, i) =>
            // route on WARC-Type, not block shape: request blocks are HTTP
            // too, but their first line is a request line, not a status line
            val http =
              if (rec.warcType == "response" &&
                rec.contentType.startsWith("application/http"))
                Some(WarcCodec.parseHttpResponse(rec.block))
              else None
            Row(id, i.toLong, rec.warcType, rec.targetUri.orNull,
              rec.contentType, rec.block.length.toLong,
              http.map(h => h.status.toLong).orNull,
              http.flatMap(_.contentType).orNull)
        }
      }
    }
    spark.createDataFrame(rdd, RecordSchema)
  }

  /** The extraction feed: 200 text/html response entities, decoded UTF-8 —
    * (media_id, html). Compose [[graft.text.TextAnalysis.extractHtmlText]]
    * onto the `html` column for the full WARC → clean-text intake.
    */
  def htmlResponses(warcFiles: DataFrame): DataFrame = {
    val spark = warcFiles.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("html", StringType, nullable = false)))
    val idIdx = warcFiles.schema.fieldIndex("media_id")
    val payloadIdx = warcFiles.schema.fieldIndex("payload")
    val rdd = warcFiles.rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        WarcCodec.parse(r.getAs[Array[Byte]](payloadIdx)).iterator
          .filter(rec => rec.warcType == "response" &&
            rec.contentType.startsWith("application/http"))
          .map(rec => WarcCodec.parseHttpResponse(rec.block))
          .filter(h => h.status == 200 &&
            h.contentType.exists(_.toLowerCase.startsWith("text/html")))
          .map(h => Row(id, new String(h.body, UTF_8)))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** QUARANTINE twin of [[htmlResponses]] — per-ARCHIVE containment for
    * streaming intake: a good archive emits one (ok=true) row per
    * 200 text/html entity; an archive whose parse fails the codecs'
    * typed IllegalArgumentException emits exactly ONE (ok=false,
    * decode_error) audit row instead of failing the task — crawled
    * archives are hostile, and one torn .warc.gz in a feed must cost one
    * audit row, not the stream. Other exception types still propagate
    * (a parser BUG should stop the job; only corrupt DATA is contained).
    */
  def htmlTextQuarantine(warcFiles: DataFrame): DataFrame = {
    val spark = warcFiles.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("ok", BooleanType, nullable = false),
      StructField("decode_error", StringType, nullable = true),
      StructField("html", StringType, nullable = true)))
    val idIdx = warcFiles.schema.fieldIndex("media_id")
    val payloadIdx = warcFiles.schema.fieldIndex("payload")
    val rdd = warcFiles.rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        try {
          WarcCodec.parse(r.getAs[Array[Byte]](payloadIdx)).iterator
            .filter(rec => rec.warcType == "response" &&
              rec.contentType.startsWith("application/http"))
            .map(rec => WarcCodec.parseHttpResponse(rec.block))
            .filter(h => h.status == 200 &&
              h.contentType.exists(_.toLowerCase.startsWith("text/html")))
            .map(h => Row(id, true, null, new String(h.body, UTF_8)))
            .toSeq
        } catch {
          case e: IllegalArgumentException => Seq(Row(id, false, e.getMessage, null))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Range-parallel record inventory of ONE huge .warc.gz: the member
    * walk ([[WarcCodec.memberOffsets]] — cheap, header-hop only) yields
    * the split map driver-side, then members parse across `parallelism`
    * tasks via [[WarcCodec.parseMemberAt]] — a single 1 GB Common Crawl
    * file must not pin one task. Payload ships by broadcast in the
    * single-JVM shape; on a cluster the same (offset, len) map drives
    * ranged reads against the object store (the AVI `frameOffsets`
    * contract). Output schema equals [[records]]'s with `rec_idx` =
    * member ordinal, so split == whole-file is directly assertable.
    */
  def splitRecords(
      spark: SparkSession,
      mediaId: Long,
      payload: Array[Byte],
      parallelism: Int): DataFrame = {
    val offs = WarcCodec.memberOffsets(payload)
    val bc = spark.sparkContext.broadcast(payload)
    val rdd = spark.sparkContext
      .parallelize(offs.toIndexedSeq.zipWithIndex, math.max(parallelism, 1))
      .map { case ((o, _), i) =>
        val rec = WarcCodec.parseMemberAt(bc.value, o)
        val isResp = rec.warcType == "response"
        val http =
          if (isResp && rec.contentType.startsWith("application/http"))
            Some(WarcCodec.parseHttpResponse(rec.block))
          else None
        Row(mediaId, i.toLong, rec.warcType, rec.targetUri.orNull,
          rec.contentType, rec.block.length.toLong,
          http.map(h => h.status.toLong).orNull,
          http.flatMap(_.contentType).orNull)
      }
    spark.createDataFrame(rdd, RecordSchema)
  }
}
