package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Round-13 gates. Opens with CHARSET-AWARE WARC→TEXT: the intake's
  * entity decode previously assumed UTF-8 bodies, so a windows-1252 or
  * shift_jis capture — a large share of any real crawl — came out
  * mojibake, silently poisoning the very corpus the intake exists to
  * feed. [[graft.ingest.Warc.resolveCharset]] now routes the charset
  * WHATWG-style (BOM > HTTP label > meta prescan > trial decode >
  * windows-1252 default) and the gate mixes five labeling shapes,
  * including a wrong-label capture the BOM must override.
  */
object Round13Queries {

  def all: Seq[Q] = Seq(

    // CHARSET-AWARE WARC→TEXT (ingest.Warc.htmlResponsesCharsetRouted) —
    // five labeling shapes keyed by doc_id % 5 (HTTP-labeled UTF-8,
    // meta-http-equiv windows-1252, meta-charset shift_jis, WRONG header
    // label over a UTF-16LE BOM, unlabeled UTF-8 resolved by trial
    // decode). Each payload carries charset-DIAGNOSTIC characters, so a
    // routing mistake cannot round-trip to the oracle's expected text:
    // decoding the windows-1252 body as UTF-8 throws or garbles é/€,
    // the shift_jis katakana garbles, the UTF-16LE body is unreadable.
    // The oracle replays routing + decode closed-form from the recipe.
    Q(
      "q346_warc_charset",
      """SELECT doc_id AS media_id,
        |  CASE doc_id % 5 WHEN 0 THEN 'utf-8' WHEN 1 THEN 'windows-1252'
        |    WHEN 2 THEN 'shift_jis' WHEN 3 THEN 'utf-16le'
        |    ELSE 'utf-8' END AS charset,
        |  CASE doc_id % 5 WHEN 0 THEN 'http' WHEN 1 THEN 'meta'
        |    WHEN 2 THEN 'meta' WHEN 3 THEN 'bom'
        |    ELSE 'sniff' END AS charset_source,
        |  trim(regexp_replace(
        |    'Doc ' || doc_id || ' ' || text ||
        |    CASE doc_id % 5 WHEN 0 THEN ' — déjà vu'
        |      WHEN 1 THEN ' café € résumé'
        |      WHEN 2 THEN ' テスト'
        |      WHEN 3 THEN ' Ωδ — test'
        |      ELSE ' naïve — ok' END,
        |    '\s+', ' ', 'g')) AS extracted
        |FROM documents ORDER BY media_id""".stripMargin) { (s, dir) =>
      graft.ingest.Warc.htmlResponsesCharsetRouted(
        graft.ingest.Warc.synthesizeWarcCharsets(
          Tables.load(s, dir, "documents"), "doc_id"))
        .select(col("media_id"), col("charset"), col("charset_source"),
          graft.text.TextAnalysis.extractHtmlText(col("html")).as("extracted"))
        .orderBy("media_id")
    },

    // EXIF-ORIENTATION-NORMALIZED PERCEPTUAL HASH (multimodal
    // .extractJpegOrientedDHash) — docs sharing `doc_id div 8` are ONE
    // upright photo stored at all 8 EXIF orientations (inverse-remapped
    // pixels + APP1 tag); the extractor sniffs the tag, decodes through
    // the real entropy coder, upright-remaps, THEN resizes → dHash. The
    // oracle computes the dHash of the UPRIGHT recipe only (q302's DC
    // closed form + floor-index resize + gradient bits, keyed by the
    // GROUP): every one of the 8 stored variants must land exactly on
    // it — i.e. one near-dup cluster per group — which fails if any of
    // the 8 remaps, the dimension swap (32×16 upright vs 16×32 stored
    // for orientations 5–8), or the sniff default is off by anything.
    Q(
      "q347_exif_oriented_dhash",
      """WITH blk AS (
        |  SELECT doc_id, by.by AS by, bx.bx AS bx,
        |    CAST(((doc_id // 8) * 29 + by.by * 71 + bx.bx * 113) % 256
        |      AS BIGINT) AS v
        |  FROM documents,
        |       unnest(generate_series(0, 1)) AS by(by),
        |       unnest(generate_series(0, 3)) AS bx(bx)),
        |dec AS (
        |  SELECT doc_id, by, bx,
        |    GREATEST(CAST(0 AS BIGINT), LEAST(CAST(255 AS BIGINT),
        |      (((((((8 * (v - 128) + 8) >> 4) * 16) * 370728 + 2048) >> 12)
        |          * 370728 + 134217728) >> 28) + 128)) AS rec
        |  FROM blk),
        |grid AS (
        |  SELECT d.doc_id, y.y AS y, x.x AS x, d.rec AS l
        |  FROM dec d,
        |       unnest(generate_series(0, 7)) AS y(y),
        |       unnest(generate_series(0, 8)) AS x(x)
        |  WHERE d.by = y.y // 4 AND d.bx = (32 * x.x) // 72),
        |g AS (
        |  SELECT a.doc_id, a.y, a.x,
        |    CASE WHEN b.l > a.l THEN 1 ELSE 0 END AS bit
        |  FROM grid a JOIN grid b
        |    ON a.doc_id = b.doc_id AND a.y = b.y AND b.x = a.x + 1
        |  WHERE a.x < 8)
        |SELECT doc_id AS media_id,
        |  CAST(1 + doc_id % 8 AS BIGINT) AS orientation,
        |  array_to_string(list(CAST(bit AS VARCHAR) ORDER BY y, x), '') AS dhash,
        |  CAST(sum(bit) AS BIGINT) AS ones
        |FROM g GROUP BY doc_id ORDER BY media_id""".stripMargin) { (s, dir) =>
      graft.multimodal.Multimodal.extractJpegOrientedDHash(
        graft.multimodal.Multimodal.synthesizeJpegOriented(
          Tables.load(s, dir, "documents"), "doc_id"))
        .orderBy("media_id")
    },

    // SUBTITLE↔AUDIO ALIGNMENT (text.AsrAlign) — the ASR-pair emitter:
    // q321's VAD utterances (REAL WAV decode → frame energies →
    // threshold islands, frames mapped to ms at 100 ms/frame) interval-
    // join q345's subtitle cues (REAL SRT/WebVTT parse of synthesized
    // files) per media; each utterance takes its BEST-overlap cue (ties
    // to the lower cue index). The cue recipe's `doc_id % 997` start
    // offset IS the drifting clock: per doc the transcript timeline
    // slides up to ~1 s against the audio, so utterances straddle cue
    // boundaries and best-overlap decides — and early utterances under
    // large drifts overlap NO cue, exercising the unmatched audit path.
    // The oracle composes both recipes closed-form (the q321 islands
    // SQL + the q345 cue projection) and replays the join + argmax.
    Q(
      "q348_asr_align",
      """WITH s AS (SELECT doc_id, i, i // 21 AS frame,
        |    ((doc_id * 7919 + i * 104729) % 65536) - 32768 AS v
        |  FROM documents, unnest(generate_series(0, 440)) AS u(i)),
        |fe AS (SELECT doc_id, frame, CAST(sum(v*v) AS BIGINT) AS e
        |  FROM s GROUP BY doc_id, frame),
        |act AS (SELECT doc_id, frame,
        |    frame - row_number() OVER (PARTITION BY doc_id ORDER BY frame) AS grp
        |  FROM fe WHERE e >= 7500000000),
        |seg AS (SELECT doc_id, min(frame) AS sf, max(frame) AS ef,
        |    count(*) AS nf
        |  FROM act GROUP BY doc_id, grp),
        |utt AS (SELECT doc_id,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY sf) - 1 AS utt,
        |    sf * 100 AS us, (ef + 1) * 100 AS ue
        |  FROM seg WHERE nf >= 2),
        |cue AS (SELECT doc_id, g.i AS cue_idx,
        |    g.i * 2000 + doc_id % 997 AS cs,
        |    g.i * 2000 + doc_id % 997 + 1500 AS ce,
        |    'cue ' || g.i || ' first line doc ' || doc_id || ' and more words'
        |      AS text
        |  FROM documents, unnest(generate_series(0, 2)) AS g(i)),
        |pairs AS (SELECT u.doc_id, u.utt, u.us, u.ue, c.cue_idx, c.text,
        |    LEAST(u.ue, c.ce) - GREATEST(u.us, c.cs) AS ov
        |  FROM utt u JOIN cue c ON u.doc_id = c.doc_id
        |  WHERE LEAST(u.ue, c.ce) > GREATEST(u.us, c.cs)),
        |best AS (SELECT *, row_number() OVER (PARTITION BY doc_id, utt
        |    ORDER BY ov DESC, cue_idx) AS rn FROM pairs)
        |SELECT u.doc_id AS media_id, CAST(u.utt AS BIGINT) AS utt,
        |  CAST(u.us AS BIGINT) AS u_start_ms, CAST(u.ue AS BIGINT) AS u_end_ms,
        |  CAST(b.cue_idx AS BIGINT) AS cue_idx, b.text AS cue_text,
        |  CAST(b.ov AS BIGINT) AS overlap_ms,
        |  CAST(b.ov * 1000000 // (u.ue - u.us) AS BIGINT) AS overlap_ratio_micro,
        |  b.cue_idx IS NOT NULL AS matched
        |FROM utt u LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
        |  ON u.doc_id = b.doc_id AND u.utt = b.utt
        |ORDER BY media_id, utt""".stripMargin) { (s, dir) =>
      import graft.multimodal.Multimodal
      import graft.text.{AsrAlign, Subtitles}
      val docs = Tables.load(s, dir, "documents")
      val utts = Multimodal.segmentUtterances(
        Multimodal.extractWavFrameFeatures(
          Multimodal.synthesizeWav(docs, "doc_id"), frameLen = 21),
        "sum_squares", threshold = 7500000000L, minFrames = 2)
        .select(col("media_id"), col("utt"),
          (col("start_frame") * 100L).as("u_start_ms"),
          ((col("end_frame") + 1L) * 100L).as("u_end_ms"))
      // the q345 subtitle recipe, verbatim: SRT for even ids, WebVTT odd
      def ts(startMs: org.apache.spark.sql.Column, sep: String) = concat(
        lit("00:00:0"), (startMs / 1000).cast("int").cast("string"), lit(sep),
        lpad((startMs % 1000).cast("string"), 3, "0"))
      def cue(i: Int, srt: Boolean) = {
        val st = lit(i * 2000) + col("doc_id") % 997
        val en = st + lit(1500)
        val sep = if (srt) "," else "."
        val idLine = if (srt) concat(lit(s"${i + 1}\n")) else lit("")
        val settings = if (srt) lit("") else lit(" align:start")
        concat(idLine, ts(st, sep), lit(" --> "), ts(en, sep), settings,
          lit(s"\ncue $i first line doc "), col("doc_id").cast("string"),
          lit("\nand more words\n\n"))
      }
      val srt = concat(cue(0, srt = true), cue(1, srt = true), cue(2, srt = true))
      val vtt = concat(lit("WEBVTT\n\nNOTE generated by graft\n\n"),
        cue(0, srt = false), cue(1, srt = false), cue(2, srt = false))
      val cues = Subtitles.cues(
        docs.select(col("doc_id").as("media_id"),
          when(col("doc_id") % 2 === 0, srt).otherwise(vtt).as("sub")),
        "media_id", "sub")
        .select(col("media_id"), col("cue_idx"),
          col("start_ms").as("c_start_ms"), col("end_ms").as("c_end_ms"),
          col("text"))
      AsrAlign.alignCues(utts, cues, grain = 1000L)
        .orderBy("media_id", "utt")
    },

    // CDX CAPTURE INDEX (ingest.Warc.cdxIndex) — the standard WARC
    // lookup table: SURT key + 14-digit timestamp + payload digest +
    // mime/status per response OR revisit record. Archives synthesized
    // with CRAWL-DEDUP REVISITS (docs sharing `doc_id div 4` have one
    // stored body; the other three captures are revisit records whose
    // WARC-Payload-Digest names the body they did NOT store). The
    // oracle replays the whole index closed-form — sha-256 of the
    // group's recipe html, the SURT projection, the timestamp digits —
    // so a drift in digest bytes, header routing, or revisit typing
    // lands off the hash. Offsets/lengths (gzip-member geometry, not
    // SQL-expressible) are gated by WarcSpec's fetch round-trip instead.
    Q(
      "q349_cdx_index",
      """SELECT doc_id AS media_id,
        |  'com,example)/doc/' || doc_id AS surt,
        |  '202608120000' || lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0') AS ts14,
        |  'sha-256:' || sha256('<html><head><title>Doc ' || (doc_id // 4)
        |    || '</title><script>var x=1;</script></head><body><h1>EN</h1>'
        |    || '<p>group body ' || (doc_id // 4)
        |    || ' &amp; more</p><!-- note --></body></html>') AS digest,
        |  CASE WHEN doc_id % 4 = 0 THEN 'text/html'
        |       ELSE 'warc/revisit' END AS mime,
        |  CAST(CASE WHEN doc_id % 4 = 0 THEN 200 END AS BIGINT) AS status,
        |  doc_id % 4 <> 0 AS is_revisit
        |FROM documents ORDER BY media_id""".stripMargin) { (s, dir) =>
      graft.ingest.Warc.cdxIndex(
        graft.ingest.Warc.synthesizeWarcRevisits(
          Tables.load(s, dir, "documents"), "doc_id"))
        .select(col("media_id"), col("surt"), col("ts14"), col("digest"),
          col("mime"), col("status"), col("is_revisit"))
        .orderBy("media_id")
    },

    // REVISIT RESOLUTION (ingest.Warc.resolveRevisits) — each revisit
    // joins the EARLIEST stored capture with the same payload digest:
    // ONE digest equi-join against a per-digest pre-reduced original
    // table (broadcastable at any corpus size — one row per distinct
    // body). The oracle knows the answer closed-form: the group's
    // id % 4 == 0 doc.
    Q(
      "q350_cdx_revisit_resolve",
      """SELECT doc_id AS media_id,
        |  'com,example)/doc/' || doc_id AS surt,
        |  '202608120000' || lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0') AS ts14,
        |  'sha-256:' || sha256('<html><head><title>Doc ' || (doc_id // 4)
        |    || '</title><script>var x=1;</script></head><body><h1>EN</h1>'
        |    || '<p>group body ' || (doc_id // 4)
        |    || ' &amp; more</p><!-- note --></body></html>') AS digest,
        |  CAST(4 * (doc_id // 4) AS BIGINT) AS orig_media_id,
        |  '202608120000' || lpad(CAST((4 * (doc_id // 4)) % 60 AS VARCHAR), 2, '0')
        |    AS orig_ts14,
        |  TRUE AS resolved
        |FROM documents WHERE doc_id % 4 <> 0
        |ORDER BY media_id""".stripMargin) { (s, dir) =>
      graft.ingest.Warc.resolveRevisits(
        graft.ingest.Warc.cdxIndex(
          graft.ingest.Warc.synthesizeWarcRevisits(
            Tables.load(s, dir, "documents"), "doc_id")))
        .select(col("media_id"), col("surt"), col("ts14"), col("digest"),
          col("orig_media_id"), col("orig_ts14"), col("resolved"))
        .orderBy("media_id")
    },

    // ANN DELETES (sim.PqIndexStore.appendTombstones/compact) — the
    // curation half the incremental index was missing: dedup kills and
    // takedowns remove vectors, so the code table must shrink, not just
    // grow. The gate builds the q333 store (frozen codebook, two
    // appended batches), tombstones vec_id % 7 == 3, COMPACTS (purge-on-
    // compact with the marker discipline: survivor data first, folded-
    // dir marker second, deletes last — replay-idempotent on either side
    // of the crash line), then re-reads the store cold and answers the
    // ADC top-k. The oracle is rebuild-from-survivors: train on the FULL
    // corpus (the codebook froze before the deletes), score every code,
    // drop the tombstoned ids — incremental-with-deletes must equal it
    // exactly.
    Q(
      "q351_ann_pq_delete",
      Round11Queries.pqOracleSurvivors(m = 4, k = 4, iters = 2, sub = 16,
        topK = 10, where = "vec_id % 7 <> 3")) { (s, dir) =>
      import graft.sim.{ProductQuantizer, PqIndexStore}
      val emb = Tables.load(s, dir, "embeddings").persist()
      val cb = ProductQuantizer.fit(emb, "vec_id", "embedding",
        dims = 64, m = 4, k = 4, iters = 2)
      val root = s"target/q351_pqstore/${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val p = new org.apache.hadoop.fs.Path(root)
      val fsys = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fsys.exists(p)) fsys.delete(p, true)
      // the pre-compaction ops are mutually independent (distinct store
      // subdirs; appends never read codebook/) — overlap their driver
      // fixed costs instead of serializing four tiny jobs
      graft.Par.run(Seq(
        () => PqIndexStore.writeCodebook(s, root, cb): Unit,
        () => PqIndexStore.appendBatch(emb.filter(col("vec_id") % 2 === 0),
          "vec_id", "embedding", root, cb, "b0"): Unit,
        () => PqIndexStore.appendBatch(emb.filter(col("vec_id") % 2 === 1),
          "vec_id", "embedding", root, cb, "b1"): Unit,
        () => PqIndexStore.appendTombstones(
          emb.filter(col("vec_id") % 7 === 3).select(col("vec_id")),
          "vec_id", root, "t0"): Unit))
      PqIndexStore.compact(s, root, "c0")
      val probe = emb.filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).map(_.toDouble).toArray
      emb.unpersist()
      ProductQuantizer.adcTopK(
        PqIndexStore.codes(s, root), "vec_id",
        PqIndexStore.readCodebook(s, root), probe, topK = 10)
    },

    // 16-BIT TRUECOLOR PNG (depth 16, color type 2), INTERLACED — the
    // q330 discipline in color: six bytes per pixel through the shared
    // byte-wise filter machinery (Paeth lookback = bpp = 6), each
    // channel framed by its MSB, so the oracle is the per-channel
    // recipe // 256 (q300-family feature algebra).
    Q(
      "q352_png16_rgb",
      """WITH px AS (
        |  SELECT doc_id, y.y AS y, x.x AS x,
        |    ((doc_id * 257 + y.y * 1031 + x.x * 4099) % 65536) // 256 AS r,
        |    ((doc_id * 263 + y.y * 1033 + x.x * 4111) % 65536) // 256 AS g,
        |    ((doc_id * 269 + y.y * 1039 + x.x * 4127) % 65536) // 256 AS b
        |  FROM documents,
        |       unnest(generate_series(0, 11)) AS y(y),
        |       unnest(generate_series(0, 15)) AS x(x)),
        |lum AS (
        |  SELECT doc_id, y, x, r, g, b, 299 * r + 587 * g + 114 * b AS l,
        |    lag(299 * r + 587 * g + 114 * b)
        |      OVER (PARTITION BY doc_id, y ORDER BY x) AS pl
        |  FROM px)
        |SELECT doc_id AS media_id,
        |  CAST(16 AS BIGINT) AS width,
        |  CAST(12 AS BIGINT) AS height,
        |  CAST(192 AS BIGINT) AS n_pixels,
        |  CAST(sum(r) AS BIGINT) AS sum_r,
        |  CAST(sum(g) AS BIGINT) AS sum_g,
        |  CAST(sum(b) AS BIGINT) AS sum_b,
        |  CAST(min(l) AS BIGINT) AS luma_min,
        |  CAST(max(l) AS BIGINT) AS luma_max,
        |  CAST(sum(CASE WHEN pl IS NOT NULL AND abs(l - pl) > 50000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS edge_count
        |FROM lum GROUP BY doc_id ORDER BY media_id""".stripMargin) { (s, dir) =>
      graft.multimodal.Multimodal.extractPngFeatures(
        graft.multimodal.Multimodal.synthesizePngRgb16(
          Tables.load(s, dir, "documents"), "doc_id", interlaced = true))
        .orderBy("media_id")
    },

    // 16-BIT RGBA PNG (depth 16, color type 6): eight-byte pixels;
    // decode composites the MSBs over white — the q328 integer
    // composite on (recipe // 256) channels.
    Q(
      "q353_png16_rgba",
      """WITH px AS (
        |  SELECT doc_id, y.y AS y, x.x AS x,
        |    ((doc_id * 257 + y.y * 1031 + x.x * 4099) % 65536) // 256 AS r0,
        |    ((doc_id * 263 + y.y * 1033 + x.x * 4111) % 65536) // 256 AS g0,
        |    ((doc_id * 269 + y.y * 1039 + x.x * 4127) % 65536) // 256 AS b0,
        |    ((doc_id * 271 + y.y * 1049 + x.x * 4129) % 65536) // 256 AS a
        |  FROM documents,
        |       unnest(generate_series(0, 11)) AS y(y),
        |       unnest(generate_series(0, 15)) AS x(x)),
        |cp AS (
        |  SELECT doc_id, y, x,
        |    (a * r0 + (255 - a) * 255 + 127) // 255 AS r,
        |    (a * g0 + (255 - a) * 255 + 127) // 255 AS g,
        |    (a * b0 + (255 - a) * 255 + 127) // 255 AS b
        |  FROM px),
        |lum AS (
        |  SELECT doc_id, y, x, r, g, b, 299 * r + 587 * g + 114 * b AS l,
        |    lag(299 * r + 587 * g + 114 * b)
        |      OVER (PARTITION BY doc_id, y ORDER BY x) AS pl
        |  FROM cp)
        |SELECT doc_id AS media_id,
        |  CAST(16 AS BIGINT) AS width,
        |  CAST(12 AS BIGINT) AS height,
        |  CAST(192 AS BIGINT) AS n_pixels,
        |  CAST(sum(r) AS BIGINT) AS sum_r,
        |  CAST(sum(g) AS BIGINT) AS sum_g,
        |  CAST(sum(b) AS BIGINT) AS sum_b,
        |  CAST(min(l) AS BIGINT) AS luma_min,
        |  CAST(max(l) AS BIGINT) AS luma_max,
        |  CAST(sum(CASE WHEN pl IS NOT NULL AND abs(l - pl) > 50000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS edge_count
        |FROM lum GROUP BY doc_id ORDER BY media_id""".stripMargin) { (s, dir) =>
      graft.multimodal.Multimodal.extractPngFeatures(
        graft.multimodal.Multimodal.synthesizePngRgba16(
          Tables.load(s, dir, "documents"), "doc_id"))
        .orderBy("media_id")
    },

    // tRNS PALETTE TRANSPARENCY (color type 3 + tRNS) — transparency
    // WITHOUT an alpha channel, the GIF-shaped web PNG: entry j's alpha
    // = (j·7 + 13) mod 256 composites the q331-era palette recipe over
    // white. The oracle composes index recipe → palette recipe → alpha
    // recipe → the shared integer composite.
    Q(
      "q354_png_trns",
      """WITH px AS (
        |  SELECT doc_id, y.y AS y, x.x AS x,
        |    (doc_id * 13 + y.y * 31 + x.x * 7) % 256 AS idx
        |  FROM documents,
        |       unnest(generate_series(0, 11)) AS y(y),
        |       unnest(generate_series(0, 15)) AS x(x)),
        |pal AS (
        |  SELECT doc_id, y, x,
        |    (idx * 31 + 7) % 256 AS r0,
        |    (idx * 17 + 3) % 256 AS g0,
        |    (idx * 23 + 11) % 256 AS b0,
        |    (idx * 7 + 13) % 256 AS a
        |  FROM px),
        |cp AS (
        |  SELECT doc_id, y, x,
        |    (a * r0 + (255 - a) * 255 + 127) // 255 AS r,
        |    (a * g0 + (255 - a) * 255 + 127) // 255 AS g,
        |    (a * b0 + (255 - a) * 255 + 127) // 255 AS b
        |  FROM pal),
        |lum AS (
        |  SELECT doc_id, y, x, r, g, b, 299 * r + 587 * g + 114 * b AS l,
        |    lag(299 * r + 587 * g + 114 * b)
        |      OVER (PARTITION BY doc_id, y ORDER BY x) AS pl
        |  FROM cp)
        |SELECT doc_id AS media_id,
        |  CAST(16 AS BIGINT) AS width,
        |  CAST(12 AS BIGINT) AS height,
        |  CAST(192 AS BIGINT) AS n_pixels,
        |  CAST(sum(r) AS BIGINT) AS sum_r,
        |  CAST(sum(g) AS BIGINT) AS sum_g,
        |  CAST(sum(b) AS BIGINT) AS sum_b,
        |  CAST(min(l) AS BIGINT) AS luma_min,
        |  CAST(max(l) AS BIGINT) AS luma_max,
        |  CAST(sum(CASE WHEN pl IS NOT NULL AND abs(l - pl) > 50000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS edge_count
        |FROM lum GROUP BY doc_id ORDER BY media_id""".stripMargin) { (s, dir) =>
      graft.multimodal.Multimodal.extractPngFeatures(
        graft.multimodal.Multimodal.synthesizePngPaletteTrns(
          Tables.load(s, dir, "documents"), "doc_id"))
        .orderBy("media_id")
    },

    // MP3 LAYER III DECODE (multimodal.Mp3Codec) — the payload the
    // header sniff (q337) skips: per-doc streams carry REAL side info
    // and REAL Huffman-coded spectra (pair table 1 + count1 table B,
    // lines all ±1, global_gain ≡ 210 mod 4, zero scalefactors), so
    // the requantized spectrum is EXACTLY ±2^g per line and the oracle
    // replays side-info fields, the part2_3_length bit accounting, and
    // integer spectral features (nonzero count, Σ|xr|·10⁶, and the
    // position/sign-weighted checksum) closed-form from the bit
    // recipe. Any drift in side-info layout, Huffman codes, sign-bit
    // order, line placement, or the requantization chain lands off the
    // hash. Time-domain stages (alias/IMDCT/subbands) are spec-gated
    // (Mp3Spec) — cosine outputs have no SQL closed form.
    Q(
      "q355_mp3_decode",
      """WITH fg AS (
        |  SELECT doc_id, f.f AS f, gr.gr AS gr FROM documents,
        |    unnest(generate_series(0, 1)) AS f(f),
        |    unnest(generate_series(0, 1)) AS gr(gr)),
        |par AS (
        |  SELECT doc_id, f, gr,
        |    4 + (doc_id + f) % 5 AS npairs,
        |    3 + (doc_id + 2*f + gr) % 4 AS nquads,
        |    (doc_id + f + gr) % 5 AS g
        |  FROM fg),
        |pp AS (
        |  SELECT doc_id, f, gr, p.p AS p,
        |    (doc_id + 3*gr + 7*p.p + f) % 2 AS mx,
        |    (doc_id*5 + gr + 11*p.p + 2*f) % 2 AS my,
        |    (doc_id + p.p + f) % 2 AS sx,
        |    (doc_id + p.p + gr) % 2 AS sy
        |  FROM par, unnest(generate_series(0, 8)) AS p(p)
        |  WHERE p.p < npairs),
        |qq AS (
        |  SELECT doc_id, f, gr, q.q AS q, j.j AS j,
        |    CASE j.j WHEN 1 THEN (doc_id + q.q + f) % 2
        |             WHEN 2 THEN (doc_id + 3*q.q + gr) % 2
        |             WHEN 3 THEN (doc_id + 5*q.q + f + gr) % 2
        |             ELSE (doc_id + 7*q.q + 1) % 2 END AS mag,
        |    (doc_id + q.q + j.j) % 2 AS s
        |  FROM par, unnest(generate_series(0, 6)) AS q(q),
        |       unnest(generate_series(1, 4)) AS j(j)
        |  WHERE q.q < nquads),
        |lines AS (
        |  SELECT doc_id, f, gr, 2*p + xy.xy AS line,
        |    CASE WHEN xy.xy = 0 THEN mx ELSE my END AS mag,
        |    CASE WHEN xy.xy = 0 THEN sx ELSE sy END AS s
        |  FROM pp, unnest(generate_series(0, 1)) AS xy(xy)
        |  UNION ALL
        |  SELECT q.doc_id, q.f, q.gr,
        |    2*a.npairs + 4*q.q + (q.j - 1) AS line, q.mag, q.s
        |  FROM qq q JOIN par a USING (doc_id, f, gr)),
        |pbits AS (
        |  SELECT doc_id, f, gr,
        |    sum(CASE WHEN mx = 0 AND my = 0 THEN 1
        |             WHEN mx = 1 AND my = 0 THEN 2 ELSE 3 END + mx + my) AS b
        |  FROM pp GROUP BY doc_id, f, gr),
        |qbits AS (
        |  -- one row per (quad, j): each carries 1 of the quad's 4 code
        |  -- bits plus its own sign bit
        |  SELECT doc_id, f, gr, sum(1 + mag) AS b
        |  FROM qq GROUP BY doc_id, f, gr),
        |feat AS (
        |  SELECT doc_id, f, gr, sum(mag) AS nnz,
        |    sum(mag * (1 - 2*s) * (line + 1)) AS wsum
        |  FROM lines GROUP BY doc_id, f, gr)
        |SELECT a.doc_id AS media_id,
        |  CAST(a.f AS BIGINT) AS frame_idx,
        |  CAST(a.gr AS BIGINT) AS granule,
        |  CAST(0 AS BIGINT) AS channel,
        |  CAST(a.npairs AS BIGINT) AS big_values,
        |  CAST(210 + 4*a.g AS BIGINT) AS global_gain,
        |  CAST(pb.b + qb.b AS BIGINT) AS part2_3_length,
        |  CAST(ft.nnz AS BIGINT) AS n_nonzero,
        |  CAST(ft.nnz * CAST(power(2, a.g) AS BIGINT) * 1000000 AS BIGINT)
        |    AS sum_abs_micro,
        |  CAST(ft.wsum * CAST(power(2, a.g) AS BIGINT) * 1000000 AS BIGINT)
        |    AS checksum_micro
        |FROM par a
        |JOIN pbits pb USING (doc_id, f, gr)
        |JOIN qbits qb USING (doc_id, f, gr)
        |JOIN feat ft USING (doc_id, f, gr)
        |ORDER BY media_id, frame_idx, granule""".stripMargin) { (s, dir) =>
      graft.multimodal.Multimodal.extractMp3Spectra(
        graft.multimodal.Multimodal.synthesizeMp3Coded(
          Tables.load(s, dir, "documents"), "doc_id"))
        .orderBy("media_id", "frame_idx", "granule")
    },

    // MS JOINT STEREO MP3 (multimodal.Mp3Codec MS matrixing) — the
    // dominant real-world stereo encoding: channel 0 codes MID (the
    // doc's own bit recipe), channel 1 SIDE (the recipe at id +
    // 1000003); decode must matrix L = (M+S)/√2, R = (M−S)/√2 on the
    // requantized spectra. Coded lines are ±2^g, so matrixed lines are
    // k·2^g/√2 — irrational but IEEE-EXACT: the oracle mirrors the
    // operation order (sum, divide by sqrt(2), scale by 10⁶, round) and
    // both engines land the identical double, hence identical integers.
    // Lines where M = −S cancel to zero, exercising the n_nonzero
    // difference between coded and output spectra.
    Q(
      "q359_mp3_ms_stereo",
      """WITH fgc AS (
        |  SELECT doc_id, f.f AS f, gr.gr AS gr, ch.ch AS ch,
        |    CASE ch.ch WHEN 0 THEN doc_id ELSE doc_id + 1000003 END AS rid
        |  FROM documents,
        |    unnest(generate_series(0, 1)) AS f(f),
        |    unnest(generate_series(0, 1)) AS gr(gr),
        |    unnest(generate_series(0, 1)) AS ch(ch)),
        |par AS (SELECT doc_id, f, gr, ch, rid,
        |    4 + (rid + f) % 5 AS npairs,
        |    3 + (rid + 2*f + gr) % 4 AS nquads,
        |    (rid + f + gr) % 5 AS g
        |  FROM fgc),
        |pp AS (SELECT doc_id, f, gr, ch, p.p AS p,
        |    (rid + 3*gr + 7*p.p + f) % 2 AS mx,
        |    (rid*5 + gr + 11*p.p + 2*f) % 2 AS my,
        |    (rid + p.p + f) % 2 AS sx,
        |    (rid + p.p + gr) % 2 AS sy
        |  FROM par, unnest(generate_series(0, 8)) AS p(p)
        |  WHERE p.p < npairs),
        |qq AS (SELECT doc_id, f, gr, ch, q.q AS q, j.j AS j,
        |    CASE j.j WHEN 1 THEN (rid + q.q + f) % 2
        |             WHEN 2 THEN (rid + 3*q.q + gr) % 2
        |             WHEN 3 THEN (rid + 5*q.q + f + gr) % 2
        |             ELSE (rid + 7*q.q + 1) % 2 END AS mag,
        |    (rid + q.q + j.j) % 2 AS s
        |  FROM par, unnest(generate_series(0, 6)) AS q(q),
        |       unnest(generate_series(1, 4)) AS j(j)
        |  WHERE q.q < nquads),
        |lines AS (
        |  SELECT doc_id, f, gr, ch, 2*p + xy.xy AS line,
        |    CASE WHEN xy.xy = 0 THEN mx ELSE my END AS mag,
        |    CASE WHEN xy.xy = 0 THEN sx ELSE sy END AS s
        |  FROM pp, unnest(generate_series(0, 1)) AS xy(xy)
        |  UNION ALL
        |  SELECT q.doc_id, q.f, q.gr, q.ch,
        |    2*a.npairs + 4*q.q + (q.j - 1), q.mag, q.s
        |  FROM qq q JOIN par a USING (doc_id, f, gr, ch)),
        |spec AS (SELECT doc_id, f, gr, ch, line,
        |    mag * (1 - 2*s) * power(2.0, a.g) AS v
        |  FROM lines JOIN par a USING (doc_id, f, gr, ch)
        |  WHERE mag > 0),
        |merged AS (
        |  SELECT coalesce(m.doc_id, s.doc_id) AS doc_id,
        |    coalesce(m.f, s.f) AS f, coalesce(m.gr, s.gr) AS gr,
        |    coalesce(m.line, s.line) AS line,
        |    coalesce(m.v, 0) AS mv, coalesce(s.v, 0) AS sv
        |  FROM (SELECT * FROM spec WHERE ch = 0) m
        |  FULL OUTER JOIN (SELECT * FROM spec WHERE ch = 1) s
        |    ON m.doc_id = s.doc_id AND m.f = s.f AND m.gr = s.gr
        |    AND m.line = s.line),
        |chan AS (
        |  SELECT doc_id, f, gr, 0 AS ch, line,
        |    round((mv + sv) / sqrt(2) * 1000000) AS micro FROM merged
        |  UNION ALL
        |  SELECT doc_id, f, gr, 1 AS ch, line,
        |    round((mv - sv) / sqrt(2) * 1000000) AS micro FROM merged),
        |feat AS (SELECT doc_id, f, gr, ch,
        |    CAST(sum(CASE WHEN micro <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS nnz,
        |    CAST(sum(abs(micro)) AS BIGINT) AS sum_abs,
        |    CAST(sum((line + 1) * micro) AS BIGINT) AS wsum
        |  FROM chan GROUP BY doc_id, f, gr, ch),
        |pbits AS (SELECT doc_id, f, gr, ch,
        |    sum(CASE WHEN mx = 0 AND my = 0 THEN 1
        |             WHEN mx = 1 AND my = 0 THEN 2 ELSE 3 END + mx + my) AS b
        |  FROM pp GROUP BY doc_id, f, gr, ch),
        |qbits AS (SELECT doc_id, f, gr, ch, sum(1 + mag) AS b
        |  FROM qq GROUP BY doc_id, f, gr, ch)
        |SELECT a.doc_id AS media_id,
        |  CAST(a.f AS BIGINT) AS frame_idx,
        |  CAST(a.gr AS BIGINT) AS granule,
        |  CAST(a.ch AS BIGINT) AS channel,
        |  CAST(a.npairs AS BIGINT) AS big_values,
        |  CAST(210 + 4*a.g AS BIGINT) AS global_gain,
        |  CAST(pb.b + qb.b AS BIGINT) AS part2_3_length,
        |  ft.nnz AS n_nonzero,
        |  ft.sum_abs AS sum_abs_micro,
        |  ft.wsum AS checksum_micro
        |FROM par a
        |JOIN pbits pb USING (doc_id, f, gr, ch)
        |JOIN qbits qb USING (doc_id, f, gr, ch)
        |JOIN feat ft USING (doc_id, f, gr, ch)
        |ORDER BY media_id, frame_idx, granule, channel""".stripMargin) { (s, dir) =>
      graft.multimodal.Multimodal.extractMp3Spectra(
        graft.multimodal.Multimodal.synthesizeMp3CodedMs(
          Tables.load(s, dir, "documents"), "doc_id"))
        .orderBy("media_id", "frame_idx", "granule", "channel")
    },

    // SEQUENCE PACKING (operators.SequencePack) — concat-then-chunk
    // into 512-token training sequences: the piece table a data loader
    // indexes by. The only global state is GlobalRank's two-pass
    // exclusive running total (one range shuffle, O(partitions) driver
    // longs); piece emission is a stateless explode. The oracle replays
    // the token counts, the window prefix sum, and the intersection
    // algebra — an off-by-one anywhere in the chunk/piece arithmetic
    // shifts every downstream row and lands off the hash.
    Q(
      "q356_seq_pack",
      """WITH t AS (SELECT doc_id,
        |    len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
        |      x -> x != '')) AS n
        |  FROM documents),
        |o AS (SELECT doc_id, n,
        |    CAST(coalesce(sum(n) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS off
        |  FROM t),
        |p AS (SELECT doc_id, n, off, c.c AS chunk_id
        |  FROM o, unnest(generate_series(off // 512, (off + n - 1) // 512)) AS c(c)
        |  WHERE n > 0)
        |SELECT CAST(chunk_id AS BIGINT) AS chunk_id, doc_id,
        |  CAST(GREATEST(chunk_id * 512 - off, 0) AS BIGINT) AS doc_from,
        |  CAST(GREATEST(off - chunk_id * 512, 0) AS BIGINT) AS chunk_offset,
        |  CAST(LEAST(off + n, (chunk_id + 1) * 512)
        |    - GREATEST(off, chunk_id * 512) AS BIGINT) AS piece_len
        |FROM p ORDER BY chunk_id, doc_id""".stripMargin) { (s, dir) =>
      import graft.text.TextAnalysis
      graft.operators.SequencePack.packChunks(
        Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens")),
        "doc_id", "n_tokens", seqLen = 512L)
        .orderBy("chunk_id", "doc_id")
    },

    // MIXTURE-WEIGHTED INTERLEAVE (operators.Mixture) — the WFQ domain
    // schedule: languages weighted en 8 / de 4 / fr 3 / es 2 / zh 1
    // emit into one global order whose every prefix carries each
    // source within ±1 of its target share. Virtual-finish-time keys
    // are exact integers (rank · lcm/weight), per-source ranks come
    // from ONE global stamp minus broadcast source offsets (never a
    // per-source single-task window), and the oracle replays the whole
    // schedule with two window functions.
    Q(
      "q357_mixture_interleave",
      """WITH r AS (SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rk
        |  FROM documents),
        |v AS (SELECT doc_id, lang, rk,
        |    rk * CASE lang WHEN 'en' THEN 3 WHEN 'de' THEN 6 WHEN 'fr' THEN 8
        |      WHEN 'es' THEN 12 ELSE 24 END AS vt
        |  FROM r)
        |SELECT CAST(row_number() OVER (ORDER BY vt, lang, doc_id) - 1 AS BIGINT)
        |    AS position,
        |  doc_id, lang,
        |  CAST(rk AS BIGINT) AS src_rank,
        |  CAST(vt AS BIGINT) AS vtime
        |FROM v ORDER BY position""".stripMargin) { (s, dir) =>
      graft.operators.Mixture.interleave(
        Tables.load(s, dir, "documents").select(col("doc_id"), col("lang")),
        "lang", "doc_id",
        Seq("en" -> 8L, "de" -> 4L, "fr" -> 3L, "es" -> 2L, "zh" -> 1L))
        .select(col("position"), col("doc_id"), col("lang"),
          col("src_rank"), col("vtime"))
        .orderBy("position")
    },

    // PREFERENCE PAIRS (operators.Preference) — the RLHF/DPO data step:
    // per prompt (doc_id div 4), best and worst scored completions
    // become one (chosen, rejected) pair via a single grouped
    // aggregate. Even prompts carry a varied score recipe; ODD prompts
    // a tie-heavy one (two candidates share each score), so the
    // deterministic tie-breaks (chosen → lowest id, rejected → highest
    // id) are load-bearing in the hash.
    Q(
      "q358_preference_pairs",
      """WITH c AS (SELECT doc_id // 4 AS prompt_id, doc_id AS cand,
        |    CASE WHEN (doc_id // 4) % 2 = 0 THEN (doc_id * 37 + 11) % 100
        |         ELSE (doc_id * 3) % 6 END AS score
        |  FROM documents),
        |r1 AS (SELECT *,
        |    row_number() OVER (PARTITION BY prompt_id
        |      ORDER BY score DESC, cand) AS rb,
        |    row_number() OVER (PARTITION BY prompt_id
        |      ORDER BY score, cand DESC) AS rw,
        |    count(*) OVER (PARTITION BY prompt_id) AS n FROM c)
        |SELECT b.prompt_id, CAST(b.n AS BIGINT) AS n_candidates,
        |  b.cand AS chosen, CAST(b.score AS BIGINT) AS chosen_score,
        |  w.cand AS rejected, CAST(w.score AS BIGINT) AS rejected_score,
        |  CAST(b.score - w.score AS BIGINT) AS margin
        |FROM (SELECT * FROM r1 WHERE rb = 1) b
        |JOIN (SELECT * FROM r1 WHERE rw = 1) w USING (prompt_id)
        |WHERE b.n >= 2 AND b.score > w.score
        |ORDER BY prompt_id""".stripMargin) { (s, dir) =>
      graft.operators.Preference.preferencePairs(
        Tables.load(s, dir, "documents")
          .select(
            expr("doc_id div 4").as("prompt_id"),
            col("doc_id").as("cand"),
            when(expr("(doc_id div 4) % 2 = 0"), (col("doc_id") * 37 + 11) % 100)
              .otherwise((col("doc_id") * 3) % 6).cast("long").as("score")),
        "prompt_id", "cand", "score")
        .orderBy("prompt_id")
    },

    // SHORT-BLOCK MP3 DECODE (Mp3Codec block_type 2) — the transient
    // granule shape every real encoder emits at attacks: window-
    // switching side info (subblock gains), the short scalefactor
    // layout, and the REORDER permutation from Huffman order (band-
    // major, three windows packed per band) to natural subband-time
    // order (windows interleaved). Recipes are sized to push lines
    // across a band-width change, so the permutation is non-uniform;
    // per-window gains 2^(g − 2·sbg[w]) keep every line exact dyadic.
    // The oracle replays band lookup, window split, reorder target,
    // and window gains in integer micro units — an off-by-one in the
    // short band table, the window math, or the interleave lands off
    // the position-weighted checksum.
    Q(
      "q361_mp3_short_blocks",
      """WITH fg AS (
        |  SELECT doc_id, f.f AS f, gr.gr AS gr FROM documents,
        |    unnest(generate_series(0, 1)) AS f(f),
        |    unnest(generate_series(0, 1)) AS gr(gr)),
        |par AS (
        |  SELECT doc_id, f, gr,
        |    10 + (doc_id + f) % 5 AS npairs,
        |    8 + (doc_id + 2*f + gr) % 4 AS nquads,
        |    (doc_id + f + gr) % 5 AS g
        |  FROM fg),
        |pp AS (
        |  SELECT doc_id, f, gr, p.p AS p,
        |    (doc_id + 3*gr + 7*p.p + f) % 2 AS mx,
        |    (doc_id*5 + gr + 11*p.p + 2*f) % 2 AS my,
        |    (doc_id + p.p + f) % 2 AS sx,
        |    (doc_id + p.p + gr) % 2 AS sy
        |  FROM par, unnest(generate_series(0, 14)) AS p(p)
        |  WHERE p.p < npairs),
        |qq AS (
        |  SELECT doc_id, f, gr, q.q AS q, j.j AS j,
        |    CASE j.j WHEN 1 THEN (doc_id + q.q + f) % 2
        |             WHEN 2 THEN (doc_id + 3*q.q + gr) % 2
        |             WHEN 3 THEN (doc_id + 5*q.q + f + gr) % 2
        |             ELSE (doc_id + 7*q.q + 1) % 2 END AS mag,
        |    (doc_id + q.q + j.j) % 2 AS s
        |  FROM par, unnest(generate_series(0, 11)) AS q(q),
        |       unnest(generate_series(1, 4)) AS j(j)
        |  WHERE q.q < nquads),
        |lines AS (
        |  SELECT doc_id, f, gr, 2*p + xy.xy AS h,
        |    CASE WHEN xy.xy = 0 THEN mx ELSE my END AS mag,
        |    CASE WHEN xy.xy = 0 THEN sx ELSE sy END AS s
        |  FROM pp, unnest(generate_series(0, 1)) AS xy(xy)
        |  UNION ALL
        |  SELECT q.doc_id, q.f, q.gr, 2*a.npairs + 4*q.q + (q.j - 1), q.mag, q.s
        |  FROM qq q JOIN par a USING (doc_id, f, gr)),
        |bands AS (SELECT * FROM (VALUES (0, 4), (4, 4), (8, 4), (12, 4),
        |    (16, 6), (22, 8)) AS t(st, wd)),
        |nat AS (
        |  SELECT l.doc_id, l.f, l.gr, l.mag, l.s,
        |    (l.h - 3*bd.st) // bd.wd AS win,
        |    3*(bd.st + (l.h - 3*bd.st) % bd.wd) + (l.h - 3*bd.st) // bd.wd
        |      AS nat_line
        |  FROM lines l JOIN bands bd
        |    ON l.h >= 3*bd.st AND l.h < 3*(bd.st + bd.wd)),
        |vals AS (
        |  SELECT n.doc_id, n.f, n.gr, n.nat_line, n.mag, n.s,
        |    CAST(power(2.0, a.g - 2*((n.doc_id + n.f + n.gr + n.win) % 3))
        |      * 1000000 AS BIGINT) AS unit
        |  FROM nat n JOIN par a USING (doc_id, f, gr)),
        |feat AS (
        |  SELECT doc_id, f, gr,
        |    CAST(sum(mag) AS BIGINT) AS nnz,
        |    CAST(sum(mag * unit) AS BIGINT) AS sum_abs,
        |    CAST(sum(mag * (1 - 2*s) * (nat_line + 1) * unit) AS BIGINT) AS wsum
        |  FROM vals GROUP BY doc_id, f, gr),
        |pbits AS (
        |  SELECT doc_id, f, gr,
        |    sum(CASE WHEN mx = 0 AND my = 0 THEN 1
        |             WHEN mx = 1 AND my = 0 THEN 2 ELSE 3 END + mx + my) AS b
        |  FROM pp GROUP BY doc_id, f, gr),
        |qbits AS (
        |  SELECT doc_id, f, gr, sum(1 + mag) AS b
        |  FROM qq GROUP BY doc_id, f, gr)
        |SELECT a.doc_id AS media_id,
        |  CAST(a.f AS BIGINT) AS frame_idx,
        |  CAST(a.gr AS BIGINT) AS granule,
        |  CAST(0 AS BIGINT) AS channel,
        |  CAST(a.npairs AS BIGINT) AS big_values,
        |  CAST(210 + 4*a.g AS BIGINT) AS global_gain,
        |  CAST(pb.b + qb.b AS BIGINT) AS part2_3_length,
        |  ft.nnz AS n_nonzero,
        |  ft.sum_abs AS sum_abs_micro,
        |  ft.wsum AS checksum_micro
        |FROM par a
        |JOIN pbits pb USING (doc_id, f, gr)
        |JOIN qbits qb USING (doc_id, f, gr)
        |JOIN feat ft USING (doc_id, f, gr)
        |ORDER BY media_id, frame_idx, granule""".stripMargin) { (s, dir) =>
      graft.multimodal.Multimodal.extractMp3Spectra(
        graft.multimodal.Multimodal.synthesizeMp3CodedShort(
          Tables.load(s, dir, "documents"), "doc_id"))
        .orderBy("media_id", "frame_idx", "granule")
    },

    // TOKEN-BUDGET SELECTION (operators.TokenBudget) — the
    // DataComp/FineWeb curation step: per language, take documents
    // best-quality-first until the domain's token budget is crossed
    // (whole docs, prefix truncation — the raw running total makes the
    // keep predicate prefix-closed). Scale shape: ONE global running
    // total over (domain, quality-order) minus broadcast per-domain
    // offsets — never a per-domain single-task window, which is the
    // worst skew shape there is (few huge domains). The oracle replays
    // rank, cumulative, and the budget line per domain.
    Q(
      "q360_token_budget",
      """WITH t AS (SELECT doc_id, lang, (doc_id * 37 + 5) % 1000 AS q,
        |    len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
        |      x -> x != '')) AS n
        |  FROM documents),
        |c AS (SELECT *,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY q DESC, doc_id)
        |      AS BIGINT) AS dom_rank,
        |    CAST(coalesce(sum(n) OVER (PARTITION BY lang ORDER BY q DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS cum_before
        |  FROM t)
        |SELECT doc_id, lang, CAST(q AS BIGINT) AS quality,
        |  CAST(n AS BIGINT) AS n_tokens, dom_rank, cum_before,
        |  cum_before + n <= CASE lang WHEN 'en' THEN 2000 WHEN 'de' THEN 800
        |    WHEN 'fr' THEN 700 WHEN 'es' THEN 600 ELSE 500 END AS kept
        |FROM c ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import graft.text.TextAnalysis
      graft.operators.TokenBudget.selectUnderBudget(
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            ((col("doc_id") * 37 + 5) % 1000).cast("long").as("quality"),
            TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens")),
        "lang", "quality", "doc_id", "n_tokens",
        Seq("en" -> 2000L, "de" -> 800L, "fr" -> 700L, "es" -> 600L, "zh" -> 500L))
        .select(col("doc_id"), col("lang"), col("quality"), col("n_tokens"),
          col("dom_rank"), col("cum_before"), col("kept"))
        .orderBy("doc_id")
    })
}
