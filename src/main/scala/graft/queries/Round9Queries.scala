package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Round-9 gates: the DEFLATE-compressed PNG container ([[graft.multimodal
  * .PngCodec]] — zlib inflate + all five scanline unfilters, pure JVM) run
  * through the shared pixel contract, and the three-container cross-format
  * dedup that proves one fingerprint space spans BMP, GIF and PNG. Oracles
  * recompute every pixel arithmetically from the integer synthesis
  * recipes (the q100/q282 pattern) — the codec round-trip on the Spark
  * side must land on exactly those integers.
  */
object Round9Queries {

  def all: Seq[Q] = Seq(

    // PNG exact features: synthesize (id-keyed integer channel recipes) →
    // REAL filter+deflate PNG encode → inflate+unfilter decode →
    // BmpCodec.features, while the oracle recomputes the channel sums /
    // luma extrema / edge counts from the recipe directly. The encoder
    // cycles filter types y mod 5, so every row exercises a different
    // unfilter path — a wrong Paeth/Average would shift sums immediately.
    Q(
      "q298_png_features",
      """WITH px AS (
        |  SELECT doc_id, y.y AS y, x.x AS x,
        |    (doc_id * 37 + y.y * 5 + x.x * 11) % 256 AS r,
        |    (doc_id * 41 + y.y * 13 + x.x * 3) % 256 AS g,
        |    (doc_id * 43 + y.y * 7 + x.x * 17) % 256 AS b
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
      val media = graft.multimodal.Multimodal
        .synthesizePng(Tables.load(s, dir, "documents"), "doc_id")
      graft.multimodal.Multimodal.extractPngFeatures(media).orderBy("media_id")
    },

    // Three-container near-dup audit: the SAME pixels as GIF (LZW), BMP
    // (uncompressed) and PNG (DEFLATE) fingerprint through their REAL
    // decoders into one dHash space — every cluster must hold equal
    // counts of all three formats (twins collide by construction), and
    // mod-256 id aliases merge clusters across ids. q284's two-format
    // gate extended by the compressed-raster corner; the oracle replays
    // the q283 dhash recipe once per doc and triples the membership.
    Q(
      "q299_crossformat3_dedup",
      """WITH px AS (
        |  SELECT doc_id, y.y AS y, x.x AS x,
        |    299 * (((doc_id * 13 + ((y.y * 12) // 8) * 31 + ((x.x * 16) // 9) * 7) % 256
        |            * 31 + 7) % 256)
        |    + 587 * (((doc_id * 13 + ((y.y * 12) // 8) * 31 + ((x.x * 16) // 9) * 7) % 256
        |            * 17 + 3) % 256)
        |    + 114 * (((doc_id * 13 + ((y.y * 12) // 8) * 31 + ((x.x * 16) // 9) * 7) % 256
        |            * 23 + 11) % 256)
        |      AS l
        |  FROM documents,
        |       unnest(generate_series(0, 7)) AS y(y),
        |       unnest(generate_series(0, 8)) AS x(x)),
        |g AS (SELECT a.doc_id, a.y, a.x,
        |    CASE WHEN b.l > a.l THEN 1 ELSE 0 END AS bit
        |  FROM px a JOIN px b ON a.doc_id = b.doc_id AND a.y = b.y AND b.x = a.x + 1
        |  WHERE a.x < 8),
        |per AS (SELECT doc_id,
        |    array_to_string(list(CAST(bit AS VARCHAR) ORDER BY y, x), '') AS dhash
        |  FROM g GROUP BY doc_id)
        |SELECT dhash,
        |  CAST(3 * count(*) AS BIGINT) AS n_media,
        |  CAST(count(*) AS BIGINT) AS n_gif,
        |  CAST(count(*) AS BIGINT) AS n_bmp,
        |  CAST(count(*) AS BIGINT) AS n_png
        |FROM per GROUP BY dhash ORDER BY dhash""".stripMargin) { (s, dir) =>
      import graft.multimodal.Multimodal
      val docs = Tables.load(s, dir, "documents")
      val gif = Multimodal
        .extractGifDHash(Multimodal.synthesizeGif(docs, "doc_id"), side = 8)
        .select(col("dhash"), lit("gif").as("_fmt"))
      val bmp = Multimodal
        .extractBmpDHash(Multimodal.synthesizeBmpGifTwin(docs, "doc_id"), side = 8)
        .select(col("dhash"), lit("bmp").as("_fmt"))
      val png = Multimodal
        .extractPngDHash(Multimodal.synthesizePngGifTwin(docs, "doc_id"), side = 8)
        .select(col("dhash"), lit("png").as("_fmt"))
      // coalesce the union (narrow — decode stays spread): each branch
      // arrives at full session parallelism, and without this the
      // fingerprint groupBy's map side launches 3×parts tiny tasks
      gif.unionByName(bmp).unionByName(png)
        .coalesce(math.max(1, s.sessionState.conf.numShufflePartitions / 4))
        .groupBy("dhash")
        .agg(
          count(lit(1)).as("n_media"),
          sum(when(col("_fmt") === "gif", 1L).otherwise(0L)).as("n_gif"),
          sum(when(col("_fmt") === "bmp", 1L).otherwise(0L)).as("n_bmp"),
          sum(when(col("_fmt") === "png", 1L).otherwise(0L)).as("n_png"))
        .orderBy("dhash")
    },

    // JPEG exact features, grayscale: block-constant synthesis → REAL
    // baseline JPEG encode (Huffman + fixed-point FDCT + Annex-K quant)
    // → entropy decode + fixed-point IDCT → features, while the oracle
    // replays the LOSSY round-trip in closed form (every block is
    // DC-only, so decode = the pinned BIGINT shift chain documented on
    // JpegCodec.Fix: qdc = (8(v−128)+8)>>4 at Q00=16, then two ×370728
    // descale stages). The lossy format is still exactly gated — the
    // oracle computes what the codec MUST lose.
    Q(
      "q300_jpeg_gray_features",
      """WITH blk AS (
        |  SELECT doc_id, by.by AS by, bx.bx AS bx,
        |    CAST((doc_id * 29 + by.by * 71 + bx.bx * 113) % 256 AS BIGINT) AS v
        |  FROM documents,
        |       unnest(generate_series(0, 1)) AS by(by),
        |       unnest(generate_series(0, 1)) AS bx(bx)),
        |dec AS (
        |  SELECT doc_id, by, bx,
        |    GREATEST(CAST(0 AS BIGINT), LEAST(CAST(255 AS BIGINT),
        |      (((((((8 * (v - 128) + 8) >> 4) * 16) * 370728 + 2048) >> 12)
        |          * 370728 + 134217728) >> 28) + 128)) AS rec
        |  FROM blk),
        |edges AS (
        |  SELECT doc_id, by,
        |    CASE WHEN abs(max(CASE WHEN bx = 1 THEN rec END)
        |                - max(CASE WHEN bx = 0 THEN rec END)) * 1000 > 50000
        |         THEN 8 ELSE 0 END AS e
        |  FROM dec GROUP BY doc_id, by)
        |SELECT a.doc_id AS media_id,
        |  CAST(16 AS BIGINT) AS width,
        |  CAST(16 AS BIGINT) AS height,
        |  CAST(256 AS BIGINT) AS n_pixels,
        |  CAST(64 * a.s AS BIGINT) AS sum_r,
        |  CAST(64 * a.s AS BIGINT) AS sum_g,
        |  CAST(64 * a.s AS BIGINT) AS sum_b,
        |  CAST(1000 * a.mn AS BIGINT) AS luma_min,
        |  CAST(1000 * a.mx AS BIGINT) AS luma_max,
        |  CAST(e.ec AS BIGINT) AS edge_count
        |FROM (SELECT doc_id, sum(rec) AS s, min(rec) AS mn, max(rec) AS mx
        |      FROM dec GROUP BY doc_id) a
        |JOIN (SELECT doc_id, sum(e) AS ec FROM edges GROUP BY doc_id) e
        |  ON a.doc_id = e.doc_id
        |ORDER BY media_id""".stripMargin) { (s, dir) =>
      val media = graft.multimodal.Multimodal.synthesizeJpeg(
        Tables.load(s, dir, "documents"), "doc_id", grayscale = true)
      graft.multimodal.Multimodal.extractJpegFeatures(media).orderBy("media_id")
    },

    // JPEG exact features, YCbCr 4:4:4 color: the same DC-only closed
    // form run per CHANNEL, composed with the pinned integer BT.601
    // transforms on both ends (forward in the encoder, inverse in the
    // decoder — micro-unit floorDiv, replayed here with the +10^12
    // offset because DuckDB's // truncates while floorDiv floors).
    // Chroma quantizes at Q00=17 (Annex K), so its qdc needs the
    // non-power-of-two offset floor-division too.
    Q(
      "q301_jpeg_color_features",
      """WITH blk AS (
        |  SELECT doc_id, by.by AS by, bx.bx AS bx,
        |    CAST((doc_id * 19 + by.by * 53 + bx.bx * 101) % 256 AS BIGINT) AS r0,
        |    CAST((doc_id * 23 + by.by * 59 + bx.bx * 103) % 256 AS BIGINT) AS g0,
        |    CAST((doc_id * 31 + by.by * 61 + bx.bx * 107) % 256 AS BIGINT) AS b0
        |  FROM documents,
        |       unnest(generate_series(0, 1)) AS by(by),
        |       unnest(generate_series(0, 1)) AS bx(bx)),
        |ycc AS (
        |  SELECT doc_id, by, bx,
        |    GREATEST(CAST(0 AS BIGINT), LEAST(CAST(255 AS BIGINT),
        |      (299000 * r0 + 587000 * g0 + 114000 * b0 + 500000) // 1000000)) AS yv,
        |    GREATEST(CAST(0 AS BIGINT), LEAST(CAST(255 AS BIGINT), 128 +
        |      ((-168736 * r0 - 331264 * g0 + 500000 * b0 + 500000
        |        + 1000000000000) // 1000000) - 1000000)) AS cb,
        |    GREATEST(CAST(0 AS BIGINT), LEAST(CAST(255 AS BIGINT), 128 +
        |      ((500000 * r0 - 418688 * g0 - 81312 * b0 + 500000
        |        + 1000000000000) // 1000000) - 1000000)) AS cr
        |  FROM blk),
        |dec AS (
        |  SELECT doc_id, by, bx,
        |    GREATEST(CAST(0 AS BIGINT), LEAST(CAST(255 AS BIGINT),
        |      (((((((8 * (yv - 128) + 8) >> 4) * 16) * 370728 + 2048) >> 12)
        |          * 370728 + 134217728) >> 28) + 128)) AS ry,
        |    GREATEST(CAST(0 AS BIGINT), LEAST(CAST(255 AS BIGINT),
        |      (((((((16 * (cb - 128) + 17 + 34000) // 34 - 1000) * 17)
        |          * 370728 + 2048) >> 12) * 370728 + 134217728) >> 28) + 128)) AS rcb,
        |    GREATEST(CAST(0 AS BIGINT), LEAST(CAST(255 AS BIGINT),
        |      (((((((16 * (cr - 128) + 17 + 34000) // 34 - 1000) * 17)
        |          * 370728 + 2048) >> 12) * 370728 + 134217728) >> 28) + 128)) AS rcr
        |  FROM ycc),
        |rgb AS (
        |  SELECT doc_id, by, bx,
        |    GREATEST(CAST(0 AS BIGINT), LEAST(CAST(255 AS BIGINT),
        |      (1000000 * ry + 1402000 * (rcr - 128) + 500000
        |        + 1000000000000) // 1000000 - 1000000)) AS rr,
        |    GREATEST(CAST(0 AS BIGINT), LEAST(CAST(255 AS BIGINT),
        |      (1000000 * ry - 344136 * (rcb - 128) - 714136 * (rcr - 128) + 500000
        |        + 1000000000000) // 1000000 - 1000000)) AS gg,
        |    GREATEST(CAST(0 AS BIGINT), LEAST(CAST(255 AS BIGINT),
        |      (1000000 * ry + 1772000 * (rcb - 128) + 500000
        |        + 1000000000000) // 1000000 - 1000000)) AS bb
        |  FROM dec),
        |lum AS (
        |  SELECT doc_id, by, bx, rr, gg, bb,
        |    299 * rr + 587 * gg + 114 * bb AS l
        |  FROM rgb),
        |edges AS (
        |  SELECT doc_id, by,
        |    CASE WHEN abs(max(CASE WHEN bx = 1 THEN l END)
        |                - max(CASE WHEN bx = 0 THEN l END)) > 50000
        |         THEN 8 ELSE 0 END AS e
        |  FROM lum GROUP BY doc_id, by)
        |SELECT a.doc_id AS media_id,
        |  CAST(16 AS BIGINT) AS width,
        |  CAST(16 AS BIGINT) AS height,
        |  CAST(256 AS BIGINT) AS n_pixels,
        |  CAST(64 * a.sr AS BIGINT) AS sum_r,
        |  CAST(64 * a.sg AS BIGINT) AS sum_g,
        |  CAST(64 * a.sb AS BIGINT) AS sum_b,
        |  CAST(a.mn AS BIGINT) AS luma_min,
        |  CAST(a.mx AS BIGINT) AS luma_max,
        |  CAST(e.ec AS BIGINT) AS edge_count
        |FROM (SELECT doc_id, sum(rr) AS sr, sum(gg) AS sg, sum(bb) AS sb,
        |             min(l) AS mn, max(l) AS mx
        |      FROM lum GROUP BY doc_id) a
        |JOIN (SELECT doc_id, sum(e) AS ec FROM edges GROUP BY doc_id) e
        |  ON a.doc_id = e.doc_id
        |ORDER BY media_id""".stripMargin) { (s, dir) =>
      val media = graft.multimodal.Multimodal.synthesizeJpeg(
        Tables.load(s, dir, "documents"), "doc_id", grayscale = false)
      graft.multimodal.Multimodal.extractJpegFeatures(media).orderBy("media_id")
    },

    // JPEG dedup clusters: the q299 fingerprint machinery on the FIFTH
    // container. 32x32 gray payloads (4x4 blocks, so the dHash space is
    // rich) decode through the REAL entropy coder and fingerprint via
    // resize(9x8) -> dHash; mod-256 recipe aliasing collides ids into
    // clusters. The oracle replays decode (DC closed form per block),
    // the nearest-neighbor resize (floor-index: bx = 32x//72, by = y//2),
    // and the horizontal-gradient bits — exact dedup of a LOSSY format,
    // because identical pixels encode to identical bytes.
    Q(
      "q302_jpeg_dedup",
      """WITH blk AS (
        |  SELECT doc_id, by.by AS by, bx.bx AS bx,
        |    CAST((doc_id * 29 + by.by * 71 + bx.bx * 113) % 256 AS BIGINT) AS v
        |  FROM documents,
        |       unnest(generate_series(0, 3)) AS by(by),
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
        |  WHERE d.by = y.y // 2 AND d.bx = (32 * x.x) // 72),
        |g AS (
        |  SELECT a.doc_id, a.y, a.x,
        |    CASE WHEN b.l > a.l THEN 1 ELSE 0 END AS bit
        |  FROM grid a JOIN grid b
        |    ON a.doc_id = b.doc_id AND a.y = b.y AND b.x = a.x + 1
        |  WHERE a.x < 8),
        |per AS (
        |  SELECT doc_id,
        |    array_to_string(list(CAST(bit AS VARCHAR) ORDER BY y, x), '') AS dhash
        |  FROM g GROUP BY doc_id)
        |SELECT dhash,
        |  CAST(count(*) AS BIGINT) AS n_media,
        |  CAST(min(doc_id) AS BIGINT) AS min_doc
        |FROM per GROUP BY dhash ORDER BY dhash""".stripMargin) { (s, dir) =>
      val media = graft.multimodal.Multimodal.synthesizeJpeg(
        Tables.load(s, dir, "documents"), "doc_id", grayscale = true,
        blocksW = 4, blocksH = 4)
      graft.multimodal.Multimodal.extractJpegDHash(media, side = 8)
        .groupBy("dhash")
        .agg(
          count(lit(1)).as("n_media"),
          min(col("media_id")).as("min_doc"))
        .orderBy("dhash")
    },

    // JPEG 4:2:0 exact features: the sampling layout real camera files
    // carry — Y at 2x2, chroma downsampled 2x each way, 16x16 MCUs of
    // 4 Y + Cb + Cr blocks. Synthesis is constant per MCU TILE, so the
    // downsampled chroma block is constant too (the pinned 2x2 average
    // of a constant is the constant) and every component stays DC-only:
    // the SAME per-channel closed form as q301 (Y at Q00=16, chroma at
    // Q00=17), now composed with real subsampled interleave on the
    // Spark side and nearest chroma upsampling in the decoder.
    Q(
      "q303_jpeg420_features",
      """WITH blk AS (
        |  SELECT doc_id, by.by AS by, bx.bx AS bx,
        |    CAST((doc_id * 19 + by.by * 53 + bx.bx * 101) % 256 AS BIGINT) AS r0,
        |    CAST((doc_id * 23 + by.by * 59 + bx.bx * 103) % 256 AS BIGINT) AS g0,
        |    CAST((doc_id * 31 + by.by * 61 + bx.bx * 107) % 256 AS BIGINT) AS b0
        |  FROM documents,
        |       unnest(generate_series(0, 1)) AS by(by),
        |       unnest(generate_series(0, 1)) AS bx(bx)),
        |ycc AS (
        |  SELECT doc_id, by, bx,
        |    GREATEST(CAST(0 AS BIGINT), LEAST(CAST(255 AS BIGINT),
        |      (299000 * r0 + 587000 * g0 + 114000 * b0 + 500000) // 1000000)) AS yv,
        |    GREATEST(CAST(0 AS BIGINT), LEAST(CAST(255 AS BIGINT), 128 +
        |      ((-168736 * r0 - 331264 * g0 + 500000 * b0 + 500000
        |        + 1000000000000) // 1000000) - 1000000)) AS cb,
        |    GREATEST(CAST(0 AS BIGINT), LEAST(CAST(255 AS BIGINT), 128 +
        |      ((500000 * r0 - 418688 * g0 - 81312 * b0 + 500000
        |        + 1000000000000) // 1000000) - 1000000)) AS cr
        |  FROM blk),
        |dec AS (
        |  SELECT doc_id, by, bx,
        |    GREATEST(CAST(0 AS BIGINT), LEAST(CAST(255 AS BIGINT),
        |      (((((((8 * (yv - 128) + 8) >> 4) * 16) * 370728 + 2048) >> 12)
        |          * 370728 + 134217728) >> 28) + 128)) AS ry,
        |    GREATEST(CAST(0 AS BIGINT), LEAST(CAST(255 AS BIGINT),
        |      ((((((((16 * (cb - 128) + 17 + 34000) // 34 - 1000) * 17)
        |          * 370728 + 2048) >> 12) * 370728 + 134217728) >> 28) + 128))) AS rcb,
        |    GREATEST(CAST(0 AS BIGINT), LEAST(CAST(255 AS BIGINT),
        |      ((((((((16 * (cr - 128) + 17 + 34000) // 34 - 1000) * 17)
        |          * 370728 + 2048) >> 12) * 370728 + 134217728) >> 28) + 128))) AS rcr
        |  FROM ycc),
        |rgb AS (
        |  SELECT doc_id, by, bx,
        |    GREATEST(CAST(0 AS BIGINT), LEAST(CAST(255 AS BIGINT),
        |      (1000000 * ry + 1402000 * (rcr - 128) + 500000
        |        + 1000000000000) // 1000000 - 1000000)) AS rr,
        |    GREATEST(CAST(0 AS BIGINT), LEAST(CAST(255 AS BIGINT),
        |      (1000000 * ry - 344136 * (rcb - 128) - 714136 * (rcr - 128) + 500000
        |        + 1000000000000) // 1000000 - 1000000)) AS gg,
        |    GREATEST(CAST(0 AS BIGINT), LEAST(CAST(255 AS BIGINT),
        |      (1000000 * ry + 1772000 * (rcb - 128) + 500000
        |        + 1000000000000) // 1000000 - 1000000)) AS bb
        |  FROM dec),
        |lum AS (
        |  SELECT doc_id, by, bx, rr, gg, bb,
        |    299 * rr + 587 * gg + 114 * bb AS l
        |  FROM rgb),
        |edges AS (
        |  SELECT doc_id, by,
        |    CASE WHEN abs(max(CASE WHEN bx = 1 THEN l END)
        |                - max(CASE WHEN bx = 0 THEN l END)) > 50000
        |         THEN 16 ELSE 0 END AS e
        |  FROM lum GROUP BY doc_id, by)
        |SELECT a.doc_id AS media_id,
        |  CAST(32 AS BIGINT) AS width,
        |  CAST(32 AS BIGINT) AS height,
        |  CAST(1024 AS BIGINT) AS n_pixels,
        |  CAST(256 * a.sr AS BIGINT) AS sum_r,
        |  CAST(256 * a.sg AS BIGINT) AS sum_g,
        |  CAST(256 * a.sb AS BIGINT) AS sum_b,
        |  CAST(a.mn AS BIGINT) AS luma_min,
        |  CAST(a.mx AS BIGINT) AS luma_max,
        |  CAST(e.ec AS BIGINT) AS edge_count
        |FROM (SELECT doc_id, sum(rr) AS sr, sum(gg) AS sg, sum(bb) AS sb,
        |             min(l) AS mn, max(l) AS mx
        |      FROM lum GROUP BY doc_id) a
        |JOIN (SELECT doc_id, sum(e) AS ec FROM edges GROUP BY doc_id) e
        |  ON a.doc_id = e.doc_id
        |ORDER BY media_id""".stripMargin) { (s, dir) =>
      val media = graft.multimodal.Multimodal.synthesizeJpeg(
        Tables.load(s, dir, "documents"), "doc_id", grayscale = false,
        subsample420 = true)
      graft.multimodal.Multimodal.extractJpegFeatures(media).orderBy("media_id")
    },

    // Animated-GIF frame features: the video-modality gate — 6-frame
    // GIF89a payloads (graphic-control extensions, per-frame LZW
    // streams) decode through GifCodec.decodeFrames into one feature
    // row per FRAME, while the oracle recomputes every frame's pixels
    // from the scene recipe (frames within a 3-frame scene are
    // identical; indices compose through the shared palette recipe).
    Q(
      "q304_gif_frame_features",
      """WITH px AS (
        |  SELECT doc_id, f.f AS frame, y.y AS y, x.x AS x,
        |    (doc_id * 13 + (f.f // 3) * 97 + y.y * 31 + x.x * 7) % 256 AS j
        |  FROM documents,
        |       unnest(generate_series(0, 5)) AS f(f),
        |       unnest(generate_series(0, 11)) AS y(y),
        |       unnest(generate_series(0, 15)) AS x(x)),
        |rgb AS (
        |  SELECT doc_id, frame, y, x,
        |    (j * 31 + 7) % 256 AS r,
        |    (j * 17 + 3) % 256 AS g,
        |    (j * 23 + 11) % 256 AS b
        |  FROM px),
        |lum AS (
        |  SELECT doc_id, frame, y, x, r, g, b,
        |    299 * r + 587 * g + 114 * b AS l,
        |    lag(299 * r + 587 * g + 114 * b)
        |      OVER (PARTITION BY doc_id, frame, y ORDER BY x) AS pl
        |  FROM rgb)
        |SELECT doc_id AS media_id,
        |  CAST(frame AS BIGINT) AS frame,
        |  CAST(16 AS BIGINT) AS width,
        |  CAST(12 AS BIGINT) AS height,
        |  CAST(sum(r) AS BIGINT) AS sum_r,
        |  CAST(sum(g) AS BIGINT) AS sum_g,
        |  CAST(sum(b) AS BIGINT) AS sum_b,
        |  CAST(min(l) AS BIGINT) AS luma_min,
        |  CAST(max(l) AS BIGINT) AS luma_max,
        |  CAST(sum(CASE WHEN pl IS NOT NULL AND abs(l - pl) > 50000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS edge_count
        |FROM lum GROUP BY doc_id, frame ORDER BY media_id, frame""".stripMargin) { (s, dir) =>
      val media = graft.multimodal.Multimodal.synthesizeGifAnimation(
        Tables.load(s, dir, "documents"), "doc_id")
      graft.multimodal.Multimodal.extractGifFrameFeatures(media)
        .orderBy("media_id", "frame")
    },

    // Temporal scene-change detection over the REAL decoded frame
    // table: a frame whose luma sum differs from its predecessor starts
    // a new scene (the planted boundaries sit at frames 3k). Luma sum
    // is exactly 299·sum_r + 587·sum_g + 114·sum_b — linear in the
    // channel sums the frame table already carries, so detection is a
    // per-media lag window over a FRAMES-sized table, never pixels.
    Q(
      "q305_gif_scene_changes",
      """WITH px AS (
        |  SELECT doc_id, f.f AS frame, y.y AS y, x.x AS x,
        |    (doc_id * 13 + (f.f // 3) * 97 + y.y * 31 + x.x * 7) % 256 AS j
        |  FROM documents,
        |       unnest(generate_series(0, 5)) AS f(f),
        |       unnest(generate_series(0, 11)) AS y(y),
        |       unnest(generate_series(0, 15)) AS x(x)),
        |sums AS (
        |  SELECT doc_id, frame,
        |    sum(299 * ((j * 31 + 7) % 256)
        |      + 587 * ((j * 17 + 3) % 256)
        |      + 114 * ((j * 23 + 11) % 256)) AS l
        |  FROM px GROUP BY doc_id, frame),
        |d AS (
        |  SELECT doc_id, frame, l,
        |    lag(l) OVER (PARTITION BY doc_id ORDER BY frame) AS pl
        |  FROM sums)
        |SELECT doc_id AS media_id, CAST(frame AS BIGINT) AS frame
        |FROM d WHERE pl IS NOT NULL AND l != pl
        |ORDER BY media_id, frame""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val ff = graft.multimodal.Multimodal.extractGifFrameFeatures(
        graft.multimodal.Multimodal.synthesizeGifAnimation(
          Tables.load(s, dir, "documents"), "doc_id"))
      val lsum = ff.select(col("media_id"), col("frame"),
        (lit(299L) * col("sum_r") + lit(587L) * col("sum_g")
          + lit(114L) * col("sum_b")).as("l"))
      lsum
        .withColumn("pl",
          lag(col("l"), 1).over(Window.partitionBy("media_id").orderBy("frame")))
        .filter(col("pl").isNotNull && col("l") =!= col("pl"))
        .select(col("media_id"), col("frame"))
        .orderBy("media_id", "frame")
    },

    // Cross-video SCENE dedup: per-frame dHash fingerprints cluster
    // across payloads — by the scene recipe, doc and doc+165 share a
    // scene (97·13⁻¹ mod 256 = 165) and doc/doc+256 alias entirely, so
    // clusters genuinely span videos. The oracle replays decode (the
    // recipe IS the decoded frame), the 16x12 → 9x8 floor-index resize
    // (q299's mapping) and the gradient bits per (doc, frame).
    Q(
      "q306_gif_scene_dedup",
      """WITH px AS (
        |  SELECT doc_id, f.f AS frame, y.y AS y, x.x AS x,
        |    (doc_id * 13 + (f.f // 3) * 97
        |      + ((y.y * 12) // 8) * 31 + ((x.x * 16) // 9) * 7) % 256 AS j
        |  FROM documents,
        |       unnest(generate_series(0, 5)) AS f(f),
        |       unnest(generate_series(0, 7)) AS y(y),
        |       unnest(generate_series(0, 8)) AS x(x)),
        |lum AS (
        |  SELECT doc_id, frame, y, x,
        |    299 * ((j * 31 + 7) % 256)
        |      + 587 * ((j * 17 + 3) % 256)
        |      + 114 * ((j * 23 + 11) % 256) AS l
        |  FROM px),
        |g AS (
        |  SELECT a.doc_id, a.frame, a.y, a.x,
        |    CASE WHEN b.l > a.l THEN 1 ELSE 0 END AS bit
        |  FROM lum a JOIN lum b
        |    ON a.doc_id = b.doc_id AND a.frame = b.frame
        |      AND a.y = b.y AND b.x = a.x + 1
        |  WHERE a.x < 8),
        |per AS (
        |  SELECT doc_id, frame,
        |    array_to_string(list(CAST(bit AS VARCHAR) ORDER BY y, x), '') AS dhash
        |  FROM g GROUP BY doc_id, frame)
        |SELECT dhash,
        |  CAST(count(*) AS BIGINT) AS n_frames,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_media,
        |  CAST(min(doc_id) AS BIGINT) AS min_doc
        |FROM per GROUP BY dhash ORDER BY dhash""".stripMargin) { (s, dir) =>
      val media = graft.multimodal.Multimodal.synthesizeGifAnimation(
        Tables.load(s, dir, "documents"), "doc_id")
      graft.multimodal.Multimodal.extractGifFrameDHash(media, side = 8)
        .groupBy("dhash")
        .agg(
          count(lit(1)).as("n_frames"),
          countDistinct(col("media_id")).as("n_media"),
          min(col("media_id")).as("min_doc"))
        .orderBy("dhash")
    },

    // Poison-pill quarantine: every 5th payload's last byte is flipped
    // (for PNG that byte is IEND's CRC — guaranteed typed decode
    // failure), and the quarantine decode turns what would be a dead
    // job into per-row ok/error audit rows. Good rows must still land
    // on q298's exact integer features; bad rows carry NULLs — the
    // oracle knows exactly which is which.
    Q(
      "q307_decode_quarantine",
      """WITH px AS (
        |  SELECT doc_id, y.y AS y, x.x AS x,
        |    (doc_id * 37 + y.y * 5 + x.x * 11) % 256 AS r,
        |    (doc_id * 41 + y.y * 13 + x.x * 3) % 256 AS g,
        |    (doc_id * 43 + y.y * 7 + x.x * 17) % 256 AS b
        |  FROM documents,
        |       unnest(generate_series(0, 11)) AS y(y),
        |       unnest(generate_series(0, 15)) AS x(x)),
        |lum AS (
        |  SELECT doc_id, y, x, r, g, b, 299 * r + 587 * g + 114 * b AS l,
        |    lag(299 * r + 587 * g + 114 * b)
        |      OVER (PARTITION BY doc_id, y ORDER BY x) AS pl
        |  FROM px),
        |agg AS (
        |  SELECT doc_id,
        |    CAST(sum(r) AS BIGINT) AS sr,
        |    CAST(sum(g) AS BIGINT) AS sg,
        |    CAST(sum(b) AS BIGINT) AS sb,
        |    CAST(min(l) AS BIGINT) AS mn,
        |    CAST(max(l) AS BIGINT) AS mx,
        |    CAST(sum(CASE WHEN pl IS NOT NULL AND abs(l - pl) > 50000
        |      THEN 1 ELSE 0 END) AS BIGINT) AS ec
        |  FROM lum GROUP BY doc_id)
        |SELECT doc_id AS media_id,
        |  doc_id % 5 != 0 AS ok,
        |  CASE WHEN doc_id % 5 = 0 THEN NULL ELSE sr END AS sum_r,
        |  CASE WHEN doc_id % 5 = 0 THEN NULL ELSE sg END AS sum_g,
        |  CASE WHEN doc_id % 5 = 0 THEN NULL ELSE sb END AS sum_b,
        |  CASE WHEN doc_id % 5 = 0 THEN NULL ELSE mn END AS luma_min,
        |  CASE WHEN doc_id % 5 = 0 THEN NULL ELSE mx END AS luma_max,
        |  CASE WHEN doc_id % 5 = 0 THEN NULL ELSE ec END AS edge_count
        |FROM agg ORDER BY media_id""".stripMargin) { (s, dir) =>
      import graft.multimodal.Multimodal
      val media = Multimodal.corruptPayloads(
        Multimodal.synthesizePng(Tables.load(s, dir, "documents"), "doc_id"),
        everyN = 5L)
      Multimodal.extractPngFeaturesQuarantine(media)
        .select(col("media_id"), col("ok"), col("sum_r"), col("sum_g"),
          col("sum_b"), col("luma_min"), col("luma_max"), col("edge_count"))
        .orderBy("media_id")
    }
  )
}
