package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Round-10 gates: REAL video — MJPEG frames in a RIFF/AVI container
  * ([[graft.multimodal.AviCodec]] walking the chunk structure, [[graft
  * .multimodal.JpegCodec]] entropy-decoding every `00dc` frame) — run
  * through the SAME temporal frame-table verbs the animated-GIF path
  * proved out (q304–q306), so scene detection and cross-video scene
  * dedup work unchanged on camera-adjacent input. Frames are
  * block-constant grayscale JPEGs, so the lossy round-trip is the q300
  * DC-only closed form and every oracle replays container + codec with
  * pure BIGINT arithmetic.
  */
object Round10Queries {

  def all: Seq[Q] = Seq(

    // AVI frame features: synthesize (block-constant gray frames, scene
    // recipe v = (id·29 + (f/3)·67 + by·71 + bx·113) mod 256) → REAL
    // JPEG encode per frame → REAL AVI mux → container walk + entropy
    // decode + fixed-point IDCT → one feature row per FRAME. The oracle
    // replays the lossy decode in closed form (q300's BIGINT shift
    // chain) per (doc, frame, block).
    Q(
      "q308_avi_frame_features",
      """WITH blk AS (
        |  SELECT doc_id, f.f AS frame, by.by AS by, bx.bx AS bx,
        |    CAST((doc_id * 29 + (f.f // 3) * 67 + by.by * 71 + bx.bx * 113) % 256
        |      AS BIGINT) AS v
        |  FROM documents,
        |       unnest(generate_series(0, 5)) AS f(f),
        |       unnest(generate_series(0, 1)) AS by(by),
        |       unnest(generate_series(0, 1)) AS bx(bx)),
        |dec AS (
        |  SELECT doc_id, frame, by, bx,
        |    GREATEST(CAST(0 AS BIGINT), LEAST(CAST(255 AS BIGINT),
        |      (((((((8 * (v - 128) + 8) >> 4) * 16) * 370728 + 2048) >> 12)
        |          * 370728 + 134217728) >> 28) + 128)) AS rec
        |  FROM blk),
        |edges AS (
        |  SELECT doc_id, frame, by,
        |    CASE WHEN abs(max(CASE WHEN bx = 1 THEN rec END)
        |                - max(CASE WHEN bx = 0 THEN rec END)) * 1000 > 50000
        |         THEN 8 ELSE 0 END AS e
        |  FROM dec GROUP BY doc_id, frame, by)
        |SELECT a.doc_id AS media_id,
        |  CAST(a.frame AS BIGINT) AS frame,
        |  CAST(16 AS BIGINT) AS width,
        |  CAST(16 AS BIGINT) AS height,
        |  CAST(64 * a.s AS BIGINT) AS sum_r,
        |  CAST(64 * a.s AS BIGINT) AS sum_g,
        |  CAST(64 * a.s AS BIGINT) AS sum_b,
        |  CAST(1000 * a.mn AS BIGINT) AS luma_min,
        |  CAST(1000 * a.mx AS BIGINT) AS luma_max,
        |  CAST(e.ec AS BIGINT) AS edge_count
        |FROM (SELECT doc_id, frame, sum(rec) AS s, min(rec) AS mn, max(rec) AS mx
        |      FROM dec GROUP BY doc_id, frame) a
        |JOIN (SELECT doc_id, frame, sum(e) AS ec
        |      FROM edges GROUP BY doc_id, frame) e
        |  ON a.doc_id = e.doc_id AND a.frame = e.frame
        |ORDER BY media_id, frame""".stripMargin) { (s, dir) =>
      val media = graft.multimodal.Multimodal.synthesizeAviMjpeg(
        Tables.load(s, dir, "documents"), "doc_id")
      graft.multimodal.Multimodal.extractAviFrameFeatures(media)
        .orderBy("media_id", "frame")
    },

    // Scene-change detection over the REAL-video frame table: same verb
    // as q305 (a lag window over the frames-grain table, never pixels),
    // now fed by container walk + entropy decode. Planted boundaries sit
    // at frames 3k; a boundary only REGISTERS when the two scenes'
    // DECODED luma sums differ (quantization can collapse a small jump —
    // the oracle replays exactly what the codec must lose, so both sides
    // agree on which boundaries survive).
    Q(
      "q309_avi_scene_changes",
      """WITH blk AS (
        |  SELECT doc_id, f.f AS frame, by.by AS by, bx.bx AS bx,
        |    CAST((doc_id * 29 + (f.f // 3) * 67 + by.by * 71 + bx.bx * 113) % 256
        |      AS BIGINT) AS v
        |  FROM documents,
        |       unnest(generate_series(0, 5)) AS f(f),
        |       unnest(generate_series(0, 1)) AS by(by),
        |       unnest(generate_series(0, 1)) AS bx(bx)),
        |sums AS (
        |  SELECT doc_id, frame,
        |    sum(GREATEST(CAST(0 AS BIGINT), LEAST(CAST(255 AS BIGINT),
        |      (((((((8 * (v - 128) + 8) >> 4) * 16) * 370728 + 2048) >> 12)
        |          * 370728 + 134217728) >> 28) + 128))) AS l
        |  FROM blk GROUP BY doc_id, frame),
        |d AS (
        |  SELECT doc_id, frame, l,
        |    lag(l) OVER (PARTITION BY doc_id ORDER BY frame) AS pl
        |  FROM sums)
        |SELECT doc_id AS media_id, CAST(frame AS BIGINT) AS frame
        |FROM d WHERE pl IS NOT NULL AND l != pl
        |ORDER BY media_id, frame""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val ff = graft.multimodal.Multimodal.extractAviFrameFeatures(
        graft.multimodal.Multimodal.synthesizeAviMjpeg(
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

    // Cross-video SCENE dedup on the REAL container: per-frame dHash
    // fingerprints cluster across AVIs — 29⁻¹ mod 256 = 53, so doc and
    // doc + 67·53 mod 256 = doc+223 share scenes one apart, and
    // doc/doc+256 alias entirely. 4×4-block 32×32 frames (q302's
    // mapping) keep the fingerprint space rich. The oracle replays
    // decode (the q300 closed form IS the decoded block), the
    // 32×32 → 9×8 floor-index resize (by = y//2, bx = (32x)//72 —
    // nested floor divisions compose), and the horizontal-gradient
    // bits per (doc, frame).
    Q(
      "q310_avi_scene_dedup",
      """WITH blk AS (
        |  SELECT doc_id, f.f AS frame, by.by AS by, bx.bx AS bx,
        |    CAST((doc_id * 29 + (f.f // 3) * 67 + by.by * 71 + bx.bx * 113) % 256
        |      AS BIGINT) AS v
        |  FROM documents,
        |       unnest(generate_series(0, 5)) AS f(f),
        |       unnest(generate_series(0, 3)) AS by(by),
        |       unnest(generate_series(0, 3)) AS bx(bx)),
        |dec AS (
        |  SELECT doc_id, frame, by, bx,
        |    GREATEST(CAST(0 AS BIGINT), LEAST(CAST(255 AS BIGINT),
        |      (((((((8 * (v - 128) + 8) >> 4) * 16) * 370728 + 2048) >> 12)
        |          * 370728 + 134217728) >> 28) + 128)) AS rec
        |  FROM blk),
        |grid AS (
        |  SELECT d.doc_id, d.frame, y.y AS y, x.x AS x, d.rec AS l
        |  FROM dec d,
        |       unnest(generate_series(0, 7)) AS y(y),
        |       unnest(generate_series(0, 8)) AS x(x)
        |  WHERE d.by = y.y // 2 AND d.bx = (32 * x.x) // 72),
        |g AS (
        |  SELECT a.doc_id, a.frame, a.y, a.x,
        |    CASE WHEN b.l > a.l THEN 1 ELSE 0 END AS bit
        |  FROM grid a JOIN grid b
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
      val media = graft.multimodal.Multimodal.synthesizeAviMjpeg(
        Tables.load(s, dir, "documents"), "doc_id", blocksW = 4, blocksH = 4)
      graft.multimodal.Multimodal.extractAviFrameDHash(media, side = 8)
        .groupBy("dhash")
        .agg(
          count(lit(1)).as("n_frames"),
          countDistinct(col("media_id")).as("n_media"),
          min(col("media_id")).as("min_doc"))
        .orderBy("dhash")
    }
  )
}
