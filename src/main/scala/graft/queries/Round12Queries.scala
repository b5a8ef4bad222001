package graft.queries

import graft.Tables
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Round-12 gates: ALPHA-CARRYING PNG (color types 6 and 4 — RGBA is the
  * web's most common PNG shape, so a real crawled image corpus lives or
  * dies on it) and 16-BIT grayscale (the scan/medical/archival shape),
  * all through [[graft.multimodal.PngCodec]]'s shared filter + Adam7
  * machinery. Decode composites alpha over a declared white background
  * into the shared pixel frame (`(a·c + (255−a)·255 + 127) / 255`,
  * integer truncation), so the oracle COMPOSES the channel recipe with
  * the alpha recipe in plain integer SQL — any drift in the 4-/2-byte
  * unfilter strides, the compositing arithmetic, or the 16-bit MSB
  * mapping lands off the hash.
  */
object Round12Queries {

  def all: Seq[Q] = Seq(

    // RGBA PNG (color type 6), INTERLACED — alpha through the Adam7 pass
    // grid: the q298/q322 channel recipes plus an alpha plane, composited
    // over white at decode. Oracle: per-pixel integer compositing
    // ((a·c + (255−a)·255 + 127) // 255 — nonnegative, so DuckDB // is
    // Java int division) then the shared feature algebra.
    Q(
      "q328_png_alpha",
      """WITH px AS (
        |  SELECT doc_id, y.y AS y, x.x AS x,
        |    (doc_id * 37 + y.y * 5 + x.x * 11) % 256 AS r0,
        |    (doc_id * 41 + y.y * 13 + x.x * 3) % 256 AS g0,
        |    (doc_id * 43 + y.y * 7 + x.x * 17) % 256 AS b0,
        |    (doc_id * 29 + y.y * 3 + x.x * 13) % 256 AS a
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
      val media = Multimodal.synthesizePngAlpha(
        Tables.load(s, dir, "documents"), "doc_id", interlaced = true)
      Multimodal.extractPngFeatures(media).orderBy("media_id")
    },

    // GRAY+ALPHA PNG (color type 4): two-byte pixels through the same
    // filter machinery, gray composited over white then widened to
    // r = g = b (luma = 1000·v).
    Q(
      "q329_png_gray_alpha",
      """WITH px AS (
        |  SELECT doc_id, y.y AS y, x.x AS x,
        |    (doc_id * 53 + y.y * 9 + x.x * 29) % 256 AS g0,
        |    (doc_id * 19 + y.y * 23 + x.x * 5) % 256 AS a
        |  FROM documents,
        |       unnest(generate_series(0, 11)) AS y(y),
        |       unnest(generate_series(0, 15)) AS x(x)),
        |cp AS (
        |  SELECT doc_id, y, x,
        |    (a * g0 + (255 - a) * 255 + 127) // 255 AS v
        |  FROM px),
        |lum AS (
        |  SELECT doc_id, y, x, v, 1000 * v AS l,
        |    lag(1000 * v) OVER (PARTITION BY doc_id, y ORDER BY x) AS pl
        |  FROM cp)
        |SELECT doc_id AS media_id,
        |  CAST(16 AS BIGINT) AS width,
        |  CAST(12 AS BIGINT) AS height,
        |  CAST(192 AS BIGINT) AS n_pixels,
        |  CAST(sum(v) AS BIGINT) AS sum_r,
        |  CAST(sum(v) AS BIGINT) AS sum_g,
        |  CAST(sum(v) AS BIGINT) AS sum_b,
        |  CAST(min(l) AS BIGINT) AS luma_min,
        |  CAST(max(l) AS BIGINT) AS luma_max,
        |  CAST(sum(CASE WHEN pl IS NOT NULL AND abs(l - pl) > 50000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS edge_count
        |FROM lum GROUP BY doc_id ORDER BY media_id""".stripMargin) { (s, dir) =>
      val media = Multimodal.synthesizePngGrayAlpha(
        Tables.load(s, dir, "documents"), "doc_id")
      Multimodal.extractPngFeatures(media).orderBy("media_id")
    },

    // 16-BIT GRAYSCALE PNG (depth 16, color type 0), INTERLACED — the
    // filter/Paeth math is byte-oriented and depth-agnostic (bpp = 2);
    // decode maps each big-endian sample to the frame by its most
    // significant byte, so the oracle is the recipe // 256.
    Q(
      "q330_png_gray16",
      """WITH px AS (
        |  SELECT doc_id, y.y AS y, x.x AS x,
        |    ((doc_id * 257 + y.y * 1031 + x.x * 4099) % 65536) // 256 AS v
        |  FROM documents,
        |       unnest(generate_series(0, 11)) AS y(y),
        |       unnest(generate_series(0, 15)) AS x(x)),
        |lum AS (
        |  SELECT doc_id, y, x, v, 1000 * v AS l,
        |    lag(1000 * v) OVER (PARTITION BY doc_id, y ORDER BY x) AS pl
        |  FROM px)
        |SELECT doc_id AS media_id,
        |  CAST(16 AS BIGINT) AS width,
        |  CAST(12 AS BIGINT) AS height,
        |  CAST(192 AS BIGINT) AS n_pixels,
        |  CAST(sum(v) AS BIGINT) AS sum_r,
        |  CAST(sum(v) AS BIGINT) AS sum_g,
        |  CAST(sum(v) AS BIGINT) AS sum_b,
        |  CAST(min(l) AS BIGINT) AS luma_min,
        |  CAST(max(l) AS BIGINT) AS luma_max,
        |  CAST(sum(CASE WHEN pl IS NOT NULL AND abs(l - pl) > 50000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS edge_count
        |FROM lum GROUP BY doc_id ORDER BY media_id""".stripMargin) { (s, dir) =>
      val media = Multimodal.synthesizePngGray16(
        Tables.load(s, dir, "documents"), "doc_id", interlaced = true)
      Multimodal.extractPngFeatures(media).orderBy("media_id")
    },

    // STEREO-DECORRELATED FLAC (channel assignments 8/9/10 — what default
    // FLAC encoders emit for stereo; id mod 3 steers each doc through
    // left-side / right-side / mid-side, side at 17 bits). Losslessness
    // keeps the oracle codec-free: it replays the per-channel recipes,
    // interleaves (j = 2i + ch), and recomputes the q318 features — any
    // drift in the side reconstruction, the 17-bit reads, or mid's parity
    // bit lands off the hash.
    Q(
      "q331_flac_stereo",
      """WITH raw AS (
        |  SELECT doc_id, j,
        |    ((doc_id % 50) - 25) * 4 + (((j // 2) % 256) - 128) * ((doc_id % 3) + 1)
        |      - CASE WHEN j % 2 = 1
        |             THEN (((j // 2) % 16) - 8) * ((doc_id % 7) + 1)
        |             ELSE 0 END AS v
        |  FROM documents, unnest(generate_series(0, 1199)) AS u(j)),
        |s AS (
        |  SELECT doc_id, j, v,
        |    lag(v) OVER (PARTITION BY doc_id ORDER BY j) AS pv
        |  FROM raw)
        |SELECT doc_id AS media_id,
        |  CAST(16000 AS BIGINT) AS sr,
        |  CAST(2 AS BIGINT) AS channels,
        |  CAST(1200 AS BIGINT) AS n_samples,
        |  CAST(600 * 1000 // 16000 AS BIGINT) AS duration_ms,
        |  CAST(min(v) AS BIGINT) AS peak_min,
        |  CAST(max(v) AS BIGINT) AS peak_max,
        |  CAST(sum(CASE WHEN pv IS NOT NULL AND ((pv < 0) != (v < 0))
        |    THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
        |  CAST(sum(v) AS BIGINT) AS sum_samples,
        |  CAST(sum(v * v) AS BIGINT) AS sum_squares,
        |  round(sqrt(CAST(sum(v * v) AS DOUBLE) / 1200), 6) AS rms
        |FROM s GROUP BY doc_id ORDER BY media_id""".stripMargin) { (s, dir) =>
      val media = Multimodal.synthesizeFlacStereo(
        Tables.load(s, dir, "documents"), "doc_id")
      Multimodal.extractFlacFeatures(media)
        .withColumn("rms", round(col("rms"), 6))
        .orderBy("media_id")
    })
}
