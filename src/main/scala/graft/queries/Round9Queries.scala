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
      gif.unionByName(bmp).unionByName(png)
        .groupBy("dhash")
        .agg(
          count(lit(1)).as("n_media"),
          sum(when(col("_fmt") === "gif", 1L).otherwise(0L)).as("n_gif"),
          sum(when(col("_fmt") === "bmp", 1L).otherwise(0L)).as("n_bmp"),
          sum(when(col("_fmt") === "png", 1L).otherwise(0L)).as("n_png"))
        .orderBy("dhash")
    }
  )
}
