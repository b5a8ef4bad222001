package graft.queries

import graft.Tables
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Round-11 gates: FLAC — the audio family's entropy-coded member
  * ([[graft.multimodal.FlacCodec]]: fixed/LPC integer predictors +
  * Rice/Golomb residual coding, CRC-8/CRC-16 framing). FLAC is
  * LOSSLESS, so the gate is the strongest possible: decode ∘ encode
  * must reproduce the synthesis recipe sample-exactly, and the oracle
  * never sees a byte — it regenerates the samples arithmetically and
  * recomputes the features. Any drift in bit packing, predictor math,
  * Rice/escape coding, or frame headers lands off the hash.
  */
object Round11Queries {

  def all: Seq[Q] = Seq(

    // REAL lossless-compressed audio decode: three recipe shapes by
    // doc parity-of-3 steer the encoder down different subframe paths
    // (CONSTANT / low-order FIXED with small Rice params / full-range
    // noise hitting large params or the 5-bit raw escape), so one query
    // covers the whole coding surface the synthesized corpus can reach.
    Q(
      "q318_flac_features",
      """WITH raw AS (
        |  SELECT doc_id, i,
        |    CASE WHEN doc_id % 3 = 0 THEN (doc_id * 13) % 200 - 100
        |         WHEN doc_id % 3 = 1 THEN
        |           ((doc_id % 50) - 25) * 4 + ((i % 256) - 128) * ((doc_id % 5) + 1)
        |         ELSE ((doc_id * 7919 + i * 104729) % 65536) - 32768 END AS v
        |  FROM documents, unnest(generate_series(0, 599)) AS u(i)),
        |s AS (
        |  SELECT doc_id, i, v,
        |    lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
        |  FROM raw)
        |SELECT doc_id AS media_id,
        |  CAST(16000 AS BIGINT) AS sr,
        |  CAST(1 AS BIGINT) AS channels,
        |  CAST(600 AS BIGINT) AS n_samples,
        |  CAST(600 * 1000 // 16000 AS BIGINT) AS duration_ms,
        |  CAST(min(v) AS BIGINT) AS peak_min,
        |  CAST(max(v) AS BIGINT) AS peak_max,
        |  CAST(sum(CASE WHEN pv IS NOT NULL AND ((pv < 0) != (v < 0))
        |    THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
        |  CAST(sum(v) AS BIGINT) AS sum_samples,
        |  CAST(sum(v * v) AS BIGINT) AS sum_squares,
        |  round(sqrt(CAST(sum(v * v) AS DOUBLE) / 600), 6) AS rms
        |FROM s GROUP BY doc_id ORDER BY media_id""".stripMargin) { (s, dir) =>
      val media = Multimodal.synthesizeFlac(Tables.load(s, dir, "documents"), "doc_id")
      Multimodal.extractFlacFeatures(media)
        .withColumn("rms", round(col("rms"), 6))
        .orderBy("media_id")
    })
}
