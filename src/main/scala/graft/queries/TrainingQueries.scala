package graft.queries

import graft.Tables
import graft.dedup.{MinHashLsh, NGramJaccard, SimHash}
import graft.multimodal.Multimodal
import graft.sim.Similarity
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

/** Beyond-reference operators for large-scale training-data pipelines
  * (BASELINE.json north star): dedup family, similarity search, text
  * analysis, multimodal plumbing — each backed by a DuckDB oracle that
  * recomputes the same recipe in SQL (md5-derived hashes keep every recipe
  * engine-portable; see module scaladocs for the scale story).
  */
object TrainingQueries {

  /** Shared oracle CTE: tokenized documents. */
  private val TokCte =
    "tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents)"

  /** Shared oracle CTE fragment: word 3-shingles (matches MinHashLsh.shingles). */
  private val ShCte =
    """sh AS (SELECT doc_id,
      |  CASE WHEN len(t) = 0 THEN CAST([] AS VARCHAR[])
      |       WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
      |       ELSE list_transform(generate_series(1, len(t) - 2),
      |                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
      |  END AS s FROM tok)""".stripMargin

  val all: Seq[Q] = Seq(

    // ---- dedup family -----------------------------------------------------

    // Exact dedup via hash-groupBy (map-side combine; one shuffle on the
    // content hash — the 100 TB shape of DISTINCT-by-content).
    Q(
      "q30_dedup_exact",
      """SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY text_hash ORDER BY keep_id""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .groupBy(md5(col("text")).as("text_hash"))
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy("keep_id")
    },

    // MinHash + LSH candidate pairs: shingle → 12-hash signature → 4 bands →
    // bucket join. The oracle recomputes the identical signature in SQL.
    Q(
      "q31_dedup_minhash_lsh",
      s"""WITH $TokCte, $ShCte,
         |sig AS (SELECT doc_id,
         |  list_transform(generate_series(0, 11), i ->
         |    list_aggregate(list_transform(s, sh2 -> md5(i::VARCHAR || ':' || sh2)), 'min')) AS g
         |  FROM sh WHERE len(s) > 0),
         |band AS (SELECT doc_id, u.b AS band,
         |    md5(array_to_string(g[u.b*3+1 : u.b*3+3], '|')) AS bucket
         |  FROM sig, unnest(generate_series(0, 3)) AS u(b))
         |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |FROM band a JOIN band b ON a.band = b.band AND a.bucket = b.bucket
         |  AND a.doc_id < b.doc_id
         |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      MinHashLsh.candidatePairs(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        shingleSize = 3, numHashes = 12, bands = 4)
        .orderBy("id_a", "id_b")
    },

    // SimHash fingerprints. Spark computes the segment-blocked pair join
    // (scalable pigeonhole index); the oracle brute-forces all pairs —
    // same answer, quadratic plan it can afford at oracle scale.
    Q(
      "q32_dedup_simhash",
      s"""WITH $TokCte,
         |fp AS (SELECT doc_id, array_to_string(list_transform(generate_series(0, 63), j ->
         |  CASE WHEN list_aggregate(list_transform(t, tok2 ->
         |    ((CAST(floor((strpos('0123456789abcdef', md5(tok2)[j//4+1]) - 1)
         |        / (2 ** (3 - j%4))) AS BIGINT) % 2) * 2 - 1)), 'sum') > 0
         |  THEN '1' ELSE '0' END), '') AS f FROM tok)
         |SELECT * FROM (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    len(list_filter(generate_series(1, 64), i -> a.f[i] != b.f[i])) AS hamming
         |  FROM fp a JOIN fp b ON a.doc_id < b.doc_id)
         |WHERE hamming <= 7 ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      SimHash.nearDuplicatePairs(
        Tables.load(s, dir, "documents"), "doc_id", "text", maxHamming = 7)
        .orderBy("id_a", "id_b")
    },

    // n-gram Jaccard as the exact verifier over LSH candidates (the
    // candidate→verify pipeline is the scale architecture: the quadratic
    // compare only ever runs on the near-linear candidate set).
    Q(
      "q33_dedup_jaccard",
      s"""WITH $TokCte, $ShCte,
         |sig AS (SELECT doc_id,
         |  list_transform(generate_series(0, 11), i ->
         |    list_aggregate(list_transform(s, sh2 -> md5(i::VARCHAR || ':' || sh2)), 'min')) AS g
         |  FROM sh WHERE len(s) > 0),
         |band AS (SELECT doc_id, u.b AS band,
         |    md5(array_to_string(g[u.b*3+1 : u.b*3+3], '|')) AS bucket
         |  FROM sig, unnest(generate_series(0, 3)) AS u(b)),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM band a JOIN band b ON a.band = b.band AND a.bucket = b.bucket
         |    AND a.doc_id < b.doc_id),
         |st AS (SELECT doc_id, list_distinct(s) AS ds FROM sh)
         |SELECT c.id_a, c.id_b,
         |  len(list_intersect(x.ds, y.ds)) * 1.0
         |    / (len(x.ds) + len(y.ds) - len(list_intersect(x.ds, y.ds))) AS jaccard
         |FROM cand c JOIN st x ON x.doc_id = c.id_a JOIN st y ON y.doc_id = c.id_b
         |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val cands = MinHashLsh.candidatePairs(docs, "doc_id", "text", 3, 12, 4)
      NGramJaccard.verifyPairs(cands, docs, "doc_id", "text", 3)
        .orderBy("id_a", "id_b")
    },

    // Embedding cosine near-dup pairs, blocked by the label column
    // (IVF-style blocking bounds the pair space).
    Q(
      "q34_dedup_embed",
      """WITH n AS (SELECT vec_id, label, embedding,
        |  sqrt(list_aggregate(list_transform(generate_series(1, len(embedding)),
        |       i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE), 'sum')) AS nrm
        |  FROM embeddings)
        |SELECT * FROM (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    round(list_aggregate(list_transform(generate_series(1, len(a.embedding)),
        |      i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE), 'sum')
        |      / (a.nrm * b.nrm), 6) AS cos_sim
        |  FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id)
        |WHERE cos_sim >= 0.3 ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      Similarity.nearDuplicatePairs(
        Tables.load(s, dir, "embeddings"), "vec_id", "embedding", "label", minCosine = -2.0)
        .withColumn("cos_sim", round(col("cos_sim"), 6))
        .filter(col("cos_sim") >= 0.3)
        .orderBy("id_a", "id_b")
    },

    // ---- similarity search ------------------------------------------------

    // Brute-force cosine top-k: the exactness baseline every ANN variant is
    // measured against.
    Q(
      "q35_ann_brute",
      """WITH p AS (SELECT embedding AS pe FROM embeddings WHERE vec_id = 0),
        |sims AS (SELECT e.vec_id,
        |  round(
        |    list_aggregate(list_transform(generate_series(1, len(e.embedding)),
        |      i -> e.embedding[i]::DOUBLE * p.pe[i]::DOUBLE), 'sum')
        |    / (sqrt(list_aggregate(list_transform(generate_series(1, len(e.embedding)),
        |         i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE), 'sum'))
        |     * sqrt(list_aggregate(list_transform(generate_series(1, len(p.pe)),
        |         i -> p.pe[i]::DOUBLE * p.pe[i]::DOUBLE), 'sum'))), 6) AS sim
        |  FROM embeddings e, p)
        |SELECT vec_id, sim FROM sims ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin) {
      (s, dir) =>
        val emb = Tables.load(s, dir, "embeddings")
        val probe = emb.filter(col("vec_id") === 0)
          .select("embedding").head().getSeq[Float](0)
        Similarity.bruteForceTopK(emb, "vec_id", "embedding", probe, 10)
          .withColumn("sim", round(col("sim"), 6))
          .orderBy(col("sim").desc, col("vec_id"))
    },

    // IVF ANN: centroid per label cluster, probe → nearest cell → scan only
    // that cell (the scale path: cells/nProbe of the corpus is never read).
    Q(
      "q36_ann_ivf",
      """WITH cm AS (SELECT label, i, avg(embedding[i]::DOUBLE) AS m
        |    FROM embeddings, unnest(generate_series(1, 64)) AS u(i) GROUP BY label, i),
        |cent AS (SELECT label, list(m ORDER BY i) AS c FROM cm GROUP BY label),
        |p AS (SELECT embedding AS pe FROM embeddings WHERE vec_id = 0),
        |best AS (SELECT label FROM cent, p
        |  ORDER BY list_aggregate(list_transform(generate_series(1, 64),
        |      i -> c[i] * pe[i]::DOUBLE), 'sum')
        |    / (sqrt(list_aggregate(list_transform(generate_series(1, 64), i -> c[i]*c[i]), 'sum'))
        |     * sqrt(list_aggregate(list_transform(generate_series(1, 64),
        |         i -> pe[i]::DOUBLE * pe[i]::DOUBLE), 'sum'))) DESC, label
        |  LIMIT 1)
        |SELECT e.vec_id,
        |  round(list_aggregate(list_transform(generate_series(1, 64),
        |      i -> e.embedding[i]::DOUBLE * p.pe[i]::DOUBLE), 'sum')
        |    / (sqrt(list_aggregate(list_transform(generate_series(1, 64),
        |         i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE), 'sum'))
        |     * sqrt(list_aggregate(list_transform(generate_series(1, 64),
        |         i -> p.pe[i]::DOUBLE * p.pe[i]::DOUBLE), 'sum'))), 6) AS sim
        |FROM embeddings e JOIN best USING (label), p
        |ORDER BY sim DESC, vec_id LIMIT 5""".stripMargin) { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      val probe = emb.filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0)
      val centroids = Similarity.centroidsOf(emb, "embedding", "label")
      Similarity.ivfTopK(emb, centroids, "vec_id", "embedding", "label", probe, 5, nProbe = 1)
        .withColumn("sim", round(col("sim"), 6))
        .orderBy(col("sim").desc, col("vec_id"))
    },

    // Sign-LSH bucketing over deterministic md5-derived hyperplanes — the
    // bucket histogram (the index structure itself, verifiable in SQL).
    Q(
      "q37_ann_lsh_buckets",
      """SELECT bucket, count(*) AS n FROM (
        |  SELECT array_to_string(list_transform(generate_series(0, 7), h ->
        |    CASE WHEN list_aggregate(list_transform(generate_series(1, 64), i ->
        |      embedding[i]::DOUBLE *
        |      ((CAST(('0x' || substr(md5(h::VARCHAR || ':' || (i-1)::VARCHAR), 1, 6)) AS BIGINT)::DOUBLE
        |        / 8388608.0) - 1.0)), 'sum') >= 0
        |    THEN '1' ELSE '0' END), '') AS bucket
        |  FROM embeddings)
        |GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "embeddings")
        .select(Similarity.hyperplaneBucket(col("embedding"), 8).as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"))
        .orderBy("bucket")
    },

    // ---- text analysis ----------------------------------------------------

    // Token counting: whitespace-word count + BPE-ish subword estimate.
    Q(
      "q38_text_tokens",
      """SELECT doc_id,
        |  len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), x -> x != '')) AS n_tokens,
        |  len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\s]'), x -> x != '')) AS n_subwords
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(
          col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
          TextAnalysis.subwordCountEstimate(col("text")).cast("long").as("n_subwords"))
        .orderBy("doc_id")
    },

    // Quality scoring: exact integer ratios → identical doubles everywhere.
    Q(
      "q39_text_quality",
      """WITH tok AS (SELECT doc_id, text,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents)
        |SELECT doc_id, length(text) AS n_chars,
        |  CASE WHEN len(t) = 0 THEN 0.0
        |       ELSE len(list_distinct(t)) * 1.0 / len(t) END AS distinct_ratio,
        |  CASE WHEN len(t) = 0 THEN 0.0
        |       ELSE list_aggregate(list_transform(t, x -> len(x)), 'sum') * 1.0 / len(t)
        |  END AS mean_token_len,
        |  CASE WHEN length(text) = 0 THEN 0.0
        |       ELSE (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))) * 1.0
        |            / length(text) END AS punct_ratio
        |FROM tok ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(
          col("doc_id"),
          length(col("text")).cast("long").as("n_chars"),
          TextAnalysis.distinctTokenRatio(col("text")).as("distinct_ratio"),
          TextAnalysis.meanTokenLength(col("text")).as("mean_token_len"),
          TextAnalysis.punctRatio(col("text")).as("punct_ratio"))
        .orderBy("doc_id")
    },

    // Heuristic language ID: stopword votes, deterministic argmax.
    Q(
      "q40_text_langid",
      """WITH v AS (SELECT doc_id,
        |  regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
        |sc AS (SELECT doc_id,
        |  len(list_filter(t, x -> x IN ('the','and','of','to','in','is','a'))) AS s_en,
        |  len(list_filter(t, x -> x IN ('el','la','de','que','los','es','una'))) AS s_es,
        |  len(list_filter(t, x -> x IN ('der','die','und','das','ist','ein','nicht'))) AS s_de,
        |  len(list_filter(t, x -> x IN ('le','la','les','des','est','une','dans'))) AS s_fr
        |  FROM v)
        |SELECT doc_id,
        |  CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en > 0 THEN 'en'
        |       WHEN s_es >= s_de AND s_es >= s_fr AND s_es > 0 THEN 'es'
        |       WHEN s_de >= s_fr AND s_de > 0 THEN 'de'
        |       WHEN s_fr > 0 THEN 'fr'
        |       ELSE 'und' END AS lang_guess
        |FROM sc ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_guess"))
        .orderBy("doc_id")
    },

    // Document fingerprints: bag fingerprint + winnowing-style rolling min.
    Q(
      "q41_text_fingerprint",
      """SELECT doc_id,
        |  md5(array_to_string(list_sort(list_distinct(
        |      regexp_extract_all(lower(text), '[a-z0-9]+'))), ' ')) AS bag_fp,
        |  CASE WHEN length(regexp_replace(lower(text), '\s+', ' ', 'g')) < 8
        |       THEN md5(regexp_replace(lower(text), '\s+', ' ', 'g'))
        |       ELSE list_aggregate(list_transform(
        |         generate_series(1, length(regexp_replace(lower(text), '\s+', ' ', 'g')) - 7),
        |         i -> md5(substr(regexp_replace(lower(text), '\s+', ' ', 'g'), i, 8))), 'min')
        |  END AS roll_fp
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(
          col("doc_id"),
          TextAnalysis.bagFingerprint(col("text")).as("bag_fp"),
          TextAnalysis.rollingMinFingerprint(col("text"), 8).as("roll_fp"))
        .orderBy("doc_id")
    },

    // ---- multimodal -------------------------------------------------------

    // Binary payload plumbing: byte length + evenly-spaced byte-range
    // "frame samples" (hex). Text bytes stand in for media payloads; the
    // schema/partitioning/slicing is the real contract. Kept alongside
    // the REAL codec gates (WAV q29, BMP q100, GIF q282, PNG q298,
    // JPEG q300, animated GIF q304) because this byte-range access
    // pattern is how formats with no in-container decoder (MP3/H.264)
    // still flow through the pipeline.
    Q(
      "q42_mm_frames",
      """WITH h AS (SELECT doc_id, lower(hex(encode(text))) AS hx,
        |    greatest(octet_length(encode(text)) - 4, 1) AS g,
        |    octet_length(encode(text)) AS nb FROM documents)
        |SELECT doc_id AS media_id, nb AS n_bytes,
        |  substr(hx, 1, 8) AS frame0,
        |  substr(hx, CAST(floor(g / 2.0) AS INT) * 2 + 1, 8) AS frame1,
        |  substr(hx, g * 2 + 1, 8) AS frame2
        |FROM h ORDER BY media_id""".stripMargin) { (s, dir) =>
      val media = Multimodal.fromText(Tables.load(s, dir, "documents"), "doc_id", "text")
      val slices = Multimodal.sampleSlices(col("payload"), 3, 4)
      media.select(
        col("media_id"),
        Multimodal.payloadBytes(col("payload")).as("n_bytes"),
        slices.getItem(0).as("frame0"),
        slices.getItem(1).as("frame1"),
        slices.getItem(2).as("frame2"))
        .orderBy("media_id")
    },

    // Stubbed decode+featurize through the mapPartitions batch path: the
    // oracle recomputes the md5-derived fake features from the same bytes.
    // This gate pins the StubDecoder CONTRACT (batch shape, schema,
    // per-partition amortization) that the six real codecs (WavCodec,
    // BmpCodec, GifCodec, PngCodec, JpegCodec, and the animated-GIF
    // frame path) all plug into — the stub remains only for MP3/H.264,
    // whose entropy coders genuinely aren't implementable-from-spec in
    // this round's budget.
    Q(
      "q43_mm_features",
      """WITH f AS (SELECT doc_id, md5(text) AS h FROM documents)
        |SELECT doc_id AS media_id,
        |  round(CAST(CAST((((strpos('0123456789abcdef', h[1])-1)*16 + (strpos('0123456789abcdef', h[2])-1))*256
        |       + ((strpos('0123456789abcdef', h[3])-1)*16 + (strpos('0123456789abcdef', h[4])-1)))
        |       / 65535.0 AS FLOAT) AS DOUBLE), 4) AS f0,
        |  round(CAST(CAST((((strpos('0123456789abcdef', h[5])-1)*16 + (strpos('0123456789abcdef', h[6])-1))*256
        |       + ((strpos('0123456789abcdef', h[7])-1)*16 + (strpos('0123456789abcdef', h[8])-1)))
        |       / 65535.0 AS FLOAT) AS DOUBLE), 4) AS f1
        |FROM f ORDER BY media_id""".stripMargin) { (s, dir) =>
      val media = Multimodal.fromText(Tables.load(s, dir, "documents"), "doc_id", "text")
      Multimodal.extractFeatures(media)
        .select(
          col("media_id"),
          round(element_at(col("features"), 1).cast("double"), 4).as("f0"),
          round(element_at(col("features"), 2).cast("double"), 4).as("f1"))
        .orderBy("media_id")
    },

    // REAL audio decode (fills the historically skipped q29 slot): synthetic
    // 16-bit PCM payloads round-trip through an actual RIFF/WAVE encode →
    // chunk-walk → sample decode (WavCodec — pure JVM, no codec lib needed),
    // then exact integer features. The oracle NEVER sees the bytes: it
    // regenerates the same samples from the integer recipe and recomputes
    // the features directly, so any parsing/endianness/header bug on the
    // Spark side breaks the hash match.
    Q(
      "q29_wav_features",
      """WITH s AS (
        |  SELECT doc_id, i,
        |    ((doc_id * 7919 + i * 104729) % 65536) - 32768 AS v,
        |    lag(((doc_id * 7919 + i * 104729) % 65536) - 32768)
        |      OVER (PARTITION BY doc_id ORDER BY i) AS pv
        |  FROM documents, unnest(generate_series(0, 440)) AS u(i))
        |SELECT doc_id AS media_id,
        |  CAST(44100 AS BIGINT) AS sr,
        |  CAST(1 AS BIGINT) AS channels,
        |  CAST(441 AS BIGINT) AS n_samples,
        |  CAST(441 * 1000 // 44100 AS BIGINT) AS duration_ms,
        |  CAST(min(v) AS BIGINT) AS peak_min,
        |  CAST(max(v) AS BIGINT) AS peak_max,
        |  CAST(sum(CASE WHEN pv IS NOT NULL AND ((pv < 0) != (v < 0)) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS zero_crossings,
        |  CAST(sum(v) AS BIGINT) AS sum_samples,
        |  CAST(sum(v * v) AS BIGINT) AS sum_squares,
        |  round(sqrt(CAST(sum(v * v) AS DOUBLE) / 441), 6) AS rms
        |FROM s GROUP BY doc_id ORDER BY media_id""".stripMargin) { (s, dir) =>
      val media = Multimodal.synthesizeWav(Tables.load(s, dir, "documents"), "doc_id")
      Multimodal.extractWavFeatures(media)
        .withColumn("rms", round(col("rms"), 6))
        .orderBy("media_id")
    },

    // REAL image decode: the BMP twin of q29 — synthetic 24-bit pixels
    // round-trip through an actual DIB encode (bottom-up rows, 4-byte row
    // padding, BGR order) → header parse → pixel decode, while the oracle
    // regenerates the same pixels from the integer recipe and recomputes
    // channel sums, luma extrema, and horizontal edge counts directly.
    Q(
      "q100_bmp_features",
      """WITH px AS (
        |  SELECT doc_id, y.y AS y, x.x AS x,
        |    (doc_id * 31 + y.y * 7 + x.x * 13) % 256 AS r,
        |    (doc_id * 17 + y.y * 11 + x.x * 5) % 256 AS g,
        |    (doc_id * 23 + y.y * 3 + x.x * 19) % 256 AS b
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
      val media = Multimodal.synthesizeBmp(Tables.load(s, dir, "documents"), "doc_id")
      Multimodal.extractBmpFeatures(media).orderBy("media_id")
    },

    // decode → RESIZE → featurize (the thumbnailing stage): nearest-neighbor
    // 16×12 → 8×6, a pure floor-index sampling, so the oracle replays the
    // source-pixel mapping sx = x·16//8, sy = y·12//6 over the integer
    // recipe and recomputes the resized image's features exactly.
    Q(
      "q104_bmp_resize",
      """WITH px AS (
        |  SELECT doc_id, y.y AS y, x.x AS x,
        |    (doc_id * 31 + ((y.y * 12) // 6) * 7 + ((x.x * 16) // 8) * 13) % 256 AS r,
        |    (doc_id * 17 + ((y.y * 12) // 6) * 11 + ((x.x * 16) // 8) * 5) % 256 AS g,
        |    (doc_id * 23 + ((y.y * 12) // 6) * 3 + ((x.x * 16) // 8) * 19) % 256 AS b
        |  FROM documents,
        |       unnest(generate_series(0, 5)) AS y(y),
        |       unnest(generate_series(0, 7)) AS x(x)),
        |lum AS (
        |  SELECT doc_id, y, x, r, g, b, 299 * r + 587 * g + 114 * b AS l,
        |    lag(299 * r + 587 * g + 114 * b)
        |      OVER (PARTITION BY doc_id, y ORDER BY x) AS pl
        |  FROM px)
        |SELECT doc_id AS media_id,
        |  CAST(8 AS BIGINT) AS width,
        |  CAST(6 AS BIGINT) AS height,
        |  CAST(48 AS BIGINT) AS n_pixels,
        |  CAST(sum(r) AS BIGINT) AS sum_r,
        |  CAST(sum(g) AS BIGINT) AS sum_g,
        |  CAST(sum(b) AS BIGINT) AS sum_b,
        |  CAST(min(l) AS BIGINT) AS luma_min,
        |  CAST(max(l) AS BIGINT) AS luma_max,
        |  CAST(sum(CASE WHEN pl IS NOT NULL AND abs(l - pl) > 50000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS edge_count
        |FROM lum GROUP BY doc_id ORDER BY media_id""".stripMargin) { (s, dir) =>
      val media = Multimodal.synthesizeBmp(Tables.load(s, dir, "documents"), "doc_id")
      Multimodal.extractBmpFeatures(media, resizeTo = Some((8, 6))).orderBy("media_id")
    },

    // PII scrub: email then URL replaced with typed placeholders (the text
    // is salted with synthetic PII so the op has something to remove).
    Q(
      "q60_text_redact",
      """SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(text || ' mail doc' || doc_id || '@corp.example now http://ex.com/' || doc_id,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    'https?://[^\s]+', '<URL>', 'g') AS redacted
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val salted = concat(
        col("text"), lit(" mail doc"), col("doc_id"), lit("@corp.example now http://ex.com/"), col("doc_id"))
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.redactPii(salted).as("redacted"))
        .orderBy("doc_id")
    },

    // Repetition scoring: most-frequent-bigram share (degenerate-text flag).
    Q(
      "q61_text_repetition",
      """WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
        |g AS (SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(t) - 1, 0)),
        |        i -> t[i] || ' ' || t[i+1])) AS gram FROM tok),
        |pg AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY doc_id, gram),
        |sc AS (SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS repetition FROM pg GROUP BY doc_id)
        |SELECT t.doc_id AS doc_id, coalesce(sc.repetition, 0.0) AS repetition
        |FROM tok t LEFT JOIN sc ON t.doc_id = sc.doc_id
        |ORDER BY t.doc_id""".stripMargin) { (s, dir) =>
      TextAnalysis.repetitionScores(Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    // Sliding token-window chunking (context-window preprocessing): 64-token
    // windows advancing by 48 (16-token overlap); every token lands in a
    // chunk, the tail chunk may be short. One codegen'd projection + explode,
    // no shuffle — output grows n/stride per doc, linear in the corpus.
    Q(
      "q112_chunk_windows",
      """WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
        |c AS (SELECT doc_id, t, len(t) AS n FROM tok WHERE len(t) > 0)
        |SELECT doc_id, u.i AS chunk_id,
        |  array_to_string(t[u.i*48+1 : least(u.i*48+64, n)], ' ') AS chunk_text,
        |  least(64, n - u.i*48) AS n_tokens
        |FROM c, unnest(generate_series(0,
        |    (greatest(n - 64, 0) + 47) // 48)) AS u(i)
        |ORDER BY doc_id, chunk_id""".stripMargin) { (s, dir) =>
      TextAnalysis.chunkTokenWindows(
        Tables.load(s, dir, "documents"), "doc_id", "text", window = 64, stride = 48)
        .orderBy("doc_id", "chunk_id")
    },

    // Banded (multi-probe) sign-LSH candidate pairs: 16 planes in 2 bands of
    // 8 — agreement on ALL bits of ANY band makes a candidate. Per-band
    // selectivity stays at 2^8 cells while the OR across bands recovers the
    // recall a single 16-bit key would lose to one flipped sign; band 0
    // reuses plane indices 0..7, so these candidates are a strict superset
    // of the plain 8-plane q37 bucketing (pinned in SimilaritySpec too).
    Q(
      "q115_ann_lsh_banded",
      """WITH bits AS (
        |  SELECT vec_id, array_to_string(list_transform(generate_series(0, 15), h ->
        |    CASE WHEN list_aggregate(list_transform(generate_series(1, 64), i ->
        |      embedding[i]::DOUBLE *
        |      ((CAST(('0x' || substr(md5(h::VARCHAR || ':' || (i-1)::VARCHAR), 1, 6)) AS BIGINT)::DOUBLE
        |        / 8388608.0) - 1.0)), 'sum') >= 0
        |    THEN '1' ELSE '0' END), '') AS f
        |  FROM embeddings),
        |band AS (SELECT vec_id, u.b AS band, substr(f, u.b*8+1, 8) AS bucket
        |  FROM bits, unnest(generate_series(0, 1)) AS u(b))
        |SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        |FROM band a JOIN band b ON a.band = b.band AND a.bucket = b.bucket
        |  AND a.vec_id < b.vec_id
        |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      Similarity.bandedCandidatePairs(
        Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
        numPlanes = 16, bands = 2, dims = 64)
        .orderBy("id_a", "id_b")
    },

    // q34's embedding near-dup under a block cap that FORCES triangle
    // sub-blocking (cap 16 vs max block ~59 → g=4, every block split): the
    // oracle is q34's exact SQL, so the capped plan is pinned row-identical
    // to the uncapped semantics — the skew guard provably changes the
    // schedule, never the answer.
    Q(
      "q116_embed_capped",
      """WITH n AS (SELECT vec_id, label, embedding,
        |  sqrt(list_aggregate(list_transform(generate_series(1, len(embedding)),
        |       i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE), 'sum')) AS nrm
        |  FROM embeddings)
        |SELECT * FROM (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    round(list_aggregate(list_transform(generate_series(1, len(a.embedding)),
        |      i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE), 'sum')
        |      / (a.nrm * b.nrm), 6) AS cos_sim
        |  FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id)
        |WHERE cos_sim >= 0.3 ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      Similarity.nearDuplicatePairs(
        Tables.load(s, dir, "embeddings"), "vec_id", "embedding", "label",
        minCosine = -2.0, maxBlockRows = 16)
        .withColumn("cos_sim", round(col("cos_sim"), 6))
        .filter(col("cos_sim") >= 0.3)
        .orderBy("id_a", "id_b")
    },

    // Multi-probe IVF: the probe scans its TWO nearest cells, not one —
    // the recall knob every IVF deployment turns (nProbe trades scan
    // fraction for recall; the plan is identical, just a 2-row broadcast).
    Q(
      "q117_ann_ivf_multiprobe",
      """WITH cm AS (SELECT label, i, avg(embedding[i]::DOUBLE) AS m
        |    FROM embeddings, unnest(generate_series(1, 64)) AS u(i) GROUP BY label, i),
        |cent AS (SELECT label, list(m ORDER BY i) AS c FROM cm GROUP BY label),
        |p AS (SELECT embedding AS pe FROM embeddings WHERE vec_id = 0),
        |best AS (SELECT label FROM cent, p
        |  ORDER BY list_aggregate(list_transform(generate_series(1, 64),
        |      i -> c[i] * pe[i]::DOUBLE), 'sum')
        |    / (sqrt(list_aggregate(list_transform(generate_series(1, 64), i -> c[i]*c[i]), 'sum'))
        |     * sqrt(list_aggregate(list_transform(generate_series(1, 64),
        |         i -> pe[i]::DOUBLE * pe[i]::DOUBLE), 'sum'))) DESC, label
        |  LIMIT 2)
        |SELECT e.vec_id,
        |  round(list_aggregate(list_transform(generate_series(1, 64),
        |      i -> e.embedding[i]::DOUBLE * p.pe[i]::DOUBLE), 'sum')
        |    / (sqrt(list_aggregate(list_transform(generate_series(1, 64),
        |         i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE), 'sum'))
        |     * sqrt(list_aggregate(list_transform(generate_series(1, 64),
        |         i -> p.pe[i]::DOUBLE * p.pe[i]::DOUBLE), 'sum'))), 6) AS sim
        |FROM embeddings e JOIN best USING (label), p
        |ORDER BY sim DESC, vec_id LIMIT 5""".stripMargin) { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      val probe = emb.filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0)
      val centroids = Similarity.centroidsOf(emb, "embedding", "label")
      Similarity.ivfTopK(emb, centroids, "vec_id", "embedding", "label", probe, 5, nProbe = 2)
        .withColumn("sim", round(col("sim"), 6))
        .orderBy(col("sim").desc, col("vec_id"))
    },

    // ANN over an int8-quantized corpus (the 4x-storage-cut path): corpus
    // vectors quantize to int8 codes + one double scale, search runs on the
    // DEQUANTIZED reconstruction against the full-precision probe. The
    // oracle replays quantize -> dequantize -> cosine exactly (floor-based
    // round-half-up, engine-portable), so any quantization drift breaks the
    // hash, not just the ranking.
    Q(
      "q118_ann_quantized",
      """WITH s AS (SELECT vec_id, embedding,
        |    greatest(list_aggregate(list_transform(embedding, x -> abs(x::DOUBLE)), 'max')
        |      / 127.0, 1e-30) AS sc
        |  FROM embeddings),
        |d AS (SELECT vec_id,
        |    list_transform(embedding, x -> floor(x::DOUBLE / sc + 0.5) * sc) AS dv
        |  FROM s),
        |p AS (SELECT embedding AS pe FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id,
        |  round(list_aggregate(list_transform(generate_series(1, 64),
        |      i -> dv[i] * pe[i]::DOUBLE), 'sum')
        |    / (sqrt(list_aggregate(list_transform(generate_series(1, 64),
        |         i -> dv[i] * dv[i]), 'sum'))
        |     * sqrt(list_aggregate(list_transform(generate_series(1, 64),
        |         i -> pe[i]::DOUBLE * pe[i]::DOUBLE), 'sum'))), 6) AS sim
        |FROM d, p ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin) { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      val probe = emb.filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0)
      val probeCol = array(probe.map(v => lit(v)): _*)
      val stored = emb
        .select(col("vec_id"), col("embedding"), Similarity.int8Scale(col("embedding")).as("_sc"))
        .select(col("vec_id"), col("_sc"),
          Similarity.quantizeInt8(col("embedding"), col("_sc")).as("_q"))
      stored
        .select(col("vec_id"),
          Similarity.cosine(
            Similarity.dequantizeInt8(col("_q"), col("_sc")), probeCol).as("sim"))
        .withColumn("sim", round(col("sim"), 6))
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(10)
    },

    // Out-of-vocabulary share per document against the corpus's own
    // frequent-token vocabulary (tf >= 10): the self-referential quality
    // signal — OCR garbage and off-language docs spike it. Exact integer
    // ratio, engine-portable.
    Q(
      "q119_oov_ratio",
      """WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
        |occ AS (SELECT doc_id, unnest(t) AS token FROM tok),
        |voc AS (SELECT token FROM (SELECT token, count(*) AS c FROM occ GROUP BY token)
        |        WHERE c >= 10),
        |per AS (SELECT occ.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |    CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
        |  FROM occ LEFT JOIN voc v USING (token) GROUP BY occ.doc_id)
        |SELECT tok.doc_id,
        |  coalesce(per.n_tokens, 0) AS n_tokens,
        |  coalesce(per.n_oov, 0) AS n_oov,
        |  CASE WHEN coalesce(per.n_tokens, 0) = 0 THEN 0.0
        |       ELSE per.n_oov * 1.0 / per.n_tokens END AS oov_ratio
        |FROM tok LEFT JOIN per USING (doc_id) ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.text.Vocab.oovRatios(
        Tables.load(s, dir, "documents"), "doc_id", "text", minCount = 10L)
        .orderBy("doc_id")
    },

    // Perceptual image fingerprint: REAL BMP decode -> 8x8 nearest resize ->
    // average-hash (luma-vs-mean bit per pixel, integer cross-product
    // compare). The oracle regenerates the resized pixels from the integer
    // recipe and recomputes the bitstring — header parse, row padding,
    // BGR order, resize mapping, and the hash itself all sit on the hash
    // match. Equal aHashes feed the exact-dedup groupBy; Hamming <= k feeds
    // the near-dup join — the q30/q32 machinery applied to images.
    Q(
      "q122_image_ahash",
      """WITH px AS (
        |  SELECT doc_id, y.y AS y, x.x AS x,
        |    (doc_id * 31 + ((y.y * 12) // 8) * 7 + ((x.x * 16) // 8) * 13) % 256 AS r,
        |    (doc_id * 17 + ((y.y * 12) // 8) * 11 + ((x.x * 16) // 8) * 5) % 256 AS g,
        |    (doc_id * 23 + ((y.y * 12) // 8) * 3 + ((x.x * 16) // 8) * 19) % 256 AS b
        |  FROM documents,
        |       unnest(generate_series(0, 7)) AS y(y),
        |       unnest(generate_series(0, 7)) AS x(x)),
        |lum AS (SELECT doc_id, y, x, 299*r + 587*g + 114*b AS l FROM px),
        |t AS (SELECT doc_id, CAST(sum(l) AS BIGINT) AS total FROM lum GROUP BY doc_id)
        |SELECT lum.doc_id AS media_id,
        |  array_to_string(list(CASE WHEN l * 64 > total THEN '1' ELSE '0' END ORDER BY y, x), '')
        |    AS ahash,
        |  CAST(sum(CASE WHEN l * 64 > total THEN 1 ELSE 0 END) AS BIGINT) AS n_ones
        |FROM lum JOIN t USING (doc_id) GROUP BY lum.doc_id ORDER BY media_id""".stripMargin) {
      (s, dir) =>
        val media = Multimodal.synthesizeBmp(Tables.load(s, dir, "documents"), "doc_id")
        Multimodal.extractBmpAHash(media, side = 8).orderBy("media_id")
    },

    // Acoustic fingerprint: REAL WAV decode -> frame energies (44-sample
    // frames, exact integer sum of squares) -> sign-of-delta bitstring, the
    // audio twin of q122. The oracle regenerates the samples from the q29
    // integer recipe and recomputes energies + bits directly.
    Q(
      "q123_audio_fingerprint",
      """WITH s AS (SELECT doc_id, i,
        |    ((doc_id * 7919 + i * 104729) % 65536) - 32768 AS v
        |  FROM documents, unnest(generate_series(0, 440)) AS u(i)),
        |fe AS (SELECT doc_id, i // 44 AS f, CAST(sum(v*v) AS BIGINT) AS e
        |  FROM s WHERE i < 440 GROUP BY doc_id, i // 44),
        |d AS (SELECT doc_id, f, e, lag(e) OVER (PARTITION BY doc_id ORDER BY f) AS pe FROM fe)
        |SELECT doc_id AS media_id,
        |  CAST(10 AS BIGINT) AS n_frames,
        |  array_to_string(list(CASE WHEN e > pe THEN '1' ELSE '0' END ORDER BY f)
        |    FILTER (WHERE pe IS NOT NULL), '') AS fp,
        |  CAST(sum(e) AS BIGINT) AS sum_energy
        |FROM d GROUP BY doc_id ORDER BY media_id""".stripMargin) { (s, dir) =>
      val media = Multimodal.synthesizeWav(Tables.load(s, dir, "documents"), "doc_id")
      Multimodal.extractWavFingerprint(media, frameLen = 44).orderBy("media_id")
    },

    // IMAGE near-duplicate pairs: aHash fingerprints (q122) through the
    // SAME pigeonhole Hamming index the text simhash uses (q32) — the
    // modality-independent dedup core applied to binary media. The oracle
    // brute-forces all pairs from the pixel recipe; Spark must reach the
    // identical pair set via the segment equi-join.
    Q(
      "q128_image_neardup",
      """WITH px AS (
        |  SELECT doc_id, y.y AS y, x.x AS x,
        |    (doc_id * 31 + ((y.y * 12) // 8) * 7 + ((x.x * 16) // 8) * 13) % 256 AS r,
        |    (doc_id * 17 + ((y.y * 12) // 8) * 11 + ((x.x * 16) // 8) * 5) % 256 AS g,
        |    (doc_id * 23 + ((y.y * 12) // 8) * 3 + ((x.x * 16) // 8) * 19) % 256 AS b
        |  FROM documents,
        |       unnest(generate_series(0, 7)) AS y(y),
        |       unnest(generate_series(0, 7)) AS x(x)),
        |lum AS (SELECT doc_id, y, x, 299*r + 587*g + 114*b AS l FROM px),
        |t AS (SELECT doc_id, sum(l) AS total FROM lum GROUP BY doc_id),
        |fp AS (SELECT lum.doc_id, list(CASE WHEN l*64 > total THEN 1 ELSE 0 END ORDER BY y, x)
        |    AS bits
        |  FROM lum JOIN t USING (doc_id) GROUP BY lum.doc_id)
        |SELECT * FROM (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    CAST(len(list_filter(generate_series(1, 64), i -> a.bits[i] != b.bits[i]))
        |      AS BIGINT) AS hamming
        |  FROM fp a JOIN fp b ON a.doc_id < b.doc_id)
        |WHERE hamming <= 3 ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      val media = Multimodal.synthesizeBmp(Tables.load(s, dir, "documents"), "doc_id")
      val fp = Multimodal.extractBmpAHash(media, side = 8)
        .select(col("media_id"), col("ahash"),
          graft.dedup.SimHash.packBits64(col("ahash")).as("_fpl"))
      graft.dedup.SimHash
        .pairsFromFingerprints(fp, "media_id", "ahash", "_fpl", bits = 64, maxHamming = 3)
        .orderBy("id_a", "id_b")
    },

    // INCREMENTAL near-dup: a "new batch" (doc_id % 5 = 0) probes the
    // stored corpus band index instead of re-running the full self-join —
    // the daily-ingest shape at 100 TB (the corpus side is a parquet table
    // computed once; the shuffle carries the new batch + colliding corpus
    // rows only). The oracle is the FULL q31 pair set filtered to pairs
    // with >= 1 new-side member: the incremental path must find exactly
    // the pairs the batch recompute would.
    Q(
      "q129_dedup_incremental",
      s"""WITH $TokCte, $ShCte,
         |sig AS (SELECT doc_id,
         |  list_transform(generate_series(0, 11), i ->
         |    list_aggregate(list_transform(s, sh2 -> md5(i::VARCHAR || ':' || sh2)), 'min')) AS g
         |  FROM sh WHERE len(s) > 0),
         |band AS (SELECT doc_id, u.b AS band,
         |    md5(array_to_string(g[u.b*3+1 : u.b*3+3], '|')) AS bucket
         |  FROM sig, unnest(generate_series(0, 3)) AS u(b))
         |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |FROM band a JOIN band b ON a.band = b.band AND a.bucket = b.bucket
         |  AND a.doc_id < b.doc_id
         |WHERE a.doc_id % 5 = 0 OR b.doc_id % 5 = 0
         |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      // the stored index already contains the new docs' rows — filtering it
      // IS the new batch's banded table (one signature pass, not two);
      // NearDupSpec exercises the separate bandedTable-per-batch path
      val corpusIndex = MinHashLsh.bandedTable(docs, "doc_id", "text", 3, 12, 4).persist()
      val newBatch = corpusIndex.filter(col("doc_id") % 5 === 0)
      MinHashLsh.candidatePairsAgainst(newBatch, corpusIndex, "doc_id")
        .orderBy("id_a", "id_b")
    },

    // HTML -> text extraction (the CommonCrawl intake step): synthesized
    // pages wrap each doc's text with title/script/heading/entities/comment;
    // extraction drops script blocks and comments, strips tags, decodes
    // entities AFTER stripping (so &lt;raw&gt; survives as literal text),
    // and collapses whitespace. The script and comment bodies span LINES
    // (chr(10) in the template) — real HTML's norm — so the (?s) on the
    // block patterns is load-bearing in both engines, not decorative. The
    // oracle replays the identical global regex chain.
    Q(
      "q130_html_extract",
      """WITH raw AS (SELECT doc_id,
        |    '<html><head><title>Doc ' || doc_id || '</title><script>var x=1;' || chr(10)
        |    || 'var y=2;</script></head>'
        |    || '<body><h1>' || upper(lang) || '</h1><p>' || text
        |    || ' &amp; more &lt;raw&gt;</p><!-- hidden' || chr(10) || 'note --></body></html>'
        |      AS h
        |  FROM documents),
        |s1 AS (SELECT doc_id,
        |    regexp_replace(h, '(?s)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>', ' ', 'g')
        |      AS t
        |  FROM raw),
        |s2 AS (SELECT doc_id, regexp_replace(t, '(?s)<!--.*?-->', ' ', 'g') AS t FROM s1),
        |s3 AS (SELECT doc_id, regexp_replace(t, '<[^>]*>', ' ', 'g') AS t FROM s2),
        |s4 AS (SELECT doc_id,
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
        |      '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'),
        |      '&#39;', '''', 'g'), '&amp;', '&', 'g') AS t
        |  FROM s3)
        |SELECT doc_id, trim(regexp_replace(t, '\s+', ' ', 'g')) AS extracted
        |FROM s4 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val html = concat(
        lit("<html><head><title>Doc "), col("doc_id").cast("string"),
        lit("</title><script>var x=1;\nvar y=2;</script></head><body><h1>"),
        upper(col("lang")),
        lit("</h1><p>"), col("text"),
        lit(" &amp; more &lt;raw&gt;</p><!-- hidden\nnote --></body></html>"))
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.extractHtmlText(html).as("extracted"))
        .orderBy("doc_id")
    },

    // Classifier-slot quality filter: featurize -> linear score -> threshold,
    // with a fixed public stub model standing in for a learned fastText-style
    // classifier. The features are the module's exact ratios (q38/q39 parity)
    // and the fully parenthesized arithmetic evaluates identically in both
    // engines.
    Q(
      "q131_quality_filter",
      """WITH tok AS (SELECT doc_id, text,
        |    regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
        |f AS (SELECT doc_id,
        |  CASE WHEN len(t) = 0 THEN 0.0
        |       ELSE len(list_distinct(t)) * 1.0 / len(t) END AS dr,
        |  len(list_filter(t, x -> x != '')) AS ntok,
        |  CASE WHEN length(text) = 0 THEN 0.0
        |       ELSE (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))) * 1.0
        |            / length(text) END AS pr
        |  FROM tok)
        |SELECT doc_id,
        |  round((dr * 2.0) + (least(CAST(ntok AS DOUBLE), 100.0) / 100.0) - (pr * 3.0), 6)
        |    AS q_score,
        |  round((dr * 2.0) + (least(CAST(ntok AS DOUBLE), 100.0) / 100.0) - (pr * 3.0), 6) >= 1.5
        |    AS kept
        |FROM f ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.stubQualityScore(col("text")).as("q_score"))
        .withColumn("kept", col("q_score") >= 1.5)
        .orderBy("doc_id")
    },

    // Embedding-level decontamination: which "training" vectors (even ids)
    // are near-duplicates of a "benchmark" vector (odd ids) — the A×B twin
    // of q34 and the semantic-space complement of the n-gram q67 (catches
    // paraphrased contamination exact shingles miss). Block-keyed, both
    // sides normalized once, one fused dot product per pair.
    Q(
      "q134_embed_decontaminate",
      """WITH n AS (SELECT vec_id, label, embedding,
        |  sqrt(list_aggregate(list_transform(generate_series(1, len(embedding)),
        |       i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE), 'sum')) AS nrm
        |  FROM embeddings)
        |SELECT * FROM (
        |  SELECT a.vec_id AS id_left, b.vec_id AS id_right,
        |    round(list_aggregate(list_transform(generate_series(1, len(a.embedding)),
        |      i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE), 'sum')
        |      / (a.nrm * b.nrm), 6) AS cos_sim
        |  FROM n a JOIN n b ON a.label = b.label
        |    AND a.vec_id % 2 = 0 AND b.vec_id % 2 = 1)
        |WHERE cos_sim >= 0.3 ORDER BY id_left, id_right""".stripMargin) { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      Similarity.crossNearPairs(
        emb.filter(col("vec_id") % 2 === 0), emb.filter(col("vec_id") % 2 === 1),
        "vec_id", "vec_id", "embedding", "label", minCosine = -2.0)
        .withColumn("cos_sim", round(col("cos_sim"), 6))
        .filter(col("cos_sim") >= 0.3)
        .orderBy("id_left", "id_right")
    },

    // Prefix-filtering EXACT set-similarity join (AllPairs/PPJoin family):
    // every pair with shingle-set Jaccard >= 1/2, found WITHOUT the
    // quadratic all-pairs — candidates must share a token among each
    // side's (n - ceil(n/2) + 1)-length prefix under one global
    // (frequency ASC, shingle ASC) order, a provable no-false-negative
    // prune. The exact complement to q31's probabilistic MinHash LSH.
    // Threshold decisions are integer-exact (o*2 >= (na+nb-o)); the
    // emitted jaccard is a single correctly-rounded division.
    Q(
      "q137_prefix_jaccard",
      s"""WITH $TokCte,
         |$ShCte,
         |ds AS (SELECT doc_id, list_distinct(s) AS st FROM sh WHERE len(s) > 0),
         |ex AS (SELECT doc_id, unnest(st) AS g FROM ds),
         |cnt AS (SELECT g, count(*) AS c FROM ex GROUP BY g),
         |arr AS (SELECT e.doc_id, list(struct_pack(c := c, g := g) ORDER BY c, g) AS lst
         |        FROM ex e JOIN cnt USING (g) GROUP BY e.doc_id),
         |pre AS (SELECT doc_id,
         |          unnest(list_slice(lst, 1, len(lst) - ((len(lst) + 1) // 2) + 1)) AS s
         |        FROM arr),
         |pt AS (SELECT doc_id, s.g AS g FROM pre),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |         FROM pt a JOIN pt b ON a.g = b.g AND a.doc_id < b.doc_id),
         |sz AS (SELECT doc_id, st, len(st) AS n FROM ds)
         |SELECT id_a, id_b, CAST(o AS DOUBLE) / (na + nb - o) AS jaccard
         |FROM (SELECT id_a, id_b, len(list_intersect(a.st, b.st)) AS o,
         |        a.n AS na, b.n AS nb
         |      FROM cand JOIN sz a ON cand.id_a = a.doc_id
         |                JOIN sz b ON cand.id_b = b.doc_id)
         |WHERE o * 2 >= (na + nb - o)
         |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      graft.dedup.PrefixJoin.jaccardPairs(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        shingleSize = 3, tNum = 1, tDen = 2)
        .orderBy("id_a", "id_b")
    },

    // Hard-negative mining (Similarity.hardNegatives): each anchor's most
    // similar DIFFERENT-label vector — the contrastive-training pair
    // generator. Top-1 per anchor is a map-side-combined max over
    // struct(sim, -id), not a corpus-sized window; sim is rounded to 6 dp
    // BEFORE ranking so both engines rank identical keys.
    Q(
      "q151_hard_negatives",
      """WITH a AS (SELECT vec_id AS anchor_id, embedding AS ae, label AS al
        |           FROM embeddings WHERE vec_id % 25 = 0),
        |s AS (SELECT a.anchor_id, e.vec_id AS neg_id,
        |    round(
        |      list_aggregate(list_transform(generate_series(1, len(e.embedding)),
        |        i -> e.embedding[i]::DOUBLE * a.ae[i]::DOUBLE), 'sum')
        |      / (sqrt(list_aggregate(list_transform(generate_series(1, len(e.embedding)),
        |           i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE), 'sum'))
        |       * sqrt(list_aggregate(list_transform(generate_series(1, len(a.ae)),
        |           i -> a.ae[i]::DOUBLE * a.ae[i]::DOUBLE), 'sum'))), 6) AS sim
        |  FROM a JOIN embeddings e ON e.label != a.al)
        |SELECT anchor_id, neg_id, sim FROM (
        |  SELECT *, row_number() OVER (PARTITION BY anchor_id
        |    ORDER BY sim DESC, neg_id) AS rn FROM s)
        |WHERE rn = 1 ORDER BY anchor_id""".stripMargin) { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      Similarity.hardNegatives(
        emb.filter(col("vec_id") % 25 === 0), emb, "vec_id", "embedding", "label")
        .orderBy("anchor_id")
    },

    // Directed containment join (PrefixJoin.containmentPairs): near-SUPERSET
    // detection |A∩B|/|A| >= 2/3 — the doc-swallowed-by-doc case Jaccard
    // structurally misses (size imbalance caps |A∩B|/|A∪B| at |A|/|B|).
    // The sub side is prefix-pruned under the rare-first global order; the
    // super side indexes all tokens (containment can't lower-bound its
    // share). The oracle brute-forces the quadratic definition.
    Q(
      "q152_containment_join",
      s"""WITH $TokCte,
         |$ShCte,
         |ds AS (SELECT doc_id, list_distinct(s) AS st FROM sh WHERE len(s) > 0),
         |sz AS (SELECT doc_id, st, len(st) AS n FROM ds)
         |SELECT id_sub, id_super, CAST(o AS DOUBLE) / na AS containment
         |FROM (SELECT a.doc_id AS id_sub, b.doc_id AS id_super,
         |        len(list_intersect(a.st, b.st)) AS o, a.n AS na
         |      FROM sz a JOIN sz b ON a.doc_id != b.doc_id)
         |WHERE o * 3 >= na * 2
         |ORDER BY id_sub, id_super""".stripMargin) { (s, dir) =>
      graft.dedup.PrefixJoin.containmentPairs(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        shingleSize = 3, tNum = 2, tDen = 3)
        .orderBy("id_sub", "id_super")
    },

    // BPE merge-candidate counting (Vocab.bpePairCounts): adjacent char-pair
    // frequencies over the DISTINCT word table weighted by word frequency —
    // iteration 0 of byte-pair-encoding vocabulary training (the argmax
    // pair is the next merge). The Heaps'-law point: the explode runs over
    // distinct words (~O(corpus^0.5)), never token occurrences, so tokenizer
    // training stays cheap at 100 TB. Counts are exact integers → no
    // rounding surface; top-50 by (n desc, pair) is a total order.
    Q(
      "q159_bpe_pairs",
      """WITH tok AS (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
        |w AS (SELECT u.tok AS w, count(*) AS tf FROM tok, unnest(t) AS u(tok) GROUP BY 1),
        |p AS (SELECT substr(w, CAST(i AS INT), 2) AS pair, tf
        |      FROM w, unnest(generate_series(1, length(w) - 1)) AS g(i)
        |      WHERE length(w) >= 2)
        |SELECT pair, CAST(sum(tf) AS BIGINT) AS n FROM p GROUP BY pair
        |ORDER BY n DESC, pair LIMIT 50""".stripMargin) { (s, dir) =>
      graft.text.Vocab.bpePairCounts(Tables.load(s, dir, "documents"), "text")
        .orderBy(col("n").desc, col("pair"))
        .limit(50)
    },

    // Linear projection 64→4 (Similarity.projectExpr): the PCA/random-
    // projection APPLY step before ANN indexing — k fused codegen dots per
    // row against broadcast-literal matrix rows; no join, no shuffle, no
    // UDF. The deterministic test matrix (((i·j) mod 7) − 3)/8 is dyadic,
    // so every product is exact and both engines fold the same sequence;
    // 6-dp rounding guards the print path (the q34/q35 convention).
    Q(
      "q175_project",
      """SELECT vec_id,
        |  round(list_aggregate(list_transform(generate_series(1, 64),
        |    i -> embedding[i]::DOUBLE * ((((i-1) * 1) % 7) - 3) * 0.125), 'sum'), 6) AS p1,
        |  round(list_aggregate(list_transform(generate_series(1, 64),
        |    i -> embedding[i]::DOUBLE * ((((i-1) * 2) % 7) - 3) * 0.125), 'sum'), 6) AS p2,
        |  round(list_aggregate(list_transform(generate_series(1, 64),
        |    i -> embedding[i]::DOUBLE * ((((i-1) * 3) % 7) - 3) * 0.125), 'sum'), 6) AS p3,
        |  round(list_aggregate(list_transform(generate_series(1, 64),
        |    i -> embedding[i]::DOUBLE * ((((i-1) * 4) % 7) - 3) * 0.125), 'sum'), 6) AS p4
        |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, dir) =>
      val m = Array.tabulate(4, 64)((j, i) => (((i * (j + 1)) % 7) - 3) * 0.125)
      val p = graft.sim.Similarity.projectExpr(col("embedding"), m)
      Tables.load(s, dir, "embeddings")
        .select(
          col("vec_id"),
          round(element_at(p, 1), 6).as("p1"),
          round(element_at(p, 2), 6).as("p2"),
          round(element_at(p, 3), 6).as("p3"),
          round(element_at(p, 4), 6).as("p4"))
        .orderBy("vec_id")
    })
}
