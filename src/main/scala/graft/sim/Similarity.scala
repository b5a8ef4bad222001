package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`), all in built-in higher-order functions (codegen'd; no
  * UDF in the hot path).
  *
  * Three tiers:
  *  - [[bruteForceTopK]] — exact cosine top-k: one pass over the corpus, a
  *    TakeOrdered at the end; the correctness baseline and fine whenever the
  *    probe set is small (the corpus scan is embarrassingly parallel).
  *  - [[ivfTopK]] — inverted-file ANN: corpus pre-clustered (any cluster id
  *    column, e.g. k-means labels); the probe searches only the nProbe
  *    nearest clusters → scan cost drops by ncells/nProbe at equal recall on
  *    clustered data. The cluster column also makes the scan PARTITION-
  *    PRUNABLE when the table is written partitioned by it.
  *  - [[hyperplaneBucket]] — sign-LSH bucketing: deterministic pseudo-random
  *    hyperplanes derived from md5 (engine-portable, no RNG state); equal
  *    buckets → candidate pairs, the embedding analog of MinHash banding.
  */
object Similarity {

  /** Cosine similarity of two float-array columns (double accumulation,
    * index order — deterministic). Runs through the native fused
    * [[graft.functions.CosineSimilarity]] expression: ONE array pass
    * carrying three accumulators, bit-identical to the three-DotProduct
    * composition it replaces (and to the `aggregate(zip_with(...))` folds
    * the oracles recompute).
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.cosine(a, b)

  /** Exact top-k neighbors of one probe vector (id excluded). */
  def bruteForceTopK(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      probe: Seq[Float],
      k: Int): DataFrame = {
    val probeCol = array(probe.map(v => lit(v)): _*)
    corpus
      .select(col(idCol), cosine(col(vecCol), probeCol).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** IVF search: rank clusters by centroid similarity, scan the top nProbe.
    * `centroids` = (clusterCol, centroid array<double>) — see [[centroidsOf]].
    */
  def ivfTopK(
      corpus: DataFrame,
      centroids: DataFrame,
      idCol: String,
      vecCol: String,
      clusterCol: String,
      probe: Seq[Float],
      k: Int,
      nProbe: Int = 1): DataFrame = {
    val probeCol = array(probe.map(v => lit(v)): _*)
    val best = centroids
      .select(col(clusterCol), cosine(col("centroid"), probeCol).as("csim"))
      .orderBy(col("csim").desc, col(clusterCol))
      .limit(nProbe)
      .select(clusterCol)
    corpus
      .join(broadcast(best), clusterCol) // cluster pruning: only nProbe cells scanned
      .select(col(idCol), cosine(col(vecCol), probeCol).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Per-cluster mean vectors (the IVF coarse quantizer). One shuffle keyed
    * by cluster; element-wise mean via posexplode + groupBy keeps the agg
    * fully parallel in the vector dimension too.
    */
  def centroidsOf(corpus: DataFrame, vecCol: String, clusterCol: String): DataFrame =
    corpus
      .select(col(clusterCol), posexplode(col(vecCol)).as(Seq("_dim", "_v")))
      .groupBy(clusterCol, "_dim")
      .agg(avg(col("_v")).as("_mean"))
      .groupBy(clusterCol)
      .agg(array_sort(collect_list(struct(col("_dim"), col("_mean")))).as("_pairs"))
      .select(col(clusterCol), transform(col("_pairs"), p => p.getField("_mean")).as("centroid"))

  /** Deterministic hyperplane component h(plane, dim) ∈ [−1, 1), derived from
    * md5 — reproducible anywhere, no RNG.
    */
  def planeComponent(plane: Column, dim: Column): Column =
    (conv(substring(md5(concat(plane.cast("string"), lit(":"), dim.cast("string"))), 1, 6), 16, 10)
      .cast("double") / lit(8388608.0)) - 1.0 // 16^6/2 = 8388608

  /** The hyperplane matrix materialized driver-side — the components are
    * pure constants of (plane, dim), so hashing them per ROW (numPlanes ×
    * dims md5 calls inside nested lambdas) only burns executor cycles.
    * Same formula as [[planeComponent]]: first 6 hex chars of
    * md5("plane:dim") scaled to [−1, 1).
    */
  def hyperplaneComponents(numPlanes: Int, dims: Int): Array[Array[Double]] =
    Array.tabulate(numPlanes, dims) { (h, d) =>
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$h:$d".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex6 = digest.take(3).map(b => f"$b%02x").mkString // 6 hex chars = 3 bytes
      java.lang.Long.parseLong(hex6, 16).toDouble / 8388608.0 - 1.0
    }

  /** Sign-LSH bucket key: one bit per hyperplane (sign of the projection),
    * emitted as a bitstring. Planes are literal constant arrays; each
    * projection is one codegen'd [[graft.functions.DotProduct]] loop
    * (sequential double accumulation — bit-identical to the zip_with/
    * aggregate fold it replaces). `dims` must match the vector length —
    * a silent mismatch would null every projection, put ALL rows in one
    * '000…0' bucket, and degrade [[lshCandidatePairs]] to a quadratic
    * self-join with no error, so the mismatch fails loudly per row instead.
    */
  def hyperplaneBucket(vecCol: Column, numPlanes: Int = 8, dims: Int = 64): Column = {
    val planes = hyperplaneComponents(numPlanes, dims)
    // NULL vectors keep their pre-guard behavior (null projections → the
    // all-'0' bucket); only a present-but-wrong-length vector is the silent
    // degeneration the guard exists for
    val dimsCheck = when(vecCol.isNull || size(vecCol) === lit(dims), lit(""))
      .otherwise(raise_error(concat(
        lit(s"hyperplaneBucket: expected $dims-dim vector, got "),
        size(vecCol).cast("string"))))
    val bits = planes.map { p =>
      val proj = graft.functions.VectorFunctions.dot(vecCol, array(p.map(lit).toSeq: _*))
      when(proj >= 0, lit("1")).otherwise(lit("0"))
    }
    concat_ws("", (dimsCheck +: bits.toSeq): _*)
  }

  /** Cross-corpus near pairs (embedding-level DECONTAMINATION): every
    * (left, right) pair within a shared block whose cosine clears the
    * threshold — the A×B twin of [[nearDuplicatePairs]], for "which training
    * vectors are near-duplicates of a benchmark vector". Both sides
    * normalize once before the block-keyed join, so each pair costs one
    * fused dot product; the pair space is |A_blk|·|B_blk| per block, never
    * |A|·|B|. The n-gram analog is [[graft.dedup.Decontaminate]]; this is
    * the semantic-space version that catches paraphrased contamination
    * exact shingles miss.
    */
  def crossNearPairs(
      left: DataFrame,
      right: DataFrame,
      idColLeft: String,
      idColRight: String,
      vecCol: String,
      blockCol: String,
      minCosine: Double): DataFrame = {
    val a = left.select(col(blockCol).as("_blk"),
      col(idColLeft).as("id_left"), normalized(col(vecCol)).as("_na"))
    val b = right.select(col(blockCol).as("_blk"),
      col(idColRight).as("id_right"), normalized(col(vecCol)).as("_nb"))
    a.join(b, Seq("_blk"))
      .select(
        col("id_left"),
        col("id_right"),
        graft.functions.VectorFunctions.dot(col("_na"), col("_nb")).as("cos_sim"))
      .filter(col("cos_sim") >= minCosine)
  }

  /** (anchor_id, neg_id, sim) hard-negative mining for metric learning:
    * each anchor's MOST similar corpus vector with a different label — the
    * pairs that actually move a contrastive loss (easy negatives are
    * already separated; the hardest ones define the margin).
    *
    * Top-1 per anchor is a partial-aggregated `max(struct(sim, −id))` —
    * ties break to the LOWEST candidate id — NOT a per-anchor window over
    * the full corpus (an anchor's candidate stream is corpus-sized; a
    * window would sort it, the max aggregates it map-side). Similarity is
    * rounded to 6 dp BEFORE the max so cross-engine rank comparisons see
    * identical keys. Anchors broadcast (the nested-loop join streams the
    * corpus once per anchor partition); `idCol` must be numeric for the
    * tie-break negation.
    *
    * At 100 TB scale the exact full scan is the calibration path — cap the
    * anchor batch, or pre-restrict `corpus` with [[lshCandidatePairs]] /
    * [[ivfTopK]] blocking and accept approximate hardest-negatives.
    */
  def hardNegatives(
      anchors: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String): DataFrame = {
    val a = anchors.select(col(idCol).as("anchor_id"),
      col(vecCol).as("_av"), col(labelCol).as("_al"))
    val c = corpus.select(col(idCol).as("neg_id"),
      col(vecCol).as("_nv"), col(labelCol).as("_nl"))
    broadcast(a).join(c, col("_al") =!= col("_nl"))
      .select(col("anchor_id"), col("neg_id"),
        round(cosine(col("_av"), col("_nv")), 6).as("_sim"))
      .groupBy("anchor_id")
      .agg(max(struct(col("_sim").as("_s"), (-col("neg_id")).as("_ni"))).as("_top"))
      .select(col("anchor_id"), (-col("_top._ni")).as("neg_id"), col("_top._s").as("sim"))
  }

  /** Corpus-aware hyperplane count: with p planes there are 2^p buckets, so
    * expected occupancy is N/2^p — p ≈ log₂(N) + margin keeps expected
    * occupancy at 2^−margin and the candidate-join output near-linear. A
    * FIXED p (the old default 8 → 256 buckets) degrades toward N²/2^p pairs
    * as the corpus grows: fine at 10⁴ vectors, quadratic disaster at 10⁹.
    * margin=4 → expected 1/16 row per bucket; real collisions then come from
    * angular closeness (the signal), not bucket crowding (the noise).
    */
  def planesFor(corpusCount: Long, margin: Int = 4): Int = {
    val n = math.max(corpusCount, 2L)
    val log2ceil = 64 - java.lang.Long.numberOfLeadingZeros(n - 1)
    math.max(8, log2ceil + margin)
  }

  /** LSH candidate pairs: equal bucket → candidate (verify with [[cosine]]).
    *
    * `numPlanes <= 0` (the default) sizes the hyperplane count from the
    * corpus via [[planesFor]] — one `count()` action (parquet-footer cheap)
    * buys a bucket space that grows with N instead of a fixed 256-bucket
    * grid whose occupancy would grow linearly with the corpus. For
    * recall-sensitive use at scale prefer [[bandedCandidatePairs]], which
    * keeps per-band buckets selective while OR-ing bands for recall.
    */
  def lshCandidatePairs(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      numPlanes: Int = 0,
      dims: Int = 64): DataFrame = {
    val planes = if (numPlanes > 0) numPlanes else planesFor(corpus.count())
    val bucketed =
      corpus.select(col(idCol), hyperplaneBucket(col(vecCol), planes, dims).as("bucket"))
    val a = bucketed.select(col("bucket"), col(idCol).as("id_a"))
    val b = bucketed.select(col("bucket"), col(idCol).as("id_b"))
    a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b")).select("id_a", "id_b", "bucket")
  }

  /** Banded (multi-probe) sign-LSH candidate pairs — the embedding analog of
    * [[graft.dedup.MinHashLsh.bandKeys]]: the `numPlanes` sign bits split
    * into `bands` groups of `numPlanes/bands` bits; vectors agreeing on ALL
    * bits of ANY band become candidates. AND-ing within a band keeps each
    * band-bucket selective (2^{planes/band} cells); OR-ing across bands
    * recovers the recall a single wide bucket key throws away (one flipped
    * sign near a hyperplane no longer hides a true near-duplicate).
    *
    * Candidate-set invariant (pinned by SimilaritySpec): band 0 of a
    * (p·b)-plane banded index uses plane indices 0..p−1 — the identical md5
    * formula as a plain p-plane bucket — so the banded candidates are a
    * SUPERSET of [[lshCandidatePairs]] at p planes: strictly better recall
    * at bounded per-band occupancy.
    *
    * Scale shape: one projection (bits), one posexplode (`bands` rows/vector),
    * one self-equi-join on (band, bucket), one distinct — the same near-linear
    * plan MinHashLsh runs. `numPlanes <= 0` sizes planes from the corpus via
    * [[planesFor]] (rounded up to a multiple of `bands`); an EXPLICIT
    * `numPlanes` must divide `bands` evenly (rejected, never silently
    * rounded — the caller sized their candidate set deliberately).
    */
  def bandedCandidatePairs(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      numPlanes: Int = 0,
      bands: Int = 4,
      dims: Int = 64): DataFrame = {
    require(bands > 0, s"bands=$bands must be positive")
    // explicit numPlanes must divide evenly — silently rounding a caller's
    // 14-planes/4-bands ask up to 16 would change their candidate set behind
    // their back; only the auto-sized path rounds (it owns the number)
    require(
      numPlanes <= 0 || numPlanes % bands == 0,
      s"numPlanes=$numPlanes not divisible by bands=$bands (pass numPlanes<=0 to auto-size)")
    val planes =
      if (numPlanes > 0) numPlanes
      else ((planesFor(corpus.count()) + bands - 1) / bands) * bands // round up to band multiple
    val r = planes / bands
    val banded = corpus
      .select(col(idCol), hyperplaneBucket(col(vecCol), planes, dims).as("_bits"))
      .select(col(idCol), posexplode(
        array((0 until bands).map(b => substring(col("_bits"), b * r + 1, r)): _*))
        .as(Seq("band", "bucket")))
    val a = banded.select(col("band"), col("bucket"), col(idCol).as("id_a"))
    val b = banded.select(col("band"), col("bucket"), col(idCol).as("id_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** Per-vector int8 quantization scale: max|v|/127, floored at 1e-30 so a
    * zero vector quantizes to zeros instead of NaNs. Symmetric scalar
    * quantization — the storage story at 100 TB: a 64-dim float corpus
    * drops 4× (256 B → 64 B/vector) while staying an exact-arithmetic
    * recipe every engine reproduces (max, divide — no RNG, no codebook).
    */
  def int8Scale(vecCol: Column): Column =
    greatest(
      array_max(transform(vecCol, v => abs(v.cast("double")))) / 127.0,
      lit(1e-30))

  /** Quantize to int8 codes: floor(v/scale + 0.5) — round-half-up spelled
    * as floor, because `floor` is exact and bit-identical across engines
    * while native round() tie-breaking is not. max|v| maps to ±127 exactly,
    * so no clamp is needed.
    */
  def quantizeInt8(vecCol: Column, scaleCol: Column): Column =
    transform(vecCol, v => floor(v.cast("double") / scaleCol + 0.5).cast("int"))

  /** Reconstruct doubles from int8 codes: q·scale (error ≤ scale/2 per
    * element by construction — pinned in SimilaritySpec).
    */
  def dequantizeInt8(qCol: Column, scaleCol: Column): Column =
    transform(qCol, q => q.cast("double") * scaleCol)

  /** Unit-normalized copy of the vector (double elements). Normalizing ONCE
    * per row before a pair join turns per-pair cosine into a bare dot
    * product — at N² pairs the per-row norms would otherwise be recomputed
    * for every partner.
    */
  def normalized(vecCol: Column): Column = {
    val norm = sqrt(graft.functions.VectorFunctions.dot(vecCol, vecCol))
    transform(vecCol, v => v.cast("double") / norm)
  }

  /** Embedding near-duplicate pairs above a cosine threshold, blocked by a
    * cluster/label column to bound the pair space (IVF-style blocking).
    * Vectors are normalized once per row, so each pair costs one fused dot
    * product.
    *
    * Skew guard — triangle sub-blocking: a block larger than `maxBlockRows`
    * splits into g = ⌈n/cap⌉ hash sub-blocks, and each row replicates to the
    * g group-pair keys (min(s,j), max(s,j)) it participates in, so the
    * self-join runs per (block, ki, kj) key with ≤ 2·cap rows a side. A hot
    * block (one k-means cell holding 10% of the corpus) thus fans out over
    * g·(g+1)/2 independent join tasks instead of collapsing into one
    * quadratic straggler — the total pair work is unchanged (it is the
    * output), but it is now PARALLEL and each task's memory is bounded.
    * The canonical-key filter (ki,kj) == (min(sa,sb), max(sa,sb)) emits each
    * pair exactly once, so the result is row-identical to the uncapped join
    * (pinned by the q116 oracle, which replays q34's SQL against a cap that
    * forces g=4 sub-blocking). Replication cost: g rows per input row —
    * o(total pair output) by construction, and 1 (no copies) for every
    * block under the cap.
    *
    * NOT lazy: this function runs the block-size aggregate (one Spark job
    * over `corpus`) AT CALL TIME to pick the plan shape. The aggregate is
    * persisted first, so the upstream pipeline executes exactly once — the
    * probe reads the cache, and the triangle path's size join reuses it
    * (one row per block, trivially small; freed on `unpersist` by the
    * caller or at session end). Callers that need a fully lazy plan should
    * pre-compute block sizes and dispatch themselves.
    */
  def nearDuplicatePairs(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      blockCol: String,
      minCosine: Double,
      maxBlockRows: Int = 16384): DataFrame = {
    require(maxBlockRows > 0, s"maxBlockRows=$maxBlockRows must be positive")
    // one row per block — AQE broadcasts it back onto the corpus; persisted
    // so the call-time probe below and the triangle path's join share ONE
    // execution of the (possibly expensive) upstream corpus plan
    val sizes = corpus.groupBy(col(blockCol).as("_blk")).agg(count(lit(1)).as("_bn"))
      .persist()
    // O(1) driver probe (a single long): when no block exceeds the cap —
    // the common case — keep the lean plain self-join plan; the triangle
    // machinery (size join + key explode) engages only under genuine skew,
    // so well-blocked corpora pay one cheap agg job, not three extra stages
    val maxBlock = Option(sizes.agg(max(col("_bn"))).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    if (maxBlock <= maxBlockRows) {
      sizes.unpersist(blocking = false) // fast path never reads it again
      val parts = corpus.sparkSession.sessionState.conf.numShufflePartitions
      val normed = corpus
        .repartition(parts, col(blockCol)) // spread + pre-partition for the join
        .select(col(blockCol).as("_blk"), col(idCol), normalized(col(vecCol)).as("_nv"))
      val a = normed.select(col("_blk"), col(idCol).as("id_a"), col("_nv").as("_na"))
      val b = normed.select(col("_blk"), col(idCol).as("id_b"), col("_nv").as("_nb"))
      return a.join(b, Seq("_blk"))
        .filter(col("id_a") < col("id_b"))
        .select(
          col("id_a"),
          col("id_b"),
          graft.functions.VectorFunctions.dot(col("_na"), col("_nb")).as("cos_sim"))
        .filter(col("cos_sim") >= minCosine)
    }
    val keyed = corpus
      .select(col(blockCol).as("_blk"), col(idCol), normalized(col(vecCol)).as("_nv"))
      .join(sizes, "_blk")
      .withColumn("_g",
        floor((col("_bn") + lit(maxBlockRows - 1L)) / lit(maxBlockRows.toLong)).cast("int"))
      .withColumn("_sub", pmod(xxhash64(col(idCol)), col("_g")).cast("int"))
      .select(col("_blk"), col(idCol), col("_nv"), col("_sub"),
        explode(sequence(lit(0), col("_g") - 1)).as("_j"))
      .select(col("_blk"), col(idCol), col("_nv"), col("_sub"),
        least(col("_sub"), col("_j")).as("_ki"),
        greatest(col("_sub"), col("_j")).as("_kj"))
    val a = keyed.select(col("_blk"), col("_ki"), col("_kj"),
      col(idCol).as("id_a"), col("_sub").as("_sa"), col("_nv").as("_na"))
    val b = keyed.select(col("_blk"), col("_ki"), col("_kj"),
      col(idCol).as("id_b"), col("_sub").as("_sb"), col("_nv").as("_nb"))
    // shuffle-hash, not broadcast: the build side here is the REPLICATED
    // corpus (g copies per hot-block row) — letting AQE broadcast it builds
    // a driver-side hash of the whole fan-out (measured 2x slower at 40k
    // rows, OOM at scale) and collapses the parallelism the sub-block keys
    // exist to create. SHJ shuffles both sides by (blk, ki, kj), so each
    // group-pair key is an independent bounded task.
    a.join(b.hint("shuffle_hash"), Seq("_blk", "_ki", "_kj"))
      .filter(col("id_a") < col("id_b"))
      // canonical key: a pair with subs (sa,sb) matches on every shared
      // group-pair key when sa==sb — keep only (min,max) so each pair is
      // emitted exactly once
      .filter(col("_ki") === least(col("_sa"), col("_sb")) &&
        col("_kj") === greatest(col("_sa"), col("_sb")))
      .select(
        col("id_a"),
        col("id_b"),
        graft.functions.VectorFunctions.dot(col("_na"), col("_nb")).as("cos_sim"))
      .filter(col("cos_sim") >= minCosine)
  }

  /** Linear projection of an embedding column through a fixed matrix — the
    * serving half of dimensionality reduction (PCA/random-projection apply:
    * train offline, ship the matrix, project the corpus before ANN
    * indexing; a 64→k projection cuts every downstream pair dot product by
    * 64/k). One fused [[graft.functions.VectorFunctions.dot]] per output
    * dimension against a BROADCAST-LITERAL row of the matrix — k codegen'd
    * dots per input row, no join, no shuffle, no UDF.
    *
    * `matrix(j)` is the j-th output dimension's weight row (length = input
    * dims; enforced per-row at plan build).
    */
  def projectExpr(vecCol: Column, matrix: Array[Array[Double]]): Column = {
    require(matrix.nonEmpty, "projection needs at least one output dimension")
    require(matrix.forall(_.length == matrix.head.length),
      "projection matrix rows must share one input dimensionality")
    array(matrix.toSeq.map { row =>
      graft.functions.VectorFunctions.dot(vecCol, array(row.toSeq.map(lit): _*))
    }: _*)
  }

  /** SemDeDup (Abbas et al. 2023): semantic deduplication by clustering the
    * embedding space with k-means, then dropping, WITHIN each cluster, every
    * vector that has a lower-id neighbor at cosine ≥ `minCosine` (first-wins,
    * the library's deterministic stand-in for the paper's
    * keep-lowest-centroid-distance rule). Clustering bounds the pair space
    * the way the paper intends: candidate pairs form within a cluster only,
    * so the quadratic term is (n/k)² per cluster, not n² — and
    * [[nearDuplicatePairs]]' triangle sub-blocking caps the damage when
    * k-means hands back a hot cluster.
    *
    * Returns one row per input vector: (`idCol`, cluster, kept) — survivors
    * carry `kept = true`; the training set is the kept slice, the audit
    * trail is the rest. Cosines are rounded to `roundDp` before the
    * threshold so a last-ulp cross-engine wobble can't flip a pair's fate.
    */
  def semanticDedup(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      minCosine: Double,
      roundDp: Int = 6): DataFrame = {
    val centroids = KMeans.fit(corpus, idCol, vecCol, k, iters)
    val clustered = KMeans.assign(corpus, vecCol, centroids)
    // pre-filter slightly below the threshold (round-up headroom), then
    // apply the rounded threshold exactly — pair volume stays bounded
    // without admitting a rounding-boundary discrepancy
    val guard = math.pow(10.0, -roundDp)
    val dropped = nearDuplicatePairs(
      clustered, idCol, vecCol, "_cluster", minCosine - guard)
      .filter(round(col("cos_sim"), roundDp) >= minCosine)
      .select(col("id_b").as(idCol))
      .distinct()
      .withColumn("_dropped", lit(true))
    clustered
      .select(col(idCol), col("_cluster").cast("long").as("cluster"))
      .join(dropped, Seq(idCol), "left")
      .select(col(idCol), col("cluster"), col("_dropped").isNull.as("kept"))
  }

  /** Per-dimension feature statistics of an embedding column — the
    * normalization table (TFDV-style) a training pipeline computes before
    * standardizing, and the drift probe it re-computes per corpus drop:
    * (dim, n, mean_micro, std_micro, min_micro, max_micro), all in
    * integer micro-units of the raw float value.
    *
    * Determinism: each element is pinned ONCE to round-half-up micro
    * units; sums and squared sums are exact decimals over those integers;
    * the mean is an integral `div`, and the sample std is the single
    * closed-form sqrt (exact numerator, CUPED recipe) the caller pins.
    *
    * Scale shape: posexplode → ONE map-side-combined aggregate keyed by
    * dim — `dims` output rows regardless of corpus size. The explode
    * multiplies the scan stream by `dims`, which is the honest cost of
    * per-dimension stats; no shuffle carries more than partial-agg rows.
    */
  /** Corpus-centroid outlier mining: each vector's exact squared distance
    * (in micro-units²) to the corpus mean — the off-distribution filter a
    * curation pipeline runs BEFORE pairwise near-dup work (a doc far from
    * everything has no near-dups to find; it has a distribution problem).
    * Returns the `topK` farthest rows as (input columns..., `d2`), ordered
    * farthest-first with `idCol` as the tie-break.
    *
    * Exactness: vectors quantize once to micro-ints (`floor(v·10⁶ + 0.5)`
    * — floats are exact in the double product, [[embeddingDimStats]]'s
    * recipe), the centroid is the truncating integer quotient `Σv div n`
    * per dimension, and `d2 = Σ(v − c)²` is an exact long fold — every
    * engine lands on the same integer, so the top-k set is unambiguous.
    *
    * Scale shape: one posexplode→map-combined aggregate builds the
    * dims-row centroid (the only shuffle, dims·partitions combiner rows);
    * the centroid packs into ONE array row crossed-broadcast onto the
    * corpus; `d2` is a fused codegen zip_with fold; the top-k is a
    * TakeOrdered (no global sort exchange — PlanSpec-gated).
    */
  def centroidOutliers(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      topK: Int = 20): DataFrame = {
    require(topK > 0, s"topK=$topK must be positive")
    val micro = transform(
      col(vecCol),
      v => floor(v.cast("double") * 1000000.0 + 0.5).cast("long"))
    val vm = df.withColumn("_vm", micro)
    val centroid = vm
      .select(posexplode(col("_vm")).as(Seq("_dim", "_v")))
      .groupBy("_dim")
      // decimal(38,0) sum: immune to Σv overflowing a long at extreme n
      // (the quotient is back in micro-int range by construction)
      .agg(count(lit(1)).as("_n"), sum(col("_v").cast("decimal(38,0)")).as("_s"))
      .select(col("_dim"), expr("cast(_s div _n as long)").as("_c"))
      .agg(collect_list(struct(col("_dim"), col("_c"))).as("_cl"))
      .select(transform(array_sort(col("_cl")), s => s("_c")).as("_cent"))
    vm.crossJoin(broadcast(centroid))
      .withColumn(
        "d2",
        aggregate(
          zip_with(col("_vm"), col("_cent"), (a, b) => (a - b) * (a - b)),
          lit(0L),
          (acc, x) => acc + x))
      .drop("_vm", "_cent")
      .orderBy(col("d2").desc, col(idCol))
      .limit(topK)
  }

  def embeddingDimStats(df: DataFrame, vecCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    df.select(posexplode(col(vecCol)).as(Seq("dim", "_v")))
      .select(col("dim").cast("long").as("dim"),
        floor(col("_v").cast("double") * 1000000.0 + 0.5).cast("long").as("_vm"))
      .groupBy("dim")
      .agg(
        count(lit(1)).as("n"),
        sum(col("_vm").cast(dec)).as("_s"),
        sum((col("_vm").cast(dec) * col("_vm").cast(dec))).as("_s2"),
        min(col("_vm")).as("min_micro"),
        max(col("_vm")).as("max_micro"))
      .select(
        col("dim"), col("n"),
        expr("_s div n").as("mean_micro"),
        when(col("n") > 1,
          sqrt(expr("cast(_s2 * n - _s * _s as double)") /
            (col("n").cast("double") * (col("n") - 1).cast("double")))).as("std_micro"),
        col("min_micro"), col("max_micro"))
  }
}
