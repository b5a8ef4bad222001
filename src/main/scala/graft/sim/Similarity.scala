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

  /** LSH candidate pairs: equal bucket → candidate (verify with [[cosine]]). */
  def lshCandidatePairs(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      numPlanes: Int = 8,
      dims: Int = 64): DataFrame = {
    val bucketed =
      corpus.select(col(idCol), hyperplaneBucket(col(vecCol), numPlanes, dims).as("bucket"))
    val a = bucketed.select(col("bucket"), col(idCol).as("id_a"))
    val b = bucketed.select(col("bucket"), col(idCol).as("id_b"))
    a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b")).select("id_a", "id_b", "bucket")
  }

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
    * Vectors are normalized on the build side of the join (once per row,
    * before the exchange), so each pair costs one fused dot product.
    */
  def nearDuplicatePairs(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      blockCol: String,
      minCosine: Double): DataFrame = {
    val parts = corpus.sparkSession.sessionState.conf.numShufflePartitions
    val normed = corpus
      .repartition(parts, col(blockCol)) // spread + pre-partition for the join
      .select(col(blockCol).as("_blk"), col(idCol), normalized(col(vecCol)).as("_nv"))
    val a = normed.select(col("_blk"), col(idCol).as("id_a"), col("_nv").as("_na"))
    val b = normed.select(col("_blk"), col(idCol).as("id_b"), col("_nv").as("_nb"))
    a.join(b, Seq("_blk"))
      .filter(col("id_a") < col("id_b"))
      .select(
        col("id_a"),
        col("id_b"),
        graft.functions.VectorFunctions.dot(col("_na"), col("_nb")).as("cos_sim"))
      .filter(col("cos_sim") >= minCosine)
  }
}
