package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Lloyd k-means over embedding columns — the trainer for the
  * IVF coarse quantizer ([[Similarity.ivfTopK]] takes any cluster column;
  * this produces one from raw vectors, making the ANN index end-to-end).
  *
  * Deterministic by construction (same result on any cluster/partitioning):
  * init = the k lowest-id vectors; assignment = squared-euclidean argmin
  * with ties to the lowest centroid index; update = exact element-wise
  * mean. No RNG anywhere.
  *
  * Scale shape: per iteration ONE scan assigns (centroids ship to executors
  * as literal arrays — k·dim doubles, metadata-sized, the same reason every
  * distributed k-means collects centroids to the driver) and one
  * posexplode + partial-aggregated mean recomputes them; k·dim rows come
  * back to the driver. Assignment is pure codegen'd expressions: dist_j =
  * c_j·c_j − 2·x·c_j (the x·x term is constant per row and drops out of
  * the argmin), evaluated via the native DotProduct, argmin via `least`
  * over (dist, idx) structs.
  */
object KMeans {

  /** Column computing the assigned cluster index for `vecCol` given fixed
    * centroids.
    */
  def assignExpr(vecCol: Column, centroids: Array[Array[Double]]): Column = {
    require(centroids.nonEmpty, "need at least one centroid")
    val scored = centroids.zipWithIndex.map { case (c, j) =>
      val cLit = array(c.map(lit).toSeq: _*)
      val cc = c.map(v => v * v).sum
      struct(
        (lit(cc) - lit(2.0) * graft.functions.VectorFunctions.dot(vecCol, cLit)).as("d"),
        lit(j).as("j"))
    }
    least(scored.toSeq: _*).getField("j")
  }

  /** `df` plus a `_cluster` column (int index into `centroids`). */
  def assign(df: DataFrame, vecCol: String, centroids: Array[Array[Double]]): DataFrame =
    df.withColumn("_cluster", assignExpr(col(vecCol), centroids))

  /** Simplified silhouette per point — the linear-time cluster-quality
    * readout (Hruschka et al.'s "simplified silhouette"): with `a` the
    * distance to the point's OWN (nearest) centroid and `b` the distance
    * to the second-nearest, `sil = (b − a) / max(a, b)` ∈ [0, 1] here
    * (own centroid is the argmin, so b ≥ a); ≈0 means the point sits on a
    * cluster boundary. The full silhouette's pairwise within-cluster
    * means are O(n²/k) — this centroid form is the one that survives a
    * 100 TB corpus: one scan, centroids as literal arrays, everything
    * codegen'd.
    *
    * Determinism: distances are the full `x·x − 2·x·c + c·c` (all three
    * index-order double folds — engine-replayable, the q86 oracle
    * convention), fp-cancellation guarded by a max(·, 0) both engines
    * apply identically, argmin/2nd-min via one array_sort on (d², j)
    * structs (ties to the lower centroid index), and `sil` is rounded to
    * 6 dp (the q34 cosine convention). Both-zero distances (a point ON
    * two coincident centroids) emit 0, not NaN.
    *
    * @return input columns + (`cluster` int, `sil` double)
    */
  def simplifiedSilhouette(
      df: DataFrame,
      vecCol: String,
      centroids: Array[Array[Double]]): DataFrame = {
    require(centroids.length >= 2,
      s"silhouette needs >= 2 centroids, got ${centroids.length}")
    val x = col(vecCol)
    val xx = graft.functions.VectorFunctions.dot(x, x)
    val scored = centroids.zipWithIndex.map { case (c, j) =>
      val cLit = array(c.map(lit).toSeq: _*)
      val cc = c.map(v => v * v).sum
      struct(
        greatest(
          xx - lit(2.0) * graft.functions.VectorFunctions.dot(x, cLit) + lit(cc),
          lit(0.0)).as("d"),
        lit(j).as("j"))
    }
    val sorted = array_sort(array(scored.toSeq: _*))
    val a2 = sorted.getItem(0).getField("d")
    val b2 = sorted.getItem(1).getField("d")
    df.withColumn("cluster", sorted.getItem(0).getField("j"))
      .withColumn(
        "sil",
        when(greatest(sqrt(a2), sqrt(b2)) === 0.0, lit(0.0))
          .otherwise(
            round((sqrt(b2) - sqrt(a2)) / greatest(sqrt(a2), sqrt(b2)), 6)))
  }

  /** Lloyd iterations; returns the final centroid matrix. Clusters that end
    * an iteration empty keep their previous centroid.
    */
  def fit(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int): Array[Array[Double]] = {
    require(k > 0 && iters >= 0, "k and iters must be positive")
    // the init collect must accept both array<float> and array<double> —
    // everything downstream (DotProduct, assignExpr) supports both
    var centroids: Array[Array[Double]] = df
      .orderBy(col(idCol))
      .limit(k)
      .select(vecCol)
      .collect()
      .map(_.getSeq[Any](0).map {
        case f: Float => f.toDouble
        case d: Double => d
        case other => throw new IllegalArgumentException(
          s"$vecCol must be array<float|double>, found element $other")
      }.toArray)
    require(centroids.nonEmpty, "corpus is empty")
    for (_ <- 1 to iters) {
      val means = assign(df, vecCol, centroids)
        .select(col("_cluster"), posexplode(col(vecCol)).as(Seq("_dim", "_v")))
        .groupBy(col("_cluster"), col("_dim"))
        .agg(avg(col("_v")).as("_mean")) // partial-aggregated; k·dim rows return
        .collect()
        .groupBy(_.getInt(0))
        .map { case (c, rows) =>
          c -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray
        }
      centroids = centroids.indices.map(j => means.getOrElse(j, centroids(j))).toArray
    }
    centroids
  }
}
