package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-shift and concentration diagnostics: the Population
  * Stability Index (the score-drift alarm every deployed filter model
  * needs between its training slice and live traffic) and the
  * Herfindahl-Hirschman concentration index (how dominated a corpus is by
  * its top sources — the "one domain is 40% of the crawl" detector).
  *
  * Determinism: bucket masses are exact long counts; each PSI term does
  * its `ln` ONCE per bucket on a ratio of exact integers and pins the
  * result to integer micro-nats (the q182 surprisal recipe); HHI is one
  * division of exact decimal sums. No per-row fp anywhere.
  *
  * Scale shape: PSI is two map-side-combined grouped counts joined on the
  * bucket id (|buckets| rows after the first shuffle); HHI is one grouped
  * sum + one tiny reduce. Both are scan-dominated.
  */
object Drift {

  /** Per-bucket PSI terms between a reference and a current slice of the
    * same frame. `bucketCol` is any precomputed integer bucket id (fixed
    * width, decile edges — caller's choice); `sliceCol` must be 0
    * (reference) / 1 (current). Laplace +1 smoothing keeps empty buckets
    * finite and deterministic (no epsilon magic constants).
    *
    * Returns (bucket, n_ref, n_cur, psi_micro) where `psi_micro` is
    * `⌊(p_cur − p_ref)·ln(p_cur/p_ref)·10⁶ + 0.5⌋` on the smoothed
    * shares — each term ≥ 0, summing to the PSI in micro-nats.
    */
  def psiTerms(df: DataFrame, bucketCol: String, sliceCol: String): DataFrame = {
    val counts = df
      .groupBy(col(bucketCol).cast("long").as("bucket"))
      .agg(
        sum(when(col(sliceCol) === 0, 1L).otherwise(0L)).as("n_ref"),
        sum(when(col(sliceCol) =!= 0, 1L).otherwise(0L)).as("n_cur"))
    // bucket-count + totals via a broadcast 1-row cross join (no collect)
    val tot = counts.agg(
      count(lit(1)).as("_b"),
      sum("n_ref").as("_tr"),
      sum("n_cur").as("_tc"))
    counts
      .crossJoin(broadcast(tot))
      .select(
        col("bucket"), col("n_ref"), col("n_cur"), {
          // smoothed shares: (n + 1) / (N + B) — exact integers into ONE
          // expression tree both engines evaluate identically
          val pr = (col("n_ref") + 1).cast("double") / (col("_tr") + col("_b")).cast("double")
          val pc = (col("n_cur") + 1).cast("double") / (col("_tc") + col("_b")).cast("double")
          floor((pc - pr) * log(pc / pr) * lit(1000000.0) + lit(0.5))
            .cast("long").as("psi_micro")
        })
  }

  /** Per-group Herfindahl-Hirschman index over member masses: for each
    * key, HHI = Σᵢ shareᵢ² where shares are `massCol` fractions of the
    * group total (one row per (key, member) expected — pre-aggregate
    * first). Returns (keys…, n_members, total_mass, hhi = Σm²/(Σm)² as one
    * exact-integer division). HHI ∈ (1/n, 1]; 10000·hhi is the antitrust
    * convention's points scale.
    */
  def hhi(df: DataFrame, keyCols: Seq[String], massCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val m = col(massCol).cast("long")
    df.groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_members"),
        sum(m.cast(dec)).as("_sm"),
        sum((m.cast(dec) * m.cast(dec))).as("_sm2"))
      .select(
        keyCols.map(col) ++ Seq(
          col("n_members"),
          col("_sm").cast("long").as("total_mass"),
          when(col("_sm") > 0,
            col("_sm2").cast("double") / (col("_sm") * col("_sm")).cast("double"))
            .as("hhi")): _*)
  }

  /** Fixed-width bucket id for [[psiTerms]]: ⌊(v − lo) / width⌋ clamped to
    * [0, nBuckets−1] — integer arithmetic only.
    */
  def widthBucket(v: Column, lo: Long, width: Long, nBuckets: Int): Column = {
    require(width > 0 && nBuckets > 0, "widthBucket needs positive width and bucket count")
    least(
      greatest(floor((v.cast("long") - lit(lo)) / lit(width)).cast("long"), lit(0L)),
      lit(nBuckets - 1L))
  }
}
