package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bottom-k-by-hash sample sketch — the SAMPLE analog of [[HyperLogLog]]:
  * a fixed-size, MERGEABLE, engine-portable uniform sample.
  *
  * The md5 of a unique row key is a deterministic pseudo-random rank, so
  * "the k rows with the smallest hashes" is (a) an exactly-k uniform
  * sample, (b) a distributed TakeOrdered — per-partition top-k then a
  * merge of k·partitions candidates, never a global sort — and (c)
  * mergeable by the min-k law:
  *
  *   bottomK(A ∪ B) = bottomK(bottomK(A) ∪ bottomK(B))
  *
  * so partial sketches built per partition / batch / day compose exactly
  * (pinned by spec) — maintain one per ingest batch and merge on read,
  * the same operational pattern as the HLL registers.
  *
  * From the sketch, SELECTION quantiles: the value at sample rank
  * ⌈p·k⌉ estimates the population p-quantile with rank error O(1/√k),
  * independent of population size — 2 000 rows summarize 10¹² rows as
  * well as 10⁶ ([[GlobalRank]] has the exact-but-full-shuffle path;
  * this is the one-scan-cheap path with a quantified error).
  */
object SampleSketch {

  /** The k rows with the smallest md5(key), hash carried as `_h`.
    * `key` must be unique per row (ties beyond the hash break on it). */
  def bottomK(df: DataFrame, key: Column, k: Int): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    require(!df.columns.contains("_h"),
      "input already has a '_h' column (reserved for the sample hash)")
    df.withColumn("_h", md5(key.cast("string")))
      .orderBy(col("_h"), key)
      .limit(k)
  }

  /** (pct, est) selection quantiles of the sample: the value of
    * `orderCols.head` at sample rank ⌈pct·k/100⌉ under the total order
    * `orderCols` (append `_h` or an id to make it total). Reuses
    * [[GlobalRank.withRowNumber]] — the same no-Window code path at any
    * sample size.
    */
  def quantiles(sample: DataFrame, orderCols: Seq[String], pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p > 0 && p <= 100), s"bad pcts $pcts")
    val s = sample.sparkSession
    import s.implicits._
    GlobalRank.withRowNumber(sample, orderCols, "_rn", "_n")
      .join(pcts.toDF("pct"), col("_rn") === expr("(pct * _n + 99) div 100"))
      .select(col("pct"), col(orderCols.head).as("est"))
  }
}
