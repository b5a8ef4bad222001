package graft.operators

import org.apache.spark.sql.DataFrame

/** Partition-count helper for ITERATION-CACHED frames. A bare
  * `repartition(col)` is advisory under AQE, which happily coalesces a
  * small cached adjacency to ONE partition — and a frame cached like that
  * serializes every subsequent iteration round through a single task
  * (measured on a 2M-edge graph: the whole component loop ground one
  * core). Passing the session's configured shuffle-partition count makes
  * the number user-specified, which AQE leaves alone; at cluster scale
  * that number is sized to the data anyway, so nothing is lost.
  */
private[graft] object Partitions {
  def numShufflePartitions(df: DataFrame): Int =
    df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
}
