package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join: left rows whose `pointCol` falls inside a
  * right-side `[startCol, endCol)` interval.
  *
  * A plain `point >= start && point < end` join has no equi-key, so Spark
  * plans BroadcastNestedLoopJoin — quadratic. The scalable shape quantizes
  * the domain into fixed-width buckets: each interval explodes to the
  * buckets it overlaps, each point maps to exactly one bucket, and the join
  * becomes an EQUI-join on the bucket id with a residual filter. One
  * shuffle keyed by bucket; work is |points| + Σ interval-widths/bucket.
  */
object RangeJoin {

  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Double): DataFrame = {
    val pb = points.withColumn("_bucket", floor(col(pointCol) / bucketWidth).cast("long"))
    val ib = intervals
      .withColumn("_b0", floor(col(startCol) / bucketWidth).cast("long"))
      // end is exclusive: an interval ending exactly on a bucket boundary
      // does not reach into that bucket
      .withColumn("_b1", floor((col(endCol) - lit(1e-9)) / bucketWidth).cast("long"))
      .withColumn("_bucket", explode(sequence(col("_b0"), greatest(col("_b0"), col("_b1")))))
      .drop("_b0", "_b1")
    pb.join(ib, Seq("_bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("_bucket")
  }
}
