package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage truncation for ITERATIVE loops — the replacement for
  * `Dataset.localCheckpoint` inside a loop whose next round's plan
  * references the previous round's frame more than once.
  *
  * Why not `localCheckpoint` itself: Spark 4's `LogicalRDD.fromDataset`
  * copies the ORIGIN plan's `Statistics` onto the truncated leaf. In a
  * label-propagation-shaped loop the round-n plan references the round-
  * (n−1) leaf k ≥ 2 times under joins, and the size-only stats visitor
  * MULTIPLIES child sizes — so the carried `sizeInBytes` (a BigInt) gains
  * a factor of the previous round's value each round: bit length grows
  * like k^n. By round ~15 planning itself takes minutes and
  * `BigInteger.multiply` aborts with "would overflow supported range"
  * (measured: the 129-node chain fixture ground 986 s then threw).
  * Wrapping the SAME checkpointed RDD with `createDataFrame` instead
  * yields a leaf with default stats — constant-size planning forever.
  *
  * The RDD is `localCheckpoint`ed (block-manager, replay-on-loss — the
  * loop's standard durability trade) and materialized by the caller's
  * next action (`eager = false`), or here and now (`eager = true`, for
  * handles that outlive the caches they read).
  */
object Lineage {

  /** `df` as a lineage-free, stats-free leaf over a localCheckpoint'ed
    * RDD. Lazy by default: the caller's next action materializes the
    * checkpoint (one job, the DupClusters count-materializes pattern).
    * Rows stay in Tungsten binary form end to end (the sql-package shim
    * checkpoints the InternalRow RDD directly) — a `df.rdd` →
    * `createDataFrame` round-trip would box and re-convert every field
    * once per loop round.
    */
  def pin(df: DataFrame, eager: Boolean = false): DataFrame =
    org.apache.spark.sql.GraftExpressionBridge.pinInternal(df, eager)

  /** The frame's executed InternalRow RDD — [[GlobalRank]]'s two-pass
    * stamps run over it directly (no external-Row deserialization). Rows
    * may be reused buffers; copy anything held across `next()` calls.
    */
  def internalRdd(df: DataFrame): org.apache.spark.rdd.RDD[
    org.apache.spark.sql.catalyst.InternalRow] =
    org.apache.spark.sql.GraftExpressionBridge.internalRdd(df)

  /** Wrap an InternalRow RDD as a DataFrame (rows must match `schema`;
    * producers may reuse row objects per the SparkPlan output contract).
    */
  def internalDataFrame(
      spark: org.apache.spark.sql.SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    org.apache.spark.sql.GraftExpressionBridge.internalDataFrame(spark, rdd, schema)
}
