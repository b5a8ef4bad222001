package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable HyperLogLog distinct-count sketch as a DataFrame program —
  * the mergeable companion to [[CountMinSketch]] (frequency) for the other
  * streaming-summary staple (cardinality).
  *
  * Unlike Spark's built-in `approx_count_distinct` (whose HLL++ register
  * layout is engine-private, so only a tolerance band is checkable), this
  * recipe is md5-derived end to end and therefore BIT-IDENTICAL in any
  * engine: bucket = first 8 bits of md5(key), rho = leading-zero count of
  * the next 52 bits + 1 (computed portably as `53 - length(bin(w))` — both
  * Spark and DuckDB print binary without leading zeros), register = max
  * rho per bucket. The oracle rebuilds the same 256 registers in SQL and
  * must land the exact same estimate.
  *
  * Determinism of the estimate: the harmonic denominator sum(2^-rho) is
  * computed in INTEGER space as sum(2^(53-rho)) — exact BIGINT arithmetic,
  * at most 256·2^53 = 2^61 — so the only floating-point steps are one
  * constant-folded alpha expression and one correctly-rounded IEEE
  * division; no cross-row double summation whose order could differ
  * between engines.
  *
  * Scale shape: building is one narrow projection + one map-side-combined
  * max keyed by bucket — the sketch is ≤ 256 rows no matter the stream;
  * merging across batches/partitions is a bucket-wise max (the composition
  * law [[merge]], same shape as CountMinSketch.merge); estimation is a
  * 256-row driver-free aggregate. The raw estimator is used (no
  * small-range linear counting, which needs ln()/engine-specific libm):
  * callers in the E < 2.5·m regime should read the exact distinct count
  * instead — at 100 TB cardinalities, raw HLL is the operating regime.
  */
object HyperLogLog {

  /** Register count m = 2^8. Fixed so sketches are always mergeable. */
  val Buckets = 256

  private def bucketOfHash(h: Column): Column =
    conv(substring(h, 1, 2), 16, 10).cast("int")

  private def rhoOfHash(h: Column): Column = {
    val w = conv(substring(h, 3, 13), 16, 10).cast("long")
    when(w === 0, lit(53)).otherwise(lit(53) - length(bin(w))).cast("int")
  }

  /** Bucket index (0..255): the first 8 bits (2 hex chars) of md5(key). */
  def bucketOf(key: Column): Column = bucketOfHash(md5(key.cast("string")))

  /** rho = leading-zero count of the 52-bit suffix + 1, in [1, 53]. */
  def rhoOf(key: Column): Column = rhoOfHash(md5(key.cast("string")))

  /** Sketch table (bucket, rho) — at most [[Buckets]] rows. The hash is
    * projected once and bucket/rho derive from it (one md5 per row by
    * construction, not by trusting codegen subexpression elimination).
    */
  def registers(df: DataFrame, key: Column): DataFrame =
    df.select(md5(key.cast("string")).as("_h"))
      .select(bucketOfHash(col("_h")).as("bucket"), rhoOfHash(col("_h")).as("rho"))
      .groupBy("bucket")
      .agg(max("rho").as("rho"))

  /** Per-group sketch tables (group, bucket, rho) — the partitioned-build
    * form: collapsing the group column with [[merge]]-style max equals one
    * whole-stream build (pinned by the q136 oracle and OperatorsSpec).
    */
  def groupedRegisters(df: DataFrame, key: Column, groupCol: Column): DataFrame =
    df.select(groupCol.as("grp"), md5(key.cast("string")).as("_h"))
      .select(col("grp"), bucketOfHash(col("_h")).as("bucket"), rhoOfHash(col("_h")).as("rho"))
      .groupBy("grp", "bucket")
      .agg(max("rho").as("rho"))

  /** Merge sketches: bucket-wise max — the streaming/partitioned
    * composition law (merge(build(A), build(B)) == build(A ∪ B) exactly).
    */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("bucket").agg(max("rho").as("rho"))

  /** Per-group estimates (grp, hll_est) from a [[groupedRegisters]] table —
    * the GROUP BY cardinality shape: distinct-count per key from one narrow
    * pass + a (groups × 256)-row aggregate, where an exact count(DISTINCT)
    * per group would shuffle every occurrence. Same integer-exact harmonic
    * sum as [[estimate]], keyed by group.
    */
  def estimateByGroup(reg: DataFrame): DataFrame = {
    val spark = reg.sparkSession
    val all = reg.select("grp").distinct()
      .crossJoin(spark.range(Buckets).select(col("id").cast("int").as("bucket")))
    all.join(reg, Seq("grp", "bucket"), "left")
      .select(col("grp"), coalesce(col("rho"), lit(0)).as("rho"))
      .groupBy("grp")
      .agg(sum(expr("shiftleft(1L, 53 - rho)")).as("_z"))
      .select(col("grp"), (lit(0.7213 / (1.0 + 1.079 / 256.0)) * lit(65536.0) *
        lit(9007199254740992.0) / col("_z").cast("double")).as("hll_est"))
  }

  /** One-row (hll_est DOUBLE) estimate from a register table. Buckets the
    * stream never touched count as rho = 0 (the left join against all 256).
    */
  def estimate(reg: DataFrame): DataFrame = {
    val spark = reg.sparkSession
    val all = spark.range(Buckets).select(col("id").cast("int").as("bucket"))
    all.join(reg, Seq("bucket"), "left")
      .select(coalesce(col("rho"), lit(0)).as("rho"))
      // exact integer harmonic denominator: sum over 256 buckets of 2^(53-rho)
      .agg(sum(expr("shiftleft(1L, 53 - rho)")).as("_z"))
      // alpha_256 * m^2 * 2^53 / Z — constant-folded doubles, one division
      .select((lit(0.7213 / (1.0 + 1.079 / 256.0)) * lit(65536.0) *
        lit(9007199254740992.0) / col("_z").cast("double")).as("hll_est"))
  }
}
