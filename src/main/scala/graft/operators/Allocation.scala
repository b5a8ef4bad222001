package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact integer apportionment: distribute an integer `total` across rows in
  * proportion to a non-negative integer weight so the allocations SUM TO
  * `total` EXACTLY — the largest-remainder (Hamilton) method. Naive
  * `round(total · w / W)` drifts by rounding and the column no longer sums
  * to the controlled figure; finance/quota/budget proration requires the
  * exact reconciliation.
  *
  * All arithmetic is decimal(38,0) integer math — quotients via exact
  * `x − (x mod W)` subtraction, never a rounded decimal division — so the
  * result is engine-reproducible bit-for-bit. Ties in remainder break by
  * `tieCols` ascending (deterministic).
  *
  * Scale shape: the input is an ALLOCATION-TARGET table (an aggregate:
  * segments, nations, accounts — thousands of rows, not facts), so the two
  * unpartitioned windows (grand total, remainder rank) run on a tiny
  * single-partition exchange by design; aggregate facts to the target grain
  * FIRST. The require below fails loudly rather than let a fact-sized input
  * silently single-partition.
  */
object Allocation {

  private val Dec = "decimal(38,0)"

  /** @param df      allocation targets; one output row per input row
    * @param tieCols deterministic remainder tie-break (should be unique)
    * @param weightCol non-negative integral weights, at least one positive
    * @param total   amount to distribute (>= 0)
    * @param maxRows guard against mis-use on fact-sized inputs
    */
  def largestRemainder(
      df: DataFrame,
      weightCol: String,
      total: Long,
      tieCols: Seq[String],
      maxRows: Long = 1000000L): DataFrame = {
    require(total >= 0, s"total=$total must be >= 0")
    require(tieCols.nonEmpty, "need tie-break columns for a deterministic remainder rank")
    Seq("_w", "_q", "_tot", "_base", "_rem", "_rk", "_short", "alloc").foreach { c =>
      require(!df.columns.contains(c), s"input column '$c' collides with an internal name")
    }
    val n = df.count()
    require(n <= maxRows,
      s"$n rows exceeds maxRows=$maxRows — aggregate to the allocation grain first " +
        "(the remainder rank is a deliberate single-partition window over targets)")

    val wAll = Window.partitionBy()
    val w = col("_w").cast(Dec)
    // a negative weight breaks the floor/mod identity below — fail the job,
    // don't mis-allocate
    val withW = df.withColumn("_w",
      when(col(weightCol).cast("long") < 0,
        raise_error(concat(lit(s"negative weight in $weightCol: "), col(weightCol))))
        .otherwise(col(weightCol).cast("long")))
    // total·w and the grand total W are exact in decimal(38,0); base share is
    // the exact floor quotient (w >= 0 ⇒ mod is the true remainder)
    val grand = sum(col("_w").cast(Dec)).over(wAll)
    val q = lit(total).cast(Dec) * w
    val staged = withW
      .withColumn("_q", q)
      .withColumn("_tot", grand)
      .withColumn("_rem", col("_q") % col("_tot"))
      .withColumn("_base", ((col("_q") - col("_rem")) / col("_tot")).cast("long"))
    val wRank = Window.orderBy(col("_rem").desc +: tieCols.map(col(_).asc): _*)
    staged
      .withColumn("_rk", row_number().over(wRank))
      .withColumn("_short", lit(total) - sum(col("_base")).over(wAll))
      .withColumn("alloc",
        col("_base") + when(col("_rk") <= col("_short"), 1L).otherwise(0L))
      .drop("_w", "_q", "_tot", "_rem", "_base", "_rk", "_short")
  }

  /** GROUPED largest remainder: one independent apportionment per
    * `groupCols` key, each distributing that group's own `totalCol` (which
    * must be group-constant — it is read per-row) across the group's rows
    * in proportion to `weightCol`. The per-stratum split-size computation
    * of an exact stratified train/val/test split is the canonical caller
    * (a handful of rows per stratum), and unlike [[largestRemainder]] the
    * windows here are PARTITIONED by the group key, so the operator is
    * safe on any number of groups — the single-partition caveat applies
    * only within one group, whose row count is the number of allocation
    * buckets (tiny by construction).
    */
  def largestRemainderBy(
      df: DataFrame,
      groupCols: Seq[String],
      weightCol: String,
      totalCol: String,
      tieCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "largestRemainderBy needs group columns")
    require(tieCols.nonEmpty, "need tie-break columns for a deterministic remainder rank")
    Seq("_w", "_q", "_tot", "_base", "_rem", "_rk", "_short", "alloc").foreach { c =>
      require(!df.columns.contains(c), s"input column '$c' collides with an internal name")
    }
    val wAll = Window.partitionBy(groupCols.map(col): _*)
    val w = col("_w").cast(Dec)
    val withW = df.withColumn("_w",
      when(col(weightCol).cast("long") < 0,
        raise_error(concat(lit(s"negative weight in $weightCol: "), col(weightCol))))
        .otherwise(col(weightCol).cast("long")))
    val grand = sum(col("_w").cast(Dec)).over(wAll)
    val q = col(totalCol).cast(Dec) * w
    val staged = withW
      .withColumn("_q", q)
      .withColumn("_tot", grand)
      .withColumn("_rem", col("_q") % col("_tot"))
      .withColumn("_base", ((col("_q") - col("_rem")) / col("_tot")).cast("long"))
    val wRank = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("_rem").desc +: tieCols.map(col(_).asc): _*)
    staged
      .withColumn("_rk", row_number().over(wRank))
      .withColumn("_short", col(totalCol).cast("long") - sum(col("_base")).over(wAll))
      .withColumn("alloc",
        col("_base") + when(col("_rk") <= col("_short"), 1L).otherwise(0L))
      .drop("_w", "_q", "_tot", "_rem", "_base", "_rk", "_short")
  }
}
