package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed global ranking — `row_number`/`rank`/`ntile`/`percent_rank`/
  * `cume_dist` over a WHOLE table without the single-partition
  * `Window.orderBy(...)` plan (an empty PARTITION BY collapses every row
  * into one window partition: one task sorts 100 TB — the same scale-killer
  * [[graft.load.IdAssign.denseIdsWindow]] documents).
  *
  * Shape: range-repartition on the order columns (so partition p holds rows
  * globally ordered before partition p+1), sort within partitions, then ONE
  * lightweight pass collects per-partition row counts (a few hundred longs
  * to the driver) and a second pass stamps each row with
  * `offset(partition) + local position` plus the total count. Every rank
  * statistic is arithmetic over (row_number, total):
  *
  *  - `rank = min row_number over the tied group`, `percent_rank =
  *    (rank−1)/(N−1)`, `cume_dist = (max row_number over the tied
  *    group)/N`, `ntile(k)` from row_number and N with the standard SQL
  *    first-`N mod k`-buckets-get-one-extra fill.
  *
  * The count pass re-reads the range shuffle's map output (the exchange is
  * reused, not re-planned), so the cost over a plain global sort is one
  * extra reduce-side scan — constant factor, no bottleneck task.
  */
object GlobalRank {

  /** Order-key cell copied out of a (possibly reused) InternalRow buffer
    * and normalized for equality: UTF8String/array/struct values alias the
    * row's bytes and MUST be cloned before being held across rows; binary
    * comes back as `Array[Byte]`, whose `==` is reference equality — two
    * tied md5 keys in different rows would compare unequal and slip past
    * the tie guard.
    */
  private def normKeyCell(v: Any): Any = v match {
    case a: Array[Byte] => a.toSeq
    case u: org.apache.spark.unsafe.types.UTF8String => u.clone()
    case s: org.apache.spark.sql.catalyst.InternalRow => s.copy()
    case ad: org.apache.spark.sql.catalyst.util.ArrayData => ad.copy()
    case d: org.apache.spark.sql.types.Decimal => d.toBigDecimal
    case x => x
  }

  private def requireFresh(df: DataFrame, cols: String*): Unit =
    for (c <- cols)
      require(
        !df.columns.contains(c),
        s"GlobalRank: output column '$c' already exists in the input —" +
          " withColumn would replace it in place while the stamped schema appends," +
          " corrupting row arity; pass a different output column name")

  /** `df` + `rnCol` (1-based global row_number, long) + `nCol` (total rows,
    * long), ordered by `orderCols`. Row order within ties follows the sort's
    * (stable) placement, so make `orderCols` a TOTAL order (append a unique
    * tie-break) whenever downstream math assumes `row_number == rank`.
    */
  def withRowNumber(
      df: DataFrame,
      orderCols: Seq[String],
      rnCol: String = "_rn",
      nCol: String = "_n",
      failOnTies: Boolean = false): DataFrame = {
    require(orderCols.nonEmpty, "global ranking needs at least one order column")
    requireFresh(df, rnCol, nCol)
    val spark = df.sparkSession
    val sorted = df
      .repartitionByRange(orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    // both passes run over the INTERNAL row RDD (the range shuffle's files
    // are reused between them): stamping through `df.rdd` would
    // field-by-field deserialize every row to an external Row and convert
    // it back — for a fact-table stamp that conversion used to cost more
    // than the shuffle itself
    val rdd = graft.operators.Lineage.internalRdd(sorted)
    // pass 1: per-partition sizes only — O(partitions) longs to the driver
    val sizes = rdd.mapPartitions(
      it => Iterator.single(it.size.toLong), preservesPartitioning = true).collect()
    val offsets = sizes.scanLeft(0L)(_ + _)
    val total = offsets.last
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField(rnCol, LongType, nullable = false),
      StructField(nCol, LongType, nullable = false)))
    // `failOnTies` = the caller promised orderCols is a TOTAL order (so
    // row_number doubles as rank); a broken promise must fail LOUDLY, not
    // silently misrank. Detection is complete with a per-partition
    // adjacent-row compare: a RangePartitioner never splits EQUAL keys
    // across partitions, so tied rows are always sorted adjacent within one
    // partition — no extra pass, no cross-partition check needed. (Nulls
    // compare equal here: SQL rank treats a repeated NULL key as a tie.)
    val keyIdx = orderCols.map(c => df.schema.fieldIndex(c))
    val keyTypes = keyIdx.map(i => df.schema(i).dataType)
    // pass 2: stamp rank + total behind the same reused range shuffle. The
    // appended struct and the JoinedRow are reused per partition — the
    // standard SparkPlan output contract (consumers copy when buffering).
    val stamped = rdd.mapPartitionsWithIndex { (pid, it) =>
      var i = offsets(pid)
      val appended = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
      appended.update(1, total)
      val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
      var prevKey: Seq[Any] = null
      it.map { r =>
        if (failOnTies) {
          val key = keyIdx.indices.map(k => normKeyCell(r.get(keyIdx(k), keyTypes(k))))
          if (prevKey != null && prevKey == key)
            throw new IllegalStateException(
              s"GlobalRank: tiesPossible=false but order key ${orderCols.mkString("(", ",", ")")}" +
                s" = ${key.mkString("(", ",", ")")} is duplicated — ranks would be wrong;" +
                " pass tiesPossible=true or append a unique tie-break column")
          prevKey = key
        }
        i += 1
        appended.update(0, i)
        joined(r, appended): org.apache.spark.sql.catalyst.InternalRow
      }
    }
    graft.operators.Lineage.internalDataFrame(spark, stamped, outSchema)
  }

  /** [[withRowNumber]] and [[withRunningTotal]] FUSED over one order:
    * when a caller needs both the global rank AND the exclusive prefix
    * sum of the same ordering (token-budget selection does), two
    * separate stamps would range-shuffle the same projection twice.
    * This pays ONE range exchange, one O(partitions) driver pass
    * collecting (size, sum) pairs, one stamp pass. Ties fail loudly
    * (both outputs are meaningless under a non-total order).
    */
  def withRowNumberAndRunningTotal(
      df: DataFrame,
      orderCols: Seq[String],
      valueCol: String,
      rnCol: String = "_rn",
      cumCol: String = "_cum"): DataFrame = {
    require(orderCols.nonEmpty, "global ranking needs at least one order column")
    requireFresh(df, rnCol, cumCol)
    val spark = df.sparkSession
    val valTmp = "_gr_stamp_val"
    require(!df.columns.contains(valTmp), s"GlobalRank: reserved column $valTmp in input")
    val projected = df.withColumn(valTmp, coalesce(col(valueCol).cast("long"), lit(0L)))
    val sorted = projected
      .repartitionByRange(orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    // internal-row passes — see withRowNumber
    val rdd = graft.operators.Lineage.internalRdd(sorted)
    val vIdx = projected.schema.fieldIndex(valTmp)
    val keyIdx = orderCols.map(c => projected.schema.fieldIndex(c))
    val keyTypes = keyIdx.map(i => projected.schema(i).dataType)
    // pass 1: per-partition (row count, value sum) — O(partitions) pairs
    val stats = rdd.mapPartitions({ it =>
      var n = 0L; var s = 0L
      it.foreach { r => n += 1; s += r.getLong(vIdx) }
      Iterator.single((n, s))
    }, preservesPartitioning = true).collect()
    val rnOffsets = stats.map(_._1).scanLeft(0L)(_ + _)
    val cumOffsets = stats.map(_._2).scanLeft(0L)(_ + _)
    val stampedSchema = StructType(projected.schema.fields ++ Seq(
      StructField(rnCol, LongType, nullable = false),
      StructField(cumCol, LongType, nullable = false)))
    // pass 2: stamp both behind the same reused range-shuffle files
    val stamped = rdd.mapPartitionsWithIndex { (pid, it) =>
      var rn = rnOffsets(pid)
      var acc = cumOffsets(pid)
      val appended = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
      val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
      var prevKey: Seq[Any] = null
      it.map { r =>
        val key = keyIdx.indices.map(k => normKeyCell(r.get(keyIdx(k), keyTypes(k))))
        if (prevKey != null && prevKey == key)
          throw new IllegalStateException(
            s"GlobalRank: order key ${orderCols.mkString("(", ",", ")")}" +
              s" = ${key.mkString("(", ",", ")")} is duplicated — rank and running" +
              " total would be nondeterministic; append a unique tie-break column")
        prevKey = key
        rn += 1
        appended.update(0, rn)
        appended.update(1, acc)
        acc += r.getLong(vIdx)
        joined(r, appended): org.apache.spark.sql.catalyst.InternalRow
      }
    }
    // drop the projected value column; output = df columns + rn + cum
    graft.operators.Lineage.internalDataFrame(spark, stamped, stampedSchema)
      .drop(valTmp)
  }

  /** Distributed EXCLUSIVE prefix sum of `valueCol` in `orderCols` order —
    * the running-total twin of [[withRowNumber]], and the primitive behind
    * sequence packing (concat-then-split bin assignment) and token-budget
    * selection in a training-data pipeline. A naive
    * `sum over (ORDER BY …)` window with no PARTITION BY collapses to one
    * task; this keeps the same two-pass shape: range-repartition + sort,
    * ONE pass ships per-partition sums to the driver (O(partitions) longs),
    * a second stamps `offset(partition) + local running sum`. `orderCols`
    * must be a total order for a deterministic result (same contract as
    * `tiesPossible = false`, enforced the same way).
    */
  def withRunningTotal(
      df: DataFrame,
      orderCols: Seq[String],
      valueCol: String,
      outCol: String = "_cum"): DataFrame = {
    require(orderCols.nonEmpty, "running total needs at least one order column")
    requireFresh(df, outCol)
    val spark = df.sparkSession
    val valTmp = "_gr_stamp_val"
    require(!df.columns.contains(valTmp), s"GlobalRank: reserved column $valTmp in input")
    // null values count as 0 (getLong on a null cell would NPE mid-stamp)
    val projected = df.withColumn(valTmp, coalesce(col(valueCol).cast("long"), lit(0L)))
    val sorted = projected
      .repartitionByRange(orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    // internal-row passes — see withRowNumber
    val rdd = graft.operators.Lineage.internalRdd(sorted)
    val vIdx = projected.schema.fieldIndex(valTmp)
    val keyIdx = orderCols.map(c => projected.schema.fieldIndex(c))
    val keyTypes = keyIdx.map(i => projected.schema(i).dataType)
    // pass 1: per-partition value sums — O(partitions) longs to the driver
    val sums = rdd.mapPartitions(
      it => Iterator.single(it.foldLeft(0L)((a, r) => a + r.getLong(vIdx))),
      preservesPartitioning = true).collect()
    val offsets = sums.scanLeft(0L)(_ + _)
    val stampedSchema = StructType(
      projected.schema.fields :+ StructField(outCol, LongType, nullable = false))
    // pass 2: append the exclusive running total behind the reused shuffle
    val stamped = rdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = offsets(pid)
      val appended = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
      var prevKey: Seq[Any] = null
      it.map { r =>
        val key = keyIdx.indices.map(k => normKeyCell(r.get(keyIdx(k), keyTypes(k))))
        if (prevKey != null && prevKey == key)
          throw new IllegalStateException(
            s"GlobalRank.withRunningTotal: order key ${orderCols.mkString("(", ",", ")")}" +
              s" = ${key.mkString("(", ",", ")")} is duplicated — the running total would be" +
              " nondeterministic; append a unique tie-break column")
        prevKey = key
        appended.update(0, acc)
        acc += r.getLong(vIdx)
        joined(r, appended): org.apache.spark.sql.catalyst.InternalRow
      }
    }
    // drop the projected value column; output = df columns + outCol
    graft.operators.Lineage.internalDataFrame(spark, stamped, stampedSchema)
      .drop(valTmp)
  }

  /** SQL-standard `ntile(buckets)` from (row_number, total): the first
    * `N mod k` buckets take `ceil(N/k)` rows, the rest `floor(N/k)`.
    */
  def ntileCol(rn: Column, n: Column, buckets: Int): Column = {
    require(buckets > 0, "ntile needs a positive bucket count")
    // Spark's `/` is double division even on longs; floor+cast keeps the
    // math integral (exact to 2^53 rows — comfortably past 100 TB counts)
    val k = lit(buckets.toLong)
    val q = floor(n / k).cast("long")
    val r = n % k
    val cut = r * (q + 1)
    when(rn <= cut, floor((rn - 1) / (q + 1)).cast("long") + 1)
      .otherwise(r + floor((rn - 1 - cut) / q).cast("long") + 1)
  }

  /** `df` + an ntile bucket column, no single-partition window. */
  def ntile(
      df: DataFrame,
      orderCols: Seq[String],
      buckets: Int,
      outCol: String = "bucket"): DataFrame =
    withRowNumber(df, orderCols)
      .withColumn(outCol, ntileCol(col("_rn"), col("_n"), buckets))
      .drop("_rn", "_n")

  /** `df` + `percent_rank` (`prkCol`) and `cume_dist` (`cdCol`) columns.
    *
    * With `tiesPossible = true` (default) tied groups are resolved exactly —
    * one extra aggregate+join keyed on `orderCols` computes each group's
    * min/max row_number (SQL rank / cume_dist numerator). Pass `false` when
    * `orderCols` is already a total order (unique tie-break column present)
    * to skip that join: `rank == row_number` then.
    */
  def rankRatios(
      df: DataFrame,
      orderCols: Seq[String],
      prkCol: String = "percent_rank",
      cdCol: String = "cume_dist",
      tiesPossible: Boolean = true): DataFrame = {
    // Tie path: a RangePartitioner cannot split EQUAL keys across
    // partitions, so a heavily repeated order value (rank by language,
    // status, …) would pile onto one partition. Appending a deterministic
    // content-hash spreader to the range keys splits tied rows across
    // partitions; row_number within a tie group becomes arbitrary-but-
    // deterministic, and the min/max bounds join below restores the EXACT
    // SQL rank/cume_dist regardless of that placement. (Without ties the
    // order is total and needs no spreader.) The ranked output feeds two
    // plan branches (probe + bounds aggregate); the range exchange is
    // reused across both, so the recompute is the in-partition sort only.
    val ranked =
      if (!tiesPossible) withRowNumber(df, orderCols, failOnTies = true)
      else {
        val spread = "_tiespread"
        withRowNumber(
          df.withColumn(
            spread,
            pmod(graft.functions.ContentHash.stableRowHash(df), lit(1024L))),
          orderCols :+ spread).drop(spread)
      }
    val withBounds =
      if (!tiesPossible) {
        ranked.withColumn("_rkmin", col("_rn")).withColumn("_rkmax", col("_rn"))
      } else {
        // null-SAFE join: a NULL order value is a legitimate rank group
        // (SQL sorts it first); a plain equi-join would silently drop those
        // rows from the output
        val bounds = ranked
          .groupBy(orderCols.map(col): _*)
          .agg(min(col("_rn")).as("_rkmin"), max(col("_rn")).as("_rkmax"))
          .select(orderCols.map(c => col(c).as(s"_b_$c")) ++
            Seq(col("_rkmin"), col("_rkmax")): _*)
        val cond = orderCols.map(c => col(c) <=> col(s"_b_$c")).reduce(_ && _)
        ranked.join(bounds, cond).drop(orderCols.map(c => s"_b_$c"): _*)
      }
    withBounds
      .withColumn(
        prkCol,
        when(col("_n") === 1, lit(0.0))
          .otherwise((col("_rkmin") - 1).cast("double") / (col("_n") - 1).cast("double")))
      .withColumn(cdCol, col("_rkmax").cast("double") / col("_n").cast("double"))
      .drop("_rn", "_n", "_rkmin", "_rkmax")
  }
}
