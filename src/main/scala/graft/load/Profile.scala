package graft.load

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling: null counts, exact distinct counts, and string-form
  * min/max per column, emitted long-format (one row per column) — the
  * data-quality report a warehouse runs after every load.
  *
  * Single scan: all per-column aggregates run in ONE aggregate (partial →
  * final, no per-column passes), then the one result row explodes into the
  * long format. min/max are compared on the STRING form so heterogeneous
  * columns share one output schema — a profiling convention, documented in
  * the output column names (`min_s`/`max_s`).
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap(c => Seq(
      // coalesce: sum over an empty table is null, the profile wants 0
      coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as(s"_nn_$c"),
      countDistinct(col(c)).as(s"_nd_$c"),
      min(col(c).cast("string")).as(s"_mn_$c"),
      max(col(c).cast("string")).as(s"_mx_$c")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map(c => struct(
      lit(c).as("col_name"),
      col(s"_nn_$c").as("n_nulls"),
      col(s"_nd_$c").as("n_distinct"),
      col(s"_mn_$c").as("min_s"),
      col(s"_mx_$c").as("max_s")))
    one.select(explode(array(stacked: _*)).as("p")).select("p.*")
  }
}
