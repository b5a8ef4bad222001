package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series repair operators — the gap-filling step between raw event
  * logs and model-ready features. Forward fill is the q72 window; this adds
  * LINEAR interpolation: interior nulls take the straight line between the
  * nearest non-null neighbors (weighted by x-axis distance), edge nulls
  * stay null (there is nothing to anchor the line to).
  *
  * Scale shape: two frame-bounded windows over the same (key, order)
  * partitioning — ONE shuffle total, both windows and the arithmetic fuse
  * into the same stage; no self-join, no explode.
  */
object TimeSeries {

  /** `df` + `outCol`: `valueCol` with interior nulls linearly interpolated
    * along `xCol` (numeric axis — epoch seconds, sequence number, …) within
    * each `keyCols` group. Non-null values pass through exactly; nulls
    * before the first / after the last observation remain null.
    */
  def interpolateLinear(
      df: DataFrame,
      keyCols: Seq[String],
      xCol: String,
      valueCol: String,
      outCol: String = "interpolated"): DataFrame = {
    val back = Window.partitionBy(keyCols.map(col): _*).orderBy(col(xCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(keyCols.map(col): _*).orderBy(col(xCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val v = col(valueCol)
    val prevV = last(v, ignoreNulls = true).over(back)
    val prevX = last(when(v.isNotNull, col(xCol)), ignoreNulls = true).over(back)
    val nextV = first(v, ignoreNulls = true).over(fwd)
    val nextX = first(when(v.isNotNull, col(xCol)), ignoreNulls = true).over(fwd)
    df.withColumn(
      outCol,
      when(v.isNotNull, v.cast("double"))
        .when(
          prevV.isNotNull && nextV.isNotNull,
          prevV.cast("double") +
            (nextV.cast("double") - prevV.cast("double")) *
            (col(xCol).cast("double") - prevX.cast("double")) /
            (nextX.cast("double") - prevX.cast("double"))))
  }
}
