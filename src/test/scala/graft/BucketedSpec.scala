package graft

import graft.load.Bucketed
import org.apache.spark.sql.functions._

/** Bucketed-table co-location: the join and the keyed aggregate must plan
  * WITHOUT an Exchange when both sides carry matching bucket layouts —
  * the write-side shuffle eliminator measured by its plan, not argued.
  */
class BucketedSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed-bucketed join and keyed aggregate plan with no Exchange; rows match plain join") {
    val left = (0L until 2000L).map(i => (i, s"l$i")).toDF("k", "lv")
    val right = (0L until 2000L by 2L).map(i => (i, s"r$i")).toDF("k", "rv")
    Bucketed.writeBucketed(left, "b_left", "k", 8)
    Bucketed.writeBucketed(right, "b_right", "k", 8)
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path (a broadcast would hide the co-location)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val bl = Bucketed.readTable(spark, "b_left")
      val br = Bucketed.readTable(spark, "b_right")
      val joined = bl.join(br, "k")
      val jp = joined.queryExecution.executedPlan.toString
      assert(jp.contains("SortMergeJoin"), s"expected SMJ in:\n$jp")
      assert(!jp.contains("Exchange"), s"bucketed join must not shuffle either side:\n$jp")
      // same rows as the plain (shuffled) join of the unbucketed frames
      val got = joined.select("k", "lv", "rv").as[(Long, String, String)].collect().toSet
      val want = left.join(right, "k").select("k", "lv", "rv")
        .as[(Long, String, String)].collect().toSet
      assert(got == want && got.size == 1000)
      // aggregation keyed on the bucket column also skips its exchange
      val agg = bl.groupBy("k").agg(count(lit(1)))
      val ap = agg.queryExecution.executedPlan.toString
      assert(!ap.contains("Exchange"), s"bucketed groupBy must not shuffle:\n$ap")
      assert(agg.count() == 2000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS b_left")
      spark.sql("DROP TABLE IF EXISTS b_right")
    }
  }
}
