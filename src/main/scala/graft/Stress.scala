package graft
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Scale-headroom probe (not part of the driver contract): flagship
  * operators over sf0.1 unioned 10x (~6M lineitem rows) to confirm the
  * plans hold well past the gate scale.
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("stress", Some("32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def x10(name: String) = (1 to 10).map(i =>
      Tables.load(spark, dir, name).withColumn("_rep", lit(i))).reduce(_ unionByName _)
    def time(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"STRESS $n%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$r")
    }
    val li = x10("lineitem"); val o = x10("orders")
    time("warmup")(li.limit(1).count())
    time("agg_6M")(li.groupBy("l_returnflag", "l_linestatus")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("q"), count(lit(1))).count())
    time("join_agg_6M")(li.join(o.select("o_orderkey", "_rep"),
      li("l_orderkey") === o("o_orderkey") && li("_rep") === o("_rep"))
      .groupBy("l_returnflag").count().count())
    time("dedup_hash_6M")(Dedup.selfDedupAnyWins(
      graft.clean.Clean.withRowHash(li, Seq("l_orderkey", "l_linenumber", "_rep")), "row_hash").count())
    time("window_6M")(li.select(org.apache.spark.sql.functions.row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy("l_suppkey", "_rep").orderBy("l_orderkey")).as("rn")).filter(col("rn") === 1).count())
    spark.stop()
  }
}
