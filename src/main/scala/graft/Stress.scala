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

    // round-2 operators at 10x
    val ev = x10("events").withColumn("user_id", col("user_id") + col("_rep") * lit(100000L))
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(expr("ts div 1000")))
    time("sessionize_1M")(graft.operators.Sessionize
      .sessionStats(ev, "user_id", "ts", "event_id", 1800L).count())
    val docs = x10("documents").withColumn("doc_id", col("doc_id") + col("_rep") * lit(1000000L))
    time("minhash_pairs_50k")(graft.dedup.MinHashLsh
      .candidatePairs(docs, "doc_id", "text", 3, 12, 4).count())
    time("components_50k") {
      val pairs = graft.dedup.MinHashLsh.candidatePairs(docs, "doc_id", "text", 3, 12, 4)
      graft.dedup.DupClusters.components(pairs, "id_a", "id_b").count()
    }
    // worst-case component shape: one 65k-node chain (diameter 65535).
    // Plain propagation would need 65k rounds; pointer doubling must land
    // near log2(65535) = 16 (reported as rows= below)
    time("components_chain_65k_rounds") {
      val chain = spark.range(65535L)
        .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
      graft.dedup.DupClusters.convergenceRounds(chain, "id_a", "id_b").toLong
    }
    val cust = x10("customer").withColumn("c_custkey", col("c_custkey") + col("_rep") * lit(10000000L))
    time("fuzzy_join_150k")(graft.operators.FuzzyJoin.pairsWithinOne(
      cust, "c_custkey", "c_name", Seq("c_nationkey"), 16, 2).count())
    time("checksum_6M")(graft.load.Snapshot.tableChecksum(
      li, Seq("l_orderkey", "l_linenumber", "_rep")).count())

    // bloom-reduced vs plain anti join: 6M-row big side against a ~600k-key
    // prior (past broadcast size). The bloom variant's shuffle carries only
    // the true-match sliver + false positives.
    val prior = o.filter(col("o_totalprice") > 150000)
      .select(col("o_orderkey"), col("_rep")).withColumn(
        "_k", concat_ws(":", col("o_orderkey"), col("_rep")))
      .select("_k")
    val liKeyed = li.withColumn("_k", concat_ws(":", col("l_orderkey"), col("_rep")))
    time("anti_plain_6M")(liKeyed.join(prior, Seq("_k"), "left_anti").count())
    time("anti_bloom_6M")(graft.operators.BloomPrune
      .antiJoinReduced(liKeyed, prior, "_k", "_k", expectedItems = 1000000L).count())
    // distributed global ranking vs the single-partition window at 6M rows:
    // same statistic, one collapses to a single task, one spreads across 32
    time("ntile_window_1task_6M") {
      li.select(org.apache.spark.sql.functions.ntile(10).over(
        org.apache.spark.sql.expressions.Window
          .orderBy("l_extendedprice", "l_orderkey", "l_linenumber", "_rep")).as("b"))
        .groupBy("b").count().count()
    }
    time("ntile_globalrank_6M") {
      graft.operators.GlobalRank.ntile(
        li.select("l_extendedprice", "l_orderkey", "l_linenumber", "_rep"),
        Seq("l_extendedprice", "l_orderkey", "l_linenumber", "_rep"), 10, "b")
        .groupBy("b").count().count()
    }
    // row-level snapshot diff at 6M rows: only (key, hash) crosses the wire
    time("snapshot_diff_6M") {
      val aT = li.select(col("l_orderkey"), col("l_linenumber"), col("_rep"), col("l_quantity"))
        .groupBy("l_orderkey", "l_linenumber", "_rep")
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("q"))
      val bT = aT.filter(pmod(col("l_orderkey"), lit(97)) =!= 0)
        .withColumn("q", when(pmod(col("l_orderkey"), lit(89)) === 0, col("q") + 1)
          .otherwise(col("q")))
      graft.load.Snapshot
        .diffTables(aT, bT, Seq("l_orderkey", "l_linenumber", "_rep"), Seq("q")).count()
    }

    // as-of join: window formulation vs native merge exec at 1M probe rows
    val clicks = ev.filter(col("event_type") === "click").select("event_id", "user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pts"))
    time("asof_window_1M")(graft.operators.AsOfJoin
      .lastPriorMatch(clicks, purchases, Seq("user_id"), "ts", "pts", Seq("pts")).count())
    time("asof_native_1M")(graft.operators.AsOfJoin
      .lastPriorMatchNative(clicks, purchases, Seq("user_id"), "ts", "pts", Seq("pts")).count())
    spark.stop()
  }
}
