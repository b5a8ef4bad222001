package graft

import graft.functions.{GraftExtensions, TypedAggregators}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** API-surface coverage: SparkSessionExtensions injection, typed Dataset
  * aggregators, bucketed co-located joins, and non-CSV/parquet formats.
  */
class ApiSurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("SparkSessionExtensions injects dot_product into GraftSession SQL") {
    // GraftSession.builder carries the extensions — SQL users get the custom
    // expression with no imperative registration
    val r = spark.sql("SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").head()
    assert(r.getDouble(0) == 11.0)
    // a raw extension-less session (same context) lacks the registration —
    // proves the injection scope is the session, not the JVM
    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val bare = SparkSession.builder()
        .master("local[4]")
        .appName("bare-test")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      assertThrows[org.apache.spark.sql.AnalysisException] {
        bare.sql("SELECT dot_product(array(1.0D), array(1.0D))").head()
      }
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("optimizer rule: levenshtein threshold predicates get auto-banded") {
    // parquet-backed source: a LocalRelation would let ConvertToLocalRelation
    // evaluate the filter away at optimization time
    def probe(s: SparkSession) = s.read.parquet(s"$sf/customer.parquet")
      .filter(levenshtein(col("c_name"), lit("Customer#000000001")) <= 1)
    // GraftSession carries the rule: rewritten to levenshtein(a, b, Some(1)) >= 0
    val df = probe(spark)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("Some(1)) >= 0"), optimized)
    // strict form: lev < 2 ⇒ banded at 1
    val strict = spark.read.parquet(s"$sf/customer.parquet")
      .filter(levenshtein(col("c_name"), lit("Customer#000000002")) < 2)
    assert(strict.queryExecution.optimizedPlan.toString.contains("Some(1)) >= 0"))
    // differential: an extension-less session evaluates the full 2-arg form
    // and returns the identical row set
    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val bare = SparkSession.builder()
        .master("local[4]")
        .appName("bare-rule-test")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val baseline = probe(bare)
      assert(!baseline.queryExecution.optimizedPlan.toString.contains("Some("))
      assert(df.count() == baseline.count() && df.count() > 0)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("typed Aggregator: single-pass mean/std over a Dataset") {
    val ds = Seq(2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0).toDS()
    val out = ds.select(TypedAggregators.meanStd.toColumn).head()
    assert(out.mean == 5.0)
    assert(math.abs(out.std - 2.0) < 1e-12)
  }

  test("typed Aggregator: element-wise vector sum per key") {
    val ds = Seq((1, Seq(1.0, 2.0)), (1, Seq(3.0, 4.0)), (2, Seq(5.0, 5.0))).toDS()
    val out = ds.groupByKey(_._1)
      .mapValues(_._2)
      .agg(TypedAggregators.vectorSum.toColumn)
      .collect().toMap
    assert(out(1) == Seq(4.0, 6.0))
    assert(out(2) == Seq(5.0, 5.0))
  }

  test("bucketed tables join without an exchange (co-located join)") {
    val db = tmpDir("buck")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS buckdb LOCATION '$db'")
    try {
      Tables.load(spark, sf, "orders")
        .write.format("parquet").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("buckdb.orders_b")
      Tables.load(spark, sf, "lineitem")
        .write.format("parquet").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("buckdb.lineitem_b")
      val joined = spark.table("buckdb.lineitem_b")
        .join(spark.table("buckdb.orders_b"),
          col("l_orderkey") === col("o_orderkey"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$p")
    } finally spark.sql("DROP DATABASE IF EXISTS buckdb CASCADE")
  }

  test("appendBatchObserved: metrics collected during the write, no second scan") {
    import graft.load.Snapshot
    val dir = tmpDir("obs") + "/table"
    val df = Seq((1L, Some(10.0)), (2L, None), (3L, Some(30.0))).toDF("id", "v")
    val m = Snapshot.appendBatchObserved(df, dir, Seq(
      count(lit(1)).as("rows"),
      sum(when($"v".isNull, 1L).otherwise(0L)).as("null_v"),
      max($"id").as("max_id")))
    assert(m("rows") == 3L && m("null_v") == 1L && m("max_id") == 3L)
    assert(spark.read.parquet(dir).count() == 3)
  }

  test("schema evolution: merged read unions batch schemas, old rows null-filled") {
    import graft.load.Snapshot
    val dir = tmpDir("evolve") + "/table"
    Snapshot.appendBatch(Seq((1L, "a")).toDF("id", "v"), dir)
    Snapshot.appendBatch(Seq((2L, "b", 9.5)).toDF("id", "v", "score"), dir)
    val merged = Snapshot.readTableMerged(spark, dir)
    assert(merged.columns.sorted.toSeq == Seq("id", "score", "v"))
    val byId = merged.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).isNullAt(merged.columns.indexOf("score")))
    assert(byId(2L).getDouble(merged.columns.indexOf("score")) == 9.5)
  }

  test("clustered append keeps rows readable and sorted within files") {
    import graft.load.Snapshot
    val dir = tmpDir("clustered") + "/table"
    Snapshot.appendBatchClustered(
      spark.range(1000).toDF("id").repartition(2), dir, Seq("id"))
    val back = spark.read.parquet(dir)
    assert(back.count() == 1000)
    // a selective range filter still pushes to the scan (pruning feeds on
    // the now-tight row-group stats)
    val p = back.filter($"id".between(10, 20)).queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("GreaterThanOrEqual(id,10)"))
  }

  test("recoverSwap restores a table stranded by a mid-swap crash") {
    import graft.load.Snapshot
    val dir = tmpDir("swaprec") + "/table"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(dir)
    // simulate a crash between rename-aside and promote: live dir gone,
    // data only in the ._swap_old sibling
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + "._swap_old")))
    Snapshot.recoverSwap(spark, dir)
    assert(spark.read.parquet(dir).count() == 2)
    // compact after recovery keeps all rows (and itself recovers first)
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + "._swap_old")))
    Snapshot.compact(spark, dir, targetFiles = 1)
    assert(spark.read.parquet(dir).count() == 2)
  }

  test("partitioned writes prune partitions at read time") {
    val dir = tmpDir("part")
    Tables.events(spark, sf)
      .withColumn("dt", date_format(col("ts"), "yyyy-MM-dd"))
      .write.partitionBy("dt").mode("overwrite").parquet(s"$dir/events_p")
    val pruned = spark.read.parquet(s"$dir/events_p").filter(col("dt") === "2024-01-01")
    pruned.collect()
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("dt"),
      s"no partition filter in:\n$plan")
    assert(pruned.count() > 0)
  }

  test("snapshot compaction merges batch files, preserves rows, survives re-read") {
    import spark.implicits._
    val dir = tmpDir("compact")
    val t = s"$dir/t"
    // simulate 5 small batch appends
    (1 to 5).foreach(i => Seq((i.toLong, s"v$i")).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(t))
    val before = new java.io.File(t).listFiles().count(_.getName.endsWith(".parquet"))
    assert(before >= 5)
    graft.load.Snapshot.compact(spark, t, targetFiles = 1)
    val after = new java.io.File(t).listFiles().count(_.getName.endsWith(".parquet"))
    assert(after == 1)
    assert(spark.read.parquet(t).select("id").as[Long].collect().sorted.toSeq == (1L to 5L))
  }

  test("JSON and ORC sources round-trip") {
    val dir = tmpDir("fmt")
    val df = Tables.events(spark, sf).limit(100)
    df.write.mode("overwrite").json(s"$dir/j")
    df.write.mode("overwrite").orc(s"$dir/o")
    assert(spark.read.json(s"$dir/j").count() == 100)
    val orc = spark.read.orc(s"$dir/o")
    assert(orc.count() == 100)
    assert(orc.schema("ts").dataType.typeName == "timestamp")
  }
}
