package graft.queries

import graft.Tables
import graft.clean.Clean
import graft.dedup.Dedup
import graft.load.{Casts, IdAssign}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference-parity operator inventory (SURVEY.md §2), one gate query per
  * operator family, expressed through the graft library over the driver's
  * TPC-H-ish test tables.
  *
  * Determinism rules used throughout (the DuckDB oracle must hash-match):
  *  - every query ends in a total ORDER BY;
  *  - double aggregates go through exact DECIMAL arithmetic and cast the final
  *    decimal to double — both engines then produce identical bits;
  *  - raw double columns pass through untouched (same parquet bits);
  *  - timestamps are emitted as formatted strings (second precision).
  */
object ParityQueries {

  /** Exact-decimal sum of a 2-dp double column, emitted as double. */
  private def dsum(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  val all: Seq[Q] = Seq(

    // S6 scan + P1 bulk rename: projection with aliasing (reference:
    // rename_column_in_csv, util/data_processing.py:107-206).
    Q(
      "q01_scan_rename",
      """SELECT l_orderkey AS order_id, l_linenumber AS line_no, l_returnflag AS flag
        |FROM lineitem ORDER BY order_id, line_no""".stripMargin) { (s, dir) =>
      Clean.renameColumns(
        Tables.load(s, dir, "lineitem").select("l_orderkey", "l_linenumber", "l_returnflag"),
        Map("l_orderkey" -> "order_id", "l_linenumber" -> "line_no", "l_returnflag" -> "flag"))
        .fold(e => throw new RuntimeException(e.message), identity)
        .orderBy("order_id", "line_no")
    },

    // S8 row-count scan + A1 (reference: data_pushing.py:288-298).
    Q("q02_count_scan", "SELECT count(*) AS n_rows FROM lineitem") { (s, dir) =>
      Tables.load(s, dir, "lineitem").agg(count(lit(1)).as("n_rows"))
    },

    // F2 extension/prefix filter + C9 filename parsing analog: regexp filter
    // (reference: main.py:364, main.py:391-392).
    Q(
      "q03_pattern_filter",
      """SELECT event_id, event_type FROM events
        |WHERE regexp_matches(event_type, '^(click|purchase)$')
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .filter(col("event_type").rlike("^(click|purchase)$"))
        .select("event_id", "event_type")
        .orderBy("event_id")
    },

    // F3 id-range predicate (reference: data_pushing.py:144-148). The filter
    // pushes to the parquet scan (PushedFilters) → row-group min/max skipping.
    Q(
      "q04_id_range_filter",
      """SELECT o_orderkey AS id, o_totalprice FROM orders
        |WHERE o_orderkey BETWEEN 100 AND 500 ORDER BY id""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .filter(col("o_orderkey").between(100, 500))
        .select(col("o_orderkey").as("id"), col("o_totalprice"))
        .orderBy("id")
    },

    // F4 null-diagnostic filter (reference: find_problematic_rows,
    // data_pushing.py:52-70).
    Q(
      "q05_null_filter",
      """SELECT doc_id, lang FROM documents WHERE lang IS NOT NULL ORDER BY doc_id""") {
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .filter(col("lang").isNotNull)
          .select("doc_id", "lang")
          .orderBy("doc_id")
    },

    // P2 add-missing-column at declared position (reference:
    // add_column_to_csv, data_processing.py:526-569 + main.py:178-195).
    Q(
      "q06_conform_add_col",
      """SELECT c_custkey AS customer_id, '' AS backfilled, c_name AS name
        |FROM customer ORDER BY customer_id""".stripMargin) { (s, dir) =>
      val df = Tables.load(s, dir, "customer")
        .select(col("c_custkey").as("customer_id"), col("c_name").as("name"))
      Clean.conform(df, Seq("customer_id", "backfilled", "name")).orderBy("customer_id")
    },

    // P4/C8 content-hash column — THE dedup key recipe
    // (reference: data_processing.py:476-482).
    Q(
      "q07_row_hash",
      """SELECT l_orderkey, l_linenumber,
        |  md5(concat_ws(chr(1),
        |    coalesce(CAST(l_orderkey AS VARCHAR), chr(2)),
        |    coalesce(CAST(l_linenumber AS VARCHAR), chr(2)),
        |    coalesce(l_returnflag, chr(2)),
        |    coalesce(l_linestatus, chr(2)))) AS row_hash
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      val df = Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus")
      df.withColumn(
        "row_hash",
        Clean.rowHashExpr(Seq("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus")))
        .drop("l_returnflag", "l_linestatus")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // J1 intra-batch dedup, first-wins (reference: self_deduplicate_csv,
    // data_processing.py:396-524). One shuffle on the key.
    Q(
      "q08_dedup_intra",
      """SELECT event_id, user_id, event_type FROM (
        |  SELECT event_id, user_id, event_type,
        |         row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY event_id""".stripMargin) { (s, dir) =>
      Dedup.selfDedupFirstWins(
        Tables.events(s, dir).select("event_id", "user_id", "event_type"),
        Seq("user_id", "event_type"),
        "event_id")
        .orderBy("event_id")
    },

    // J2 cross-batch anti-join on the hash/key column (reference:
    // compare_and_deduplicate_csv_files, data_processing.py:209-393).
    Q(
      "q09_dedup_cross",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '2001-01-01')
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      Dedup.antiJoinPrior(
        Tables.load(s, dir, "customer").select("c_custkey", "c_name"),
        Tables.load(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
          .select(col("o_custkey").as("c_custkey")),
        "c_custkey")
        .orderBy("c_custkey")
    },

    // J3 id anti-join with range-pruned build side (reference:
    // prevent_id_duplicate, data_pushing.py:115-166).
    Q(
      "q10_id_guard",
      """SELECT o_orderkey AS id, o_orderstatus FROM orders
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey
        |    AND l_orderkey >= (SELECT min(o_orderkey) FROM orders)
        |    AND l_orderkey <= (SELECT max(o_orderkey) FROM orders))
        |ORDER BY id""".stripMargin) { (s, dir) =>
      Dedup.idGuard(
        Tables.load(s, dir, "orders").select(col("o_orderkey").as("id"), col("o_orderstatus")),
        Tables.load(s, dir, "lineitem").select(col("l_orderkey").as("id")),
        "id")
        .orderBy("id")
    },

    // A2 MAX(id) watermark (reference: get_last_id, data_pushing.py:407-428).
    Q("q11_watermark", "SELECT max(o_orderkey) AS last_id FROM orders") { (s, dir) =>
      Tables.load(s, dir, "orders").agg(max("o_orderkey").as("last_id"))
    },

    // A3 min/max bounds (reference: data_pushing.py:144-145).
    Q(
      "q12_minmax",
      "SELECT min(l_orderkey) AS min_id, max(l_orderkey) AS max_id FROM lineitem") { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .agg(min("l_orderkey").as("min_id"), max("l_orderkey").as("max_id"))
    },

    // A4 distinct-set collection (reference: data_processing.py:296-311).
    Q(
      "q13_distinct",
      """SELECT DISTINCT l_returnflag AS flag, l_linestatus AS status
        |FROM lineitem ORDER BY flag, status""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .select(col("l_returnflag").as("flag"), col("l_linestatus").as("status"))
        .distinct()
        .orderBy("flag", "status")
    },

    // A5 batch statistics/counters (reference: data_processing.py:367-393).
    Q(
      "q14_stats",
      """SELECT count(*) AS n_rows, count(DISTINCT l_orderkey) AS n_orders,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |FROM lineitem""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem").agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        dsum(col("l_quantity")).as("total_qty"))
    },

    // C1 string→timestamp null-on-error (reference: data_pushing.py:346-348).
    Q(
      "q15_cast_timestamp",
      """SELECT event_id,
        |  strftime(try_strptime(strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S'),
        |           '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS parsed,
        |  strftime(try_strptime('not a date', '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d') AS junk
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .select(
          col("event_id"),
          date_format(
            Casts.toTimestampCoerce(date_format(date_trunc("second", col("ts")), "yyyy-MM-dd HH:mm:ss")),
            "yyyy-MM-dd HH:mm:ss").as("parsed"),
          // emitted as a (null) STRING: an all-null timestamp column would
          // hinge the compare on timestamp tz-ness, which differs by engine
          date_format(Casts.toTimestampCoerce(lit("not a date")), "yyyy-MM-dd").as("junk"))
        .orderBy("event_id")
    },

    // C2/C3 numeric coercion incl. the pandas "3.0"→3 path (reference:
    // data_pushing.py:351-358).
    Q(
      "q16_cast_numeric",
      """SELECT event_id,
        |  CAST(CAST(regexp_extract(props, '"k": (\d+)', 1) || '.0' AS DOUBLE) AS BIGINT) AS k_int,
        |  CAST(regexp_extract(props, '"k": (\d+)', 1) AS DOUBLE) AS k_float,
        |  CAST(TRY_CAST('junk' AS DOUBLE) AS BIGINT) AS junk_int
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      val k = regexp_extract(col("props"), "\"k\": (\\d+)", 1)
      Tables.events(s, dir)
        .select(
          col("event_id"),
          Casts.toLongCoerce(concat(k, lit(".0"))).as("k_int"),
          Casts.toDoubleCoerce(k).as("k_float"),
          Casts.toLongCoerce(lit("junk")).as("junk_int"))
        .orderBy("event_id")
    },

    // C5 strip trailing ".0" (reference: data_pushing.py:363-365).
    Q(
      "q17_strip_dotzero",
      """SELECT DISTINCT regexp_replace(CAST(n_chars AS VARCHAR) || '.0', '\.0$', '') AS cleaned
        |FROM documents ORDER BY cleaned""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(
          Casts.stripTrailingDotZero(concat(col("n_chars").cast("string"), lit(".0")))
            .as("cleaned"))
        .distinct()
        .orderBy("cleaned")
    },

    // C6 dob reformat to yyyy-MM-dd string (reference: data_pushing.py:368-370).
    Q(
      "q18_dob_format",
      "SELECT event_id, strftime(ts, '%Y-%m-%d') AS dob FROM events ORDER BY event_id") {
      (s, dir) =>
        Tables.events(s, dir)
          .select(col("event_id"), date_format(col("ts"), "yyyy-MM-dd").as("dob"))
          .orderBy("event_id")
    },

    // C7 null normalization of pandas artifacts (reference:
    // handle_nan_for_type, data_pushing.py:20-50).
    Q(
      "q19_null_normalize",
      """SELECT doc_id,
        |  CASE WHEN source IN ('<NA>', 'nan') THEN NULL ELSE source END AS source
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), Casts.normalizeNullStrings(col("source")).as("source"))
        .orderBy("doc_id")
    },

    // P3 dense surrogate ids from a watermark (reference:
    // data_pushing.py:329-331) — scalable zipWithIndex path.
    Q(
      "q20_assign_ids",
      """SELECT row_number() OVER (ORDER BY event_id) + 1000 AS id, event_id
        |FROM events ORDER BY id""".stripMargin) { (s, dir) =>
      IdAssign.denseIds(Tables.events(s, dir).select("event_id"), 1000L, Seq("event_id"))
        .orderBy("id")
    },

    // S9/S10/K3/O1 catalog scan analog: status-log style scan+aggregate
    // (reference: query_processed_files, data_pushing.py:544-592).
    Q(
      "q21_catalog_scan",
      """SELECT event_type AS status, count(*) AS n FROM events
        |GROUP BY status ORDER BY status""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type").as("status"))
        .agg(count(lit(1)).as("n"))
        .orderBy("status")
    },

    // Sort + limit (top-k) — oldest-first eviction analog (reference:
    // cleanup.py:113).
    Q(
      "q22_topk",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    },

    // Flagship group-aggregate (exercises partial aggregation / map-side
    // combine; the shape every warehouse table report takes).
    Q(
      "q23_agg_group",
      """SELECT l_returnflag AS flag, l_linestatus AS status,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |       (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |       AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty
        |FROM lineitem GROUP BY flag, status ORDER BY flag, status""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      li.groupBy(col("l_returnflag").as("flag"), col("l_linestatus").as("status"))
        .agg(
          count(lit(1)).as("n"),
          dsum(col("l_quantity")).as("sum_qty"),
          sum((col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("decimal(28,4)")).cast("double").as("revenue"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
        .orderBy("flag", "status")
    },

    // Join + aggregate with an explicitly broadcast dimension (the 100 TB
    // plan: fact shuffles once for the agg, dim ships to every executor).
    Q(
      "q24_join_agg",
      """SELECT c_mktsegment AS segment, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY segment ORDER BY segment""".stripMargin) { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
        .orderBy("segment")
    },

    // Window function: per-key running total (our idiomatic tool for
    // first-wins dedup and id assignment; SURVEY §2.8).
    Q(
      "q25_window_running",
      """SELECT event_id, user_id,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
        |    PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .select(
          col("event_id"),
          col("user_id"),
          sum(col("value").cast("decimal(18,2)")).over(w).cast("double").as("running_total"))
        .orderBy("event_id")
    },

    // Set difference (the dedup validation set ops; SURVEY §2.8).
    Q(
      "q26_set_except",
      """SELECT event_type FROM (
        |  SELECT DISTINCT event_type FROM events
        |  EXCEPT SELECT * FROM (VALUES ('click'), ('view')) v(event_type))
        |ORDER BY event_type""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.events(s, dir).select("event_type").distinct()
        .except(Seq("click", "view").toDF("event_type"))
        .orderBy("event_type")
    },

    // Union of prior batches (the J2 loop collapses to one union + anti-join).
    Q(
      "q27_union_all",
      """SELECT count(*) AS n FROM (
        |  SELECT l_orderkey AS k FROM lineitem
        |  UNION ALL SELECT o_orderkey AS k FROM orders)""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem").select(col("l_orderkey").as("k"))
        .unionAll(Tables.load(s, dir, "orders").select(col("o_orderkey").as("k")))
        .agg(count(lit(1)).as("n"))
    },

    // Micro-batch/streaming-style tumbling-window aggregate (the reference's
    // daily poll loop; Structured Streaming runs this same plan with
    // Trigger.AvailableNow — see graft.streaming).
    Q(
      "q28_time_window",
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events GROUP BY hour ORDER BY hour""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
        .orderBy("hour")
    })
}
