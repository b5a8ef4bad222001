package graft.queries

import graft.Tables
import graft.load.Skew
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytics breadth beyond the reference's own surface: multi-level
  * aggregation, the window-function family, string/date scalar functions,
  * skew-salted aggregation, sketches. All decimal-exact or integer-exact so
  * the DuckDB oracles hash-match.
  */
object AnalyticsQueries {

  val all: Seq[Q] = Seq(

    // ROLLUP: hierarchical totals in one pass (grouping-set machinery).
    Q(
      "q44_rollup",
      """SELECT l_returnflag AS flag, l_linestatus AS status, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY ROLLUP(flag, status)
        |ORDER BY flag NULLS FIRST, status NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .select(col("l_returnflag").as("flag"), col("l_linestatus").as("status"), col("l_quantity"))
        .rollup("flag", "status")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))
        .orderBy(col("flag").asc_nulls_first, col("status").asc_nulls_first)
    },

    // The window-function family: rank, dense_rank, lag, lead, ntile.
    Q(
      "q45_window_family",
      """SELECT event_id, user_id,
        |  rank() OVER w AS rnk,
        |  dense_rank() OVER w AS drnk,
        |  lag(event_id, 1) OVER w AS prev_id,
        |  lead(event_id, 1) OVER w AS next_id,
        |  ntile(4) OVER w AS quartile
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("event_id")
      Tables.events(s, dir).select(
        col("event_id"), col("user_id"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        lag(col("event_id"), 1).over(w).as("prev_id"),
        lead(col("event_id"), 1).over(w).as("next_id"),
        ntile(4).over(w).cast("long").as("quartile"))
        .orderBy("event_id")
    },

    // String scalar-function family over real data.
    Q(
      "q46_string_funcs",
      """SELECT doc_id,
        |  upper(substr(source, 1, 3)) AS src_upper,
        |  length(trim(source)) AS src_len,
        |  lpad(CAST(doc_id AS VARCHAR), 8, '0') AS padded,
        |  replace(lang, 'e', '3') AS leet,
        |  reverse(lang) AS rlang,
        |  concat(lang, '/', source) AS joined,
        |  split_part(source, 'c', 2) AS after_c
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents").select(
        col("doc_id"),
        upper(substring(col("source"), 1, 3)).as("src_upper"),
        length(trim(col("source"))).cast("long").as("src_len"),
        lpad(col("doc_id").cast("string"), 8, "0").as("padded"),
        regexp_replace(col("lang"), "e", "3").as("leet"),
        reverse(col("lang")).as("rlang"),
        concat(col("lang"), lit("/"), col("source")).as("joined"),
        // DuckDB split_part returns '' (not NULL) when the part is absent
        coalesce(element_at(split(col("source"), "c"), 2), lit("")).as("after_c"))
        .orderBy("doc_id")
    },

    // Date/time scalar-function family.
    Q(
      "q47_date_funcs",
      """SELECT o_orderkey,
        |  year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS d,
        |  dayofweek(o_orderdate) + 1 AS dow,
        |  strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d') AS due,
        |  datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS age_days
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("d"),
        dayofweek(col("o_orderdate")).cast("long").as("dow"),
        date_format(col("o_orderdate") + expr("INTERVAL 90 DAYS"), "yyyy-MM-dd").as("due"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("timestamp")).cast("long").as("age_days"))
        .orderBy("o_orderkey")
    },

    // Conditional aggregation (pivot shape with fixed columns).
    Q(
      "q48_conditional_agg",
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'click') AS clicks,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchases,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'purchase')
        |       AS DOUBLE) AS purchase_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy("user_id")
        .agg(
          count(when(col("event_type") === "click", 1)).as("clicks"),
          count(when(col("event_type") === "purchase", 1)).as("purchases"),
          sum(when(col("event_type") === "purchase", col("value").cast("decimal(18,2)")))
            .cast("double").as("purchase_value"))
        .orderBy("user_id")
    },

    // Skew-salted two-phase aggregate — same answer as the direct GROUP BY
    // (the oracle), but phase 1 spreads hot keys over 16 reducers. Decimal
    // sums keep the two-phase result bit-identical (associative).
    Q(
      "q49_salted_agg",
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      val prepped = Tables.events(s, dir)
        .select(col("event_type"), col("value").cast("decimal(18,2)").as("val"))
      Skew.saltedAggregate(prepped, Seq("event_type"), Seq("val"), saltBuckets = 16)
        .select(col("event_type"), col("n"), col("sum_val").cast("double").as("sum_val"))
        .orderBy("event_type")
    },

    // Sketch-based distinct (HLL). Spark's and DuckDB's HLL sketches
    // legitimately differ, so the estimate itself can't be equality-checked;
    // the gate instead hash-matches the companion EXACT distinct and folds
    // the sketch assertion into the row: `within_bound` is true iff the HLL
    // estimate lands within 3σ (3 × rsd=0.05 → ±15%) of the exact count —
    // an out-of-bound sketch flips it to false and fails the hash match.
    Q(
      "q50_approx_distinct",
      """SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
        |  TRUE AS within_bound
        |FROM lineitem""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .agg(
          countDistinct(col("l_orderkey")).as("exact_orders"),
          approx_count_distinct(col("l_orderkey"), rsd = 0.05).as("_approx"))
        .select(
          col("exact_orders"),
          (abs(col("_approx") - col("exact_orders"))
            <= col("exact_orders").cast("double") * lit(0.15)).as("within_bound"))
    },

    // As-of join: last purchase at-or-before each click, per user. Spark
    // runs graft's union+window operator (one shuffle, linear); the oracle
    // uses DuckDB's native ASOF JOIN — two independent algorithms, same rows.
    Q(
      "q51_asof_join",
      """WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts AS pts FROM events WHERE event_type = 'purchase')
        |SELECT c.event_id, c.user_id,
        |  strftime(date_trunc('second', c.ts), '%Y-%m-%d %H:%M:%S') AS click_ts,
        |  strftime(date_trunc('second', p.pts), '%Y-%m-%d %H:%M:%S') AS last_purchase_ts
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.pts
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click").select("event_id", "user_id", "ts")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("pts"))
      graft.operators.AsOfJoin
        .lastPriorMatch(clicks, purchases, Seq("user_id"), "ts", "pts", Seq("pts"))
        .select(
          col("event_id"),
          col("user_id"),
          date_format(date_trunc("second", col("ts")), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
          date_format(date_trunc("second", col("asof_pts")), "yyyy-MM-dd HH:mm:ss")
            .as("last_purchase_ts"))
        .orderBy("event_id")
    },

    // Point-in-interval range join: Spark quantizes intervals to buckets and
    // equi-joins (no nested loop); the oracle is the plain inequality join —
    // equality of results verifies the bucketing optimization exactly.
    Q(
      "q52_range_join",
      """SELECT event_id, band_id FROM events
        |JOIN (VALUES (1, 0.0, 50.0), (2, 50.0, 100.0), (3, 100.0, 200.0),
        |             (4, 200.0, 500.0), (5, 500.0, 1000.0)) b(band_id, lo, hi)
        |  ON value >= lo AND value < hi
        |ORDER BY event_id, band_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val bands = Seq((1, 0.0, 50.0), (2, 50.0, 100.0), (3, 100.0, 200.0),
        (4, 200.0, 500.0), (5, 500.0, 1000.0)).toDF("band_id", "lo", "hi")
      graft.operators.RangeJoin
        .pointInInterval(Tables.events(s, dir), bands, "value", "lo", "hi", bucketWidth = 50.0)
        .select("event_id", "band_id")
        .orderBy("event_id", "band_id")
    },

    // Semi-structured columns: JSON path extraction + typed cast.
    Q(
      "q53_json_extract",
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  CAST(json_extract_string('{"bad": 1}', '$.missing') AS BIGINT) AS missing
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      Tables.events(s, dir).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        get_json_object(lit("""{"bad": 1}"""), "$.missing").cast("long").as("missing"))
        .orderBy("event_id")
    },

    // Exact interpolated percentiles (the sort-based quantile operator).
    Q(
      "q54_percentiles",
      """SELECT l_returnflag AS flag,
        |  round(quantile_cont(l_quantity, 0.25), 4) AS p25,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS p50,
        |  round(quantile_cont(l_quantity, 0.75), 4) AS p75
        |FROM lineitem GROUP BY flag ORDER BY flag""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag").as("flag"))
        .agg(
          round(expr("percentile(l_quantity, 0.25)"), 4).as("p25"),
          round(expr("percentile(l_quantity, 0.5)"), 4).as("p50"),
          round(expr("percentile(l_quantity, 0.75)"), 4).as("p75"))
        .orderBy("flag")
    },

    // Quantile SKETCH (approx_percentile, the distributed one-pass
    // mergeable summary). Like q50's HLL gate: the sketch output itself is
    // engine-specific, so the gate hash-matches the companion EXACT median
    // and folds the sketch assertion into the row — `within_bound` is true
    // iff the sketch's answer has rank within 1/accuracy (+slack for the
    // tie mass: l_quantity is heavily tied, so both rank sides are
    // checked) of the 0.5 target.
    Q(
      "q103_approx_percentile",
      """SELECT round(quantile_cont(l_quantity, 0.5), 4) AS exact_median,
        |  TRUE AS within_bound
        |FROM lineitem""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_quantity").cast("double").as("q"))
      val stats = li.agg(
        expr("percentile(q, 0.5)").as("_exact"),
        expr("approx_percentile(q, 0.5, 100)").as("_apx"),
        count(lit(1)).as("_n"))
      li.crossJoin(broadcast(stats))
        .agg(
          round(first(col("_exact")), 4).as("exact_median"),
          // rank-range of the sketch's value: [count(< v), count(<= v)]
          // must straddle 0.5·n within eps = 1/accuracy + 0.01 slack
          ((sum(when(col("q") < col("_apx"), 1L).otherwise(0L)) / first(col("_n"))
            <= lit(0.5 + 0.02)) &&
            (sum(when(col("q") <= col("_apx"), 1L).otherwise(0L)) / first(col("_n"))
              >= lit(0.5 - 0.02))).as("within_bound"))
    },

    // Set collection into arrays (collect_set + deterministic sort). The
    // gate output is the '|'-joined string form: the driver's compare
    // hashes pandas cells, and raw array cells are unhashable there — the
    // stringification loses nothing (elements are sorted and '|'-free).
    Q(
      "q55_collect_set",
      """SELECT user_id,
        |  array_to_string(list_sort(list(DISTINCT event_type)), '|') AS types
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy("user_id")
        .agg(array_join(array_sort(collect_set(col("event_type"))), "|").as("types"))
        .orderBy("user_id")
    },

    // Pivot (fixed spread values; oracle = FILTER columns).
    Q(
      "q56_pivot",
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'view') AS view,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "view", "purchase"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("click", "view", "purchase"))
        .orderBy("user_id")
    },

    // CUBE: all grouping-set combinations in one pass.
    Q(
      "q57_cube",
      """SELECT o_orderstatus AS status, o_orderpriority AS prio, count(*) AS n
        |FROM orders GROUP BY CUBE(status, prio)
        |ORDER BY status NULLS FIRST, prio NULLS FIRST""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .select(col("o_orderstatus").as("status"), col("o_orderpriority").as("prio"))
        .cube("status", "prio")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("status").asc_nulls_first, col("prio").asc_nulls_first)
    },

    // Full outer join: both unmatched sides survive with nulls.
    Q(
      "q58_outer_join",
      """SELECT c_custkey, n FROM customer
        |FULL OUTER JOIN (
        |  SELECT o_custkey, count(*) AS n FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '2001-01-01' GROUP BY o_custkey
        |) r ON c_custkey = o_custkey
        |ORDER BY c_custkey NULLS FIRST, n NULLS FIRST""".stripMargin) { (s, dir) =>
      val recent = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
        .groupBy("o_custkey").agg(count(lit(1)).as("n"))
      Tables.load(s, dir, "customer")
        .join(recent, col("c_custkey") === col("o_custkey"), "full_outer")
        .select("c_custkey", "n")
        .orderBy(col("c_custkey").asc_nulls_first, col("n").asc_nulls_first)
    },

    // Statistical-moment aggregates (population forms; rounded — both
    // engines use streaming moment formulas that differ in final ulps).
    Q(
      "q62_stats_moments",
      """SELECT l_returnflag AS flag,
        |  round(var_pop(l_quantity), 6) AS var_qty,
        |  round(stddev_pop(l_quantity), 6) AS std_qty,
        |  round(covar_pop(l_quantity, l_extendedprice), 4) AS covar_qp,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qp
        |FROM lineitem GROUP BY flag ORDER BY flag""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag").as("flag"))
        .agg(
          round(var_pop(col("l_quantity")), 6).as("var_qty"),
          round(stddev_pop(col("l_quantity")), 6).as("std_qty"),
          round(covar_pop(col("l_quantity"), col("l_extendedprice")), 4).as("covar_qp"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"))
        .orderBy("flag")
    },

    // Left-semi join (EXISTS shape), the positive twin of the J2 anti-join.
    Q(
      "q59_semi_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |              AND o_totalprice > 400)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "customer")
        .join(
          Tables.load(s, dir, "orders").filter(col("o_totalprice") > 400)
            .select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // EXACT global median without a global sort: GlobalRank's
    // range-partition + O(partitions) offsets stamps a distributed
    // row_number, then only the two middle rows survive. The approx
    // twins are q54/q103; this is the exact path at the same scale shape
    // (no single-partition stage — PlanSpec pins that for the machinery).
    Q(
      "q124_exact_median",
      """WITH r AS (SELECT l_extendedprice AS p,
        |    row_number() OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
        |    count(*) OVER () AS n
        |  FROM lineitem)
        |SELECT avg(p) AS median_price, CAST(min(n) AS BIGINT) AS n_rows
        |FROM r WHERE rn IN ((n + 1) // 2, (n + 2) // 2)""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_extendedprice").as("p"), col("l_orderkey"), col("l_linenumber"))
      graft.operators.GlobalRank
        .withRowNumber(li, Seq("p", "l_orderkey", "l_linenumber"), "_rn", "_n")
        .filter(col("_rn") === expr("(_n + 1) div 2") || col("_rn") === expr("(_n + 2) div 2"))
        .agg(avg(col("p")).as("median_price"), min(col("_n")).as("n_rows"))
    },

    // EXACT p25/p50/p75/p99 (nearest-rank, ceil(p·n/100)) from ONE ranking
    // pass: the row_number stamp amortizes across every requested quantile —
    // the scale argument vs one single-partition window sort per percentile.
    // The 4-row percentile table broadcasts; selection is a scan-speed
    // filter against the stamped rank.
    Q(
      "q126_exact_quantiles",
      """WITH r AS (SELECT l_extendedprice AS v,
        |    row_number() OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
        |    count(*) OVER () AS n
        |  FROM lineitem)
        |SELECT p.pct, r.v AS value
        |FROM r, (VALUES (25), (50), (75), (99)) AS p(pct)
        |WHERE r.rn = (p.pct * r.n + 99) // 100
        |ORDER BY pct""".stripMargin) { (s, dir) =>
      import s.implicits._
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_extendedprice").as("v"), col("l_orderkey"), col("l_linenumber"))
      val pcts = Seq(25, 50, 75, 99).toDF("pct")
      graft.operators.GlobalRank
        .withRowNumber(li, Seq("v", "l_orderkey", "l_linenumber"), "_rn", "_n")
        .join(pcts, col("_rn") === expr("(pct * _n + 99) div 100"))
        .select(col("pct"), col("v").as("value"))
        .orderBy("pct")
    },

    // Wide → long reshaping (unpivot/melt): the feature-table normalizer —
    // Spark 4's native unpivot, a zero-shuffle row expander (each input row
    // emits one row per measure column). Oracle spells it as the portable
    // UNION ALL.
    Q(
      "q132_unpivot",
      """SELECT l_orderkey, l_linenumber, metric, value FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem)
        |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_discount"), col("l_tax")),
          "metric", "value")
        .orderBy("l_orderkey", "l_linenumber", "metric")
    },

    // Event-transition counts (the Markov/bigram view of user journeys):
    // per-user lag over the event-time order, then a global (prev, next)
    // count — a per-KEY window (partition-parallel; never the global-sort
    // anti-pattern) feeding one map-side-combined aggregation.
    Q(
      "q133_event_transitions",
      """WITH o AS (SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events)
        |SELECT prev, event_type AS next, CAST(count(*) AS BIGINT) AS n
        |FROM o WHERE prev IS NOT NULL
        |GROUP BY prev, next ORDER BY prev, next""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.load(s, dir, "events")
        .select(col("event_type"), lag(col("event_type"), 1).over(w).as("prev"))
        .filter(col("prev").isNotNull)
        .groupBy(col("prev"), col("event_type").as("next"))
        .agg(count(lit(1)).as("n"))
        .orderBy("prev", "next")
    },

    // Z-order (Morton) clustering key: interleave the bits of two sort
    // dimensions so ONE total order keeps both locally clustered — written
    // through appendBatchClustered, parquet row-group min/max stats stay
    // tight on BOTH columns and a filter on either prunes. Pure
    // bit-arithmetic projection, exact in any engine.
    Q(
      "q135_zorder_key",
      """SELECT l_orderkey, l_linenumber, l_suppkey,
        |  CAST(list_aggregate(list_transform(generate_series(0, 15), i ->
        |    ((((l_orderkey % 65536) >> i) & 1) << (2*i))
        |    | (((l_suppkey >> i) & 1) << (2*i + 1))), 'sum') AS BIGINT) AS zkey
        |FROM lineitem ORDER BY zkey, l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
          graft.operators.ZOrder.mortonKey16(
            pmod(col("l_orderkey"), lit(65536L)), col("l_suppkey")).as("zkey"))
        .orderBy("zkey", "l_orderkey", "l_linenumber")
    },

    // Portable HyperLogLog distinct sketch (md5-derived registers, raw
    // estimator, integer-exact harmonic sum): unlike q50's built-in
    // approx_count_distinct (engine-private HLL++ layout, only a tolerance
    // band checkable), this estimate is BIT-IDENTICAL across engines — the
    // oracle rebuilds all 256 registers in SQL and must land the same
    // double. hll_est_merged comes from per-event_type partial sketches
    // max-merged (the 100 TB composition law: build per batch/partition,
    // merge, estimate once) and must equal the whole-stream estimate
    // exactly, which the oracle pins by construction.
    Q(
      "q136_hll_distinct",
      """WITH h AS (SELECT md5(event_id::VARCHAR) AS x FROM events),
        |b AS (SELECT CAST(('0x' || substr(x, 1, 2)) AS BIGINT) AS bucket,
        |             CAST(('0x' || substr(x, 3, 13)) AS BIGINT) AS w FROM h),
        |r AS (SELECT bucket, CASE WHEN w = 0 THEN 53 ELSE 53 - length(bin(w)) END AS rho
        |      FROM b),
        |reg AS (SELECT bucket, max(rho) AS rho FROM r GROUP BY bucket),
        |f AS (SELECT g.bucket, coalesce(reg.rho, 0) AS rho
        |      FROM (SELECT unnest(generate_series(0, 255)) AS bucket) g
        |      LEFT JOIN reg ON g.bucket = reg.bucket),
        |z AS (SELECT CAST(sum(1::BIGINT << CAST(53 - rho AS INTEGER)) AS BIGINT) AS zi
        |      FROM f),
        |e AS (SELECT (0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / 256.0::DOUBLE))
        |        * 65536.0::DOUBLE * 9007199254740992.0::DOUBLE / CAST(zi AS DOUBLE) AS est
        |      FROM z),
        |x AS (SELECT CAST(count(DISTINCT event_id) AS BIGINT) AS exact_ids FROM events)
        |SELECT exact_ids, est AS hll_est, est AS hll_est_merged,
        |  abs(est - exact_ids) <= exact_ids * 0.25::DOUBLE AS within_25pct
        |FROM x, e""".stripMargin) { (s, dir) =>
      import graft.operators.HyperLogLog
      val ev = Tables.load(s, dir, "events")
      val whole = HyperLogLog.estimate(HyperLogLog.registers(ev, col("event_id")))
      // partitioned build: per-type partial sketches, max-merged to one
      val merged = HyperLogLog.estimate(
        HyperLogLog.groupedRegisters(ev, col("event_id"), col("event_type"))
          .groupBy("bucket").agg(max("rho").as("rho")))
        .withColumnRenamed("hll_est", "hll_est_merged")
      val exact = ev.agg(countDistinct(col("event_id")).as("exact_ids"))
      exact.crossJoin(whole).crossJoin(merged)
        .select(col("exact_ids"), col("hll_est"), col("hll_est_merged"),
          (abs(col("hll_est") - col("exact_ids")) <=
            col("exact_ids") * lit(0.25)).as("within_25pct"))
    },

    // Blocked entity resolution (the record-linkage shape): candidate pairs
    // come from an equi-join on a cheap blocking key (segment, nation) —
    // never all-pairs — and survive an exact edit-distance verify
    // (levenshtein <= 2, a codegen'd built-in with identical DP semantics
    // in both engines). At 100 TB the block key bounds the pair space the
    // way LSH bands do for text; integer output, no FP anywhere.
    Q(
      "q139_er_pairs",
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |  CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS dist
        |FROM customer a JOIN customer b
        |  ON a.c_mktsegment = b.c_mktsegment AND a.c_nationkey = b.c_nationkey
        |  AND a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 2
        |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
        .select("c_custkey", "c_name", "c_mktsegment", "c_nationkey")
      val a = c.select(col("c_mktsegment"), col("c_nationkey"),
        col("c_custkey").as("id_a"), col("c_name").as("_na"))
      val b = c.select(col("c_mktsegment"), col("c_nationkey"),
        col("c_custkey").as("id_b"), col("c_name").as("_nb"))
      a.join(b, Seq("c_mktsegment", "c_nationkey"))
        .filter(col("id_a") < col("id_b"))
        .withColumn("dist", levenshtein(col("_na"), col("_nb")))
        .filter(col("dist") <= 2)
        .select("id_a", "id_b", "dist")
        .orderBy("id_a", "id_b")
    },

    // Sequence-length bucketing manifest (the dynamic-batching planner's
    // input): each document lands in the next power-of-2 token-length
    // bucket, computed by PURE bit arithmetic (1 << length(bin(n-1)) —
    // both engines print binary without leading zeros, so no log2/float
    // anywhere), with per-bucket doc counts, token totals, and the padding
    // waste a fixed-shape batch of that bucket would pay. Stateless
    // projection + one map-side-combined groupBy over ~a dozen buckets.
    Q(
      "q140_length_buckets",
      """WITH tok AS (SELECT doc_id,
        |    len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), x -> x != ''))
        |      AS n
        |  FROM documents),
        |b AS (SELECT doc_id, n,
        |    CASE WHEN n <= 1 THEN n ELSE 1::BIGINT << length(bin(n - 1)) END AS bucket
        |  FROM tok)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n) AS BIGINT) AS total_tokens,
        |  CAST(sum(bucket - n) AS BIGINT) AS total_padding
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(graft.text.TextAnalysis.tokenCount(col("text")).cast("long").as("_n"))
        .withColumn("bucket",
          when(col("_n") <= 1, col("_n"))
            .otherwise(expr("shiftleft(1L, length(bin(_n - 1)))")))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"), sum(col("_n")).as("total_tokens"),
          sum(col("bucket") - col("_n")).as("total_padding"))
        .orderBy("bucket")
    },

    // Per-group HLL cardinalities — the GROUP BY shape the sketch exists
    // for at 100 TB: distinct events per type from one narrow pass plus a
    // (groups x 256)-row aggregate, instead of shuffling every occurrence
    // the way count(DISTINCT) per group does. Estimates are bit-identical
    // across engines (same integer-exact algebra as q136), pinned next to
    // the exact counts.
    Q(
      "q141_hll_by_group",
      """WITH h AS (SELECT event_type, md5(event_id::VARCHAR) AS x FROM events),
        |b AS (SELECT event_type, CAST(('0x' || substr(x, 1, 2)) AS BIGINT) AS bucket,
        |             CAST(('0x' || substr(x, 3, 13)) AS BIGINT) AS w FROM h),
        |r AS (SELECT event_type, bucket,
        |        CASE WHEN w = 0 THEN 53 ELSE 53 - length(bin(w)) END AS rho FROM b),
        |reg AS (SELECT event_type, bucket, max(rho) AS rho
        |        FROM r GROUP BY event_type, bucket),
        |g AS (SELECT DISTINCT event_type FROM events),
        |f AS (SELECT g.event_type, gb.bucket, coalesce(reg.rho, 0) AS rho
        |      FROM g CROSS JOIN (SELECT unnest(generate_series(0, 255)) AS bucket) gb
        |      LEFT JOIN reg ON g.event_type = reg.event_type AND gb.bucket = reg.bucket),
        |z AS (SELECT event_type,
        |        CAST(sum(1::BIGINT << CAST(53 - rho AS INTEGER)) AS BIGINT) AS zi
        |      FROM f GROUP BY event_type),
        |x AS (SELECT event_type, CAST(count(DISTINCT event_id) AS BIGINT) AS exact_n
        |      FROM events GROUP BY event_type)
        |SELECT x.event_type, exact_n,
        |  (0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / 256.0::DOUBLE))
        |    * 65536.0::DOUBLE * 9007199254740992.0::DOUBLE / CAST(zi AS DOUBLE) AS hll_est
        |FROM x JOIN z USING (event_type) ORDER BY event_type""".stripMargin) { (s, dir) =>
      import graft.operators.HyperLogLog
      val ev = Tables.load(s, dir, "events")
      val est = HyperLogLog.estimateByGroup(
        HyperLogLog.groupedRegisters(ev, col("event_id"), col("event_type")))
        .withColumnRenamed("grp", "event_type")
      ev.groupBy("event_type").agg(countDistinct("event_id").as("exact_n"))
        .join(est, "event_type")
        .select(col("event_type"), col("exact_n"), col("hll_est"))
        .orderBy("event_type")
    },

    // Rendezvous (highest-random-weight) sharding: the 4-shard -> 5-shard
    // transition matrix. The output SHAPE is the stability proof — only
    // diagonal cells (unmoved) and the shard_new = 4 column (moved to the
    // NEW shard) can appear; a key migrating between two old shards is
    // impossible by construction, unlike modulo partitioning which
    // reshuffles nearly everything on resize. Engines agree bit-for-bit
    // because the winner is an md5 argmax.
    Q(
      "q142_rendezvous_shards",
      """WITH c4 AS (SELECT doc_id, arg_max(r, md5(r::VARCHAR || ':' || doc_id::VARCHAR))
        |              AS shard_old
        |            FROM documents, unnest(generate_series(0, 3)) AS u(r)
        |            GROUP BY doc_id),
        |c5 AS (SELECT doc_id, arg_max(r, md5(r::VARCHAR || ':' || doc_id::VARCHAR))
        |         AS shard_new
        |       FROM documents, unnest(generate_series(0, 4)) AS u(r)
        |       GROUP BY doc_id)
        |SELECT shard_old, shard_new, CAST(count(*) AS BIGINT) AS n_docs
        |FROM c4 JOIN c5 USING (doc_id)
        |GROUP BY shard_old, shard_new
        |ORDER BY shard_old, shard_new""".stripMargin) { (s, dir) =>
      import graft.operators.Rendezvous
      Tables.load(s, dir, "documents")
        .select(
          Rendezvous.shard(col("doc_id"), 4).as("shard_old"),
          Rendezvous.shard(col("doc_id"), 5).as("shard_new"))
        .groupBy("shard_old", "shard_new")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("shard_old", "shard_new")
    },

    // HLL set algebra: distinct-overlap of two key sets by
    // inclusion-exclusion — |A∩B| ≈ est(A) + est(B) − est(A ∪ B), where
    // the union estimate comes FREE from the bucket-wise-max merge (the
    // property exact distinct counts lack: two exact per-set counts cannot
    // produce an overlap without rescanning both sets; two 256-row
    // sketches can). All three estimates are the same integer-exact
    // algebra as q136, so the combination is bit-identical cross-engine.
    Q(
      "q143_hll_overlap",
      """WITH ha AS (SELECT md5(event_id::VARCHAR) AS x FROM events WHERE event_id % 3 != 0),
        |hb AS (SELECT md5(event_id::VARCHAR) AS x FROM events WHERE event_id % 2 = 0),
        |ra AS (SELECT CAST(('0x' || substr(x, 1, 2)) AS BIGINT) AS bucket,
        |         max(CASE WHEN CAST(('0x' || substr(x, 3, 13)) AS BIGINT) = 0 THEN 53
        |             ELSE 53 - length(bin(CAST(('0x' || substr(x, 3, 13)) AS BIGINT))) END)
        |           AS rho
        |       FROM ha GROUP BY bucket),
        |rb AS (SELECT CAST(('0x' || substr(x, 1, 2)) AS BIGINT) AS bucket,
        |         max(CASE WHEN CAST(('0x' || substr(x, 3, 13)) AS BIGINT) = 0 THEN 53
        |             ELSE 53 - length(bin(CAST(('0x' || substr(x, 3, 13)) AS BIGINT))) END)
        |           AS rho
        |       FROM hb GROUP BY bucket),
        |regs AS (SELECT 'a' AS side, bucket, rho FROM ra
        |         UNION ALL SELECT 'b', bucket, rho FROM rb
        |         UNION ALL SELECT 'u', bucket, max(rho)
        |           FROM (SELECT * FROM ra UNION ALL SELECT * FROM rb) GROUP BY bucket),
        |f AS (SELECT s.side, gb.bucket, coalesce(regs.rho, 0) AS rho
        |      FROM (SELECT DISTINCT side FROM regs) s
        |      CROSS JOIN (SELECT unnest(generate_series(0, 255)) AS bucket) gb
        |      LEFT JOIN regs ON s.side = regs.side AND gb.bucket = regs.bucket),
        |e AS (SELECT side,
        |        (0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / 256.0::DOUBLE))
        |          * 65536.0::DOUBLE * 9007199254740992.0::DOUBLE
        |          / CAST(CAST(sum(1::BIGINT << CAST(53 - rho AS INTEGER)) AS BIGINT) AS DOUBLE)
        |          AS est
        |      FROM f GROUP BY side),
        |x AS (SELECT CAST(count(DISTINCT event_id) AS BIGINT) AS exact_overlap
        |      FROM events WHERE event_id % 3 != 0 AND event_id % 2 = 0)
        |SELECT exact_overlap,
        |  max(CASE WHEN side = 'a' THEN est END)
        |    + max(CASE WHEN side = 'b' THEN est END)
        |    - max(CASE WHEN side = 'u' THEN est END) AS est_overlap
        |FROM x, e GROUP BY exact_overlap""".stripMargin) { (s, dir) =>
      import graft.operators.HyperLogLog
      val ev = Tables.load(s, dir, "events").select(col("event_id"))
      val ra = HyperLogLog.registers(ev.filter(col("event_id") % 3 =!= 0), col("event_id"))
      val rb = HyperLogLog.registers(ev.filter(col("event_id") % 2 === 0), col("event_id"))
      val ea = HyperLogLog.estimate(ra).withColumnRenamed("hll_est", "_ea")
      val eb = HyperLogLog.estimate(rb).withColumnRenamed("hll_est", "_eb")
      val eu = HyperLogLog.estimate(HyperLogLog.merge(ra, rb))
        .withColumnRenamed("hll_est", "_eu")
      val exact = ev.filter(col("event_id") % 3 =!= 0 && col("event_id") % 2 === 0)
        .agg(countDistinct(col("event_id")).as("exact_overlap"))
      exact.crossJoin(ea).crossJoin(eb).crossJoin(eu)
        .select(col("exact_overlap"),
          (col("_ea") + col("_eb") - col("_eu")).as("est_overlap"))
    }
  )
}
