package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.core.OracleCompat._

/** SURVEY.md §2.1-2.4, §2.6-2.8: scans, filters, joins, aggregations,
  * top-k, set ops, scalar functions — each Spark-first (DataFrame API,
  * broadcast hints on dims, filters on raw columns so pushdown survives)
  * with a DuckDB oracle.
  *
  * Provenance for the shapes: reference README.md:23,32-44,68-88
  * (PostgreSQL tables, cleansing/noise filtering, zone/date predicates,
  * site→zone joins, per-zone summaries, top-k listings).
  */
object RelationalQueries {

  // ---- §2.1 scans / sources -------------------------------------------

  /** S1+P1: projected, predicate-pushed scan of the fact table. */
  private val s1 = QuerySpec(
    "q_s1_scan_project",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1998-07-01'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-07-01").cast("timestamp"))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** S2+F4: semi-structured ingestion — JSON props parsed with a declared
    * schema (`from_json`), the schema-on-read path for raw logs
    * (reference README.md:33). */
  private val s2 = QuerySpec(
    "q_s2_json_ingest",
    """SELECT event_id, event_type,
      |       CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS k
      |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .select(col("event_id"), col("event_type"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType))))
          .getField("k").as("k"))
      .orderBy("event_id")
  }

  /** S7+T2: recent-first log listing (reference README.md:88 GET /logs) —
    * planned as TakeOrderedAndProject, never a global sort. */
  private val s7 = QuerySpec(
    "q_s7_recent_logs",
    """SELECT event_id, epoch_ms(ts) AS ts_ms, event_type, value
      |FROM events ORDER BY epoch_ms(ts) DESC, event_id DESC LIMIT 25""".stripMargin) { (s, d) =>
    // both engines order on the SAME ms-truncated key + id tiebreak —
    // ordering on raw ts would let DuckDB's ns precision pick a
    // different top-25 when two events share a millisecond
    Tables.events(s, d)
      .select(col("event_id"), epochMs(col("ts")).as("ts_ms"), col("event_type"), col("value"))
      .orderBy(col("ts_ms").desc, col("event_id").desc)
      .limit(25)
  }

  // ---- §2.2 filters / cleansing ---------------------------------------

  /** P2: null cleansing — impute a synthesized-null column
    * (reference README.md:36 "Cleansing missing/nulls"). */
  private val p2 = QuerySpec(
    "q_p2_null_cleanse",
    """SELECT l_orderkey, l_linenumber,
      |       COALESCE(NULLIF(l_discount, 0), -1.0) AS disc_filled,
      |       (l_discount = 0) AS was_zero
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        coalesce(nullif(col("l_discount"), lit(0)), lit(-1.0)).as("disc_filled"),
        (col("l_discount") === 0).as("was_zero"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** P3: noise filter — in-range sensor readings only
    * (reference README.md:36 "noise filtering"). */
  private val p3 = QuerySpec(
    "q_p3_noise_filter",
    """SELECT event_id, user_id, value FROM events
      |WHERE value BETWEEN 5 AND 95 AND event_type <> 'error'
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .filter(col("value").between(5, 95) && col("event_type") =!= "error")
      .select("event_id", "user_id", "value")
      .orderBy("event_id")
  }

  /** P4: date/priority predicates — "outages expected tomorrow in zone Z"
    * shape (reference README.md:68,86); both predicates pushed to parquet. */
  private val p4 = QuerySpec(
    "q_p4_predicate",
    """SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS order_date, o_totalprice
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
      |  AND o_orderstatus = 'F'
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp") &&
        col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_custkey"),
        to_date(col("o_orderdate")).as("order_date"), col("o_totalprice"))
      .orderBy("o_orderkey")
  }

  /** P5: probability-threshold filter (reference README.md:71-75,141). */
  private val p5 = QuerySpec(
    "q_p5_threshold",
    """SELECT event_id, user_id, value FROM events
      |WHERE value >= 90 ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d).filter(col("value") >= 90)
      .select("event_id", "user_id", "value").orderBy("event_id")
  }

  // ---- §2.3 joins ------------------------------------------------------

  /** J1: site→zone/region resolution (reference README.md:51,68) — two
    * broadcast hash joins up a fixed-cardinality dim chain; zero shuffles
    * of the fact side at any scale. */
  private val j1 = QuerySpec(
    "q_j1_dim_join",
    """SELECT r_name, n_name, COUNT(*) AS n_customers,
      |       CAST(SUM(CAST(c_acctbal AS DECIMAL(27,2))) AS DOUBLE) AS acctbal_sum
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("acctbal_sum"))
      .orderBy("r_name", "n_name")
  }

  /** J2: fact↔fact equi-join (forecast↔ticket-history shape, reference
    * README.md:57,43) — shuffle join on the key, partial aggregation
    * map-side before the exchange. */
  private val j2 = QuerySpec(
    "q_j2_fact_join",
    """SELECT o_orderpriority, COUNT(*) AS n_items,
      |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"))
      .orderBy("o_orderpriority")
  }

  /** J4: left-outer calendar-style join (reference README.md:63) — null
    * preservation on the unmatched side. */
  private val j4 = QuerySpec(
    "q_j4_outer_join",
    """SELECT o_orderstatus, COUNT(*) AS n_orders, COUNT(c_custkey) AS n_building
      |FROM orders LEFT JOIN (SELECT * FROM customer WHERE c_mktsegment = 'BUILDING') c
      |  ON o_custkey = c_custkey
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")),
        col("o_custkey") === col("c_custkey"), "left")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"), count(col("c_custkey")).as("n_building"))
      .orderBy("o_orderstatus")
  }

  /** J6: calendar/date-key join (reference README.md:41 "holiday") —
    * enrich each event with its day's total. */
  private val j6 = QuerySpec(
    "q_j6_date_join",
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |         CAST(SUM(CAST(value AS DECIMAL(27,2))) AS DOUBLE) AS day_total
      |  FROM events GROUP BY 1)
      |SELECT e.event_id, CAST(e.ts AS DATE) AS day, daily.day_total
      |FROM events e JOIN daily ON CAST(e.ts AS DATE) = daily.day
      |ORDER BY e.event_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val daily = ev.groupBy(to_date(col("ts")).as("day"))
      .agg(dsum(col("value")).as("day_total"))
    ev.select(col("event_id"), to_date(col("ts")).as("day"))
      .join(broadcast(daily), "day")
      .select("event_id", "day", "day_total")
      .orderBy("event_id")
  }

  /** J6b: holiday-calendar broadcast join (reference README.md:41
    * "holiday" temporal feature) — tiny literal dim, left join on the
    * date key, boolean feature out. */
  private val j6holiday = QuerySpec(
    "q_j6_holiday_join",
    """SELECT e.event_id, CAST(e.ts AS DATE) AS day,
      |       (h.holiday_date IS NOT NULL) AS is_holiday
      |FROM events e
      |LEFT JOIN (SELECT CAST(x AS DATE) AS holiday_date
      |           FROM (VALUES ('2024-01-01'), ('2024-01-15')) t(x)) h
      |  ON CAST(e.ts AS DATE) = h.holiday_date
      |ORDER BY e.event_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val holidays = Seq("2024-01-01", "2024-01-15").toDF("x")
      .select(col("x").cast("date").as("holiday_date"))
    Tables.events(s, d)
      .select(col("event_id"), to_date(col("ts")).as("day"))
      .join(broadcast(holidays), col("day") === col("holiday_date"), "left")
      .select(col("event_id"), col("day"), col("holiday_date").isNotNull.as("is_holiday"))
      .orderBy("event_id")
  }

  /** J9: range (point-in-interval) join — orders placed inside each
    * line's shipping window [l_shipdate, l_shipdate + (l_partkey%14)+1
    * days]. Spark plans the bare BETWEEN join as a nested loop; the
    * operator bins the date domain and equi-joins on the bin
    * (operators.RangeJoin), re-checking the exact predicate — gated in
    * PlanSpec against nested-loop/cartesian plans. The oracle runs the
    * plain BETWEEN join (DuckDB IEJoin). */
  private val j9range = QuerySpec(
    "q_j9_range_join",
    """WITH iv AS (SELECT l_orderkey, l_linenumber,
      |              CAST(l_shipdate AS DATE) AS w_start,
      |              CAST(l_shipdate AS DATE) + ((l_partkey % 14 + 1)::INT) AS w_end
      |            FROM lineitem WHERE l_quantity = 50)
      |SELECT iv.l_orderkey, iv.l_linenumber, CAST(COUNT(*) AS BIGINT) AS n_orders
      |FROM iv JOIN orders o ON CAST(o.o_orderdate AS DATE) BETWEEN iv.w_start AND iv.w_end
      |GROUP BY iv.l_orderkey, iv.l_linenumber
      |ORDER BY iv.l_orderkey, iv.l_linenumber""".stripMargin) { (s, d) =>
    val iv = Tables.lineitem(s, d).filter(col("l_quantity") === 50)
      .select(col("l_orderkey"), col("l_linenumber"),
        to_date(col("l_shipdate")).as("w_start"),
        date_add(to_date(col("l_shipdate")), (col("l_partkey") % 14 + 1).cast("int")).as("w_end"))
    val pts = Tables.orders(s, d).select(to_date(col("o_orderdate")).as("o_orderdate"))
    graft.operators.RangeJoin.pointInInterval(pts, "o_orderdate", iv, "w_start", "w_end", 7)
      .groupBy("l_orderkey", "l_linenumber")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** J11: interval ANTI join — orders placed OUTSIDE every maintenance
    * window (operators.RangeJoin.antiPointInInterval): the NOC
    * alarm-suppression / embargo-filter shape. Unlike J9's binned pair
    * generator, the anti form aggregates intervals into their distinct
    * covered-day set (bounded by the calendar span, broadcast) and
    * runs one equi anti join — density-proof at any data volume
    * (round-11 scaling fix); the oracle runs the plain NOT EXISTS. */
  private val j11anti = QuerySpec(
    "q_j11_anti_range",
    """WITH iv AS (SELECT CAST(l_shipdate AS DATE) AS w_start,
      |              CAST(l_shipdate AS DATE) + ((l_partkey % 14 + 1)::INT) AS w_end
      |            FROM lineitem WHERE l_quantity = 50)
      |SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate
      |FROM orders o
      |WHERE NOT EXISTS (SELECT 1 FROM iv
      |                  WHERE CAST(o.o_orderdate AS DATE) BETWEEN iv.w_start AND iv.w_end)
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val iv = Tables.lineitem(s, d).filter(col("l_quantity") === 50)
      .select(to_date(col("l_shipdate")).as("w_start"),
        date_add(to_date(col("l_shipdate")), (col("l_partkey") % 14 + 1).cast("int")).as("w_end"))
    val pts = Tables.orders(s, d)
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("o_orderdate"))
    graft.operators.RangeJoin.antiPointInInterval(
      pts, "o_orderdate", iv, "w_start", "w_end")
      .orderBy("o_orderkey")
  }

  /** J7a: left-semi — sites WITH open tickets (reference README.md:61-63
    * dispatch dedup); EXISTS shape, no row multiplication. */
  private val j7semi = QuerySpec(
    "q_j7_semi_join",
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_totalprice") > 400000),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name").orderBy("c_custkey")
  }

  /** J7b: left-anti — predicted-to-fail sites with NO open high-value
    * ticket = proactive-deployment set (reference README.md:10,60-62).
    * Anti-joined against the same filtered set as J7a so both branches
    * are non-empty at every scale factor. */
  private val j7anti = QuerySpec(
    "q_j7_anti_join",
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_totalprice") > 400000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name").orderBy("c_custkey")
  }

  // ---- §2.4 aggregations ----------------------------------------------

  /** A1: the canonical grouped pricing summary (TPC-H Q1 shape) — per
    * site/region/day rollups in the reference (README.md:43,68-75).
    * Exact-decimal sums for oracle parity. */
  private val a1 = QuerySpec(
    "q_a1_groupby_pricing",
    """SELECT l_returnflag, l_linestatus,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS sum_qty,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,2))) AS DOUBLE) AS sum_base_price,
      |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))) AS DOUBLE) AS sum_disc_price,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
      |       CAST(SUM(CAST(l_discount AS DECIMAL(27,4))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
      |       COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** A4: conditional aggregate — failure rate per site
    * (reference README.md:44 "rate of failure"); integer sums, exact. */
  private val a4 = QuerySpec(
    "q_a4_failure_rate",
    """SELECT user_id, COUNT(*) AS n_events,
      |       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS error_rate
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        (sum(when(col("event_type") === "error", 1).otherwise(0)).cast("double") /
          count(lit(1))).as("error_rate"))
      .orderBy("user_id")
  }

  /** A6a: exact distinct counting per group (reference README.md:38
    * categorical domains). */
  private val a6 = QuerySpec(
    "q_a6_count_distinct",
    """SELECT user_id, COUNT(DISTINCT event_type) AS n_types, COUNT(*) AS n
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
    Tables.events(s, d).groupBy("user_id")
      .agg(countDistinct(col("event_type")).as("n_types"), count(lit(1)).as("n"))
      .orderBy("user_id")
  }

  /** A6b: row dedup by key subset — `dropDuplicates` as a first-class op. */
  private val a6b = QuerySpec(
    "q_a6_dropdup",
    """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).select("l_returnflag", "l_linestatus")
      .dropDuplicates().orderBy("l_returnflag", "l_linestatus")
  }

  /** A7: rollup — zone→site drill-down in one pass via Catalyst Expand
    * (reference README.md:68-77 multi-grain chat summaries). */
  private val a7 = QuerySpec(
    "q_a7_rollup",
    """SELECT COALESCE(r_name, 'ALL') AS region_name, COALESCE(n_name, 'ALL') AS nation_name,
      |       COUNT(*) AS n, CAST(SUM(CAST(c_acctbal AS DECIMAL(27,2))) AS DOUBLE) AS bal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY region_name, nation_name""".stripMargin) { (s, d) =>
    // Through the SQL surface: DataFrame-API rollup over a multi-join
    // lineage trips Spark 4.1's ambiguous-self-join check; the SQL planner
    // resolves the same plan (Expand under Aggregate) without issue.
    Tables.customer(s, d).createOrReplaceTempView("customer_a7")
    Tables.nation(s, d).createOrReplaceTempView("nation_a7")
    Tables.region(s, d).createOrReplaceTempView("region_a7")
    s.sql(
      """SELECT COALESCE(r_name, 'ALL') AS region_name, COALESCE(n_name, 'ALL') AS nation_name,
        |       COUNT(*) AS n, CAST(SUM(CAST(c_acctbal AS DECIMAL(27,2))) AS DOUBLE) AS bal
        |FROM customer_a7
        |JOIN nation_a7 ON c_nationkey = n_nationkey
        |JOIN region_a7 ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY region_name, nation_name""".stripMargin)
  }

  /** A8: robust stats — exact interpolated percentiles for noise bounds
    * (reference README.md:36). At 100 TB swap for approx_percentile; the
    * exact form here is what the oracle can verify. */
  private val a8 = QuerySpec(
    "q_a8_percentile",
    """SELECT event_type,
      |       ROUND(quantile_cont(value, 0.5), 6) AS p50,
      |       ROUND(quantile_cont(value, 0.95), 6) AS p95
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
    Tables.events(s, d).groupBy("event_type")
      .agg(round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.95)"), 6).as("p95"))
      .orderBy("event_type")
  }

  /** A8 at the 100 TB tier: approx_percentile — mergeable fixed-memory
    * sketch vs the exact form's full value sort.
    *
    * Oracle shape (sketch values are engine-specific, so the raw
    * estimate can't hash-match): the query emits the EXACT interpolated
    * percentiles (cross-engine comparable — same values as
    * q_a8_percentile) plus in-band BOOLEANS asserting the approx value
    * landed inside the exact ±0.01-quantile band. accuracy=1000 bounds
    * rank error at 0.001·n — 10× inside the band — and
    * approx_percentile is deterministic for a fixed input, so the
    * booleans are a stable TRUE that DuckDB asserts as literals. A
    * regression in the sketch (or a band miss) flips a boolean and
    * fails the hash. */
  private val a8approx = QuerySpec(
    "q_a8_approx_percentile",
    """SELECT event_type,
      |       ROUND(quantile_cont(value, 0.5), 6) AS p50_exact,
      |       ROUND(quantile_cont(value, 0.95), 6) AS p95_exact,
      |       TRUE AS p50_in_band,
      |       TRUE AS p95_in_band
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
    Tables.events(s, d).groupBy("event_type")
      .agg(
        round(expr("percentile(value, 0.5)"), 6).as("p50_exact"),
        round(expr("percentile(value, 0.95)"), 6).as("p95_exact"),
        expr("approx_percentile(value, 0.5, 1000)").as("_a50"),
        expr("approx_percentile(value, 0.95, 1000)").as("_a95"),
        expr("percentile(value, 0.49)").as("_lo50"),
        expr("percentile(value, 0.51)").as("_hi50"),
        expr("percentile(value, 0.94)").as("_lo95"),
        expr("percentile(value, 0.96)").as("_hi95"))
      .select(col("event_type"), col("p50_exact"), col("p95_exact"),
        (col("_a50") >= col("_lo50") && col("_a50") <= col("_hi50")).as("p50_in_band"),
        (col("_a95") >= col("_lo95") && col("_a95") <= col("_hi95")).as("p95_in_band"))
      .orderBy("event_type")
  }

  /** A9a: RMSE as exact-decimal aggregate (reference README.md:53). */
  private val a9 = QuerySpec(
    "q_a9_rmse",
    """SELECT COUNT(*) AS n,
      |       SQRT(CAST(SUM(CAST(POW(value / 100 - CASE WHEN event_type = 'error' THEN 1.0 ELSE 0.0 END, 2) AS DECIMAL(27,10))) AS DOUBLE) / COUNT(*)) AS rmse
      |FROM events""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .agg(count(lit(1)).as("n"),
        sqrt(sum(pow(col("value") / 100 -
          when(col("event_type") === "error", 1.0).otherwise(0.0), 2)
          .cast(org.apache.spark.sql.types.DecimalType(27, 10))).cast("double") /
          count(lit(1))).as("rmse"))
  }

  // ---- §2.6 top-k ------------------------------------------------------

  /** T1: global top-k (reference README.md:71-75 "top-3 predicted
    * outages") — TakeOrderedAndProject, no full sort. */
  private val t1 = QuerySpec(
    "q_t1_topk",
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
  }

  // ---- §2.7 set ops ----------------------------------------------------

  /** U1: union of heterogeneous feeds into one spine
    * (reference README.md:32 — sensors + BTS + tickets + alarms). */
  private val u1 = QuerySpec(
    "q_u1_union",
    """SELECT event_id, 'err' AS src, value FROM events WHERE event_type = 'error'
      |UNION ALL
      |SELECT event_id, 'buy' AS src, value FROM events WHERE event_type = 'purchase'
      |ORDER BY event_id, src""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val a = ev.filter(col("event_type") === "error")
      .select(col("event_id"), lit("err").as("src"), col("value"))
    val b = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), lit("buy").as("src"), col("value"))
    a.unionByName(b).orderBy("event_id", "src")
  }

  /** U2: difference set — predicted-but-unticketed (reference
    * README.md:10,60-62). */
  private val u2 = QuerySpec(
    "q_u2_except",
    """SELECT c_custkey FROM customer
      |EXCEPT SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 400000
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d).select("c_custkey")
      .except(Tables.orders(s, d).filter(col("o_totalprice") > 400000)
        .select(col("o_custkey").as("c_custkey")))
      .orderBy("c_custkey")
  }

  /** U3: intersection — predicted AND historically failing
    * (reference README.md:57). */
  private val u3 = QuerySpec(
    "q_u3_intersect",
    """SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      |ORDER BY o_custkey""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
    def year(y: Int) = o.filter(col("o_orderdate") >= lit(s"$y-01-01").cast("timestamp") &&
      col("o_orderdate") < lit(s"${y + 1}-01-01").cast("timestamp")).select("o_custkey")
    year(1996).intersect(year(1997)).orderBy("o_custkey")
  }

  // ---- §2.8 scalar function families ----------------------------------

  /** F1: temporal feature extraction (reference README.md:41 "time of day,
    * day of week"). DuckDB dayofweek is 0=Sunday vs Spark 1=Sunday, hence
    * the +1 on the oracle side. */
  private val f1 = QuerySpec(
    "q_f1_datetime",
    """SELECT event_id,
      |       CAST(year(ts) AS BIGINT) AS y, CAST(month(ts) AS BIGINT) AS mo,
      |       CAST(day(ts) AS BIGINT) AS dom, CAST(hour(ts) AS BIGINT) AS h,
      |       CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
      |       CAST(ts AS DATE) + 7 AS week_later
      |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d).select(
      col("event_id"),
      year(col("ts")).cast("long").as("y"),
      month(col("ts")).cast("long").as("mo"),
      dayofmonth(col("ts")).cast("long").as("dom"),
      hour(col("ts")).cast("long").as("h"),
      dayofweek(col("ts")).cast("long").as("dow"),
      date_add(to_date(col("ts")), 7).as("week_later"))
      .orderBy("event_id")
  }

  /** F2: math family (reference README.md:38,53,73). Per-row IEEE double
    * arithmetic (×, −, sqrt, x²) is bit-identical across engines, so no
    * rounding — ROUND itself is the non-portable op (Spark HALF_UP vs
    * DuckDB) on boundary doubles. LN is libm-dependent → round to 6. */
  private val f2 = QuerySpec(
    "q_f2_math",
    """SELECT l_orderkey, l_linenumber,
      |       l_extendedprice * l_discount AS disc_amount,
      |       SQRT(l_quantity) AS sq,
      |       ABS(l_discount - 0.05) AS ab,
      |       ROUND(LN(l_extendedprice), 6) AS lg,
      |       l_quantity * l_quantity AS pw
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      (col("l_extendedprice") * col("l_discount")).as("disc_amount"),
      sqrt(col("l_quantity")).as("sq"),
      abs(col("l_discount") - 0.05).as("ab"),
      round(log(col("l_extendedprice")), 6).as("lg"),
      (col("l_quantity") * col("l_quantity")).as("pw"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** F3: string family — normalization / tokenization / pattern extraction
    * for raw-log fields (reference README.md:33,38,73). */
  private val f3 = QuerySpec(
    "q_f3_string",
    """SELECT p_partkey,
      |       UPPER(p_name) AS up,
      |       CAST(LENGTH(p_name) AS BIGINT) AS n_chars,
      |       CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_tokens,
      |       CONCAT(p_brand, '#', p_type) AS brand_type,
      |       regexp_extract(p_brand, '(\d+)', 1) AS brand_num
      |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
    Tables.part(s, d).select(
      col("p_partkey"),
      upper(col("p_name")).as("up"),
      length(col("p_name")).cast("long").as("n_chars"),
      size(split(col("p_name"), " ")).cast("long").as("n_tokens"),
      concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
      regexp_extract(col("p_brand"), "(\\d+)", 1).as("brand_num"))
      .orderBy("p_partkey")
  }

  /** F5: array/higher-order family on embeddings — L2 norm as a
    * sequential fold, identical order in both engines
    * (reference README.md:52). */
  private val f5 = QuerySpec(
    "q_f5_array",
    """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
      |       SQRT(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS l2,
      |       embedding[1]::DOUBLE AS head
      |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, d) =>
    val v = col("embedding").cast("array<double>")
    Tables.embeddings(s, d).select(
      col("vec_id"),
      size(col("embedding")).cast("long").as("dim"),
      sqrt(aggregate(transform(v, x => x * x), lit(0.0), (acc, x) => acc + x)).as("l2"),
      element_at(v, 1).as("head"))
      .orderBy("vec_id")
  }

  /** F7: conditional family — categorical encoding
    * (reference README.md:38 "encoding categorical signals"). */
  private val f7 = QuerySpec(
    "q_f7_conditional",
    """SELECT event_id,
      |       CASE WHEN value < 10 THEN 'low' WHEN value < 50 THEN 'mid' ELSE 'high' END AS band,
      |       COALESCE(NULLIF(event_type, 'error'), 'alarm') AS kind
      |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d).select(
      col("event_id"),
      when(col("value") < 10, "low").when(col("value") < 50, "mid").otherwise("high").as("band"),
      coalesce(nullif(col("event_type"), lit("error")), lit("alarm")).as("kind"))
      .orderBy("event_id")
  }

  /** F6: map family — JSON props parsed to MapType, element access
    * (reference README.md:33 raw-log props). */
  private val f6 = QuerySpec(
    "q_f6_map",
    """SELECT event_id,
      |       CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS k_val,
      |       CAST(1 AS BIGINT) AS n_keys
      |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
    val m = from_json(col("props"), org.apache.spark.sql.types.MapType(
      org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.LongType))
    Tables.events(s, d).select(
      col("event_id"),
      element_at(m, "k").as("k_val"),
      size(map_keys(m)).cast("long").as("n_keys"))
      .orderBy("event_id")
  }

  /** A6c: approximate distinct (HLL++) — the 100 TB path for
    * cardinality. Sketch values differ across engines, so the oracle
    * checks the same shape as q_a8_approx_percentile: the exact
    * distinct count (cross-engine comparable) plus an in-band boolean
    * asserting the HLL estimate sits within 5% relative error of exact
    * (default rsd 0.05; deterministic for a fixed input, and measured
    * well inside the band at both test scales). DuckDB asserts the
    * boolean as a literal — an estimator regression flips it and fails
    * the hash. */
  private val a6c = QuerySpec(
    "q_a6_approx_distinct",
    """SELECT event_type,
      |       COUNT(DISTINCT user_id) AS exact_users,
      |       TRUE AS approx_in_band
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
    // rsd 0.02 + a 0.10 band = 5σ: the HLL estimate is deterministic for
    // fixed input, but the default-rsd sketch measured 6.7% off at sf0.1
    // (the old 0.05 band was only 1σ and passed sf0.01 by luck)
    Tables.events(s, d).groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.02).as("_approx"),
        countDistinct(col("user_id")).as("exact_users"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("_approx") - col("exact_users")).cast("double") / col("exact_users") <= 0.10)
          .as("approx_in_band"))
      .orderBy("event_type")
  }

  /** A6d: MERGEABLE cardinality sketches (Datasketches HLL) — the
    * incremental-corpus companion to q_a6_approx_distinct: a pipeline
    * appending nightly batches stores one tiny sketch per (batch,
    * group) and answers whole-corpus distinct counts by UNIONING
    * sketches — no rescan of historical data, ever. In-engine, the
    * table splits into two disjoint halves, each half builds per-group
    * sketches, and BOTH the unioned estimate and the single-pass
    * whole-table estimate must sit within the 5σ accuracy band of the
    * exact count DuckDB recomputes (lgConfigK=12 ⇒ ~1.6% rsd; 10%
    * band). The two estimates are NOT asserted equal — a first draft
    * did, and the sf0.1 sweep caught it: Datasketches serves a
    * single-pass sketch from its stream-order-dependent HIP estimator,
    * which a union legitimately discards (merged sketches fall back to
    * the composite estimator), so merged and whole differ by design at
    * the ~1% level while both stay in band. */
  private val a6d = QuerySpec(
    "q_a6_hll_merge",
    """SELECT event_type,
      |       COUNT(DISTINCT user_id) AS exact_users,
      |       TRUE AS merged_in_band, TRUE AS whole_in_band
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    def sketch(df: org.apache.spark.sql.DataFrame, as: String) =
      df.groupBy("event_type").agg(hll_sketch_agg(col("user_id")).as(as))
    val h1 = sketch(ev.filter(col("event_id") % 2 === 0), "_sk1")
    val h2 = sketch(ev.filter(col("event_id") % 2 =!= 0), "_sk2")
    val whole = ev.groupBy("event_type").agg(
      hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("_whole"),
      countDistinct(col("user_id")).as("exact_users"))
    def inBand(est: Column): Column =
      abs(est - col("exact_users")).cast("double") / col("exact_users") <= 0.10
    h1.join(h2, "event_type")
      .select(col("event_type"),
        hll_sketch_estimate(hll_union(col("_sk1"), col("_sk2"))).as("_merged"))
      .join(whole, "event_type")
      .select(col("event_type"), col("exact_users"),
        inBand(col("_merged")).as("merged_in_band"),
        inBand(col("_whole")).as("whole_in_band"))
      .orderBy("event_type")
  }

  val all: Seq[QuerySpec] = Seq(
    s1, s2, s7, p2, p3, p4, p5,
    j1, j2, j4, j6, j6holiday, j7semi, j7anti, j9range, j11anti,
    a1, a4, a6, a6b, a6c, a6d, a7, a8, a8approx, a9,
    t1, u1, u2, u3,
    f1, f2, f3, f5, f6, f7)
}
