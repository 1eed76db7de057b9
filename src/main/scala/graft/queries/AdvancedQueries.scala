package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.core.OracleCompat._

/** Catalyst-feature queries rounding out SURVEY.md §4: deterministic
  * stddev, pivot, correlated scalar subquery (decorrelation rewrite),
  * and cube grouping sets.
  */
object AdvancedQueries {

  /** A8b: sample stddev via exact decimal moments — the explicit
    * formula is engine-portable where built-in stddev_samp is not
    * (accumulation-order differences). */
  private val stddev = QuerySpec(
    "q_a8_stddev",
    """SELECT event_type, COUNT(value) AS n,
      |       SQRT((CAST(COUNT(value) AS DOUBLE) * CAST(SUM(CAST(value * value AS DECIMAL(27,6))) AS DOUBLE)
      |             - CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) * CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE))
      |            / (CAST(COUNT(value) AS DOUBLE) * (CAST(COUNT(value) AS DOUBLE) - 1.0))) AS sd
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
    Tables.events(s, d).groupBy("event_type")
      .agg(count(col("value")).as("n"), dstddev(col("value")).as("sd"))
      .orderBy("event_type")
  }

  /** A10: pivot — per-user event-type counts as columns. The oracle is
    * the portable conditional-aggregate form; Spark's pivot plans to
    * the same single-pass aggregate. */
  private val pivot = QuerySpec(
    "q_a10_pivot",
    """SELECT user_id,
      |       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
      |       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
      |       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
      |       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
      |       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("user_id")
  }

  /** SQ1: correlated scalar subquery — "readings above their site's own
    * average" (SURVEY.md §4: RewriteCorrelatedScalarSubquery). Through
    * the SQL surface to exercise the decorrelation rule explicitly. */
  private val scalarSubquery = QuerySpec(
    "q_sq_correlated",
    """SELECT e.event_id, e.user_id, e.value
      |FROM events e
      |WHERE e.value > (SELECT CAST(SUM(CAST(value AS DECIMAL(27,2))) AS DOUBLE) / COUNT(*)
      |                 FROM events i WHERE i.user_id = e.user_id)
      |ORDER BY e.event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d).createOrReplaceTempView("events_sq")
    s.sql(
      """SELECT e.event_id, e.user_id, e.value
        |FROM events_sq e
        |WHERE e.value > (SELECT CAST(SUM(CAST(value AS DECIMAL(27,2))) AS DOUBLE) / COUNT(*)
        |                 FROM events_sq i WHERE i.user_id = e.user_id)
        |ORDER BY e.event_id""".stripMargin)
  }

  /** A7b: cube — all grouping-set combinations in one Expand pass. */
  private val cube = QuerySpec(
    "q_a7_cube",
    """SELECT COALESCE(n_name, 'ALL') AS nation_name, COALESCE(c_mktsegment, 'ALL') AS segment,
      |       COUNT(*) AS n
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY CUBE(n_name, c_mktsegment)
      |ORDER BY nation_name, segment""".stripMargin) { (s, d) =>
    Tables.customer(s, d).createOrReplaceTempView("customer_cb")
    Tables.nation(s, d).createOrReplaceTempView("nation_cb")
    s.sql(
      """SELECT COALESCE(n_name, 'ALL') AS nation_name, COALESCE(c_mktsegment, 'ALL') AS segment,
        |       COUNT(*) AS n
        |FROM customer_cb JOIN nation_cb ON c_nationkey = n_nationkey
        |GROUP BY CUBE(n_name, c_mktsegment)
        |ORDER BY nation_name, segment""".stripMargin)
  }

  /** SK1: salted two-phase aggregation — identical results to direct
    * GROUP BY (the oracle), shaped to survive a pathologically hot key
    * (operators.Skew; ARCHITECTURE.md skew notes). */
  private val saltedAgg = QuerySpec(
    "q_skew_salted_agg",
    """SELECT user_id, COUNT(*) AS n,
      |       CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS val_sum
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
    graft.operators.Skew.saltedSumCount(
      Tables.events(s, d), "user_id", saltBuckets = 8,
      Seq("val_sum" -> col("value")))
      .orderBy("user_id")
  }

  /** SK2: salted fact↔dim equi-join — identical rows to the plain join
    * (the oracle), shaped so a hot fact key spreads over saltBuckets
    * reducers instead of one (operators.Skew.saltedJoin; the dim side
    * replicates, the fact side never reshuffles by more than its salt). */
  private val saltedJoin = QuerySpec(
    "q_skew_salted_join",
    """SELECT p.p_type, COUNT(*) AS n,
      |       CAST(SUM(CAST(l.l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS qty_sum
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |GROUP BY p.p_type ORDER BY p.p_type""".stripMargin) { (s, d) =>
    val fact = Tables.lineitem(s, d)
      .select(col("l_partkey").as("partkey"), col("l_quantity"))
    val dim = Tables.part(s, d).select(col("p_partkey").as("partkey"), col("p_type"))
    graft.operators.Skew.saltedJoin(fact, dim, Seq("partkey"), saltBuckets = 8)
      .groupBy("p_type")
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty_sum"))
      .orderBy("p_type")
  }

  /** Z-order (Morton) key over (l_partkey, l_suppkey): the interleaved
    * sort key behind two-dimensional data skipping (operators.Layout;
    * clustering property asserted in LayoutSpec). The bit arithmetic is
    * exact integers, so DuckDB reproduces every key. */
  private val zorderKey = QuerySpec(
    "q_zorder_key",
    """SELECT l_orderkey, l_linenumber,
      |  list_reduce(list_concat([CAST(0 AS BIGINT)], range(0, 16)),
      |    (acc, i) -> acc + ((CAST(l_partkey AS BIGINT) >> i) & 1) * (CAST(1 AS BIGINT) << (2*i))
      |                    + ((CAST(l_suppkey AS BIGINT) >> i) & 1) * (CAST(1 AS BIGINT) << (2*i+1))) AS z
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        graft.operators.Layout.zValue("l_partkey", "l_suppkey").as("z"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Two deterministic "versions" of the orders snapshot, for U4/U5:
    * new drops every 4th key (deletes), old lacks every 3rd (inserts),
    * and new perturbs status (%5) and price (%7 — one exact +1.0 add)
    * so multi-column null-safe comparison is exercised. */
  private val snapshotSql =
    """WITH o_old AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice
      |  FROM orders WHERE o_orderkey % 3 <> 0
      |), o_new AS (
      |  SELECT o_orderkey,
      |         CASE WHEN o_orderkey % 5 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
      |         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice
      |  FROM orders WHERE o_orderkey % 4 <> 0
      |)""".stripMargin

  private def snapshots(s: org.apache.spark.sql.SparkSession, d: String) = {
    val base = Tables.orders(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
    val oldDf = base.filter(col("o_orderkey") % 3 =!= 0)
    val newDf = base.filter(col("o_orderkey") % 4 =!= 0)
      .withColumn("o_orderstatus",
        when(col("o_orderkey") % 5 === 0, lit("X")).otherwise(col("o_orderstatus")))
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 7 === 0, col("o_totalprice") + lit(1.0))
          .otherwise(col("o_totalprice")))
    (oldDf, newDf)
  }

  /** U4: snapshot change detection — SnapshotDiff.diff's full-outer
    * classification, changes only. */
  private val snapshotDiff = QuerySpec(
    "q_u4_snapshot_diff",
    s"""$snapshotSql
       |SELECT * FROM (
       |  SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
       |         CASE WHEN o.o_orderkey IS NULL THEN 'insert'
       |              WHEN n.o_orderkey IS NULL THEN 'delete'
       |              WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
       |                OR o.o_totalprice IS DISTINCT FROM n.o_totalprice THEN 'update'
       |              ELSE 'same' END AS change,
       |         o.o_orderstatus AS old_status, n.o_orderstatus AS new_status,
       |         o.o_totalprice AS old_price, n.o_totalprice AS new_price
       |  FROM o_old o FULL OUTER JOIN o_new n ON o.o_orderkey = n.o_orderkey
       |) WHERE change <> 'same' ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val (oldDf, newDf) = snapshots(s, d)
    graft.operators.SnapshotDiff
      .diff(oldDf, newDf, Seq("o_orderkey"), Seq("o_orderstatus", "o_totalprice"))
      .filter(col("change") =!= "same")
      .select(col("o_orderkey"), col("change"),
        col("old_o_orderstatus").as("old_status"), col("new_o_orderstatus").as("new_status"),
        col("old_o_totalprice").as("old_price"), col("new_o_totalprice").as("new_price"))
      .orderBy("o_orderkey")
  }

  /** U5: changeset application round trip — applyChanges(old,
    * diff(old, new)) must BE the new snapshot; the oracle is the new
    * snapshot itself, so the whole diff→apply loop is hash-certified. */
  private val snapshotApply = QuerySpec(
    "q_u5_changes_apply",
    s"""$snapshotSql
       |SELECT o_orderkey, o_orderstatus, o_totalprice
       |FROM o_new ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val (oldDf, newDf) = snapshots(s, d)
    val keys = Seq("o_orderkey")
    val cmp = Seq("o_orderstatus", "o_totalprice")
    val changes = graft.operators.SnapshotDiff.diff(oldDf, newDf, keys, cmp)
      .filter(col("change") =!= "same")
    graft.operators.SnapshotDiff.applyChanges(oldDf, changes, keys, cmp)
      .orderBy("o_orderkey")
  }

  /** J10: fuzzy entity-resolution self-join (operators.FuzzyJoin) —
    * customer-name pairs within ONE character edit, via deletion-
    * neighborhood blocking + levenshtein verify. The oracle is the
    * BRUTE-FORCE quadratic levenshtein join, so the blocked candidate
    * generator's recall (not just its precision) is hash-certified. */
  private val fuzzyNames = QuerySpec(
    "q_er_fuzzy_names",
    """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
      |       a.c_name AS name_a, b.c_name AS name_b,
      |       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
      |FROM customer a, customer b
      |WHERE a.c_custkey < b.c_custkey
      |  AND levenshtein(a.c_name, b.c_name) <= 1
      |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
    graft.operators.FuzzyJoin.editDistancePairs(
      Tables.customer(s, d), col("c_custkey"), col("c_name"))
      .orderBy("id_a", "id_b")
  }

  /** A15: column-level data-quality profile (operators.Profiler) —
    * per-column rows/nulls/exact-distinct/min/max/mode over the events
    * table in ONE melt shuffle. The oracle replays every statistic
    * per column, certifying the single-pass melt against k separate
    * straightforward aggregations. */
  private val profiler = QuerySpec(
    "q_a15_profile",
    """WITH m AS (
      |  SELECT 'event_id' AS column_name, CAST(event_id AS VARCHAR) AS val FROM events
      |  UNION ALL SELECT 'event_type', event_type FROM events
      |  UNION ALL SELECT 'user_id', CAST(user_id AS VARCHAR) FROM events
      |  UNION ALL SELECT 'props', props FROM events
      |), c AS (
      |  SELECT column_name, val, COUNT(*) AS cnt FROM m GROUP BY 1, 2
      |), agg AS (
      |  SELECT column_name,
      |         CAST(SUM(cnt) AS BIGINT) AS n_rows,
      |         CAST(COALESCE(SUM(CASE WHEN val IS NULL THEN cnt END), 0) AS BIGINT) AS n_null,
      |         CAST(COUNT(CASE WHEN val IS NOT NULL THEN 1 END) AS BIGINT) AS n_distinct
      |  FROM c GROUP BY 1
      |), md AS (
      |  SELECT column_name, val AS mode_val, CAST(cnt AS BIGINT) AS mode_cnt,
      |         ROW_NUMBER() OVER (PARTITION BY column_name ORDER BY cnt DESC, val ASC) AS rn
      |  FROM c WHERE val IS NOT NULL
      |), mm AS (
      |  SELECT 'event_id' AS column_name, CAST(MIN(event_id) AS VARCHAR) AS min_val, CAST(MAX(event_id) AS VARCHAR) AS max_val FROM events
      |  UNION ALL SELECT 'event_type', MIN(event_type), MAX(event_type) FROM events
      |  UNION ALL SELECT 'user_id', CAST(MIN(user_id) AS VARCHAR), CAST(MAX(user_id) AS VARCHAR) FROM events
      |  UNION ALL SELECT 'props', MIN(props), MAX(props) FROM events
      |)
      |SELECT a.column_name, a.n_rows, a.n_null,
      |       CAST(a.n_null AS DOUBLE) / a.n_rows AS null_rate,
      |       a.n_distinct, mm.min_val, mm.max_val, md.mode_val, md.mode_cnt
      |FROM agg a JOIN mm USING (column_name) JOIN md USING (column_name)
      |WHERE md.rn = 1
      |ORDER BY column_name""".stripMargin) { (s, d) =>
    graft.operators.Profiler.profile(
      Tables.events(s, d), Seq("event_id", "event_type", "user_id", "props"))
      .orderBy("column_name")
  }

  /** J10b: entity-resolution clusters over part names (operators.
    * FuzzyJoin.entityClusters) — typo chains group transitively; the
    * oracle walks the BRUTE-FORCE pair graph with a recursive CTE, so
    * blocking recall AND the distributed component labels are both
    * hash-certified (56 entities over 2,000 parts at sf0.01, max 65). */
  private val entityClusters = QuerySpec(
    "q_er_entity_clusters",
    """WITH RECURSIVE p AS (
      |  SELECT a.p_partkey AS u, b.p_partkey AS v
      |  FROM part a, part b
      |  WHERE a.p_partkey < b.p_partkey AND levenshtein(a.p_name, b.p_name) <= 1),
      |e AS (SELECT u, v FROM p UNION SELECT v, u FROM p),
      |walk(node, comp) AS (
      |  SELECT u, u FROM e
      |  UNION
      |  SELECT e.u, walk.comp FROM e JOIN walk ON e.v = walk.node),
      |labels AS (SELECT node, MIN(comp) AS rep FROM walk GROUP BY node),
      |lab AS (
      |  SELECT p_partkey AS id, COALESCE(l.rep, p_partkey) AS entity_rep
      |  FROM part LEFT JOIN labels l ON l.node = p_partkey)
      |SELECT id, CAST(entity_rep AS BIGINT) AS entity_rep,
      |       CAST(COUNT(*) OVER (PARTITION BY entity_rep) AS BIGINT) AS entity_size
      |FROM lab ORDER BY id""".stripMargin) { (s, d) =>
    graft.operators.FuzzyJoin.entityClusters(
      Tables.part(s, d), col("p_partkey"), col("p_name"))
      .orderBy("id")
  }

  /** PageRank over the customer↔supplier interaction graph
    * (operators.PageRank): both directions of the orders×lineitem
    * bipartite relation, 10 damped rounds — which entities the
    * transaction graph actually centers on. The oracle replays every
    * round bit-identically (unrolled CTEs generated by the SAME code
    * that drives the Spark loop, 9-dp contribution rounding + exact
    * decimal sums). */
  private val pagerank = QuerySpec(
    "q_graph_pagerank",
    graft.operators.PageRank.oracleSql(
      """e AS (
        |  SELECT DISTINCT 2 * CAST(o_custkey AS BIGINT) AS src,
        |         2 * CAST(l_suppkey AS BIGINT) + 1 AS dst
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |  WHERE o_orderkey % 4 = 0
        |  UNION
        |  SELECT DISTINCT 2 * CAST(l_suppkey AS BIGINT) + 1,
        |         2 * CAST(o_custkey AS BIGINT)
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |  WHERE o_orderkey % 4 = 0)""".stripMargin,
      iterations = 10, damping = 0.85)) { (s, d) =>
    import graft.operators.PageRank
    // node ids: even = customer (2·custkey), odd = supplier (2·suppkey+1);
    // the %4 order sample bounds the bench graph (the vec_id<100
    // convention) — every rank of the sampled graph is still replayed
    val pairs = Tables.orders(s, d)
      .filter(col("o_orderkey") % 4 === 0)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      // BIGINT on both sides, cast BEFORE the multiply: the id arithmetic
      // must not run in whatever integer width this round's parquet
      // generator chose for the keys (an INT32 2·key can wrap where the
      // oracle's BIGINT arithmetic cannot)
      .select((col("o_custkey").cast("long") * 2).as("c"),
        (col("l_suppkey").cast("long") * 2 + 1).as("sup"))
    val edges = pairs.select(col("c").as("src"), col("sup").as("dst"))
      .union(pairs.select(col("sup").as("src"), col("c").as("dst")))
    PageRank.ranks(edges, "src", "dst", iterations = 10)
      .orderBy("node")
  }

  val all: Seq[QuerySpec] = Seq(stddev, pivot, scalarSubquery, cube, saltedAgg, saltedJoin, pagerank,
    zorderKey, snapshotDiff, snapshotApply, fuzzyNames, profiler, entityClusters)
}
