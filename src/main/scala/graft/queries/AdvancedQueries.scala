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

  val all: Seq[QuerySpec] = Seq(stddev, pivot, scalarSubquery, cube, saltedAgg, saltedJoin,
    zorderKey)
}
