package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.api.NetIntel
import graft.core.{DomainTables, Tables}
import graft.operators.Forecast
import graft.sources.Sinks

/** The reference's entry-point queries EP1-EP3 (README.md:85-88) over
  * the derived domain tables, oracle-checked end-to-end, plus the ML
  * forecast pipeline (property-checked — training is not
  * bit-reproducible).
  */
object DomainQueries {

  private def withFixtures(body: String): String =
    s"""WITH ${DomainTables.sitesSql},
       |${DomainTables.forecastsSql},
       |${DomainTables.kbSql}
       |$body""".stripMargin

  /** EP1 — the README's canonical interaction (README.md:68-79). */
  private val ep1 = QuerySpec(
    "q_ep1_chat_top_outages",
    withFixtures(
      """SELECT id, site_code, zone, outage_probability, root_cause, resolution, fme_plan
        |FROM forecasts JOIN sites USING (site_code) JOIN kb USING (root_cause)
        |WHERE prediction_date = DATE '2024-01-15' AND zone = 'BUILDING'
        |ORDER BY outage_probability DESC, id LIMIT 3""".stripMargin)) { (s, d) =>
    NetIntel.chatTopOutages(s, d, "2024-01-15", "BUILDING", 3)
  }

  /** EP2 — raw forecast listing above threshold (README.md:86). */
  private val ep2 = QuerySpec(
    "q_ep2_forecast",
    withFixtures(
      """SELECT id, site_code, outage_probability, root_cause
        |FROM forecasts
        |WHERE prediction_date = DATE '2024-01-15' AND outage_probability >= 0.5
        |ORDER BY outage_probability DESC, id""".stripMargin)) { (s, d) =>
    NetIntel.forecastsFor(s, d, "2024-01-15", 0.5)
      .select("id", "site_code", "outage_probability", "root_cause")
  }

  /** EP3 — FME deployment schedule (README.md:87,60-63). */
  private val ep3 = QuerySpec(
    "q_ep3_schedule",
    withFixtures(
      """, f AS (SELECT * FROM forecasts WHERE prediction_date = DATE '2024-01-15'),
        |urgency AS (SELECT site_code, MAX(outage_probability) AS urgency FROM f GROUP BY site_code),
        |ticketed AS (SELECT DISTINCT site_code FROM f WHERE root_cause = 'error'),
        |ranked AS (
        |  SELECT s.zone, u.site_code, u.urgency, s.region,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY s.zone ORDER BY u.urgency DESC, u.site_code) AS BIGINT) AS deploy_rank
        |  FROM urgency u JOIN sites s USING (site_code)
        |  WHERE u.site_code NOT IN (SELECT site_code FROM ticketed))
        |SELECT zone, deploy_rank, site_code, urgency, region FROM ranked
        |WHERE deploy_rank <= 5 ORDER BY zone, deploy_rank""".stripMargin)) { (s, d) =>
    NetIntel.schedule(s, d, "2024-01-15", 5)
  }

  /** S5 — forecast sink ROUND TRIP through storage: write the full
    * forecast table date-partitioned ([[Sinks.writeForecasts]]), read it
    * back under a date predicate, and hash the values against DuckDB's
    * view of the source — certifying the partitioned layout preserves
    * every value AND that a date-bounded read-back touches one
    * partition (the pruning itself is CI-gated in PlanSpec/SinksSpec;
    * this query is the value-level half the driver checks). Each
    * invocation writes a fresh temp dir: the sink is append-only, so
    * re-reading a shared path would double rows across Bench reps. */
  private val s5Sink = QuerySpec(
    "q_s5_forecast_sink",
    withFixtures(
      """SELECT id, site_code, outage_probability, root_cause
        |FROM forecasts WHERE prediction_date = DATE '2024-01-15'
        |ORDER BY id""".stripMargin)) { (s, d) =>
    val path = java.nio.file.Files
      .createTempDirectory("graft-s5-sink").toString
    Sinks.writeForecasts(DomainTables.forecasts(s, d), path)
    s.read.parquet(path)
      .filter(col("p_date") === lit("2024-01-15").cast("date"))
      .select("id", "site_code", "outage_probability", "root_cause")
      .orderBy("id")
  }

  /** X3 — MLlib forecast pipeline. Training is seeded but LBFGS's
    * parallel reduction is not bit-reproducible, so the hash oracle is
    * the in-band-invariant shape (the q_a6_approx_distinct trick): one
    * row whose only cross-engine number is the scored-row count (DuckDB
    * recomputes it as the distinct (user_id, day) pairs past the
    * split), plus booleans the engine computes FROM the scored table —
    * model quality (AUC/RMSE via [[Forecast.metrics]], i.e. the
    * distributed tie-averaged-rank AUC path runs inside this query) and
    * output-contract checks. Bounds carry >10x the observed cross-scale
    * spread: measured AUC 0.765-0.801 and RMSE 0.418-0.427 across
    * sf0.001/0.01/0.1 (round 9), gated at 0.6 / 0.49. A training or
    * scoring regression flips a boolean and fails the hash. */
  private val ml = QuerySpec(
    "q_x3_ml_forecast",
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_scored,
      |       TRUE AS auc_in_band, TRUE AS rmse_in_band,
      |       TRUE AS probs_in_range, TRUE AS dates_after_split
      |FROM (SELECT user_id, CAST(ts AS DATE) AS day FROM events
      |      WHERE CAST(ts AS DATE) >= DATE '2024-01-20'
      |      GROUP BY user_id, CAST(ts AS DATE)) t""".stripMargin) { (s, d) =>
    val scored = graft.core.CacheGovernor.persistTracked(
      Forecast.trainAndScore(Tables.events(s, d), splitDay = "2024-01-20"))
    val m = Forecast.metrics(scored)
    val rowChecks = scored.agg(
      count(lit(1)).cast("long").as("n_scored"),
      max(when(col("outage_probability") < 0.0 || col("outage_probability") > 1.0,
        1).otherwise(0)).as("_badp"),
      max(when(col("prediction_date") < lit("2024-01-20").cast("date"),
        1).otherwise(0)).as("_badd"))
    rowChecks.crossJoin(m.select(col("auc"), col("rmse")))
      .select(col("n_scored"),
        (col("auc") >= 0.6).as("auc_in_band"),
        (col("rmse") <= 0.49).as("rmse_in_band"),
        (col("_badp") === 0).as("probs_in_range"),
        (col("_badd") === 0).as("dates_after_split"))
  }

  /** EP3 + the README.md:61 location-clustering stage (seeded KMeans).
    * Iterative ML has no value-level SQL oracle, so this is the
    * in-band-invariant shape: the one cross-engine number is the
    * eligible-site count (DuckDB recomputes urgency minus ticketed,
    * joined to sites — exactly the relational prefix the clustering
    * consumes), and the booleans assert everything the clustering stage
    * must preserve: k non-empty clusters, per-cluster ranks contiguous
    * from 1, capacity respected, every scheduled site eligible, every
    * urgency EXACTLY the relational urgency (same doubles), and a full
    * re-run (second KMeans fit) bit-identical under the fixed seed.
    * KMeans itself runs inside the query — twice, for the determinism
    * gate. */
  private val ep3Clustered = QuerySpec(
    "q_ep3_schedule_clustered",
    withFixtures(
      """, f AS (SELECT * FROM forecasts WHERE prediction_date = DATE '2024-01-15'),
        |urgency AS (SELECT site_code, MAX(outage_probability) AS urgency FROM f GROUP BY site_code),
        |ticketed AS (SELECT DISTINCT site_code FROM f WHERE root_cause = 'error'),
        |eligible AS (SELECT u.site_code FROM urgency u JOIN sites s USING (site_code)
        |             WHERE u.site_code NOT IN (SELECT site_code FROM ticketed))
        |SELECT CAST((SELECT COUNT(*) FROM eligible) AS BIGINT) AS n_eligible,
        |       TRUE AS clusters_eq_k, TRUE AS ranks_contiguous,
        |       TRUE AS within_capacity, TRUE AS sites_eligible,
        |       TRUE AS urgency_exact, TRUE AS rerun_deterministic""".stripMargin)) { (s, d) =>
    val k = 4
    val perCluster = 5
    val run1 = NetIntel.scheduleClustered(s, d, "2024-01-15", k, perCluster)
    val run2 = NetIntel.scheduleClustered(s, d, "2024-01-15", k, perCluster)
    // order-insensitive full-result signature; bit_xor (not sum) so the
    // fold cannot overflow under ANSI arithmetic
    def sig(df: DataFrame, as: String) = df.agg(expr(
      "bit_xor(xxhash64(cluster, deploy_rank, site_code, urgency, zone, region))")
      .as(as))
    val f = DomainTables.forecastsForDate(s, d, "2024-01-15")
    val urgency = f.groupBy("site_code").agg(max(col("outage_probability")).as("_u"))
    val ticketed = f.filter(col("root_cause") === "error").select("site_code")
    val eligible = urgency
      .join(ticketed, Seq("site_code"), "left_anti")
      .join(broadcast(DomainTables.sites(s, d).select("site_code")), "site_code")
    val nEligible = eligible.agg(count(lit(1)).cast("long").as("n_eligible"))
    val perClusterChecks = run1.groupBy("cluster")
      .agg(count(lit(1)).as("_n"),
        max(col("deploy_rank")).as("_maxr"), min(col("deploy_rank")).as("_minr"))
      .agg(count(lit(1)).as("_nclusters"),
        max(when(col("_maxr") =!= col("_n") || col("_minr") =!= 1, 1)
          .otherwise(0)).as("_badrank"),
        max(when(col("_n") > perCluster, 1).otherwise(0)).as("_overcap"))
    val eligibility = run1.join(eligible, Seq("site_code"), "left_outer")
      .agg(max(when(col("_u").isNull, 1).otherwise(0)).as("_notelig"),
        max(when(col("_u").isNotNull && col("urgency") =!= col("_u"), 1)
          .otherwise(0)).as("_badurg"))
    nEligible.crossJoin(perClusterChecks).crossJoin(eligibility)
      .crossJoin(sig(run1, "_sig1")).crossJoin(sig(run2, "_sig2"))
      .select(col("n_eligible"),
        (col("_nclusters") === k).as("clusters_eq_k"),
        (col("_badrank") === 0).as("ranks_contiguous"),
        (col("_overcap") === 0).as("within_capacity"),
        (col("_notelig") === 0).as("sites_eligible"),
        (col("_badurg") === 0).as("urgency_exact"),
        (col("_sig1") === col("_sig2")).as("rerun_deterministic"))
  }

  /** EP3 route ordering (README.md:62 "Optimizes FME routing using
    * heuristic … dispatch"): the greedy nearest-neighbor tour per zone
    * over [[NetIntel.route]]'s exact integer micro-unit coordinates.
    * The oracle UNROLLS the engine's tour loop (perZone = 5 → five
    * argmin steps, each excluding the already-visited stops of its
    * zone), replaying every leg's squared distance, tie-break and
    * visit order bit-for-bit — the [[graft]] unrolled-oracle
    * discipline for bounded iterative logic. */
  private val ep3Route = QuerySpec(
    "q_ep3_route",
    withFixtures(
      """, f AS (SELECT * FROM forecasts WHERE prediction_date = DATE '2024-01-15'),
        |urgency AS (SELECT site_code, MAX(outage_probability) AS urgency FROM f GROUP BY site_code),
        |ticketed AS (SELECT DISTINCT site_code FROM f WHERE root_cause = 'error'),
        |ranked AS (
        |  SELECT s.zone, u.site_code, u.urgency, s.region,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY s.zone ORDER BY u.urgency DESC, u.site_code) AS BIGINT) AS deploy_rank
        |  FROM urgency u JOIN sites s USING (site_code)
        |  WHERE u.site_code NOT IN (SELECT site_code FROM ticketed)),
        |coords AS (
        |  SELECT zone, deploy_rank, site_code, urgency,
        |         CAST((('0x' || substr(md5(region || '|x'), 1, 8))::UBIGINT % 1000) * 100 +
        |              ('0x' || substr(md5(site_code || '|x'), 1, 8))::UBIGINT % 100 AS BIGINT) AS cx,
        |         CAST((('0x' || substr(md5(region || '|y'), 1, 8))::UBIGINT % 1000) * 100 +
        |              ('0x' || substr(md5(site_code || '|y'), 1, 8))::UBIGINT % 100 AS BIGINT) AS cy
        |  FROM ranked WHERE deploy_rank <= 5),
        |s1 AS (SELECT zone, site_code, urgency, cx, cy, CAST(0 AS BIGINT) AS leg
        |       FROM coords WHERE deploy_rank = 1),
        |s2 AS (SELECT zone, site_code, urgency, cx, cy, leg FROM (
        |  SELECT c.zone, c.site_code, c.urgency, c.cx, c.cy,
        |         (c.cx - p.cx) * (c.cx - p.cx) + (c.cy - p.cy) * (c.cy - p.cy) AS leg,
        |         ROW_NUMBER() OVER (PARTITION BY c.zone ORDER BY
        |           (c.cx - p.cx) * (c.cx - p.cx) + (c.cy - p.cy) * (c.cy - p.cy), c.site_code) AS rn
        |  FROM coords c JOIN s1 p ON c.zone = p.zone AND c.site_code <> p.site_code)
        |  WHERE rn = 1),
        |v2 AS (SELECT zone, site_code FROM s1 UNION ALL SELECT zone, site_code FROM s2),
        |s3 AS (SELECT zone, site_code, urgency, cx, cy, leg FROM (
        |  SELECT c.zone, c.site_code, c.urgency, c.cx, c.cy,
        |         (c.cx - p.cx) * (c.cx - p.cx) + (c.cy - p.cy) * (c.cy - p.cy) AS leg,
        |         ROW_NUMBER() OVER (PARTITION BY c.zone ORDER BY
        |           (c.cx - p.cx) * (c.cx - p.cx) + (c.cy - p.cy) * (c.cy - p.cy), c.site_code) AS rn
        |  FROM coords c JOIN s2 p ON c.zone = p.zone
        |  WHERE NOT EXISTS (SELECT 1 FROM v2 v WHERE v.zone = c.zone AND v.site_code = c.site_code))
        |  WHERE rn = 1),
        |v3 AS (SELECT * FROM v2 UNION ALL SELECT zone, site_code FROM s3),
        |s4 AS (SELECT zone, site_code, urgency, cx, cy, leg FROM (
        |  SELECT c.zone, c.site_code, c.urgency, c.cx, c.cy,
        |         (c.cx - p.cx) * (c.cx - p.cx) + (c.cy - p.cy) * (c.cy - p.cy) AS leg,
        |         ROW_NUMBER() OVER (PARTITION BY c.zone ORDER BY
        |           (c.cx - p.cx) * (c.cx - p.cx) + (c.cy - p.cy) * (c.cy - p.cy), c.site_code) AS rn
        |  FROM coords c JOIN s3 p ON c.zone = p.zone
        |  WHERE NOT EXISTS (SELECT 1 FROM v3 v WHERE v.zone = c.zone AND v.site_code = c.site_code))
        |  WHERE rn = 1),
        |v4 AS (SELECT * FROM v3 UNION ALL SELECT zone, site_code FROM s4),
        |s5 AS (SELECT zone, site_code, urgency, cx, cy, leg FROM (
        |  SELECT c.zone, c.site_code, c.urgency, c.cx, c.cy,
        |         (c.cx - p.cx) * (c.cx - p.cx) + (c.cy - p.cy) * (c.cy - p.cy) AS leg,
        |         ROW_NUMBER() OVER (PARTITION BY c.zone ORDER BY
        |           (c.cx - p.cx) * (c.cx - p.cx) + (c.cy - p.cy) * (c.cy - p.cy), c.site_code) AS rn
        |  FROM coords c JOIN s4 p ON c.zone = p.zone
        |  WHERE NOT EXISTS (SELECT 1 FROM v4 v WHERE v.zone = c.zone AND v.site_code = c.site_code))
        |  WHERE rn = 1),
        |tour AS (
        |  SELECT zone, CAST(1 AS BIGINT) AS visit_order, site_code, leg AS leg_dist_sq, urgency FROM s1
        |  UNION ALL SELECT zone, 2, site_code, leg, urgency FROM s2
        |  UNION ALL SELECT zone, 3, site_code, leg, urgency FROM s3
        |  UNION ALL SELECT zone, 4, site_code, leg, urgency FROM s4
        |  UNION ALL SELECT zone, 5, site_code, leg, urgency FROM s5)
        |SELECT zone, visit_order, site_code, leg_dist_sq, urgency
        |FROM tour ORDER BY zone, visit_order""".stripMargin)) { (s, d) =>
    NetIntel.route(s, d, "2024-01-15", 5)
  }

  val all: Seq[QuerySpec] = Seq(ep1, ep2, ep3, ep3Clustered, ep3Route, ml, s5Sink)
}
