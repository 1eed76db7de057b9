package graft.queries

import graft.api.NetIntel
import graft.core.{DomainTables, Tables}
import graft.operators.Forecast

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

  /** X3 — MLlib forecast pipeline; rows-only check (see Forecast). */
  private val ml = QuerySpec.noOracle("q_x3_ml_forecast") { (s, d) =>
    Forecast.trainAndScore(Tables.events(s, d), splitDay = "2024-01-20")
  }

  /** EP3 + the README.md:61 location-clustering stage (seeded KMeans —
    * iterative ML, not SQL-oracle-able; property-checked in
    * ForecastSpec). */
  private val ep3Clustered = QuerySpec.noOracle("q_ep3_schedule_clustered") { (s, d) =>
    NetIntel.scheduleClustered(s, d, "2024-01-15", k = 4, perCluster = 5)
  }

  val all: Seq[QuerySpec] = Seq(ep1, ep2, ep3, ep3Clustered, ml)
}
