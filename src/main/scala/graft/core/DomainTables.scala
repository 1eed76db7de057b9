package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Domain tables of the reference (README.md:51,95-103,11,41: sites,
  * outage_forecasts, knowledge_base, holidays), derived deterministically
  * from the harness tables (FIXTURES.md "Domain fixtures to derive") so
  * the DuckDB oracle can rebuild them with identical SQL.
  *
  * Mapping: customer → site (site_code S<custkey>, zone = market
  * segment, region via nation); event → forecast (probability =
  * value/100, root cause = event type); event_type → knowledge-base
  * entry.
  */
object DomainTables {

  /** sites(site_code, zone, region) — J1 dim (reference README.md:51). */
  def sites(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .select(
        concat(lit("S"), col("c_custkey")).as("site_code"),
        col("c_mktsegment").as("zone"),
        col("n_name").as("region"))

  /** outage_forecasts per reference README.md:95-103, from events. */
  def forecasts(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(
      col("event_id").as("id"),
      concat(lit("S"), col("user_id") + 1).as("site_code"),
      to_date(col("ts")).as("prediction_date"),
      (col("value") / 100).as("outage_probability"),
      col("event_type").as("root_cause"))

  /** Date-bounded forecasts with REAL parquet pushdown: `events.ts` is
    * int64 nanos on disk (Spark has no ns type), so a predicate on the
    * converted timestamp cannot prune row groups — but the equivalent
    * range on the raw long can. UTC day [d, d+1) in ns ⟺
    * CAST(ts AS DATE) = d, since the data is µs-aligned and positive.
    * At 100 TB this is the difference between scanning one day and
    * scanning the table. */
  def forecastsForDate(s: SparkSession, dir: String, date: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val raw = Tables.load(s, dir, "events")
    val startNs = java.time.LocalDate.parse(date).toEpochDay * 86400L * 1000000000L
    val endNs = startNs + 86400L * 1000000000L
    val bounded =
      if (raw.schema("ts").dataType == LongType)
        raw.filter(col("ts") >= startNs && col("ts") < endNs)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else {
        // filter in the column's OWN type (TIMESTAMP or TIMESTAMP_NTZ) so
        // the predicate pushes to the parquet scan, then normalize — a
        // cast on the column side would block row-group pruning
        val tsType = raw.schema("ts").dataType
        raw.filter(col("ts") >= lit(date).cast(tsType) &&
            col("ts") < date_add(lit(date).cast("date"), 1).cast(tsType))
          .withColumn("ts", col("ts").cast(TimestampType))
      }
    bounded.select(
      col("event_id").as("id"),
      concat(lit("S"), col("user_id") + 1).as("site_code"),
      to_date(col("ts")).as("prediction_date"),
      (col("value") / 100).as("outage_probability"),
      col("event_type").as("root_cause"))
  }

  /** knowledge_base(root_cause, resolution, fme_plan) — J3 broadcast dim
    * (reference README.md:11,57-58). */
  def knowledgeBase(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(col("event_type").as("root_cause")).distinct()
      .select(
        col("root_cause"),
        concat(lit("resolve-"), col("root_cause")).as("resolution"),
        concat(lit("dispatch-"), col("root_cause")).as("fme_plan"))

  /** Matching SQL CTEs for the DuckDB oracle. */
  val sitesSql: String =
    """sites AS (
      |  SELECT 'S' || c_custkey AS site_code, c_mktsegment AS zone, n_name AS region
      |  FROM customer JOIN nation ON c_nationkey = n_nationkey)""".stripMargin

  val forecastsSql: String =
    """forecasts AS (
      |  SELECT event_id AS id, 'S' || (user_id + 1) AS site_code,
      |         CAST(ts AS DATE) AS prediction_date,
      |         value / 100 AS outage_probability,
      |         event_type AS root_cause
      |  FROM events)""".stripMargin

  val kbSql: String =
    """kb AS (
      |  SELECT DISTINCT event_type AS root_cause,
      |         'resolve-' || event_type AS resolution,
      |         'dispatch-' || event_type AS fme_plan
      |  FROM events)""".stripMargin
}
