package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.DomainTables

/** The reference's three HTTP entry points as DataFrame programs
  * (SURVEY.md §3: EP1 POST /chat, EP2 GET /forecast, EP3 GET /schedule —
  * reference README.md:85-88). The LLM/chat-formatting layer is out of
  * engine scope; these are the queries each endpoint runs.
  */
object NetIntel {

  /** EP1 (reference README.md:68-79): "top-k predicted outages for
    * <date> in <zone>, each with root cause, resolution, FME plan".
    * Plan shape: scan → pushed date/zone predicates → broadcast dim
    * joins → top-k (TakeOrderedAndProject). */
  def chatTopOutages(
      spark: SparkSession, dir: String,
      date: String, zone: String, k: Int = 3): DataFrame = {
    val f = DomainTables.forecastsForDate(spark, dir, date)
    val s = DomainTables.sites(spark, dir).filter(col("zone") === zone)
    val kb = DomainTables.knowledgeBase(spark, dir)
    f.join(broadcast(s), "site_code")
      .join(broadcast(kb), "root_cause")
      .select("id", "site_code", "zone", "outage_probability",
        "root_cause", "resolution", "fme_plan")
      .orderBy(col("outage_probability").desc, col("id").asc)
      .limit(k)
  }

  /** EP2 (reference README.md:86): raw forecasts above a probability
    * threshold for a date. */
  def forecastsFor(
      spark: SparkSession, dir: String,
      date: String, minProbability: Double): DataFrame =
    DomainTables.forecastsForDate(spark, dir, date)
      .filter(col("outage_probability") >= minProbability)
      .orderBy(col("outage_probability").desc, col("id").asc)

  /** EP3 (reference README.md:87,60-63): recommended FME deployments —
    * rank urgency per zone (max forecast probability per site), skip
    * sites already ticketed that day (anti-join), order the deployment
    * plan. */
  def schedule(
      spark: SparkSession, dir: String,
      date: String, perZone: Int = 5): DataFrame = {
    val f = DomainTables.forecastsForDate(spark, dir, date)
    val urgency = f.groupBy("site_code")
      .agg(max(col("outage_probability")).as("urgency"))
    // "open ticket" = an error-root-cause forecast for the site that day
    val ticketed = f.filter(col("root_cause") === "error").select("site_code")
    val s = DomainTables.sites(spark, dir)
    val ranked = urgency
      .join(ticketed, Seq("site_code"), "left_anti")
      .join(broadcast(s), "site_code")
      .withColumn("deploy_rank",
        row_number().over(Window.partitionBy("zone")
          .orderBy(col("urgency").desc, col("site_code").asc)).cast("long"))
      .filter(col("deploy_rank") <= perZone)
    ranked.select("zone", "deploy_rank", "site_code", "urgency", "region")
      .orderBy("zone", "deploy_rank")
  }
}
