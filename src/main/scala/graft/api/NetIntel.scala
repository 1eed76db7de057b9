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
      date: String, perZone: Int = 5): DataFrame =
    rankedSchedule(spark, dir, date, perZone)
      .orderBy("zone", "deploy_rank")

  /** The unsorted deployment ranking [[schedule]] and [[route]] share:
    * urgency per site, open-ticket anti-join, per-zone capacity cut. */
  private def rankedSchedule(
      spark: SparkSession, dir: String,
      date: String, perZone: Int): DataFrame = {
    val f = DomainTables.forecastsForDate(spark, dir, date)
    val urgency = f.groupBy("site_code")
      .agg(max(col("outage_probability")).as("urgency"))
    // "open ticket" = an error-root-cause forecast for the site that day
    val ticketed = f.filter(col("root_cause") === "error").select("site_code")
    val s = DomainTables.sites(spark, dir)
    urgency
      .join(ticketed, Seq("site_code"), "left_anti")
      .join(broadcast(s), "site_code")
      .withColumn("deploy_rank",
        row_number().over(Window.partitionBy("zone")
          .orderBy(col("urgency").desc, col("site_code").asc)).cast("long"))
      .filter(col("deploy_rank") <= perZone)
      .select("zone", "deploy_rank", "site_code", "urgency", "region")
  }

  /** EP3 + the README.md:62 route-optimization claim: order each
    * zone's scheduled deployments into ONE deterministic crew route —
    * a greedy nearest-neighbor tour (the classic dispatch heuristic)
    * starting at the most urgent site (deploy_rank 1), repeatedly
    * visiting the nearest unvisited stop, ties to the lexically
    * smaller site_code. Distances are EXACT integer squared
    * micro-units over md5-derived pseudo-coordinates (region base
    * 0-999 ×100 + per-site jitter 0-99 — the [[pseudoCoord]] geometry
    * in an engine-portable hash so an oracle replays every leg
    * bit-for-bit; swap for real coordinates in production).
    *
    * Scale shape: the tour is imperative only WITHIN a zone's ≤
    * perZone stops (bounded, tiny); zones distribute across the
    * cluster via groupByKey. Coordinate hashing stays in codegen. */
  def route(
      spark: SparkSession, dir: String,
      date: String, perZone: Int = 5): DataFrame = {
    import spark.implicits._
    def h(c: org.apache.spark.sql.Column, salt: String, m: Int) =
      conv(substring(md5(concat(c, lit("|" + salt))), 1, 8), 16, 10)
        .cast("long") % m
    val coords = rankedSchedule(spark, dir, date, perZone)
      .withColumn("_cx",
        h(col("region"), "x", 1000) * 100 + h(col("site_code"), "x", 100))
      .withColumn("_cy",
        h(col("region"), "y", 1000) * 100 + h(col("site_code"), "y", 100))
      .select("zone", "deploy_rank", "site_code", "urgency", "_cx", "_cy")
      .as[(String, Long, String, Double, Long, Long)]
    coords.groupByKey(_._1).flatMapGroups { (zone, it) =>
      val stops = it.toArray
      def d2(a: (String, Long, String, Double, Long, Long),
          b: (String, Long, String, Double, Long, Long)): Long = {
        val dx = a._5 - b._5
        val dy = a._6 - b._6
        dx * dx + dy * dy
      }
      val out = Array.newBuilder[(String, Long, String, Long, Double)]
      var cur = stops.minBy(_._2) // deploy_rank 1: start at most urgent
      val visited = scala.collection.mutable.Set(cur._3)
      out += ((zone, 1L, cur._3, 0L, cur._4))
      var order = 2L
      while (visited.size < stops.length) {
        val next = stops.iterator.filterNot(s => visited(s._3))
          .minBy(s => (d2(cur, s), s._3))
        out += ((zone, order, next._3, d2(cur, next), next._4))
        visited += next._3
        cur = next
        order += 1
      }
      out.result().iterator
    }.toDF("zone", "visit_order", "site_code", "leg_dist_sq", "urgency")
      .orderBy("zone", "visit_order")
  }

  /** EP3 with the README.md:61-declared LOCATION CLUSTERING stage:
    * sites are grouped into `k` geographic clusters with MLlib KMeans
    * and FME deployments ranked per cluster (one crew route per
    * cluster) rather than per administrative zone.
    *
    * The harness tables carry no lat/lon, so coordinates are a
    * deterministic stand-in derived from the site's region (all sites
    * of a region share a base coordinate — regions ARE geography here)
    * plus a small per-site jitter; swap [[pseudoCoords]] for real
    * coordinates in production. KMeans is seeded, so assignments are
    * reproducible; clustering has no SQL oracle (iterative ML) — it is
    * property-tested in ForecastSpec. */
  def scheduleClustered(
      spark: SparkSession, dir: String,
      date: String, k: Int = 4, perCluster: Int = 5): DataFrame = {
    val f = DomainTables.forecastsForDate(spark, dir, date)
    val urgency = f.groupBy("site_code")
      .agg(max(col("outage_probability")).as("urgency"))
    val ticketed = f.filter(col("root_cause") === "error").select("site_code")
    val s = DomainTables.sites(spark, dir)
    val sites = urgency
      .join(ticketed, Seq("site_code"), "left_anti")
      .join(broadcast(s), "site_code")
      .withColumn("_x", pseudoCoord("x", col("region"), col("site_code")))
      .withColumn("_y", pseudoCoord("y", col("region"), col("site_code")))
    // cached: KMeans.fit makes several passes; uncached, each pass
    // re-runs the scan→agg→anti-join→dim-join pipeline (same
    // session-lifetime cache convention as the dedup core)
    val feats = graft.core.CacheGovernor.persistTracked(
      new org.apache.spark.ml.feature.VectorAssembler()
        .setInputCols(Array("_x", "_y")).setOutputCol("_loc")
        .transform(sites))
    // random init (seeded): kmeans|| costs several extra jobs for no
    // quality gain on well-separated region base points
    val model = new org.apache.spark.ml.clustering.KMeans()
      .setK(k).setSeed(42L).setInitMode("random").setMaxIter(10)
      .setFeaturesCol("_loc").setPredictionCol("cluster")
      .fit(feats)
    val ranked = model.transform(feats)
      .withColumn("cluster", col("cluster").cast("long"))
      .withColumn("deploy_rank",
        row_number().over(Window.partitionBy("cluster")
          .orderBy(col("urgency").desc, col("site_code").asc)).cast("long"))
      .filter(col("deploy_rank") <= perCluster)
    ranked.select("cluster", "deploy_rank", "site_code", "urgency", "zone", "region")
      .orderBy("cluster", "deploy_rank")
  }

  /** Deterministic pseudo-coordinate: region base point (hash of the
    * region name on a 10×10 grid) + per-site jitter ≤ 0.011 — two sites
    * of one region are always far closer to each other than distinct
    * region bases are likely to be. */
  private def pseudoCoord(axis: String, region: org.apache.spark.sql.Column,
      site: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(xxhash64(lit(axis), region), lit(1000)) / 100.0 +
      pmod(xxhash64(lit(axis), site), lit(100)) / 10000.0
}
