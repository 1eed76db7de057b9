package graft.tools

/** Dev-only: per-stage timing of the recall report's serving path —
  * the durable index build, then each bench method frame, then the
  * aggregate report row — so a serving-cost regression is attributable
  * to one stage instead of one 45-second number.
  *
  * Usage: runMain graft.tools.ProfileRecall <sfDir> [cpus]
  */
object ProfileRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(1).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).toInt
    val spark = graft.core.GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val tally = new ProfileQuery.Tally
    spark.sparkContext.addSparkListener(tally)
    def drain(): Unit =
      org.apache.spark.GraftSparkAccess.drainListenerBus(spark.sparkContext)
    def time(label: String)(f: => Unit): Unit = {
      drain()
      val c0 = tally.cpuNs.get
      val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e9
      drain()
      val cpu = (tally.cpuNs.get - c0) / 1e9
      println(f"PROFILE $label%-28s wall=$dt%7.3f cpu=$cpu%8.3f")
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    // cold pass (build included in the first consumer)
    graft.queries.RecallReportQueries.benchMethods.foreach { case (m, fn) =>
      graft.core.CacheGovernor.reset(spark)
      time(s"method:$m") {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
    }
    graft.core.CacheGovernor.reset(spark)
    time("report(all)") {
      graft.SparkEntry.queries("q_sim_recall_report")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
