package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: run one registry query and dump per-stage task counts +
  * shuffle volumes (the StageTally view ProfileQuery lacks). */
object DebugStages {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    val cpuByStage = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, Int)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) cpuByStage.merge(t.stageId,
          (m.executorCpuTime, m.executorRunTime, 1),
          (a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3))
      }
    })
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, sfDir).count()
    println(f"wall ${(System.nanoTime() - t0) / 1e9}%.1f s")
    Thread.sleep(2000)
    import scala.jdk.CollectionConverters._
    cpuByStage.asScala.toSeq.sortBy(-_._2._1).take(25).foreach {
      case (sid, (cpu, run, n)) =>
        println(f"stage $sid%4d tasks $n%5d cpu ${cpu / 1e9}%7.2f s run ${run / 1e3}%7.2f s")
    }
    spark.stop()
  }
}
