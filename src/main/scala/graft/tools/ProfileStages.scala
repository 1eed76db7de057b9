package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Dev-only per-STAGE profiler for registry queries: runs each named
  * query once (noop sink, Bench reset/isolate contract) and prints its
  * stages sorted by executor CPU, with task counts and shuffle bytes —
  * the stage-level view §7.1 of the optimization guide starts from,
  * minus the UI this sandbox can't open.
  *
  * Usage: runMain graft.tools.ProfileStages <sfDir> <name>[,<name>...]
  */
object ProfileStages {
  final class StageCpu extends SparkListener {
    val q = new java.util.concurrent.ConcurrentLinkedQueue[
      (Int, Int, Long, Long, Long, Long, String)]()
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      val i = s.stageInfo
      val m = i.taskMetrics
      q.add((i.stageId, i.numTasks, m.executorCpuTime, m.executorRunTime,
        m.shuffleReadMetrics.totalBytesRead,
        m.shuffleWriteMetrics.bytesWritten,
        i.details.linesIterator
          .find(l => l.contains("graft") && !l.contains("GraftSparkAccess"))
          .getOrElse(i.name).trim.take(90)))
    }
    def clear(): Unit = q.clear()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(",").toSeq).getOrElse(Seq.empty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.local(cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    val st = new StageCpu
    spark.sparkContext.addSparkListener(st)
    spark.range(1000).selectExpr("sum(id)").collect()
    names.foreach { n =>
      graft.core.CacheGovernor.reset(spark)
      org.apache.spark.GraftSparkAccess.drainListenerBus(spark.sparkContext)
      st.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      org.apache.spark.GraftSparkAccess.drainListenerBus(spark.sparkContext)
      val stages = st.q.toArray
        .map(_.asInstanceOf[(Int, Int, Long, Long, Long, Long, String)])
      println(f"\n===== $n wall=$dt%.3f cpu=${stages.map(_._3).sum / 1e9}%.3f " +
        f"stages=${stages.length} =====")
      stages.sortBy(-_._4).take(14).foreach {
        case (id, tasks, cpu, run, sr, sw, site) =>
          println(f"stage=$id%5d tasks=$tasks%4d cpu=${cpu / 1e9}%7.3f " +
            f"run=${run / 1e3}%8.3f sRead=${sr / 1024}%8dK sWrite=${sw / 1024}%8dK  $site")
      }
    }
    spark.stop()
  }
}
