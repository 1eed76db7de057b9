package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Steal-immune per-query profiler: runs named registry queries with the
  * Bench cold/isolate contract, reporting executor CPU time (actual
  * cycles — robust to the measurement host's 10-90% hypervisor steal),
  * task count and shuffle volume alongside wall time.
  *
  * Usage: runMain graft.tools.ProfileQuery <sfDir> <name>[,<name>...] [reps]
  * Each rep: CacheGovernor.reset, then the named queries in the given
  * order with isolate() between them — query 1 pays any shared-relation
  * build, later queries ride it, exactly as one Bench run prices it.
  */
object ProfileQuery {

  final class Tally extends SparkListener {
    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    val runMs = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val shufRead = new java.util.concurrent.atomic.AtomicLong
    val shufWrite = new java.util.concurrent.atomic.AtomicLong
    val memSpill = new java.util.concurrent.atomic.AtomicLong
    val diskSpill = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        cpuNs.addAndGet(m.executorCpuTime)
        runMs.addAndGet(m.executorRunTime)
        tasks.incrementAndGet()
        shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        memSpill.addAndGet(m.memoryBytesSpilled)
        diskSpill.addAndGet(m.diskBytesSpilled)
      }
    }
  }

  /** One completed stage's parallelism + shuffle volume. */
  final case class StageStat(
      stageId: Int, numTasks: Int, shufRead: Long, shufWrite: Long)

  /** Per-STAGE tally (vs [[Tally]]'s per-task totals): records each
    * completed stage's task count and shuffle bytes, so scale smokes can
    * assert "every stage that reads real shuffle data is as wide as the
    * cluster" — the property that actually transfers to 1000 executors,
    * where one narrow hot stage is the whole job's ceiling. */
  final class StageTally extends SparkListener {
    private val q = new java.util.concurrent.ConcurrentLinkedQueue[StageStat]()
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      val i = s.stageInfo
      val m = i.taskMetrics
      q.add(StageStat(i.stageId, i.numTasks,
        m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten))
    }
    def stages: Seq[StageStat] = {
      import scala.jdk.CollectionConverters._
      q.asScala.toList
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(sys.error("usage: ProfileQuery <sfDir> <q1,q2,...> [reps]"))
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    (1 to reps).foreach { rep =>
      graft.core.CacheGovernor.reset(spark)
      names.foreach { name =>
        val fn = graft.SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
        val tally = new Tally
        spark.sparkContext.addSparkListener(tally)
        val t0 = System.nanoTime()
        // noop-sink consumption, same contract as Bench (round 12):
        // count() silently pruned projection-only tails and
        // unique-key left joins out of the measurement. Row mass for
        // the curve tables rides the SAME run via observe() — a
        // separate count() re-executed the full query, which for the
        // side-effecting ledger rows rebuilt and rewrote whole
        // indexes into fresh temp dirs, doubling profile wall time
        val obs = org.apache.spark.sql.Observation()
        fn(spark, sfDir).observe(obs, org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("rows"))
          .write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(1500) // listener settle (single-JVM profiler)
        spark.sparkContext.removeSparkListener(tally)
        val n = obs.get("rows")
        graft.core.CacheGovernor.isolate()
        val spill =
          if (tally.memSpill.get == 0 && tally.diskSpill.get == 0) ""
          else f"  spillM ${tally.memSpill.get / 1048576.0}%8.1f MiB  spillD ${tally.diskSpill.get / 1048576.0}%8.1f MiB"
        println(f"[profile] rep$rep $name%-28s wall ${wall}%7.2f s  cpu ${tally.cpuNs.get / 1e9}%8.2f s  run ${tally.runMs.get / 1e3}%8.2f s  tasks ${tally.tasks.get}%6d  shufR ${tally.shufRead.get / 1048576.0}%8.1f MiB  shufW ${tally.shufWrite.get / 1048576.0}%8.1f MiB$spill  ($n rows)")
      }
    }
    spark.stop()
  }
}
