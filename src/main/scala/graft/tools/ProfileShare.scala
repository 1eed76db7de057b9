package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** One-off profiler for shared-relation plan decisions (round 7).
  *
  * The measurement host suffers 10-90% hypervisor steal minute-to-minute
  * (observed /proc/stat), so WALL TIME cannot rank plans. Each scenario
  * therefore also reports EXECUTOR CPU TIME (actual cycles, steal-immune),
  * task count and shuffle volume — "which plan does less work" — which is
  * the 100 TB question anyway; wall-clock rankings belong to a quiet host.
  */
object ProfileShare {

  private final class Tally extends SparkListener {
    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    val runMs = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val shufRead = new java.util.concurrent.atomic.AtomicLong
    val shufWrite = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        cpuNs.addAndGet(m.executorCpuTime)
        runMs.addAndGet(m.executorRunTime)
        tasks.incrementAndGet()
        shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    def t(label: String)(body: => Any): Unit = {
      val tally = new Tally
      spark.sparkContext.addSparkListener(tally)
      val t0 = System.nanoTime()
      val r = body
      val wall = (System.nanoTime() - t0) / 1e9
      // drain queued listener events before reading the tally
      // (listenerBus is private[spark]; a short settle sleep suffices
      // for a single-JVM profiler)
      Thread.sleep(1500)
      spark.sparkContext.removeSparkListener(tally)
      println(f"[profile] $label%-42s wall ${wall}%7.2f s  cpu ${tally.cpuNs.get / 1e9}%8.2f s  run ${tally.runMs.get / 1e3}%8.2f s  tasks ${tally.tasks.get}%6d  shufR ${tally.shufRead.get / 1048576.0}%8.1f MiB  shufW ${tally.shufWrite.get / 1048576.0}%8.1f MiB  ($r)")
    }

    val docs = graft.core.Tables.documents(spark, sfDir)

    // scenario A: round-6 lazy derivation (no sharing)
    graft.core.CacheGovernor.reset(spark)
    t("A1 lazy pairs (r6 minHashPairs)") {
      val (tagged, verified) = graft.operators.Dedup.collapseVerifyP(docs)
      graft.operators.Dedup.expandPairsP(
        tagged.select("_fp", "_id"), verified).count()
    }
    graft.core.CacheGovernor.isolate()
    t("A2 lazy clusters (r6 minHashClusters)") {
      val (tagged, verified) = graft.operators.Dedup.collapseVerifyP(docs)
      graft.operators.Dedup.clustersFromP(
        tagged.select("_fp", "_id"), verified).count()
    }

    // scenario B: round-7 shared checkpointed relation, step-timed
    graft.core.CacheGovernor.reset(spark)
    val (tagged, verified) = graft.operators.Dedup.collapseVerifyP(docs)
    var m: org.apache.spark.sql.DataFrame = null
    var v: org.apache.spark.sql.DataFrame = null
    t("B1 checkpoint members") { m = tagged.select("_fp", "_id").localCheckpoint(); m.count() }
    t("B2 checkpoint verified") { v = verified.localCheckpoint(); v.count() }
    t("B3 expandPairs over checkpoints") {
      graft.operators.Dedup.expandPairsP(m, v).count()
    }
    graft.core.CacheGovernor.isolate()
    t("B4 clustersFrom over checkpoints") {
      graft.operators.Dedup.clustersFromP(m, v).count()
    }
    graft.core.CacheGovernor.isolate()

    // scenario C: components alone, by input kind
    t("C1 components over CHECKPOINTED edges") {
      graft.operators.Components.connectedComponents(
        v.select("_fpa", "_fpb"), "_fpa", "_fpb").count()
    }
    graft.core.CacheGovernor.reset(spark)
    t("C2 components over LAZY edges") {
      val (_, v2) = graft.operators.Dedup.collapseVerifyP(docs)
      graft.operators.Components.connectedComponents(
        v2.select("_fpa", "_fpb"), "_fpa", "_fpb").count()
    }
    spark.stop()
  }
}
