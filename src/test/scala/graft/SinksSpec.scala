package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.DomainTables
import graft.sources.Sinks

class SinksSpec extends AnyFunSuite {
  import TestSession.{spark, sfDir}

  test("forecast sink partitions by date and read-back prunes partitions") {
    val out = Files.createTempDirectory("graft_sink").toString
    val f = DomainTables.forecasts(spark, sfDir)
    Sinks.writeForecasts(f, out)
    // physical layout: one directory per p_date
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("p_date=")))
    // date-bounded read-back matches source count for that date
    val day = "2024-01-15"
    val back = spark.read.parquet(out).filter(col("p_date") === day).count()
    val src = f.filter(col("prediction_date") === lit(day).cast("date")).count()
    assert(back === src && back > 0)
    // partition pruning visible in the physical plan
    val plan = spark.read.parquet(out).filter(col("p_date") === day)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || plan.contains("p_date"))
  }

  test("audit sink appends one narrow row per query without re-executing it") {
    val out = Files.createTempDirectory("graft_audit").toString
    val f = DomainTables.forecasts(spark, sfDir).limit(10)
    // the serving path materializes once; the audit row reuses that count
    val served = f.count()
    // gate: the audit WRITE must plan from a local relation only, never
    // a file scan. The listener sees every execution on the shared
    // session (suites run in parallel, and the f.count() above delivers
    // asynchronously), so capture is filtered to plans writing to THIS
    // audit path before asserting.
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        plans.add(qe.executedPlan.toString)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    import scala.jdk.CollectionConverters._
    def auditPlans = plans.asScala.filter(_.contains(out)).toSeq
    try {
      Sinks.auditLog(spark, "q_test_1", served, out)
      Sinks.auditLog(spark, "q_test_2", served, out)
      // listener delivery is async; wait for both audit-write executions
      val deadline = System.nanoTime() + 10_000_000_000L
      while (auditPlans.size < 2 && System.nanoTime() < deadline) Thread.sleep(50)
    } finally spark.listenerManager.unregister(listener)
    assert(auditPlans.size === 2, s"expected 2 audit writes, saw ${auditPlans.size}")
    assert(auditPlans.forall(p => !p.contains("FileScan")),
      "audit write re-executed a source scan")
    val audit = spark.read.parquet(out)
    assert(audit.count() === 2)
    assert(audit.columns.toSeq.sorted === Seq("n_rows", "query_name", "served_at_ms"))
    assert(audit.select("n_rows").collect().forall(_.getLong(0) === served))
  }

  test("streaming file sink writes exactly-once with AvailableNow") {
    val out = Files.createTempDirectory("graft_stream_sink").toString
    val cp = Files.createTempDirectory("graft_stream_cp").toString
    // stream the raw events parquet (S3: file-stream source stand-in);
    // the file source wants a directory, so stage the file into one.
    // Schema must be the RAW one (ts as long nanos under nanosAsLong).
    val srcDir = Files.createTempDirectory("graft_stream_src")
    Files.copy(java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      srcDir.resolve("events.parquet"))
    val evSchema = graft.core.Tables.load(spark, sfDir, "events").schema
    val src = spark.readStream.schema(evSchema).parquet(srcDir.toString)
    val q = Sinks.streamForecasts(src, out, cp).start()
    q.processAllAvailable(); q.stop()
    val n = spark.read.parquet(out).count()
    assert(n === graft.core.Tables.load(spark, sfDir, "events").count())
  }
}
