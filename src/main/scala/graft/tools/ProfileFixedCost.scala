package graft.tools

import org.apache.spark.sql.SparkSession

/** Measurement tool (not part of the engine): break a query's
  * bench-rep wall into BUILD (the registry closure: plan
  * construction + any driver-side work it does), PLAN (analysis +
  * optimization + physical planning of the built frame) and EXEC
  * (the noop-sink run), per rep — quantifying the per-row fixed
  * bookkeeping the round-14 verdict flagged before touching the
  * bench loop. Usage: ProfileFixedCost <sfDir> <q1,q2,...> [reps]. */
object ProfileFixedCost {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    try spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).count()
    catch { case _: Throwable => () }
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to reps).foreach { rep =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis+optimize+planning
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        graft.core.CacheGovernor.isolate()
        val t4 = System.nanoTime()
        println(f"[fixed] $name%-28s rep$rep build ${(t1 - t0) / 1e9}%6.3f  " +
          f"plan ${(t2 - t1) / 1e9}%6.3f  exec ${(t3 - t2) / 1e9}%6.3f  " +
          f"isolate ${(t4 - t3) / 1e9}%6.3f")
      }
      graft.core.CacheGovernor.reset(spark)
    }
    spark.stop()
  }
}
