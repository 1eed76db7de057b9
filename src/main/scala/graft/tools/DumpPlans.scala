package graft.tools

import org.apache.spark.sql.execution.ExplainMode

/** Dump EXECUTED formatted physical plans (AQE final plans) for named
  * registry queries into an output directory — the before/after plan
  * evidence an optimization round commits next to its code
  * (plans/r<N>/<query>_<suffix>.txt).
  *
  * Usage: runMain graft.tools.DumpPlans <outDir> <suffix> <sfDir> [query ...]
  * (no query names → the full registry)
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: DumpPlans <outDir> <suffix> <sfDir> [query ...]")
    val (outDir, suffix, sfDir) = (args(0), args(1), args(2))
    val names =
      if (args.length > 3) args.drop(3).toSeq
      else graft.SparkEntry.specs.map(_.name)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.core.GraftSession.local(cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      // Verify-style isolation so a dumped plan never depends on what
      // ran before it (shared relations would otherwise swap a trained
      // subtree for an InMemory/LogicalRDD scan based on dump order)
      graft.core.CacheGovernor.reset(spark)
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      // execute THIS dataset's own QueryExecution (a write would spawn
      // a separate one) so the finalized adaptive plan — real join
      // picks, AQEShuffleRead coalescing — is what we dump
      df.collect()
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"), plan)
      println(s"dumped $n -> $outDir/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
