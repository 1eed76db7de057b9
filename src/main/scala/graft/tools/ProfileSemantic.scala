package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cash the SemDeDup scale claim: at FIXED nCells the within-cluster
  * pairing grows quadratically with the cell, so the honest 100 TB
  * dial is the paper's own — nCells grows ∝ corpus so the expected
  * cell stays O(1). This tool measures the prune at a given scale
  * under both settings (the registry row's fixed 16 cells vs cells
  * scaled to ~rows/125, the sf0.1 cell occupancy) so BASELINE.md can
  * carry the measured tradeoff instead of an asserted one.
  *
  * Usage: runMain graft.tools.ProfileSemantic [sfDir] [reps]
  */
object ProfileSemantic {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/gendata/g1.0")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val rows = emb.count()
    val scaledCells = math.max(16, (rows / 125).toInt)
    Seq("fixed16" -> 16, s"scaled$scaledCells" -> scaledCells).foreach {
      case (label, nCells) =>
        (1 to reps).foreach { rep =>
          graft.core.CacheGovernor.reset(spark)
          val tally = new ProfileQuery.Tally
          spark.sparkContext.addSparkListener(tally)
          val t0 = System.nanoTime()
          graft.operators.SemanticDedup.prune(
            emb, "vec_id", "embedding", nCells = nCells, iters = 2, eps = 0.4)
            .write.format("noop").mode("overwrite").save()
          val wall = (System.nanoTime() - t0) / 1e9
          Thread.sleep(1000)
          spark.sparkContext.removeSparkListener(tally)
          println(f"[semantic] rep$rep $label%-12s rows=$rows%7d cells=$nCells%5d " +
            f"wall $wall%7.2f s  cpu ${tally.cpuNs.get / 1e9}%7.2f s  " +
            f"shufW ${tally.shufWrite.get / 1048576.0}%7.1f MiB")
        }
    }
    spark.stop()
  }
}
