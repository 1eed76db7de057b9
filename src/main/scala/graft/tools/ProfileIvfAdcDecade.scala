package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only decade measurement for the IVFADC stored-index SERVING
  * path at a FIXED nProbe (the production dial on clustered corpora:
  * with nCells = ⌊√n⌋ and nProbe held constant, the probed share is
  * nProbe/⌊√n⌋, so per-query serving work grows ~√n — sub-linear).
  * Builds the index OUTSIDE the timed region, then times `reps`
  * serve-only calls with ProfileQuery's steal-immune CPU tally.
  *
  * Usage: runMain graft.tools.ProfileIvfAdcDecade <sfDir> <nProbe> [reps]
  * Run back-to-back on gc0.1 / gc1.0 (matched window) and compare the
  * serve-only CPU ratio; recall@5 prints beside it so the speed point
  * is never quoted without its quality. */
object ProfileIvfAdcDecade {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nProbe = args(1).toInt
    val reps = args.lift(2).map(_.toInt).getOrElse(4)
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{ProductQuantization, Similarity}
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 100)
    def slice(i: Int) = emb.filter(pmod(col("vec_id"), lit(3)) === i)
    val dir = java.nio.file.Files.createTempDirectory("ivfadcdec").toString
    ProductQuantization.writeIvfPqIndex(slice(0), "vec_id", "embedding",
      dir, nCells = 0, iters = 2, m = 16, kSub = 32)
    ProductQuantization.appendToIvfPqIndex(spark, dir,
      emb.filter(pmod(col("vec_id"), lit(3)) =!= 0), "vec_id", "embedding")
    val nCells = ProductQuantization.ivfPqCellCount(spark, dir)
    def serve() = ProductQuantization.searchIvfPqIndex(
      spark, dir, queries, "vec_id", "embedding",
      emb, "vec_id", "embedding", k = 5, nProbe = nProbe,
      candidateFrac = 0.10)
    // recall (untimed — includes the brute-force oracle)
    val exact = Similarity.bruteForceTopK(queries, emb,
      "vec_id", "embedding", "vec_id", "embedding", 5).select("q_id", "c_id")
    exact.persist()
    val recall = serve().join(exact, Seq("q_id", "c_id"), "left_semi").count()
      .toDouble / exact.count()
    val tally = new ProfileQuery.Tally
    spark.sparkContext.addSparkListener(tally)
    for (r <- 1 to reps) {
      val c0 = tally.cpuNs.get; val w0 = System.nanoTime
      serve().write.format("noop").mode("overwrite").save()
      Thread.sleep(1500) // listener settle (single-JVM profiler)
      val cpu = (tally.cpuNs.get - c0) / 1e9
      val wall = (System.nanoTime - w0) / 1e9
      println(f"IVFADC-DECADE $sfDir nCells=$nCells%d nProbe=$nProbe%d " +
        f"share=${nProbe.toDouble / nCells}%.3f rep$r%d wall=$wall%.2f s " +
        f"cpu=$cpu%.2f s recall@5=$recall%.3f")
    }
    spark.stop()
  }
}
