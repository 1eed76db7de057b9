package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only measurement for the PQ codes index's rerank serving path
  * (q_sim_pq_index's r17 shape): build the index exactly as the query
  * does (train on the %3=0 slice, append the rest), then measure
  * recall@5 of adcRerankTopKFrom vs exact brute force over a
  * candidateFrac grid. BASELINE.md records the chosen point. */
object ProfilePqIndex {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master("local[8]"), 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 100)
    def slice(i: Int) = emb.filter(pmod(col("vec_id"), lit(3)) === i)
    val dir = java.nio.file.Files.createTempDirectory("pqidxprof").toString
    graft.operators.ProductQuantization.writePqIndex(
      slice(0), "vec_id", "embedding", dir, m = 8, kSub = 32, iters = 2)
    graft.operators.ProductQuantization.appendToPqIndex(
      spark, dir, slice(1), "vec_id", "embedding")
    graft.operators.ProductQuantization.appendToPqIndex(
      spark, dir, slice(2), "vec_id", "embedding")
    val exact = graft.operators.Similarity.bruteForceTopK(
      queries, emb, "vec_id", "embedding", "vec_id", "embedding", 5)
      .select("q_id", "c_id")
    exact.persist(); val nHits = exact.count()
    for (frac <- Seq(0.05, 0.10, 0.15, 0.20)) {
      val top = graft.operators.ProductQuantization.adcRerankTopKFrom(
        spark, dir, queries, "vec_id", "embedding",
        emb, "vec_id", "embedding", k = 5, candidateFrac = frac)
      val hits = top.join(exact, Seq("q_id", "c_id"), "left_semi").count()
      println(f"PQINDEX-RERANK frac=$frac%.2f recall@5=${hits.toDouble / nHits}%.3f")
    }
    // the residual-encoded IVFADC stored index (r18): auto-dialed
    // ⌊√n_seed⌋ coarse cells, probed-share serving — share × frac grid
    val dir2 = java.nio.file.Files.createTempDirectory("ivfpqidxprof").toString
    graft.operators.ProductQuantization.writeIvfPqIndex(
      slice(0), "vec_id", "embedding", dir2,
      nCells = 0, iters = 2, m = 16, kSub = 32)
    graft.operators.ProductQuantization.appendToIvfPqIndex(
      spark, dir2, slice(1), "vec_id", "embedding")
    graft.operators.ProductQuantization.appendToIvfPqIndex(
      spark, dir2, slice(2), "vec_id", "embedding")
    val nCells = graft.operators.ProductQuantization.ivfPqCellCount(spark, dir2)
    // hot/empty coarse-cell stress: the codes-per-cell distribution
    // (clustered corpora skew ~20×; serving must survive the hot cell)
    val sizes = graft.operators.ProductQuantization.ivfPqCodes(spark, dir2)
      .filter(col("sub") === 0).groupBy("coarse").count()
      .select("count").collect().map(_.getLong(0)).sorted
    if (sizes.nonEmpty)
      println(s"IVFADC-CELLS nCells=$nCells nonEmpty=${sizes.length} " +
        s"min=${sizes.head} p50=${sizes(sizes.length / 2)} max=${sizes.last}")
    for (share <- Seq(0.125, 0.25, 0.375, 0.5, 0.625); frac <- Seq(0.05, 0.10, 0.15)) {
      val nProbe = math.max(1, math.ceil(nCells * share).toInt)
      val top = graft.operators.ProductQuantization.searchIvfPqIndex(
        spark, dir2, queries, "vec_id", "embedding",
        emb, "vec_id", "embedding", k = 5,
        nProbe = nProbe, candidateFrac = frac)
      val hits = top.join(exact, Seq("q_id", "c_id"), "left_semi").count()
      println(f"IVFADC nCells=$nCells%d nProbe=$nProbe%d share=${nProbe.toDouble / nCells}%.3f frac=$frac%.2f recall@5=${hits.toDouble / nHits}%.3f")
    }
    spark.stop()
  }
}
