package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only measurement for the PQ-ADC report row: recall@5 vs exact
  * brute force and the candidate fraction actually scored, over a
  * (m, kSub, candidateFrac) grid at one SF dir. Prints one line per
  * configuration; BASELINE.md records the chosen point. */
object ProfilePq {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master("local[8]"), 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 100)
    val k = 5
    val exact = graft.operators.Similarity.bruteForceTopK(
      queries, emb, "vec_id", "embedding", "vec_id", "embedding", k)
      .select("q_id", "c_id")
    exact.persist(); val nHits = exact.count()
    for (m <- Seq(4, 8); kSub <- Seq(16, 32); frac <- Seq(0.05, 0.10, 0.15)) {
      val top = graft.operators.ProductQuantization.adcTopK(
        queries, emb, "vec_id", "embedding", "vec_id", "embedding",
        k, m = m, kSub = kSub, iters = 2, candidateFrac = frac)
      val hits = top.join(exact, Seq("q_id", "c_id"), "left_semi").count()
      val cand = graft.operators.ProductQuantization.adcCandidates(
        queries, emb, "vec_id", "embedding", "vec_id", "embedding",
        k, m = m, kSub = kSub, iters = 2, candidateFrac = frac).count()
      println(f"PQ m=$m%d kSub=$kSub%d frac=$frac%.2f recall@5=${hits.toDouble / nHits}%.3f candidates=$cand%d")
    }
    // the codes-only serving point: ADC top-5 with NO rerank
    val adcOnly = graft.operators.ProductQuantization.adcCandidates(
      queries, emb, "vec_id", "embedding", "vec_id", "embedding",
      k = 5, m = 8, kSub = 32, iters = 2, candidateFrac = 0.0)
    val hitsOnly = adcOnly.join(exact, Seq("q_id", "c_id"), "left_semi").count()
    println(f"PQ m=8 kSub=32 ADC-ONLY recall@5=${hitsOnly.toDouble / nHits}%.3f")
    // true IVF-PQ grid (r17): coarse-probe share vs recall at the
    // report's m=8/kSub=32 PQ configuration, 16 Lloyd cells
    val n = emb.count()
    for (nProbe <- Seq(6, 8, 10, 12); frac <- Seq(0.10, 0.15)) {
      val top = graft.operators.ProductQuantization.ivfpqTopK(
        queries, emb, "vec_id", "embedding", "vec_id", "embedding",
        k, nCells = 16, nProbe = nProbe, iters = 2,
        m = 8, kSub = 32, candidateFrac = frac)
      val hits = top.join(exact, Seq("q_id", "c_id"), "left_semi").count()
      val cand = graft.operators.ProductQuantization.ivfpqCandidates(
        queries, emb, "vec_id", "embedding", "vec_id", "embedding",
        k, nCells = 16, nProbe = nProbe, iters = 2,
        m = 8, kSub = 32, candidateFrac = frac).count()
      println(f"IVFPQ nProbe=$nProbe%d frac=$frac%.2f recall@5=${hits.toDouble / nHits}%.3f candidates=$cand%d (of ${100 * n}%d pairs)")
    }
    spark.stop()
  }
}
