package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only measurement for the r18 coarse-geometry auto-dial: recall@5
  * of every IVF-family registry method at nCells = ⌊√n⌋ (the certified
  * SemDeDup dial) with a FIXED nProbe=4 — the share falls as the corpus
  * grows (4/⌊√n⌋), which is the sub-linear serving promise — plus the
  * composed ivfpq method at a 50% probe share. Run per SF; BASELINE.md
  * records the chosen bands. */
object ProfileIvfDial {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master("local[8]"), 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{ProductQuantization, Similarity}
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 100)
    val n = emb.count()
    val k = math.max(1, math.sqrt(n.toDouble).toInt)
    val exact = Similarity.bruteForceTopK(
      queries, emb, "vec_id", "embedding", "vec_id", "embedding", 5)
      .select("q_id", "c_id")
    exact.persist(); val nHits = exact.count()
    def recall(df: org.apache.spark.sql.DataFrame): Double =
      df.join(exact, Seq("q_id", "c_id"), "left_semi").count().toDouble / nHits
    val rIvf = recall(Similarity.ivfTopK(queries, emb,
      "vec_id", "embedding", "vec_id", "embedding", 5, nCells = k, nProbe = 4))
    val rTrained = recall(Similarity.ivfTopKTrained(queries, emb,
      "vec_id", "embedding", "vec_id", "embedding", 5, nCells = k, nProbe = 4))
    val rLloyd = recall(Similarity.ivfTopKLloyd(queries, emb,
      "vec_id", "embedding", "vec_id", "embedding", 5,
      nCells = k, nProbe = 4, iters = 2))
    println(f"IVFDIAL n=$n%d nCells=$k%d nProbe=4 share=${4.0 / k}%.3f " +
      f"ivf=$rIvf%.3f trained=$rTrained%.3f lloyd=$rLloyd%.3f")
    // the composed in-session ivfpq method at the 50%-share dial
    val np = (k + 1) / 2
    val rIvfpq = recall(ProductQuantization.ivfpqTopK(queries, emb,
      "vec_id", "embedding", "vec_id", "embedding", 5,
      nCells = k, nProbe = np, iters = 2, m = 8, kSub = 32,
      candidateFrac = 0.15))
    println(f"IVFDIAL-PQ nCells=$k%d nProbe=$np%d share=${np.toDouble / k}%.3f " +
      f"ivfpq_adc_rerank=$rIvfpq%.3f")
    spark.stop()
  }
}
