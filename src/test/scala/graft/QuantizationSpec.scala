package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Quantization

class QuantizationSpec extends AnyFunSuite {
  import TestSession.{spark, sfDir}
  import spark.implicits._

  private val toy = Seq(
    (1L, Seq(0.0, 1.0, 2.0, 4.0)),
    (2L, Seq(4.0, 3.0, 0.5, 0.0))
  ).toDF("id", "v")

  test("codes cover the range: min maps to 0, max to levels-1, midpoints monotone") {
    val out = Quantization.withQuantized(toy, col("v"), levels = 4)
      .orderBy("id").select("codes").collect()
      .map(_.getSeq[Int](0))
    // range [0,4], step 1: 0→0, 1→1, 2→2, 4→3(clamped), 3→3, 0.5→0
    assert(out(0).toSeq === Seq(0, 1, 2, 3))
    assert(out(1).toSeq === Seq(3, 3, 0, 0))
  }

  test("midpoint reconstruction error is bounded by step/2") {
    val out = Quantization.withQuantized(toy, col("v"), levels = 4)
      .withColumn("err", array_max(zip_with(
        col("v"), col("recon"), (x, y) => abs(x - y))))
      .select("err").collect().map(_.getDouble(0))
    assert(out.forall(_ <= 0.5 + 1e-12)) // step=1 → bound 0.5
  }

  test("quantized cosine ranking stays faithful on real embeddings (recall in band)") {
    val emb = Tables.embeddings(spark, sfDir).limit(200).cache()
    val q = Quantization.withQuantized(emb, col("embedding"), levels = 256)
      .select(col("vec_id"), col("recon").as("embedding"))
    val queries = emb.filter(col("vec_id") < 20).select("vec_id", "embedding")
    import graft.operators.Similarity
    def topk(corpus: org.apache.spark.sql.DataFrame) =
      Similarity.bruteForceTopK(queries, corpus, "vec_id", "embedding",
        "vec_id", "embedding", k = 5)
        .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = topk(emb.select("vec_id", "embedding"))
    val quant = topk(q)
    val recall = (exact & quant).size.toDouble / exact.size
    assert(recall >= 0.9, s"SQ8 recall $recall below band")
  }

  test("encode/decode round trip is idempotent on already-reconstructed values") {
    val once = Quantization.withQuantized(toy, col("v"), levels = 4)
      .select(col("id"), col("recon").as("v"))
    val twice = Quantization.withQuantized(once, col("v"), levels = 4)
      .orderBy("id").select("recon").collect().map(_.getSeq[Double](0))
    val first = once.orderBy("id").select("v").collect().map(_.getSeq[Double](0))
    // midpoints re-quantize to their own bins — but the RANGE is now the
    // midpoint span, so just assert the values stay within one step
    first.zip(twice).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) <= 1.0 + 1e-12) }
    }
  }
}
