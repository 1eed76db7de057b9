package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.LinearProbe

class LinearProbeSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def corpus = graft.core.Tables.documents(spark, TestSession.sfDir)

  test("gradient descent descends: training MSE drops on the corpus") {
    val out = LinearProbe.train(corpus, col("text"), iters = 6, lr = 0.3)
      .select("mse_first_q", "mse_last_q").head()
    assert(out.getLong(1) < out.getLong(0))
    assert(out.getLong(0) > 0L)
  }

  test("training is partition-count-insensitive (quantized sums)") {
    val a = LinearProbe.train(corpus, col("text"), 4, 0.3)
      .collect().toSeq
    val b = LinearProbe.train(corpus.repartition(13), col("text"), 4, 0.3)
      .collect().toSeq
    assert(a === b)
  }

  test("long training fits the planted target closely") {
    // the target IS a linear function of the features, so enough
    // iterations must drive training MSE near zero — "near" tempered
    // by the features' collinearity (small-eigenvalue directions
    // close slowly; measured 2e-4 at 120 iters)
    val out = LinearProbe.train(corpus.limit(100), col("text"),
        iters = 120, lr = 0.5)
      .select("mse_first_q", "mse_last_q").head()
    assert(out.getLong(1) < 1_000_000L,
      s"mse_last_q=${out.getLong(1)} (= ${out.getLong(1) / 1e9} MSE)") // < 1e-3
    assert(out.getLong(1) < out.getLong(0) / 100) // ≥ 100× reduction
  }

  test("score() reproduces the training-time prediction fold") {
    val w = Seq(0.1, 0.2, 0.0, 0.3, 0.0, -0.1)
    val feats = LinearProbe.featureDefs(col("text"), "text").map(_._2)
    val manual = w.zip(feats).map { case (wi, fi) => lit(wi) * fi }
      .reduceLeft(_ + _)
    val diff = corpus.limit(50)
      .select(abs(LinearProbe.score(corpus.limit(50), col("text"), w) - manual)
        .as("d"))
      .agg(max(col("d"))).head().getDouble(0)
    assert(diff === 0.0)
  }
}
