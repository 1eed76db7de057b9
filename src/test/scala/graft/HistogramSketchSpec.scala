package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.HistogramSketch

class HistogramSketchSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def vals(vs: Seq[Double]) = vs.toDF("v")

  test("bins partition the range; edges land in the upper bin; out-of-range clamps") {
    val df = vals(Seq(-5.0, 0.0, 1.9, 2.0, 511.9, 512.0, 999.0))
      .select(HistogramSketch.binOf(col("v"), 0.0, 512.0, 256).as("b"))
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(0L, 0L, 0L, 1L, 255L, 255L, 255L))
  }

  test("per-day histograms merged equal the single-pass histogram") {
    val rows = (0 until 3000).map(i => (s"d${i % 7}", (i % 450) + 0.25)).toDF("day", "v")
    val whole = HistogramSketch.build(rows, col("v"), 0.0, 512.0, 256)
      .orderBy("bin").collect().map(r => (r.getLong(0), r.getLong(1)))
    val merged = HistogramSketch.merge(
      HistogramSketch.build(rows, col("v"), 0.0, 512.0, 256, Seq("day")), Nil)
      .orderBy("bin").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(whole.toSeq === merged.toSeq)
  }

  test("quantile estimate sits within one bin width above the true quantile") {
    val n = 10000
    val rows = vals((1 to n).map(_.toDouble / 20.0)) // uniform (0.05 .. 500]
    val hist = HistogramSketch.build(rows, col("v"), 0.0, 512.0, 256)
    val qs = HistogramSketch.quantiles(hist, Seq(0.5, 0.9, 0.99), 0.0, 512.0, 256)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val w = 2.0
    for ((q, est) <- qs) {
      val exact = (1 to n).map(_.toDouble / 20.0).sorted.apply(math.ceil(q * n).toInt - 1)
      assert(exact <= est && est - exact < w + 1e-9,
        s"q=$q est=$est exact=$exact not within ($w]")
    }
  }

  test("quantiles respect group keys") {
    val rows = Seq(("a", 10.0), ("a", 10.0), ("a", 10.0), ("b", 400.0)).toDF("g", "v")
    val hist = HistogramSketch.build(rows, col("v"), 0.0, 512.0, 256, Seq("g"))
    val out = HistogramSketch.quantiles(hist, Seq(0.5), 0.0, 512.0, 256, Seq("g"))
      .orderBy("g").collect().map(r => (r.getString(0), r.getDouble(2)))
    assert(out(0) === ("a", 12.0)) // bin 5 = [10,12) → upper edge 12
    assert(out(1) === ("b", 402.0))
  }

  test("merge is partition-insensitive") {
    val rows = (0 until 2000).map(i => (s"d${i % 5}", (i * 17 % 500) + 0.5)).toDF("day", "v")
    val a = HistogramSketch.merge(
      HistogramSketch.build(rows.coalesce(1), col("v"), 0.0, 512.0, 128, Seq("day")), Nil)
    val b = HistogramSketch.merge(
      HistogramSketch.build(rows.repartition(13), col("v"), 0.0, 512.0, 128, Seq("day")), Nil)
    assert(a.orderBy("bin").collect().toSeq === b.orderBy("bin").collect().toSeq)
  }
}
