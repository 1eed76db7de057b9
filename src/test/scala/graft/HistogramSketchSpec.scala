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

  private def hist(vals: Seq[Double]) =
    HistogramSketch.build(vals.map(Tuple1(_)).toDF("v"), col("v"), 0.0, 100.0, 10)

  test("psi of a distribution against itself is exactly zero") {
    val vals = (0 until 500).map(i => (i * 13 % 100) + 0.5)
    val out = HistogramSketch.psi(hist(vals), hist(vals), 10).collect().head
    assert(out.getAs[Double]("psi") === 0.0)
    assert(out.getAs[Long]("n_a") === 500L && out.getAs[Long]("n_b") === 500L)
  }

  test("psi of disjoint distributions is large, and symmetric under swap") {
    val a = hist((0 until 300).map(i => (i % 40) + 0.5))   // mass in bins 0-3
    val b = hist((0 until 300).map(i => 60.0 + (i % 40) + 0.5)) // bins 6-9
    val ab = HistogramSketch.psi(a, b, 10).collect().head.getAs[Double]("psi")
    val ba = HistogramSketch.psi(b, a, 10).collect().head.getAs[Double]("psi")
    assert(ab > 0.25, s"disjoint mass must read as drifted, got $ab")
    assert(ab === ba, "PSI is symmetric in (p-q)ln(p/q)")
  }

  test("psi enumerates the full bin spine: bins absent from both inputs still count") {
    // all mass in bin 0 on both sides, equal totals — 9 bins absent
    // from both frames; smoothed shares identical per bin → psi = 0
    val same = HistogramSketch.psi(
      hist(Seq.fill(50)(1.0)), hist(Seq.fill(50)(2.0)), 10).collect().head
    assert(same.getAs[Double]("psi") === 0.0)
    // unequal totals: the ABSENT bins' smoothed shares now differ, so
    // they contribute — finite and small, never NaN/∞ (the Laplace
    // floor is the point)
    val diff = HistogramSketch.psi(
      hist(Seq.fill(50)(1.0)), hist(Seq.fill(80)(2.0)), 10).collect().head
      .getAs[Double]("psi")
    assert(diff > 0.0 && diff < 0.1 && !diff.isNaN && !diff.isInfinite)
  }

  test("psi keys: drift scored per group, keyed spine from both sides") {
    val a = HistogramSketch.build(
      Seq(("x", 5.0), ("x", 15.0)).toDF("k", "v"), col("v"), 0.0, 100.0, 10, Seq("k"))
    val b = HistogramSketch.build(
      Seq(("x", 95.0), ("y", 50.0)).toDF("k", "v"), col("v"), 0.0, 100.0, 10, Seq("k"))
    val got = HistogramSketch.psi(a, b, 10, Seq("k"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getAs[Long]("n_a"), r.getAs[Long]("n_b")))
    assert(got.toSeq === Seq(("x", 2L, 1L), ("y", 0L, 1L)))
  }
}
