package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Regression

class RegressionSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime

  /** (key, secondsFromEpochStart, value) rows. */
  private def series(rows: (String, Long, Double)*) =
    rows.toDF("k", "s", "v")
      .select(col("k"), timestamp_millis(col("s") * 1000 + t0).as("ts"), col("v"))

  private def fit(rows: (String, Long, Double)*) =
    Regression.trendPerKey(series(rows: _*), Seq("k"), "ts", col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]),
          Option(r.get(3)).map(_.asInstanceOf[Double]),
          Option(r.get(4)).map(_.asInstanceOf[Double])))
      .toMap

  test("an exact line recovers its slope, intercept, and r² = 1") {
    // v = 2·(s/86400) + 5  →  slope_per_day = 2, intercept = 5 at s=0
    val rows = (0 to 10).map(i => ("k", i * 8640L, 2.0 * i * 8640 / 86400 + 5.0))
    val (n, slope, icept, r2) = fit(rows: _*)("k")
    assert(n === 11L)
    assert(slope.get === 2.0)
    assert(icept.get === 5.0)
    assert(r2.get === 1.0)
  }

  test("a flat series has zero slope and NULL r² (zero y-variance)") {
    val (n, slope, _, r2) = fit(("k", 0L, 7.0), ("k", 100L, 7.0), ("k", 200L, 7.0))("k")
    assert(n === 3L)
    assert(slope.get === 0.0)
    assert(r2.isEmpty, "dyy = 0 must yield NULL r², not an ANSI error")
  }

  test("degenerate groups (n = 1, or zero x-variance) yield NULL fits") {
    val out = fit(("solo", 50L, 9.0), ("same_t", 10L, 1.0), ("same_t", 10L, 5.0))
    assert(out("solo")._2.isEmpty && out("solo")._4.isEmpty)
    assert(out("same_t")._2.isEmpty, "dxx = 0 must yield NULL slope")
  }

  test("the fit is partition-count-insensitive") {
    val rows = (0 until 200).map(i => ("k", i * 97L, (i % 13) * 1.5 + i * 0.01))
    def run(parts: Int) =
      Regression.trendPerKey(
        series(rows: _*).repartition(parts), Seq("k"), "ts", col("v"))
        .collect().head.toSeq
    assert(run(1) === run(13))
  }
}
