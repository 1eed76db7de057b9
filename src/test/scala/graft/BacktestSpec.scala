package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Backtest

class BacktestSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private val h0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime

  /** One reading per hour for `days` days: value = f(dayIdx, hourIdx). */
  private def series(days: Int)(f: (Int, Int) => Double) =
    (for (d <- 0 until days; h <- 0 until 24)
      yield ("k", h0 + (d * 24L + h) * 3600000L, f(d, h)))
      .toDF("key", "tms", "value")
      .select(col("key"), timestamp_millis(col("tms")).as("ts"), col("value"))

  private def run(df: org.apache.spark.sql.DataFrame) =
    Backtest.seasonalNaive(df, Seq("key"), "ts", col("value"),
      step = "1 hour", periodMs = 86400000L,
      origins = Seq((1L, "2024-01-03", "2024-01-04"), (2L, "2024-01-04", "2024-01-05")))
      .orderBy("fold")
      .collect().map(r => (r.getLong(0), r.getAs[Long]("n"),
        r.getAs[Double]("rmse"), r.getAs[Double]("mae")))

  test("a perfectly daily-periodic series backtests to zero error") {
    val out = run(series(5)((_, h) => 10.0 + h))
    assert(out.length === 2)
    out.foreach { case (_, n, rmse, mae) =>
      assert(n === 24L); assert(rmse === 0.0); assert(mae === 0.0)
    }
  }

  test("a constant day-over-day drift scores exactly that offset") {
    // value = 3·day + hour → ŷ(t) = y(t−1d) is always 3 under
    val out = run(series(5)((d, h) => 3.0 * d + h))
    out.foreach { case (_, n, rmse, mae) =>
      assert(n === 24L)
      assert(math.abs(rmse - 3.0) < 1e-9)
      assert(math.abs(mae - 3.0) < 1e-9)
    }
  }

  test("folds score only their own window") {
    // Jan 3 (day idx 2) is corrupted; fold 1 (scoring Jan 3) sees the
    // error as the ACTUAL, fold 2 (scoring Jan 4 against Jan 3) sees it
    // as the PREDICTION error
    val out = run(series(5)((d, h) => if (d == 2) 100.0 else 10.0))
    val byFold = out.map(o => o._1 -> o._3).toMap
    assert(byFold(1L) === 90.0) // actual 100 vs naive 10
    assert(byFold(2L) === 90.0) // actual 10 vs naive 100
  }

  test("buckets missing their seasonal ancestor drop out of the score (inner join)") {
    // only 2 days of data: fold windows beyond day 1 have no lag rows
    val out = Backtest.seasonalNaive(
      series(2)((_, h) => h.toDouble), Seq("key"), "ts", col("value"),
      "1 hour", 86400000L, Seq((1L, "2024-01-02", "2024-01-03")))
      .collect()
    assert(out.length === 1 && out.head.getAs[Long]("n") === 24L)
    val none = Backtest.seasonalNaive(
      series(1)((_, h) => h.toDouble), Seq("key"), "ts", col("value"),
      "1 hour", 86400000L, Seq((1L, "2024-01-02", "2024-01-03")))
      .collect()
    assert(none.isEmpty)
  }
}
