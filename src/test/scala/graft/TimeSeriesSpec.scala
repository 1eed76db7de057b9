package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TimeSeries
import graft.core.OracleCompat.dsum

class TimeSeriesSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOfJoin never picks a future row, matches hand-computed result") {
    val left = Seq(
      (1L, "a", ts("2024-01-01 10:00:00")),
      (2L, "a", ts("2024-01-01 12:00:00")),
      (3L, "b", ts("2024-01-01 09:00:00"))).toDF("id", "k", "ts")
    val right = Seq(
      ("a", ts("2024-01-01 09:30:00"), 10.0),
      ("a", ts("2024-01-01 11:00:00"), 20.0),
      ("a", ts("2024-01-01 13:00:00"), 99.0), // future for both left rows
      ("b", ts("2024-01-01 09:00:00"), 7.0)   // exactly simultaneous
    ).toDF("k", "rts", "v")
    val out = TimeSeries.asOfJoin(left, right, Seq("k"), "ts", "rts", Seq("v"))
      .select("id", "v_asof").collect().map(r => r.getLong(0) -> r.get(1)).toMap
    assert(out(1L) === 10.0) // 09:30 row, not 11:00
    assert(out(2L) === 20.0) // 11:00 row, not 13:00
    assert(out(3L) === 7.0)  // simultaneous right row is visible
  }

  test("asOfJoin returns the latest right ROW even when its value is null") {
    // regression: per-column ignoreNulls used to mix the timestamp of
    // one right row with the value of an earlier one
    val left = Seq((1L, "a", ts("2024-01-01 12:00:00"))).toDF("id", "k", "ts")
    val right = Seq(
      ("a", ts("2024-01-01 10:00:00"), Some(5.0)),
      ("a", ts("2024-01-01 11:00:00"), None: Option[Double])).toDF("k", "rts", "v")
    val out = TimeSeries.asOfJoin(left, right, Seq("k"), "ts", "rts", Seq("v")).collect().head
    assert(out.getAs[Timestamp]("_asof_ts") === ts("2024-01-01 11:00:00"))
    assert(out.isNullAt(out.fieldIndex("v_asof")), "value must come from the SAME (latest) row")
  }

  test("asOfJoin yields null when no prior right row exists") {
    val left = Seq((1L, "a", ts("2024-01-01 08:00:00"))).toDF("id", "k", "ts")
    val right = Seq(("a", ts("2024-01-01 09:00:00"), 5.0)).toDF("k", "rts", "v")
    val out = TimeSeries.asOfJoin(left, right, Seq("k"), "ts", "rts", Seq("v")).collect()
    assert(out.length === 1 && out.head.isNullAt(out.head.fieldIndex("v_asof")))
  }

  test("interpolate is identity on a gap-free hourly series") {
    val df = (0 until 5).map(h => ("a", ts(f"2024-01-01 0$h:00:00"), h * 10.0))
      .toDF("k", "ts", "v")
    val out = TimeSeries.interpolate(df, "k", "ts", "v")
      .orderBy("grid_ts").select("value_interp").as[Double].collect()
    assert(out.toSeq === Seq(0.0, 10.0, 20.0, 30.0, 40.0))
  }

  test("interpolate fills an interior gap linearly and edges by carry") {
    // observations at hours 0 and 3 only; hours 1,2 interpolate linearly
    val df = Seq(("a", ts("2024-01-01 00:00:00"), 0.0),
      ("a", ts("2024-01-01 03:00:00"), 30.0)).toDF("k", "ts", "v")
    val out = TimeSeries.interpolate(df, "k", "ts", "v")
      .orderBy("grid_ts").select("value_interp").as[Double].collect()
    assert(out.toSeq === Seq(0.0, 10.0, 20.0, 30.0))
  }

  test("bucketed asOfJoin: identical to unbucketed on a pathologically skewed key") {
    // hot key "hot" carries 90% of both sides, spread over 20 days — the
    // daily bucketing must split its window work across >1 hash group
    // (the unbucketed form serializes the key into ONE task)
    val left = ((0 until 900).map { i =>
      (i.toLong, "hot", ts(f"2024-01-${1 + i % 20}%02d ${i % 24}%02d:15:00"))
    } ++ (900 until 1000).map { i =>
      (i.toLong, s"cold${i % 10}", ts(f"2024-01-${1 + i % 20}%02d ${i % 24}%02d:15:00"))
    }).toDF("id", "k", "ts")
    val right = ((0 until 450).map { i =>
      ("hot", ts(f"2024-01-${1 + i % 20}%02d ${(i * 7) % 24}%02d:00:00"), i.toDouble)
    } ++ (0 until 50).map { i =>
      (s"cold${i % 10}", ts(f"2024-01-${1 + i % 20}%02d ${(i * 7) % 24}%02d:00:00"), -i.toDouble)
    }).toDF("k", "rts", "v")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id"), col("_asof_ts").cast("string"), col("v_asof"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.get(2))).toSet
    val plain = rows(TimeSeries.asOfJoin(left, right, Seq("k"), "ts", "rts", Seq("v")))
    val bucketed = TimeSeries.asOfJoinBucketed(left, right, Seq("k"), "ts", "rts", Seq("v"))
    assert(rows(bucketed) === plain)
    // the hot key's window work is really split: >1 (key, bucket) group
    val hotGroups = left.filter(col("k") === "hot")
      .select(date_trunc("day", col("ts"))).distinct().count()
    assert(hotGroups > 1, s"fixture must span multiple buckets, got $hotGroups")
    val windowPlan = bucketed.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w.partitionSpec.length
    }
    assert(windowPlan.contains(2), s"main window must partition by (key, bucket): $windowPlan")
  }

  test("bucketed interpolate: identical to unbucketed on a pathologically skewed key") {
    // hot key = 95% of observations, clumped on Jan 1-5 and Jan 25-29:
    // the hourly grid spans the 3-week hole, so every grid point in the
    // empty middle weeks needs prev/next carried across EMPTY buckets
    // in both directions
    val df = ((0 until 950).map { i =>
      val day = if (i % 2 == 0) 1 + i % 5 else 25 + i % 5
      ("hot", ts(f"2024-01-$day%02d ${i % 24}%02d:30:00"), (i % 37).toDouble)
    } ++ (0 until 50).map { i =>
      (s"cold${i % 5}", ts(f"2024-01-${1 + i % 20}%02d ${i % 24}%02d:30:00"), i.toDouble)
    }).toDF("k", "ts", "v")
    def rows(d: org.apache.spark.sql.DataFrame) = d
      .select(col("k"), col("grid_ts").cast("string"), col("value_interp"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    val plain = rows(TimeSeries.interpolate(df, "k", "ts", "v"))
    val bucketed = TimeSeries.interpolateBucketed(df, "k", "ts", "v")
    assert(rows(bucketed) === plain)
    val windowPlan = bucketed.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w.partitionSpec.length
    }
    assert(windowPlan.contains(2), s"grid windows must partition by (key, bucket): $windowPlan")
  }

  test("sessionize merges within gap and splits across it") {
    val df = Seq(
      ("u", ts("2024-01-01 10:00:00"), 1.0),
      ("u", ts("2024-01-01 10:10:00"), 1.0), // same session (10 min gap)
      ("u", ts("2024-01-01 11:30:00"), 1.0)  // new session (80 min gap)
    ).toDF("user_id", "ts", "value")
    val out = TimeSeries.sessionize(df, "user_id", "ts", "30 minutes",
      Seq(count(lit(1)).as("n"), dsum(col("value")).as("s")))
      .orderBy("session_start").collect()
    assert(out.length === 2)
    assert(out(0).getAs[Long]("n") === 2)
    assert(out(1).getAs[Long]("n") === 1)
  }

  test("sequenceWindows emits only complete windows, in order") {
    val df = (1 to 5).map(i => ("a", ts(f"2024-01-01 0$i:00:00"), i.toDouble))
      .toDF("k", "ts", "v")
    val out = TimeSeries.sequenceWindows(df, "k", "ts", "v", k = 3)
      .orderBy("ts").select("seq").as[Seq[Double]].collect()
    assert(out.length === 3)
    assert(out.head === Seq(1.0, 2.0, 3.0))
    assert(out.last === Seq(3.0, 4.0, 5.0))
  }

  test("rolling average of a constant series is constant (resample)") {
    val df = (0 until 24).map(h => ("a", ts(f"2024-01-01 $h%02d:30:00"), 5.0))
      .toDF("k", "ts", "v")
    val out = TimeSeries.resample(df, Seq("k"), "ts", "1 hour",
      Seq(dsum(col("v")).as("s"), count(lit(1)).as("n")))
    assert(out.select("s").as[Double].collect().forall(_ === 5.0))
  }
}
