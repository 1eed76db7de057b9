package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Anomaly

class AnomalySpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def series(vals: Seq[Double], key: String = "k") =
    vals.zipWithIndex.map { case (v, i) => (key, i.toLong, v) }
      .toDF("key", "t", "value")

  test("ewma of a constant series is that constant") {
    val out = Anomaly.withEwma(series(Seq.fill(40)(7.25)), Seq("key"), Seq("t"), "value")
      .select("ewma").collect()
    assert(out.forall(_.getDouble(0) === 7.25))
  }

  test("ewma first row equals the value; second row is the 2:1 blend") {
    val out = Anomaly.withEwma(series(Seq(10.0, 4.0)), Seq("key"), Seq("t"), "value")
      .orderBy("t").select("ewma").collect()
    assert(out(0).getDouble(0) === 10.0)
    // (4*1 + 10*0.5) / 1.5
    assert(out(1).getDouble(0) === (4.0 + 5.0) / 1.5)
  }

  test("ewma responds to a step and converges toward the new level") {
    val vals = Seq.fill(20)(1.0) ++ Seq.fill(20)(100.0)
    val out = Anomaly.withEwma(series(vals), Seq("key"), Seq("t"), "value")
      .orderBy("t").select("ewma").collect().map(_.getDouble(0))
    assert(out(19) === 1.0)
    assert(out(20) > 50.0 && out(20) < 100.0) // half-weight on the new value
    assert(out(39) > 99.9) // 16 steps after the step: tail influence < 2^-15
  }

  test("anomaly flags exactly the planted spike, not the steady state") {
    val vals = Seq.tabulate(50)(i => if (i == 40) 500.0 else 10.0 + (i % 3))
    val out = Anomaly.withAnomalyFlags(series(vals), Seq("key"), Seq("t"), "value")
      .orderBy("t").select("t", "anomaly", "trail_n").collect()
    val flagged = out.filter(_.getBoolean(1)).map(_.getLong(0)).toSeq
    assert(flagged === Seq(40L))
    // warm-up rows cannot flag
    assert(out.take(8).forall(!_.getBoolean(1)))
  }

  test("flags are per-key: a spike in one series never flags another") {
    val a = Seq.tabulate(40)(i => ("a", i.toLong, if (i == 30) 900.0 else 5.0 + (i % 2)))
    val b = Seq.tabulate(40)(i => ("b", i.toLong, 5.0 + (i % 2)))
    val out = Anomaly.withAnomalyFlags((a ++ b).toDF("key", "t", "value"),
      Seq("key"), Seq("t"), "value")
    assert(out.filter(col("anomaly")).select("key").collect().map(_.getString(0)).toSeq === Seq("a"))
  }

  /** Reference sequential CUSUM: s_i = max(0, s_{i-1} + x_i − μ − k),
    * μ = the series mean rounded to the same 4-dp grid the operator
    * uses. The window identity must reproduce it exactly. */
  private def seqCusum(vals: Seq[Double], slack: Double): Seq[Double] = {
    val mu = BigDecimal(vals.map(BigDecimal(_).setScale(4)).sum.toDouble / vals.size)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    vals.scanLeft(0.0)((s, x) => math.max(0.0, s + x - mu - slack)).tail
  }

  test("cusum window identity equals the sequential recursion") {
    val vals = Seq(10.0, 10.5, 9.5, 10.0, 14.0, 15.0, 16.0, 9.0, 10.0, 18.0, 19.0)
    val got = Anomaly.withCusum(series(vals), Seq("key"), Seq("t"), "value",
      slack = 0.5, threshold = 5.0)
      .orderBy("t").select("cusum").collect().map(_.getDouble(0)).toSeq
    val want = seqCusum(vals, 0.5)
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-9, s"$got vs $want") }
  }

  test("cusum flags a sustained level shift but not isolated noise") {
    // steady at 10 with one spike, then a sustained +3 shift
    val vals = Seq.fill(20)(10.0).updated(5, 14.0) ++ Seq.fill(20)(13.0)
    val out = Anomaly.withCusum(series(vals), Seq("key"), Seq("t"), "value",
      slack = 0.5, threshold = 8.0)
      .orderBy("t").select("t", "cusum_alert").collect()
    val alerts = out.filter(_.getBoolean(1)).map(_.getLong(0))
    assert(alerts.nonEmpty, "sustained shift must eventually alert")
    assert(alerts.min >= 20L, "no alert before the shift begins")
  }

  test("cusum resets: a below-target stretch drains the statistic to zero") {
    // mean 9.2 sits exactly on the operator's 4-dp decimal grid, so the
    // below-target tail drains the statistic all the way to 0
    val vals = Seq(20.0, 20.0, 2.0, 2.0, 2.0)
    val got = Anomaly.withCusum(series(vals), Seq("key"), Seq("t"), "value",
      slack = 0.0, threshold = 100.0)
      .orderBy("t").select("cusum").collect().map(_.getDouble(0))
    assert(got.last === 0.0)
    assert(got.forall(_ >= 0.0))
  }

  /** (key, slot, value) rows with an explicit slot column. */
  private def slotted(rows: (String, Long, Double)*) =
    rows.toDF("key", "hr", "value")

  test("seasonal deviation judges rows against their own slot, not the global mean") {
    // slot 2 runs at 100, slot 14 at 10 — a 100 at 2 am is NORMAL even
    // though it is far from the global mean; a 100 at 2 pm is anomalous
    val base = (1 to 40).flatMap(i => Seq(
      ("k", 2L, 100.0 + (i % 3)), ("k", 14L, 10.0 + (i % 3))))
    val probe = Seq(("k", 14L, 100.0))
    val out = graft.operators.Anomaly.withSeasonalDeviation(
      slotted(base ++ probe: _*), Seq("key"), col("hr"), "value",
      minN = 30, zThreshold = 3.0)
    val flagged = out.filter(col("seasonal_anomaly"))
      .select("slot", "value").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(flagged.toSeq === Seq((14L, 100.0)))
  }

  test("seasonal profile broadcasts: the stream is never hash-shuffled") {
    val base = (1 to 40).map(i => ("k", (i % 24).toLong, i.toDouble))
    val df = graft.operators.Anomaly.withSeasonalDeviation(
      slotted(base: _*), Seq("key"), col("hr"), "value")
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("BroadcastHashJoin"), "profile must broadcast-join back")
    assert(!p.contains("SortMergeJoin"), "stream must not shuffle for the profile join")
  }

  /** (key, hourIdx, eventsInThatHour) → one event row per count. */
  private def hourly(rows: (String, Int, Int)*) = {
    val h0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    rows.flatMap { case (k, h, c) =>
      (0 until c).map(i => (k, h0 + h * 3600000L + i * 1000L))
    }.toDF("key", "tms")
      .select(col("key"), timestamp_millis(col("tms")).as("ts"))
  }

  private def storm(rows: (String, Int, Int)*) =
    graft.operators.Anomaly.stormRatio(
      hourly(rows: _*), Seq("key"), "ts", "1 hour", 3600000L,
      lookback = 3, threshold = 2.0)
      .orderBy("bucket_ms")
      .collect().map(r => (r.getAs[Long]("n"), r.getAs[Long]("trail_n"),
        r.getAs[Boolean]("storm")))

  test("storm ratio flags a burst against the trailing mean, not steady load") {
    val out = storm(("k", 0, 4), ("k", 1, 4), ("k", 2, 4), ("k", 3, 4), ("k", 4, 24))
    assert(out.map(_._3).toSeq === Seq(false, false, false, false, true))
    assert(out(4) === ((24L, 12L, true))) // 24·3/12 = 6 ≥ 2
  }

  test("storm ratio range frame: absent quiet hours count as zero history") {
    // hours 0 and 1 active, hour 2 absent, burst at hour 3: trailing
    // window (hours 0-2) sums 4+4+0 — a rows-frame would instead reach
    // back to hour 0's predecessor and miss the quiet hour
    val out = storm(("k", 0, 4), ("k", 1, 4), ("k", 3, 9))
    assert(out.last === ((9L, 8L, true))) // 9·3/8 = 3.375 ≥ 2
  }

  test("storm ratio never flags the history-free head") {
    val out = storm(("k", 0, 1000))
    assert(out.toSeq === Seq((1000L, 0L, false)))
  }

  test("window is partitioned: no single-task global window in the plan") {
    val df = Anomaly.withEwma(series(Seq.fill(10)(1.0)), Seq("key"), Seq("t"), "value")
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("windowspecdefinition(t"), "window must be keyed, not global")
  }

  test("cusum ledger: fold ≡ one-shot, redelivery no-op, crash between commits converges") {
    // profile fixes μ = 10 for key 1 (values 8..12 avg 10); monitor two
    // batches with a known drift
    val profile = Seq((1L, 8.0), (1L, 12.0), (1L, 10.0))
      .zipWithIndex.map { case ((k, v), i) => (k, i.toLong, i.toLong * 10L, v) }
      .toDF("key", "eid", "ts_ms", "v")
    val mon = Seq.tabulate(12)(i =>
      (1L, 100L + i, 1000L + i * 100L, 12.0 + i))
      .toDF("key", "eid", "ts_ms", "v")
    def sl(lo: Long, hi: Long) =
      mon.filter(col("ts_ms") >= lo && col("ts_ms") < hi)
    val dir = java.nio.file.Files.createTempDirectory("cusumledg").toString
    Anomaly.writeCusumProfile(profile, Seq("key"), "v", dir)
    val fold = Anomaly.cusumLedgerBatch(dir, Seq("key"), "ts_ms", "eid",
      "v", latenessMs = 250L, slack = 0.5, threshold = 25.0)
    fold(sl(0L, 1500L), 1L)
    fold(sl(0L, 1500L), 1L) // redelivery — committed final/b1 → no-op
    fold(sl(1500L, 9999L), 2L)
    def points(): Set[Seq[Any]] = Anomaly.cusumLedgerPoints(spark, dir)
      .select("key", "_eid", "cusum", "alert").collect().map(_.toSeq).toSet
    val got = points()
    // one-shot replay: wm_final = 2100 − 250 = 1850 → eids 100..108
    // finalized; running p over x − 10 − 0.5 = 1.5, 2.5, ...
    var p = 0.0; var m = Double.MaxValue
    val want = (0 until 9).map { i =>
      p += (12.0 + i) - 10.0 - 0.5
      m = math.min(m, p)
      val s = p - math.min(m, 0.0)
      Seq[Any](1L, 100L + i, s, s > 25.0)
    }.toSet
    assert(got === want)
    // crash window: wipe final/b2 (siblings survive) and redeliver —
    // the fold recomputes from the last COMPLETE batch (b1) and
    // re-commits identical rows
    def rmTree(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rmTree); f.delete()
    }
    rmTree(new java.io.File(s"$dir/final/b2"))
    fold(sl(1500L, 9999L), 2L)
    assert(points() === got,
      "a crash between the sibling and final commits must converge")
  }
}
