package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Intervals

class IntervalsSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def iv(rows: (String, Long, Long)*) =
    rows.toDF("key", "s", "e")

  private def merged(rows: (String, Long, Long)*) =
    Intervals.mergeIntervals(iv(rows: _*), Seq("key"), "s", "e")
      .orderBy("key", "w_start")
      .select("key", "w_start", "w_end", "n_merged")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("disjoint intervals pass through unmerged") {
    assert(merged(("a", 0L, 5L), ("a", 10L, 15L)).toSeq ===
      Seq(("a", 0L, 5L, 1L), ("a", 10L, 15L, 1L)))
  }

  test("overlapping and touching intervals coalesce into one span") {
    // [0,5] overlaps [3,8]; [8,12] touches — all one island
    assert(merged(("a", 0L, 5L), ("a", 3L, 8L), ("a", 8L, 12L)).toSeq ===
      Seq(("a", 0L, 12L, 3L)))
  }

  test("a contained interval never extends its island") {
    assert(merged(("a", 0L, 100L), ("a", 10L, 20L), ("a", 150L, 160L)).toSeq ===
      Seq(("a", 0L, 100L, 2L), ("a", 150L, 160L, 1L)))
  }

  test("an early long interval swallows later starts (running-max, not lag)") {
    // [0,50] then [10,20] then [30,40]: lag(end) would see 20 < 30 and
    // wrongly break; the running MAX keeps the island open
    assert(merged(("a", 0L, 50L), ("a", 10L, 20L), ("a", 30L, 40L)).toSeq ===
      Seq(("a", 0L, 50L, 3L)))
  }

  test("keys are isolated from each other") {
    assert(merged(("a", 0L, 10L), ("b", 5L, 15L)).toSeq ===
      Seq(("a", 0L, 10L, 1L), ("b", 5L, 15L, 1L)))
  }

  test("identical duplicate intervals merge") {
    assert(merged(("a", 3L, 9L), ("a", 3L, 9L)).toSeq === Seq(("a", 3L, 9L, 2L)))
  }

  test("merge is partitioning-insensitive") {
    val rows = (0 until 500).map { i =>
      val k = s"k${i % 7}"
      val s0 = (i * 37L) % 1000
      (k, s0, s0 + 20 + (i % 60))
    }
    val one = Intervals.mergeIntervals(rows.toDF("key", "s", "e").coalesce(1), Seq("key"), "s", "e")
    val many = Intervals.mergeIntervals(rows.toDF("key", "s", "e").repartition(13), Seq("key"), "s", "e")
    assert(one.orderBy("key", "w_start").collect().toSeq ===
      many.orderBy("key", "w_start").collect().toSeq)
  }

  test("window + groupBy share one exchange (groupBy keys extend the window's)") {
    val df = Intervals.mergeIntervals(
      iv(("a", 0L, 5L), ("a", 3L, 8L), ("b", 1L, 2L)), Seq("key"), "s", "e")
    val plan = df.queryExecution.executedPlan.toString
    val n = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(n === 1, s"expected a single hash exchange, plan:\n$plan")
  }

  test("outage ledger: fold ≡ batch merge, redelivery no-op, crash between commits converges") {
    val alarms = Seq(
      (1L, 0L, 50L), (1L, 40L, 90L), (1L, 200L, 250L), (1L, 400L, 460L),
      (2L, 10L, 20L), (2L, 15L, 120L), (2L, 300L, 310L), (1L, 480L, 500L))
      .toDF("site_id", "start_ms", "end_ms")
    def sl(lo: Long, hi: Long) =
      alarms.filter(col("start_ms") >= lo && col("start_ms") < hi)
    val dir = java.nio.file.Files.createTempDirectory("outledg").toString
    val fold = Intervals.outageLedgerBatch(dir, latenessMs = 100L)
    fold(sl(0L, 150L), 1L)
    fold(sl(150L, 350L), 2L)
    fold(sl(150L, 350L), 2L) // redelivery: committed final/b2 → no-op
    fold(sl(350L, 999L), 3L)
    def windows(p: String) = Intervals.outageLedgerWindows(spark, p)
      .select("site_id", "w_start", "w_end", "n_merged", "finalized")
      .collect().map(_.toSeq).toSet
    val got = windows(dir)
    // read ≡ one-shot batch merge over the whole history, counts included
    val want = Intervals.mergeIntervals(
      alarms.select(col("site_id"), col("start_ms").as("s"), col("end_ms").as("e")),
      Seq("site_id"), "s", "e")
      .select("site_id", "w_start", "w_end", "n_merged").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got.map(s => (s(0), s(1), s(2), s(3))) === want)
    // watermark after batch 3 = 480 - 100 = 380: site 1's [400,460]
    // and [480,500] (disjoint islands) both stay open, everything
    // earlier is final
    assert(got.exists(s => s(1) === 400L && s(4) === false))
    assert(got.count(_(4) == false) === 2)
    // crash window: final committed, state of the NEXT attempt skipped —
    // simulate the other order too: wipe final/b3 (state/b3 survives)
    // and redeliver; the fold recomputes from state/b2 and re-commits
    // the identical final rows
    val fs = new java.io.File(s"$dir/final/b3")
    def rmTree(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rmTree)
      f.delete()
    }
    rmTree(fs)
    fold(sl(350L, 999L), 3L)
    assert(windows(dir) === got,
      "a crash between the state and final commits must converge on redelivery")
  }

  test("outage read gates on final-LAST: a half-crashed state commit is never read") {
    val alarms = Seq(
      (1L, 0L, 50L), (1L, 40L, 90L), (1L, 200L, 250L), (2L, 10L, 20L))
      .toDF("site_id", "start_ms", "end_ms")
    val dir = java.nio.file.Files.createTempDirectory("outcrash").toString
    val fold = Intervals.outageLedgerBatch(dir, latenessMs = 100L)
    fold(alarms.filter(col("start_ms") < 150L), 1L)
    fold(alarms.filter(col("start_ms") >= 150L), 2L)
    def windows() = Intervals.outageLedgerWindows(spark, dir)
      .select("site_id", "w_start", "w_end", "n_merged", "finalized")
      .collect().map(_.toSeq).toSet
    val before = windows()
    // simulate batch 3 crashing BETWEEN its state and final commits:
    // state/b3 exists (with a different view — all prior opens dropped
    // as if finalized), final/b3 does not. The read must keep serving
    // the batch-2-complete view, not transiently drop those windows.
    graft.operators.LedgerFiles.atomicAppendAt(spark, dir, "state",
      Seq((-1L, 0L, 0L, 0L, 999999L))
        .toDF("site_id", "w_start", "w_end", "n_merged", "wm"), 3L)
    assert(windows() === before,
      "a state/b<k> without its final/b<k> sibling must be invisible to reads")
  }

  test("downtimeStats sums coalesced spans and reports availability") {
    val m = Intervals.mergeIntervals(
      iv(("a", 0L, 50L), ("a", 100L, 130L), ("b", 0L, 10L)), Seq("key"), "s", "e")
    val out = Intervals.downtimeStats(m, Seq("key"), lit(0L), lit(200L))
      .orderBy("key")
      .select("key", "downtime", "n_windows", "longest", "availability")
      .collect()
    assert(out(0).getString(0) === "a")
    assert(out(0).getLong(1) === 80L)
    assert(out(0).getLong(2) === 2L)
    assert(out(0).getLong(3) === 50L)
    assert(out(0).getDouble(4) === 1.0 - 80.0 / 200.0)
    assert(out(1).getString(0) === "b")
    assert(out(1).getDouble(4) === 1.0 - 10.0 / 200.0)
  }
}
