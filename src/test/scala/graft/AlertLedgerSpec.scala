package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.StreamingOps

/** Laws of the ledgered ST6 threshold-alert fold (r18): fold ≡ one-shot
  * crossing detection, watermark gating, redelivery no-op, crash
  * convergence, threshold frozen with the relation. */
class AlertLedgerSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  test("alert ledger: fold ≡ one-shot crossings, redelivery no-op, crash converges") {
    // key 1: 3,12,14,2,30,1 → BREACH@12, RECOVER@2, BREACH@30, RECOVER@1
    val vals = Seq(3.0, 12.0, 14.0, 2.0, 30.0, 1.0, 7.0)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      (1L, 100L + i, 1000L + i * 100L, v)
    }.toDF("key", "eid", "ts_ms", "v")
    def sl(lo: Long, hi: Long) =
      rows.filter(col("ts_ms") >= lo && col("ts_ms") < hi)
    val dir = java.nio.file.Files.createTempDirectory("alertledg").toString
    StreamingOps.writeAlertLedger(spark, dir, threshold = 10.0)
    val fold = StreamingOps.alertLedgerBatch(dir, Seq("key"), "ts_ms",
      "eid", "v", latenessMs = 250L)
    fold(sl(0L, 1400L), 1L)
    fold(sl(0L, 1400L), 1L) // redelivery — committed final/b1 → no-op
    fold(sl(1400L, 9999L), 2L)
    def alerts(): Set[(Long, Long, String)] =
      StreamingOps.alertLedgerAlerts(spark, dir)
        .select(col("key"), col("_eid"), col("kind"))
        .as[(Long, Long, String)].collect().toSet
    val got = alerts()
    // wm_final = 1600 − 250 = 1350 → eids 100..103 finalized only:
    // BREACH@101, RECOVER@103; the BREACH@104 (ts 1400) stays buffered
    assert(got === Set((1L, 101L, "BREACH"), (1L, 103L, "RECOVER")))
    // crash window: wipe final/b2 (siblings survive) and redeliver
    def rmTree(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rmTree); f.delete()
    }
    rmTree(new java.io.File(s"$dir/final/b2"))
    fold(sl(1400L, 9999L), 2L)
    assert(alerts() === got,
      "a crash between the sibling and final commits must converge")
    // a later batch finalizes the buffered crossing against the carried
    // in-breach state — no duplicate, no loss
    val late = Seq((1L, 200L, 2500L, 5.0)).toDF("key", "eid", "ts_ms", "v")
    fold(late, 3L)
    assert(alerts() === got +
      ((1L, 104L, "BREACH")) + ((1L, 105L, "RECOVER")),
      "the watermark advance must finalize buffered crossings exactly once")
  }
}
