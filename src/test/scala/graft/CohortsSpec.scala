package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Cohorts

class CohortsSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  // Mondays: 2024-01-01, -08, -15 (all UTC)
  private def ev(rows: (Long, String)*) =
    rows.toDF("user_id", "t").select(col("user_id"), col("t").cast("timestamp").as("ts"))

  private val events = ev(
    (1L, "2024-01-01 10:00:00"), (1L, "2024-01-09 10:00:00"), // w0, w1
    (2L, "2024-01-03 10:00:00"),                               // w0 only
    (3L, "2024-01-02 10:00:00"), (3L, "2024-01-16 10:00:00"), // w0, w2
    (4L, "2024-01-10 10:00:00"), (4L, "2024-01-15 10:00:00")  // cohort w1: w0, w1
  )

  private def matrix =
    Cohorts.retention(events, col("user_id"), col("ts"))
      .orderBy("cohort_ms", "week_offset")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

  private val w0 = 1704067200000L // 2024-01-01 (Monday) epoch millis
  private val w1 = w0 + 604800000L

  test("cohorts are keyed by first-seen week; offsets count distinct actives") {
    assert(matrix.toSeq === Seq(
      (w0, 0L, 3L, 1.0),       // users 1,2,3 first seen in w0
      (w0, 1L, 1L, 1.0 / 3.0), // only user 1 returns in w1
      (w0, 2L, 1L, 1.0 / 3.0), // only user 3 in w2
      (w1, 0L, 1L, 1.0),       // user 4's cohort
      (w1, 1L, 1L, 1.0)))      // user 4 stays active
  }

  test("week-0 retention is always exactly 1.0") {
    assert(matrix.filter(_._2 == 0L).forall(_._4 === 1.0))
  }

  test("a user appears only under its own cohort") {
    // user 4 is active in calendar week w1 and w2 but belongs to cohort
    // w1 — the w0 cohort rows must never count it
    val w0Total = matrix.filter(_._1 == w0).map(_._3).sum
    assert(w0Total === 5L) // 3 + 1 + 1, no leakage from user 4
  }

  test("multiple events in one week count once") {
    val doubled = events.union(events)
    val m2 = Cohorts.retention(doubled, col("user_id"), col("ts"))
      .orderBy("cohort_ms", "week_offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(m2.toSeq === matrix.toSeq)
  }
}
