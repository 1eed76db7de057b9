package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Funnel

class FunnelSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private val steps = Seq("a", "b", "c")

  private def ev(rows: (Long, Long, String)*) =
    rows.toDF("u", "tms", "et")
      .select(col("u"), timestamp_millis(col("tms")).as("ts"), col("et"))

  private def times(rows: (Long, Long, String)*) =
    Funnel.completionTimes(ev(rows: _*), col("u"), col("ts"), col("et"), steps)
      .orderBy("user").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))

  test("in-order events complete every step at the right times") {
    val out = times((1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"))
    assert(out.toSeq === Seq((1L, Some(10L), Some(20L), Some(30L))))
  }

  test("out-of-order steps do not count: b before a is not a conversion") {
    val out = times((1L, 20L, "b"), (1L, 30L, "a"))
    assert(out.toSeq === Seq((1L, Some(30L), None, None)))
  }

  test("a simultaneous event is not strictly after and does not convert") {
    val out = times((1L, 10L, "a"), (1L, 10L, "b"))
    assert(out.toSeq === Seq((1L, Some(10L), None, None)))
  }

  test("the earliest qualifying event wins each step") {
    val out = times((1L, 10L, "a"), (1L, 5L, "b"), (1L, 15L, "b"), (1L, 25L, "b"))
    assert(out.toSeq === Seq((1L, Some(10L), Some(15L), None)))
  }

  test("steps can complete through interleaved repeats") {
    // a@10, b@5 (ignored), c@12 (before b — ignored), b@20, c@30
    val out = times((1L, 10L, "a"), (1L, 5L, "b"), (1L, 12L, "c"),
      (1L, 20L, "b"), (1L, 30L, "c"))
    assert(out.toSeq === Seq((1L, Some(10L), Some(20L), Some(30L))))
  }

  test("funnelCounts reports per-step users and conversion vs step 1") {
    val rows = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"), // full funnel
      (2L, 10L, "a"), (2L, 20L, "b"),                 // stops at b
      (3L, 10L, "a"),                                 // stops at a
      (4L, 10L, "b")                                  // never starts
    )
    val got = Funnel.funnelCounts(ev(rows: _*), col("u"), col("ts"), col("et"), steps)
      .orderBy("step").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq(
      (1L, "a", 3L, 1.0),
      (2L, "b", 2L, 2.0 / 3.0),
      (3L, "c", 1L, 1.0 / 3.0)))
  }

  test("funnel evaluation is partition-insensitive") {
    val rows = (1 to 300).flatMap { u =>
      Seq((u.toLong, (u * 7 % 50).toLong, "a"), (u.toLong, (u * 13 % 60).toLong, "b"),
        (u.toLong, (u * 29 % 70).toLong, "c"))
    }
    val one = Funnel.funnelCounts(ev(rows: _*).coalesce(1), col("u"), col("ts"), col("et"), steps)
    val many = Funnel.funnelCounts(ev(rows: _*).repartition(11), col("u"), col("ts"), col("et"), steps)
    assert(one.orderBy("step").collect().toSeq === many.orderBy("step").collect().toSeq)
  }
}
