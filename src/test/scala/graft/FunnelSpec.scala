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

  test("transition matrix counts adjacent pairs per user with row-stochastic probabilities") {
    val rows = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), // a→b, b→a
      (2L, 1L, "a"), (2L, 2L, "b"),                 // a→b
      (3L, 5L, "c")                                  // lone event: no pair
    )
    val got = Funnel.transitionMatrix(ev(rows: _*), col("u"), col("ts"), col("et"))
      .orderBy("from_type", "to_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq(("a", "b", 2L, 1.0), ("b", "a", 1L, 1.0)))
  }

  test("transition matrix never crosses user boundaries") {
    // user 1 ends with 'b', user 2 starts with 'c': no b→c pair
    val rows = Seq((1L, 1L, "a"), (1L, 2L, "b"), (2L, 3L, "c"), (2L, 4L, "d"))
    val got = Funnel.transitionMatrix(ev(rows: _*), col("u"), col("ts"), col("et"))
      .select("from_type", "to_type").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("a", "b"), ("c", "d")))
  }

  test("transition probabilities sum to 1 per source state") {
    val rows = (1 to 200).map(i => (i.toLong % 10, i.toLong, Seq("a", "b", "c")(i % 3)))
    val sums = Funnel.transitionMatrix(ev(rows: _*), col("u"), col("ts"), col("et"))
      .groupBy("from_type").agg(sum("p").as("s"))
      .collect().map(_.getDouble(1))
    assert(sums.forall(s => math.abs(s - 1.0) < 1e-9))
  }
}
