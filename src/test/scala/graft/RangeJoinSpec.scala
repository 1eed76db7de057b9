package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  test("binned join equals brute-force BETWEEN, including boundaries and bin straddles") {
    val intervals = Seq(
      (1L, "2024-01-01", "2024-01-03"),  // within one bin
      (2L, "2024-01-05", "2024-01-09"),  // straddles a 7-day bin edge
      (3L, "2024-02-01", "2024-02-01"),  // single-day
      (4L, "2024-03-10", "2024-03-01")   // inverted: matches nothing
    ).toDF("iv_id", "s", "e")
      .select(col("iv_id"), col("s").cast("date").as("s"), col("e").cast("date").as("e"))
    val points = (0 until 90).toDF("i")
      .select(date_add(lit("2024-01-01").cast("date"), col("i")).as("p"))

    val got = RangeJoin.pointInInterval(points, "p", intervals, "s", "e", 7)
      .select("iv_id", "p").as[(Long, java.sql.Date)].collect().toSet
    val brute = intervals.crossJoin(points)
      .filter(col("p").between(col("s"), col("e")))
      .select("iv_id", "p").as[(Long, java.sql.Date)].collect().toSet

    assert(got === brute)
    assert(brute.exists(_._1 == 2L), "straddling interval must match")
    assert(!got.exists(_._1 == 4L), "inverted interval must match nothing")
    assert(got.count(_._1 == 3L) === 1, "single-day boundary is inclusive")
  }

  test("open-ended sentinel interval clamps to the point range instead of exploding") {
    val intervals = Seq((1L, "2024-01-10", "9999-12-31")).toDF("iv_id", "s", "e")
      .select(col("iv_id"), col("s").cast("date").as("s"), col("e").cast("date").as("e"))
    val points = (0 until 30).toDF("i")
      .select(date_add(lit("2024-01-01").cast("date"), col("i")).as("p"))
    val joined = RangeJoin.pointInInterval(points, "p", intervals, "s", "e", 7)
    // correct matches: Jan 10-30 inclusive = 21 points
    assert(joined.count() === 21)
    // and the interval side exploded onto a handful of bins, not ~400k:
    // count the exploded bin rows via the same clamp+sequence arithmetic
    val binRows = intervals
      .crossJoin(points.agg(min(col("p")).as("mn"), max(col("p")).as("mx")))
      .select(explode(sequence(
        floor(datediff(greatest(col("s"), col("mn")), lit("1970-01-01").cast("date")) / 7),
        floor(datediff(least(col("e"), col("mx")), lit("1970-01-01").cast("date")) / 7))))
      .count()
    assert(binRows <= 5, s"expected a handful of bins, got $binRows")
  }

  test("anti form keeps exactly the points outside every interval, rows intact") {
    val intervals = Seq(("2024-01-05", "2024-01-10"), ("2024-01-08", "2024-01-12"))
      .toDF("s", "e")
      .select(col("s").cast("date").as("s"), col("e").cast("date").as("e"))
    val points = (0 until 20).toDF("i")
      .select(col("i").cast("long").as("id"),
        date_add(lit("2024-01-01").cast("date"), col("i")).as("p"),
        concat(lit("x"), col("i")).as("payload"))
    val out = RangeJoin.antiPointInInterval(points, "p", intervals, "s", "e")
      .orderBy("id").collect()
    // suppressed: Jan 5-12 inclusive = ids 4..11; survivors keep payload
    assert(out.map(_.getLong(0)).toSeq === ((0 to 3) ++ (12 to 19)).map(_.toLong))
    assert(out.forall(r => r.getString(2) == s"x${r.getLong(0)}"))
    // a point inside TWO overlapping windows is dropped once, not twice
    assert(out.length === 12)
  }

  test("anti form keeps null-dated points, matching NOT EXISTS") {
    val intervals = Seq(("2024-01-01", "2024-12-31")).toDF("s", "e")
      .select(col("s").cast("date").as("s"), col("e").cast("date").as("e"))
    val points = Seq((1L, "2024-06-01"), (2L, null), (3L, "2025-06-01"))
      .toDF("id", "ps").select(col("id"), col("ps").cast("date").as("p"))
    val out = RangeJoin.antiPointInInterval(points, "p", intervals, "s", "e")
      .select("id").as[Long].collect().sorted
    assert(out.toSeq === Seq(2L, 3L)) // covered date dropped; null + outside kept
  }

  test("anti form with no intervals is the identity") {
    val intervals = Seq.empty[(java.sql.Date, java.sql.Date)].toDF("s", "e")
    val points = (0 until 5).toDF("i")
      .select(col("i").cast("long").as("id"),
        date_add(lit("2024-01-01").cast("date"), col("i")).as("p"))
    val out = RangeJoin.antiPointInInterval(points, "p", intervals, "s", "e")
    assert(out.count() === 5)
  }

  test("anti form with all-null point dates does not explode SCD sentinels") {
    // With no non-null point date the bounds row is (NULL, NULL); the
    // null-bounds guard must keep the open-ended 9999-12-31 interval
    // from generating a ~2.9M-day sequence, and all points survive.
    val intervals = Seq(("2024-01-01", "9999-12-31")).toDF("s", "e")
      .select(col("s").cast("date").as("s"), col("e").cast("date").as("e"))
    val points = Seq((1L, null: String), (2L, null: String)).toDF("id", "ps")
      .select(col("id"), col("ps").cast("date").as("p"))
    val t0 = System.nanoTime()
    val out = RangeJoin.antiPointInInterval(points, "p", intervals, "s", "e")
      .select("id").as[Long].collect().sorted
    assert(out.toSeq === Seq(1L, 2L))
    assert((System.nanoTime() - t0) < 30e9, "sentinel interval exploded")
  }

  test("anti form with empty points side returns empty, fast") {
    val intervals = Seq(("2024-01-01", "9999-12-31")).toDF("s", "e")
      .select(col("s").cast("date").as("s"), col("e").cast("date").as("e"))
    val points = Seq.empty[(Long, java.sql.Date)].toDF("id", "p")
    assert(RangeJoin.antiPointInInterval(points, "p", intervals, "s", "e")
      .count() === 0)
  }
}
