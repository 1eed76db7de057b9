package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Profiler

class ProfilerSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private val df = Seq(
    (Some(3L), Some("b")),
    (Some(1L), Some("a")),
    (Some(1L), None),
    (None, Some("a")),
    (Some(10L), Some("b"))
  ).toDF("num", "str")

  private def row(name: String) =
    Profiler.profile(df, Seq("num", "str")).filter(col("column_name") === name)
      .select("n_rows", "n_null", "null_rate", "n_distinct",
        "min_val", "max_val", "mode_val", "mode_cnt")
      .collect().head

  test("null counting, exact distinct, and rates") {
    val n = row("num")
    assert((n.getLong(0), n.getLong(1), n.getDouble(2), n.getLong(3)) ===
      ((5L, 1L, 0.2, 3L)))
    val s = row("str")
    assert((s.getLong(0), s.getLong(1), s.getLong(3)) === ((5L, 1L, 2L)))
  }

  test("min/max use the native ordering, not the string rendering") {
    // string-cast ordering would give max "3" (since "3" > "10")
    val n = row("num")
    assert(n.getString(4) === "1" && n.getString(5) === "10")
  }

  test("mode is the most frequent value, ties broken by smallest value") {
    val n = row("num")
    assert(n.getString(6) === "1" && n.getLong(7) === 2L)
    // str: "a" ×2 vs "b" ×2 — tie, smallest value wins
    val s = row("str")
    assert(s.getString(6) === "a" && s.getLong(7) === 2L)
  }

  test("an all-null column profiles with null mode and min/max") {
    val d2 = Seq((Option.empty[Long], 1L), (None, 2L)).toDF("n", "k")
    val out = Profiler.profile(d2, Seq("n")).collect().head
    assert(out.getAs[Long]("n_null") === 2L)
    assert(out.getAs[Long]("n_distinct") === 0L)
    assert(out.isNullAt(out.fieldIndex("mode_val")))
    assert(out.isNullAt(out.fieldIndex("min_val")))
  }
}
