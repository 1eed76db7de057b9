package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.CountMin

class CountMinSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private val (depth, width) = (4, 64)

  private val rows: Seq[(String, String)] = Seq(
    "a" -> 5, "b" -> 3, "c" -> 2, "d" -> 1, "e" -> 1
  ).flatMap { case (k, n) => Seq.fill(n)(k) }
    .zipWithIndex.map { case (k, i) => (if (i % 2 == 0) "s1" else "s2", k) }

  private def df = rows.toDF("src", "key")

  private def sketchRows(s: org.apache.spark.sql.DataFrame) =
    s.select("depth", "bucket", "cnt").as[(Long, Long, Long)].collect().toSet

  test("estimates never under-count and are exact absent collisions") {
    val sk = CountMin.build(df, col("key"), depth, width)
    val truth = df.groupBy("key").agg(count(lit(1)).as("true_cnt"))
    val est = CountMin.estimate(sk, truth, col("key"), depth, width)
      .select("key", "true_cnt", "est").as[(String, Long, Long)].collect()
    assert(est.nonEmpty)
    est.foreach { case (k, t, e) => assert(e >= t, s"under-count for $k") }
    // 5 keys into 4×64 counters: some depth row is collision-free, so
    // the min is exact
    est.foreach { case (k, t, e) => assert(e === t, s"collision inflated $k") }
  }

  test("per-source sketches merge into exactly the whole-corpus sketch") {
    val whole = CountMin.build(df, col("key"), depth, width)
    val perSrc = CountMin.build(df, col("key"), depth, width, Seq("src"))
    val merged = CountMin.merge(perSrc)
    assert(sketchRows(merged) === sketchRows(whole))
  }

  test("every depth row conserves total mass") {
    val sk = CountMin.build(df, col("key"), depth, width)
    val sums = sk.groupBy("depth").agg(sum("cnt").as("n"))
      .select("n").as[Long].collect()
    assert(sums.length === depth)
    assert(sums.forall(_ === rows.size.toLong))
  }

  test("a forced-collision width still never under-counts") {
    val sk = CountMin.build(df, col("key"), depth, 2)
    val truth = df.groupBy("key").agg(count(lit(1)).as("true_cnt"))
    val est = CountMin.estimate(sk, truth, col("key"), depth, 2)
      .select("true_cnt", "est").as[(Long, Long)].collect()
    est.foreach { case (t, e) => assert(e >= t) }
  }

  test("an unseen key estimates 0 when its buckets are untouched") {
    // width large enough that a fresh key almost surely misses all 5
    // used buckets per row; assert the ≥0 floor and the exact-0 case
    // via an empty corpus (every bucket untouched, left join → 0)
    val empty = CountMin.build(df.filter(lit(false)), col("key"), depth, width)
    val probe = Seq(Tuple1("zzz")).toDF("key")
    val est = CountMin.estimate(empty, probe, col("key"), depth, width)
      .select("est").as[Long].collect()
    assert(est.toSeq === Seq(0L))
  }
}
