package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.HeavyHitters
import graft.functions.HeavyHitters.{MG, MisraGries}

class HeavyHittersSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def sketch(df: org.apache.spark.sql.DataFrame, k: Int): Map[String, Long] =
    df.agg(HeavyHitters.heavyHitters(k)(col("tok")).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.token"), col("e.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("exact when distinct items fit the capacity") {
    val df = Seq.tabulate(300)(i => s"t${i % 7}").toDF("tok").repartition(5)
    val got = sketch(df, 16)
    val want = (0 until 7).map(i => s"t$i" -> (300 / 7 + (if (i < 300 % 7) 1 else 0)).toLong).toMap
    assert(got === want)
  }

  test("guarantees hold on skewed data under adversarial partitioning") {
    // 10_000 items: one majority token (40%), a mid tier, and a long tail
    val items = Seq.fill(4000)("heavy") ++
      (0 until 3000).map(i => s"mid${i % 10}") ++
      (0 until 3000).map(i => s"tail$i")
    val n = items.size.toLong
    val k = 16
    val exact = items.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    for (parts <- Seq(1, 7, 32)) {
      val got = sketch(items.toDF("tok").repartition(parts), k)
      // every estimate is a lower bound within N/(k+1)
      got.foreach { case (t, est) =>
        assert(est <= exact(t), s"over-count for $t at parts=$parts")
        assert(exact(t) - est <= n / (k + 1) + 1, s"error bound broken for $t")
      }
      // every item above the frequency threshold is present
      exact.filter(_._2 > n.toDouble / (k + 1)).keys.foreach { t =>
        assert(got.contains(t), s"heavy item $t missing at parts=$parts")
      }
      assert(got.contains("heavy"))
    }
  }

  test("merge is associative-safe: split-and-merge obeys the same bounds as one pass") {
    val mg = new MisraGries(8)
    val xs = Seq.fill(500)("a") ++ Seq.fill(300)("b") ++ (0 until 400).map(i => s"z$i")
    val n = xs.size.toLong
    // three different merge trees over thirds of the stream
    val parts = xs.grouped(300).map(_.foldLeft(mg.zero)(mg.reduce)).toSeq
    val lft = parts.reduceLeft(mg.merge)
    val rgt = parts.reduceRight(mg.merge)
    for (m <- Seq(lft, rgt)) {
      assert(m.processed === n)
      assert(m.counts.size <= 8)
      assert(m.counts("a") <= 500 && 500 - m.counts("a") <= n / 9)
      assert(m.counts("b") <= 300 && 300 - m.counts("b") <= n / 9)
    }
  }

  test("summary state never exceeds capacity") {
    val mg = new MisraGries(4)
    val fold = (0 until 1000).map(i => s"x$i").foldLeft(mg.zero)(mg.reduce)
    assert(fold.counts.size <= 4)
    assert(mg.merge(fold, fold).counts.size <= 4)
  }

  test("finish orders by (est desc, token) deterministically") {
    val mg = new MisraGries(8)
    val st = MG(Map("b" -> 3L, "a" -> 3L, "c" -> 9L), 15L)
    assert(mg.finish(st).toSeq.map(_.token) === Seq("c", "a", "b"))
  }
}
