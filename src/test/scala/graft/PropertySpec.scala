package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TimeSeries}

/** Algebraic laws on scalacheck-generated data (SURVEY.md §5.2.3).
  * Sampled with fixed seeds (deterministic CI) and few samples per law
  * — each sample is a full Spark job. */
class PropertySpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int = 5): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private def forAll[A](g: Gen[A])(body: A => Unit): Unit =
    samples(g).foreach(body)

  private def forAll2[A](g1: Gen[A], g2: Gen[A])(body: (A, A) => Unit): Unit =
    samples(g1).zip(samples(g2).reverse).foreach { case (a, b) => body(a, b) }

  private val seriesGen: Gen[List[(String, Long, Double)]] = for {
    n <- Gen.choose(2, 25)
    keys <- Gen.listOfN(n, Gen.oneOf("a", "b"))
    offsets <- Gen.listOfN(n, Gen.choose(0L, 100000L))
    values <- Gen.listOfN(n, Gen.choose(-100.0, 100.0))
  } yield keys.lazyZip(offsets).lazyZip(values).toList.zipWithIndex.map {
    case ((k, off, v), i) => (k, off * 1000L + i, v) // unique ts per row
  }

  private def toDf(rows: List[(String, Long, Double)]) =
    rows.map { case (k, ms, v) => (k, new Timestamp(1704067200000L + ms), v) }
      .toDF("k", "ts", "v")

  test("property: as-of join never matches a future right row") {
    forAll2(seriesGen, seriesGen) { (ls, rs) =>
      if (ls.nonEmpty && rs.nonEmpty) {
        val out = TimeSeries.asOfJoin(
          toDf(ls).withColumnRenamed("ts", "lts"), toDf(rs).withColumnRenamed("ts", "rts"),
          Seq("k"), "lts", "rts", Seq("v"))
        val bad = out.filter(col("_asof_ts").isNotNull && col("_asof_ts") > col("lts")).count()
        assert(bad === 0)
      }
    }
  }

  test("property: interpolation is identity at observed grid points") {
    forAll(seriesGen) { rows =>
      if (rows.nonEmpty) {
        val df = toDf(rows)
        val obs = df.groupBy(col("k"), date_trunc("hour", col("ts")).as("grid_ts"))
          .agg((sum(col("v").cast("decimal(27,2)")).cast("double") / count(col("v"))).as("expected"))
        val interp = TimeSeries.interpolate(df, "k", "ts", "v")
        val mismatch = interp.join(obs, Seq("k", "grid_ts"))
          .filter(abs(col("value_interp") - col("expected")) > 1e-9).count()
        assert(mismatch === 0)
      }
    }
  }

  test("property: dedup is idempotent and fingerprint ignores token order") {
    forAll(Gen.listOfN(8, Gen.listOfN(6, Gen.oneOf("x", "y", "z", "w")))) { docs =>
      val df = docs.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toDF("doc_id", "text")
      val once = Dedup.exact(df, Seq("text"))
      assert(once.count() === Dedup.exact(once, Seq("text")).count())
      // same multiset-of-distinct-tokens, shuffled → same fingerprint
      val shuffled = docs.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.reverse.mkString(" ")) }.toDF("doc_id", "text")
      val f1 = Dedup.withFingerprint(df, "text").select("doc_id", "fingerprint")
      val f2 = Dedup.withFingerprint(shuffled, "text")
        .select(col("doc_id"), col("fingerprint").as("fp2"))
      assert(f1.join(f2, "doc_id").filter(col("fingerprint") =!= col("fp2")).count() === 0)
    }
  }

  test("property: filter-then-union equals union-then-filter") {
    forAll2(seriesGen, seriesGen) { (as, bs) =>
      val (a, b) = (toDf(as), toDf(bs))
      val pred = col("v") > 0
      val left = a.filter(pred).unionByName(b.filter(pred)).count()
      val right = a.unionByName(b).filter(pred).count()
      assert(left === right)
    }
  }
}
