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

  test("property: cusum window identity equals the sequential recursion on any series") {
    forAll(seriesGen) { rows =>
      val out = graft.operators.Anomaly.withCusum(
        toDf(rows), Seq("k"), Seq("ts"), "v", slack = 0.25, threshold = 10.0)
        .select("k", "ts", "cusum").collect()
        .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getDouble(2)))
        .groupBy(_._1)
      rows.groupBy(_._1).foreach { case (k, krows) =>
        // reference recursion replicating the operator's exact pipeline:
        // 4-dp decimal grid via BigDecimal.valueOf (Spark's cast/round
        // use the double's STRING form — scala's BigDecimal(double)
        // exact-binary constructor rounds grid midpoints differently),
        // exact decimal accumulation, one double division for μ
        def g4(d: Double) = BigDecimal(
          java.math.BigDecimal.valueOf(d).setScale(4, java.math.RoundingMode.HALF_UP))
        val xsD = krows.sortBy(_._2).map(t => g4(t._3))
        val muD = g4(xsD.sum.toDouble / xsD.size)
        val slackD = BigDecimal("0.25")
        var s = BigDecimal(0)
        val want = xsD.map { x =>
          s = (s + x - muD - slackD).max(BigDecimal(0)); s.toDouble
        }
        val got = out(k).sortBy(_._2).map(_._3)
        got.zip(want).foreach { case (g, w) =>
          assert(g === w, s"key $k: ${got.toSeq} vs $want")
        }
      }
    }
  }

  /** Reference DP levenshtein for the fuzzy-join law. */
  private def lev(a: String, b: String): Int = {
    val (x, y) = (a.toCharArray, b.toCharArray)
    val d = Array.tabulate(x.length + 1, y.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to x.length; j <- 1 to y.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1))
    d(x.length)(y.length)
  }

  private val namesGen: Gen[List[String]] = for {
    n <- Gen.choose(2, 30)
    // short strings over a tiny alphabet force plenty of ≤1-edit pairs
    ss <- Gen.listOfN(n, for {
      len <- Gen.choose(0, 6)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString)
  } yield ss

  test("property: fuzzy ER pairs equal brute-force levenshtein ≤ 1 on any corpus") {
    forAll(namesGen) { names =>
      val df = names.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "name")
      val got = graft.operators.FuzzyJoin.editDistancePairs(df, col("id"), col("name"))
        .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
      val want = for {
        (sa, ia) <- names.zipWithIndex; (sb, ib) <- names.zipWithIndex
        if ia < ib && lev(sa, sb) <= 1
      } yield (ia.toLong, ib.toLong)
      assert(got.size === got.distinct.size, "duplicate pair emitted")
      assert(got.sorted === want.sorted)
    }
  }

  test("property: count-min estimates dominate true counts and merge losslessly") {
    forAll(namesGen) { names =>
      val df = names.zipWithIndex.map { case (s, i) => (s"s${i % 3}", s) }.toDF("src", "k")
      val whole = graft.operators.CountMin.build(df, col("k"), 3, 16)
      val merged = graft.operators.CountMin.merge(
        graft.operators.CountMin.build(df, col("k"), 3, 16, Seq("src")))
      assert(
        merged.select("depth", "bucket", "cnt").as[(Long, Long, Long)].collect().toSet ===
          whole.select("depth", "bucket", "cnt").as[(Long, Long, Long)].collect().toSet)
      val truth = df.groupBy("k").agg(count(lit(1)).as("t"))
      graft.operators.CountMin.estimate(whole, truth, col("k"), 3, 16)
        .select("t", "est").as[(Long, Long)].collect()
        .foreach { case (t, e) => assert(e >= t) }
    }
  }
}
