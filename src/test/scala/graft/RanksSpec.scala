package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Ranks

/** The distributed tie-averaged rank must equal the single-window
  * reference BIT-FOR-BIT (all sums are dyadic-exact). The fixture is
  * deliberately high-cardinality (~180k distinct scores over 200k rows):
  * with that many distinct scores, an unpersisted range exchange gets
  * re-evaluated per DAG branch with independently sampled partition
  * boundaries, the _pid join drops rows, and npos+nneg collapses — the
  * regression this spec pins down. */
class RanksSpec extends AnyFunSuite {
  import TestSession.spark

  test("distributed AUC ≡ global-window reference at ~200k distinct scores") {
    val df = spark.range(200000).select(
      (pmod(xxhash64(col("id")), lit(180001)) / lit(1000.0)).as("score"),
      pmod(xxhash64(col("id"), lit(7)), lit(2)).cast("int").as("lab"))
    val got = Ranks.aucStats(df, col("score"), col("lab") === 1).collect().head

    val ranked = df
      .withColumn("rn", row_number().over(Window.orderBy("score")))
      .withColumn("ar", avg(col("rn")).over(Window.partitionBy("score")))
    val npos = sum(when(col("lab") === 1, 1).otherwise(0))
    val nneg = sum(when(col("lab") === 0, 1).otherwise(0))
    val ref = ranked.agg(
      npos.cast("long").as("npos"),
      nneg.cast("long").as("nneg"),
      ((sum(when(col("lab") === 1, col("ar")).otherwise(0.0)) -
        npos * (npos + lit(1)) / 2.0) / (npos * nneg)).as("auc"))
      .collect().head

    assert(got.getAs[Long]("npos") === ref.getAs[Long]("npos"))
    assert(got.getAs[Long]("nneg") === ref.getAs[Long]("nneg"))
    assert(got.getAs[Long]("npos") + got.getAs[Long]("nneg") === 200000L,
      "offset join dropped rows")
    assert(got.getAs[Double]("auc") === ref.getAs[Double]("auc"))
    spark.catalog.clearCache()
  }

  test("distributed row_number ≡ global-window reference on a composite key at 200k rows") {
    // unique composite key (n has heavy ties, term is unique)
    val df = spark.range(200000).select(
      pmod(xxhash64(col("id")), lit(997)).as("n"),
      concat(lit("t"), col("id")).as("term"))
    val order = Seq(col("n").desc, col("term").asc)
    val got = Ranks.distributedRowNumber(df, order, "rank")
    val ref = df.withColumn("rank",
      row_number().over(Window.orderBy(order: _*)).cast("long"))
    assert(got.select("n", "term", "rank").exceptAll(ref.select("n", "term", "rank")).isEmpty)
    assert(got.count() === 200000L)
    spark.catalog.clearCache()
  }

  test("distributed row_number plan has no unpartitioned window") {
    val df = spark.range(1000).select(col("id").as("k"))
    val plan = Ranks.distributedRowNumber(df, Seq(col("k").asc))
      .queryExecution.optimizedPlan.toString
    val windowSpecs = "windowspecdefinition\\(([^)]*)\\)".r
      .findAllMatchIn(plan.toLowerCase).map(_.group(1)).toList
    assert(windowSpecs.nonEmpty)
    // every window spec must carry a partition expression before the
    // ordering spec (unpartitioned = starts with the sort expr only)
    windowSpecs.foreach(s => assert(s.contains("_pid"), s"unpartitioned window: $s"))
    spark.catalog.clearCache()
  }

  test("all-tied scores rank to the midpoint: AUC is exactly 0.5") {
    val df = spark.range(1000).select(
      lit(7.5).as("score"),
      pmod(col("id"), lit(3)).cast("int").as("lab")) // 334 positives
    val got = Ranks.aucStats(df, col("score"), col("lab") === 0).collect().head
    assert(got.getAs[Long]("npos") === 334L)
    assert(got.getAs[Long]("nneg") === 666L)
    assert(got.getAs[Double]("auc") === 0.5)
    spark.catalog.clearCache()
  }

  test("perfectly separated classes: AUC is exactly 1.0") {
    val df = spark.range(1000).select(
      col("id").cast("double").as("score"),
      (col("id") >= 500).cast("int").as("lab"))
    val got = Ranks.aucStats(df, col("score"), col("lab") === 1).collect().head
    assert(got.getAs[Long]("npos") === 500L)
    assert(got.getAs[Double]("auc") === 1.0)
    spark.catalog.clearCache()
  }

  test("calibration: a two-bin hand computation, including the ECE") {
    import spark.implicits._
    val df = Seq((0.0, 0), (0.0, 1), (1.0, 0), (1.0, 1)).toDF("score", "lab")
    val got = Ranks.calibration(df, col("score"), col("lab") === 1, bins = 2)
      .orderBy("bin").collect()
      .map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n"), r.getAs[Double]("conf"),
        r.getAs[Double]("acc"), r.getAs[Double]("gap"), r.getAs[Double]("ece")))
    // bin 0: conf 0, acc 0.5 → gap +0.5; bin 1: conf 1, acc 0.5 → gap −0.5
    // ECE = (2·0.5 + 2·0.5)/4 = 0.5 on every row
    assert(got.toSeq === Seq((0L, 2L, 0.0, 0.5, 0.5, 0.5), (1L, 2L, 1.0, 0.5, -0.5, 0.5)))
  }

  test("calibration: the max score lands in the top bin, not past it") {
    import spark.implicits._
    val df = (0 to 100).map(i => (i / 100.0, if (i > 50) 1 else 0)).toDF("score", "lab")
    val out = Ranks.calibration(df, col("score"), col("lab") === 1, bins = 10)
    val bins = out.select("bin").as[Long].collect()
    assert(bins.max === 9L && bins.min === 0L)
    assert(out.agg(sum("n")).collect().head.getLong(0) === 101L)
  }

  test("woe bins: separating feature reads large |woe| and IV; uniform reads ~0") {
    import spark.implicits._
    // bin 0 (v<5) almost all negative, bin 1 (v≥5) almost all positive
    val sep = (1 to 40).map(i =>
      (if (i % 2 == 0) 1.0 else 9.0, i % 2 == 1)) ++ Seq((1.0, true), (9.0, false))
    val sepOut = Ranks.woeBins(sep.toDF("v", "y"), col("v"), col("y"), 0.0, 10.0, 2)
      .orderBy("bin").collect()
    val woes = sepOut.map(_.getAs[Double]("woe"))
    assert(woes(0) < -1.0 && woes(1) > 1.0, woes.toSeq.toString)
    assert(sepOut.head.getAs[Double]("iv") > 0.3, "separating feature must read strong IV")
    // feature exactly balanced against the label: woe = 0, IV = 0
    val ind = for { v <- 0 until 10; y <- Seq(true, false) } yield (v.toDouble, y)
    val indOut = Ranks.woeBins(ind.toDF("v", "y"), col("v"), col("y"), 0.0, 10.0, 2)
      .collect()
    assert(indOut.forall(r => r.getAs[Double]("woe") === 0.0))
    assert(indOut.head.getAs[Double]("iv") === 0.0)
  }

  test("woe bins: counts are exact and the laplace floor keeps empty cells finite") {
    import spark.implicits._
    // all positives in bin 0; bin 1 exists with only negatives
    val df = Seq((1.0, true), (1.0, true), (9.0, false)).toDF("v", "y")
    val out = Ranks.woeBins(df, col("v"), col("y"), 0.0, 10.0, 2)
      .orderBy("bin").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((0L, 2L, 0L), (1L, 0L, 1L)))
    out.foreach { r =>
      val w = r.getAs[Double]("woe")
      assert(!w.isNaN && !w.isInfinite, "smoothing must keep WOE finite")
    }
  }

  test("calibration: degenerate score range collapses to one bin, NULL conf/gap/ece") {
    import spark.implicits._
    // all-equal scores: the bin expression would be 0/0 and conf ±Inf —
    // the degenerate-range gate must emit one bin with NULL conf/gap/ece
    // (the house NULL-on-degenerate-denominator discipline), exact acc
    val df = Seq((0.7, 1), (0.7, 0), (0.7, 1)).toDF("score", "lab")
    val out = Ranks.calibration(df, col("score"), col("lab") === 1, bins = 10).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("bin") === 0L && r.getAs[Long]("n") === 3L)
    assert(r.isNullAt(r.fieldIndex("conf")) && r.isNullAt(r.fieldIndex("gap")))
    assert(r.isNullAt(r.fieldIndex("ece")))
    assert(math.abs(r.getAs[Double]("acc") - 2.0 / 3.0) < 1e-12)
  }

  test("calibration of a well-calibrated scorer reads near-zero ECE") {
    import spark.implicits._
    // 20 rows per level; positives at each level = level · 20 exactly
    val rows = for {
      lvl <- 0 to 10
      i <- 1 to 20
    } yield (lvl / 10.0, if (i <= lvl * 2) 1 else 0)
    val out = Ranks.calibration(rows.toDF("score", "lab"), col("score"), col("lab") === 1, 10)
      .collect().head.getAs[Double]("ece")
    // levels 0.9 and 1.0 share the top bin (conf 0.95 vs acc 0.95 — still 0);
    // everything else is exact
    assert(math.abs(out) < 1e-9, s"well-calibrated scorer must have ~0 ECE, got $out")
  }
}
