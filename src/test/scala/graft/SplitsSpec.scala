package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Splits

class SplitsSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def corpus(n: Int, dupEvery: Int) =
    (1 to n).map { i =>
      // every dupEvery-th doc is a near-dup family sharing one group key
      val g = if (i % dupEvery == 0) s"fam${i / dupEvery % 401}" else s"solo$i"
      (i.toLong, g)
    }.toDF("doc_id", "grp")

  test("group members never straddle splits, and fractions land near target") {
    val df = Splits.groupAwareSplit(corpus(20000, 4), col("grp"), 0.8, 0.1)
    val stats = Splits.splitStats(df, col("grp")).collect()
    assert(stats.forall(_.getAs[Long]("straddling_groups") === 0L))
    val byName = stats.map(r => r.getString(0) -> r.getAs[Long]("n_docs")).toMap
    val total = byName.values.sum.toDouble
    // group-level hashing: doc-level fractions drift with group sizes,
    // so the band is generous — it guards gross mis-assignment only
    assert(math.abs(byName("train") / total - 0.8) < 0.05, byName.toString)
    assert(math.abs(byName("val") / total - 0.1) < 0.04, byName.toString)
    assert(byName.keySet === Set("train", "val", "test"))
  }

  test("assignment is a pure function of the group key: partition- and row-insensitive") {
    val base = corpus(5000, 3)
    def assignments(parts: Int) =
      Splits.groupAwareSplit(base.repartition(parts), col("grp"), 0.7, 0.15)
        .select("doc_id", "split").as[(Long, String)].collect().toSet
    assert(assignments(1) === assignments(13))
    // adding rows never changes existing assignments (no global state)
    val grown = Splits.groupAwareSplit(corpus(6000, 3), col("grp"), 0.7, 0.15)
      .filter(col("doc_id") <= 5000)
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    assert(grown === assignments(1))
  }

  test("a different seed is an independent re-split; same seed is identical") {
    val base = corpus(4000, 5)
    def split(seed: Long) =
      Splits.groupAwareSplit(base, col("grp"), 0.8, 0.1, seed = seed)
        .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(split(0L) === split(0L))
    val a = split(0L); val b = split(1L)
    val moved = a.count { case (id, s) => b(id) != s }
    // independent hashing: ~2·0.8·0.2 + ... of docs move; 0 would mean
    // the seed is ignored
    assert(moved > 500, s"seed rotation moved only $moved docs")
  }

  test("splitStats flags a wrong leakage unit as straddling") {
    // split on doc_id (row-level) but audit on the family key: families
    // WILL straddle — the invariant catches the wrong-column mistake
    val df = Splits.groupAwareSplit(corpus(2000, 2), col("doc_id"), 0.5, 0.25)
    val straddle = Splits.splitStats(df, col("grp"))
      .select("straddling_groups").as[Long].head()
    assert(straddle > 0L, "row-level split over multi-doc groups must straddle")
  }
}
