package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Association

class AssociationSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def lift(rows: (Long, String)*) =
    Association.cooccurrenceLift(
      rows.toDF("bucket", "t"), Seq(col("bucket")), col("t"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))))
      .toMap

  test("always-together types read lift = n_buckets / co-rate of independence") {
    // a and b appear in both buckets, always together: lift = 2·2/(2·2)=1? —
    // with N=2 buckets, n_a=n_b=n_ab=2: lift = 2·2/(2·2) = 1 at saturation;
    // add a bucket without them to push lift above 1
    val out = lift((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (3L, "c"))
    val (nab, na, nb, n, l) = out(("a", "b"))
    assert((nab, na, nb, n) === ((2L, 2L, 2L, 3L)))
    assert(l === 2.0 * 3 / (2 * 2)) // 1.5 > 1: correlated
  }

  test("never-together types produce no pair row; independents read lift ≈ 1") {
    val out = lift((1L, "a"), (2L, "b"))
    assert(!out.contains(("a", "b")), "disjoint types must not pair")
    // independence: a in half the buckets, b in half, together in a quarter
    val ind = lift(
      (1L, "a"), (1L, "b"), (2L, "a"), (3L, "b"), (4L, "x"))
    val (_, _, _, _, l) = ind(("a", "b"))
    assert(l === 1.0 * 4 / (2 * 2)) // exactly 1: independent
  }

  test("presence collapses event volume: duplicates in a bucket count once") {
    val out = lift((1L, "a"), (1L, "a"), (1L, "a"), (1L, "b"), (2L, "a"))
    val (nab, na, _, _, _) = out(("a", "b"))
    assert(nab === 1L && na === 2L)
  }
}
