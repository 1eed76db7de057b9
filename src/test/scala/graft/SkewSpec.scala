package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.operators.Skew

/** Semantics of the skew-mitigation operators beyond the oracle row
  * (q_skew_salted_join covers inner-join equality on real tables): the
  * salted join must preserve exact row MULTIPLICITY and outer-join
  * semantics for duplicate keys on either side. */
class SkewSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def rows(df: DataFrame): Seq[(Int, String, Option[String])] =
    df.select("k", "fv", "dv").collect()
      .map(r => (r.getInt(0), r.getString(1), Option(r.getString(2))))
      .toSeq.sorted

  test("saltedJoin preserves multiplicity and outer semantics exactly") {
    val fact = Seq((1, "a"), (1, "b"), (2, "c"), (3, "d")).toDF("k", "fv")
    val dim = Seq((1, "X"), (1, "Y"), (2, "Z"), (9, "W")).toDF("k", "dv")
    // inner: dup keys on BOTH sides → fact row (1,a) matches dim X and Y
    assert(rows(Skew.saltedJoin(fact, dim, Seq("k"), 4)) ===
      rows(fact.join(dim, Seq("k"))))
    // left outer: unmatched fact key 3 survives exactly once
    assert(rows(Skew.saltedJoin(fact, dim, Seq("k"), 4, "left")) ===
      rows(fact.join(dim, Seq("k"), "left")))
  }
}
