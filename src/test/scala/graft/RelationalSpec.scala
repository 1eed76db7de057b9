package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class RelationalSpec extends AnyFunSuite {
  import TestSession.{spark, sfDir}

  test("flagship entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query name has either an oracle or a documented reason") {
    val noOracle = SparkEntry.specs.filter(_.oracle.isEmpty).map(_.name).toSet
    // the only approximate / non-portable-hash ops
    assert(noOracle === Set(
      "q_dedup_simhash", "q_sim_lsh_topk", "q_sim_ivf_topk",
      "q_x3_ml_forecast", "q_a6_approx_distinct",
      "q_dedup_embedding_lsh", "q_ep3_schedule_clustered"))
  }

  test("approx_count_distinct within 5% of exact on events") {
    val rows = SparkEntry.queries("q_a6_approx_distinct")(spark, sfDir).collect()
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05, s"$approx vs $exact")
    }
  }

  test("query names are unique and oracle keys match query keys") {
    val names = SparkEntry.specs.map(_.name)
    assert(names.distinct.size === names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
