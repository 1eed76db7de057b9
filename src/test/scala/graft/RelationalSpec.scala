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
    // the only approximate / iterative-ML ops (q_dedup_simhash left
    // this list in round 6: the portable md5-60 fingerprint family made
    // it DuckDB-reproducible)
    assert(noOracle === Set(
      "q_sim_lsh_topk", "q_sim_ivf_topk",
      "q_sim_ivf_trained", "q_x3_ml_forecast", "q_a6_approx_distinct",
      "q_dedup_embedding_lsh", "q_embed_centroids_banded",
      "q_ep3_schedule_clustered", "q_a8_approx_percentile"))
  }

  test("approx_count_distinct within 5% of exact on events") {
    val rows = SparkEntry.queries("q_a6_approx_distinct")(spark, sfDir).collect()
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05, s"$approx vs $exact")
    }
  }

  test("approx_percentile tracks the exact percentiles") {
    val exact = SparkEntry.queries("q_a8_percentile")(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    SparkEntry.queries("q_a8_approx_percentile")(spark, sfDir).collect().foreach { r =>
      val (p50, p95) = exact(r.getString(0))
      // accuracy=1000 bounds RANK error at n/1000; the value error that
      // implies depends on local density — 5% relative is conservative
      assert(math.abs(r.getDouble(1) - p50) <= 0.05 * math.max(1.0, p50),
        s"p50 ${r.getDouble(1)} vs $p50")
      assert(math.abs(r.getDouble(2) - p95) <= 0.05 * math.max(1.0, p95),
        s"p95 ${r.getDouble(2)} vs $p95")
    }
  }

  test("query names are unique and oracle keys match query keys") {
    val names = SparkEntry.specs.map(_.name)
    assert(names.distinct.size === names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
