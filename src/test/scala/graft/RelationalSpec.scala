package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class RelationalSpec extends AnyFunSuite {
  import TestSession.{spark, sfDir}

  test("flagship entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query carries an oracle — the no-oracle list is empty") {
    val noOracle = SparkEntry.specs.filter(_.oracle.isEmpty).map(_.name).toSet
    // the list emptied over rounds 6-9: q_dedup_simhash via the portable
    // md5-60 family (r6); approx aggregates via in-band-boolean oracles
    // and all four LSH/IVF queries via the portable hyperplane/sample
    // families (r7); and the last three iterative-ML queries (KMeans
    // schedule, trained IVF, ML forecast) via in-band invariant-boolean
    // oracles sized by MeasureMlBounds (r9). A new query without an
    // oracle must either get one or document its reason HERE.
    assert(noOracle === Set.empty[String])
  }

  test("approx_count_distinct sits inside its certified 5% band") {
    val rows = SparkEntry.queries("q_a6_approx_distinct")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("approx_in_band"),
        s"HLL estimate out of band for ${r.getString(0)} (exact ${r.getAs[Long]("exact_users")})")
    }
  }

  test("approx_percentile sits inside its certified quantile band and exacts agree") {
    val exact = SparkEntry.queries("q_a8_percentile")(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val rows = SparkEntry.queries("q_a8_approx_percentile")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // the emitted exact percentiles must be the q_a8_percentile values
      val (p50, p95) = exact(r.getString(0))
      assert(r.getDouble(1) === p50 && r.getDouble(2) === p95)
      // accuracy=1000 bounds RANK error at 0.001·n — 10× inside the
      // ±0.01-quantile band the query certifies
      assert(r.getAs[Boolean]("p50_in_band"), s"p50 out of band for ${r.getString(0)}")
      assert(r.getAs[Boolean]("p95_in_band"), s"p95 out of band for ${r.getString(0)}")
    }
  }

  test("query names are unique and oracle keys match query keys") {
    val names = SparkEntry.specs.map(_.name)
    assert(names.distinct.size === names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
