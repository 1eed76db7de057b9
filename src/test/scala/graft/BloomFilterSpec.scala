package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Runtime bloom-filter semi-join reduction — the shuffle-bytes lever
  * GraftSession pins ON for selective fact↔fact joins at 100 TB. The
  * injection thresholds (application side ≥ ~10 GB) are deliberately
  * far above local test scale so everyday plans are unchanged; this
  * spec lowers them to prove the engine wiring actually injects the
  * filter on the J2 shape, and that results are identical with and
  * without it (the bloom is a pre-filter: false positives re-checked
  * by the join, zero false negatives). */
class BloomFilterSpec extends AnyFunSuite {
  import TestSession.{spark, sfDir}

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("selective fact-fact join injects a bloom filter on the probe side at scale thresholds") {
    // a selective filter on the build side (orders) + a shuffle join
    // (broadcast disabled) is exactly the injection shape
    def query() = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir).filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))

    var withBloom: Array[org.apache.spark.sql.Row] = null
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      // local-scale stand-ins for the 100 TB defaults
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB") {
      val df = query()
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter") || plan.contains("might_contain"),
        s"expected a runtime bloom filter in the optimized plan:\n${plan.take(4000)}")
      withBloom = df.orderBy("o_orderstatus").collect()
    }
    // correctness: identical aggregates with the feature fully off
    var plain: Array[org.apache.spark.sql.Row] = null
    withConfs("spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
      plain = query().orderBy("o_orderstatus").collect()
    }
    assert(withBloom.map(_.toString).toSeq === plain.map(_.toString).toSeq)
  }
}
