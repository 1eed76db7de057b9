package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.sources.Sinks

/** Bucketing = the co-located-join contract: one shuffle at write time,
  * zero at read time (ARCHITECTURE.md "Joins"). */
class BucketedJoinSpec extends AnyFunSuite {
  import TestSession.{spark, sfDir}

  test("equi-join on bucketed tables plans without any Exchange") {
    // the session catalog is per-JVM but warehouse files persist across
    // runs — clear leftovers or CREATE TABLE fails on the stale location
    Seq("li_bucketed", "o_bucketed").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(
        s"${System.getProperty("java.io.tmpdir")}/graft-warehouse/$t")
      if (dir.exists()) {
        dir.listFiles().foreach(_.delete()); dir.delete()
      }
    }
    Sinks.writeBucketed(Tables.lineitem(spark, sfDir), "li_bucketed", "l_orderkey", 8)
    Sinks.writeBucketed(Tables.orders(spark, sfDir), "o_bucketed", "o_orderkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the bucketed sort-merge path is what's planned
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "o_orderpriority")
      val n = j.collect().length.toLong
      assert(n === Tables.lineitem(spark, sfDir).count())
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
