package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.sources.Jdbc

/** S1 production-shape source against embedded Derby (the JDBC engine
  * shipped with Spark): write → partitioned read-back → pushdown. */
class JdbcSpec extends AnyFunSuite {
  import TestSession.{spark, sfDir}

  private lazy val url = {
    val dir = Files.createTempDirectory("graft_jdbc").resolve("db")
    s"jdbc:derby:$dir;create=true"
  }

  test("round-trip: write nation over JDBC, read it back") {
    val nation = Tables.nation(spark, sfDir)
      .select("n_nationkey", "n_name", "n_regionkey")
    Jdbc.write(nation, url, "nation", SaveMode.Overwrite)
    val back = Jdbc.read(spark, url, "nation")
    assert(back.count() === nation.count())
    assert(back.columns.map(_.toLowerCase).sorted ===
      Array("n_name", "n_nationkey", "n_regionkey"))
  }

  test("partitioned read opens one bounded cursor per partition") {
    val back = Jdbc.readPartitioned(spark, url, "nation",
      "N_NATIONKEY", lowerBound = 0L, upperBound = 25L, numPartitions = 4)
    assert(back.rdd.getNumPartitions === 4)
    assert(back.count() === Tables.nation(spark, sfDir).count())
  }

  test("filters and projection push into the JDBC scan") {
    val q = Jdbc.readPartitioned(spark, url, "nation",
      "N_NATIONKEY", 0L, 25L, 4)
      .filter(col("N_REGIONKEY") === 1)
      .select("N_NAME")
    q.collect()
    val plan = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters: [*IsNotNull(n_regionkey), *EqualTo(n_regionkey,1)]"),
      "filter must reach the JDBC scan's generated SQL")
    // pruned read schema: only the projected column survives the scan
    assert(plan.contains("ReadSchema: struct<n_name:string>"), "scan must not read all columns")
  }
}
