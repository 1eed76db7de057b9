package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val tally = new ProfileQuery.Tally
    spark.sparkContext.addSparkListener(tally)
    def drain(): Unit = org.apache.spark.GraftSparkAccess.drainListenerBus(spark.sparkContext)
    def time(label: String)(f: => Unit): Unit = {
      drain(); val c0 = tally.cpuNs.get; val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e9; drain()
      println(f"PEEK $label%-20s wall=$dt%7.3f cpu=${(tally.cpuNs.get - c0) / 1e9}%8.3f")
    }
    val d = "/root/testdata/sf0.1"
    val pairs = graft.core.Tables.orders(spark, d)
      .filter(col("o_orderkey") % 4 === 0)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(graft.core.Tables.lineitem(spark, d).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey").cast("long") * 2).as("c"),
        (col("l_suppkey").cast("long") * 2 + 1).as("sup"))
    val edges = pairs.select(col("c").as("src"), col("sup").as("dst"))
      .union(pairs.select(col("sup").as("src"), col("c").as("dst")))
    val eRaw = edges.select(col("src").as("_s"), col("dst").as("_d")).distinct()
    spark.range(1000).selectExpr("sum(id)").collect()
    (1 to 2).foreach { i => time(s"edges distinct $i") { println("n=" + eRaw.count()) } }
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/edges_plan.txt"),
      eRaw.queryExecution.explainString(ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
