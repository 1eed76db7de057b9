package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan audit: prints formatted physical plans for representative
  * queries and greps for the properties that matter at 100 TB —
  * predicate pushdown reaching parquet, pruned read schemas, broadcast
  * joins on dims, whole-stage codegen coverage, TakeOrderedAndProject
  * for top-k (SURVEY.md §4).
  *
  * Usage: runMain graft.ExplainAudit <sfDir> [queryName ...]
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq(
      "q_s1_scan_project", "q_p4_predicate", "q_j1_dim_join", "q_j2_fact_join",
      "q_t1_topk", "q_a1_groupby_pricing", "q_ep1_chat_top_outages",
      "q_j5_asof_join", "q_dedup_minhash", "q_x1_sim_topk",
      "q_a9_auc", "q_dedup_embedding",
      "q_dedup_clusters", "q_contamination", "q_vocab_build")
    val spark = graft.core.GraftSession.local(8)
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      // execute THIS dataset's own QueryExecution first: with AQE on,
      // codegen ids and final join choices only appear in the finalized
      // adaptive plan (a write would spawn a separate QueryExecution)
      df.collect()
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      println(s"\n========== $n ==========")
      println(plan)
      val checks = Seq(
        "pushed-filters" -> plan.contains("PushedFilters: ["),
        "codegen" -> (plan.contains("codegen id :") || plan.contains("WholeStageCodegen")),
        "broadcast-join" -> plan.contains("BroadcastHashJoin"),
        "top-k-fused" -> plan.contains("TakeOrderedAndProject"))
      println("CHECKS " + checks.map { case (k, v) => s"$k=$v" }.mkString(" "))
    }
    spark.stop()
  }
}
