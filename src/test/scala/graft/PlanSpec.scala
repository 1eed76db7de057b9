package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.ExplainMode

/** Plan-property regression gate (SURVEY.md §4): the scale-critical
  * physical-plan properties asserted in CI, not just eyeballed. Each
  * query executes first so the AQE-final plan (codegen ids, join
  * choices) is what's inspected. */
class PlanSpec extends AnyFunSuite {
  import TestSession.{spark, sfDir}

  private def finalPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("predicate pushdown reaches the parquet scan") {
    val p = finalPlan("q_s1_scan_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate"))
  }

  test("column pruning: scan reads only projected columns") {
    val p = finalPlan("q_s1_scan_project")
    // the date column's physical type has changed across testdata
    // generations (timestamp[us] today, DATE or ns-long before) — the
    // pruning property under test is WHICH columns are read, not how
    // the generator typed the date that round
    assert(
      """ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double,l_extendedprice:double,l_shipdate:\w+"""
        .r.findFirstIn(p).isDefined,
      s"pruned ReadSchema not found in:\n${p.linesIterator.filter(_.contains("ReadSchema")).mkString("\n")}")
  }

  test("dim chain plans as broadcast hash joins") {
    val p = finalPlan("q_j1_dim_join")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("global top-k fuses into TakeOrderedAndProject (no full sort)") {
    val p = finalPlan("q_t1_topk")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("flagship EP1: pushed ns-range date bound + broadcast dims + fused top-k") {
    val p = finalPlan("q_ep1_chat_top_outages")
    assert(p.contains("GreaterThanOrEqual(ts,"), "date bound must push as int64 ns range")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("whole-stage codegen is active on the aggregation path") {
    val p = finalPlan("q_a1_groupby_pricing")
    assert(p.contains("codegen id :"))
  }

  test("semi/anti joins plan as such (no row multiplication)") {
    assert(finalPlan("q_j7_semi_join").contains("LeftSemi"))
    assert(finalPlan("q_j7_anti_join").contains("LeftAnti"))
  }

  test("AUC rank is distributed: no unpartitioned (single-task) window in the plan") {
    val p = finalPlan("q_a9_auc")
    val winLines = p.linesIterator.filter(_.contains("windowspecdefinition")).toList
    assert(winLines.nonEmpty, "expected the per-partition running-sum window")
    assert(winLines.forall(_.contains("_pid")),
      s"found a window not partitioned by _pid:\n${winLines.mkString("\n")}")
  }

  test("embedding near-dup is block-bucketed: no broadcast cross product") {
    val p = finalPlan("q_dedup_embedding")
    assert(!p.contains("BroadcastNestedLoopJoin"), "O(n²) broadcast theta-join in plan")
    assert(!p.contains("CartesianProduct"), "cartesian product in plan")
  }

  test("range join is binned: the interval-point join is a hash join on the bin") {
    val p = finalPlan("q_j9_range_join")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      "expected a hash join for the interval-point match")
    assert(p.contains("_bin"), "expected the join keyed on the bin")
    assert(!p.contains("CartesianProduct"), "cartesian product in plan")
    // the only nested loop allowed is the single-row point-bounds attach
    // (count distinct node ids in the FINAL plan only — AQE's appended
    // "Initial Plan" section re-lists the same operators under new ids)
    val bnl = "BroadcastNestedLoopJoin[^(]*\\((\\d+)\\)".r
      .findAllMatchIn(p.split("== Initial Plan ==").head).map(_.group(1)).toSet
    assert(bnl.size <= 1, s"unexpected nested-loop joins: $bnl")
  }

  test("simhash dedup: chunk-blocked equi-join, no cross product, no unpartitioned window") {
    val p = finalPlan("q_dedup_simhash")
    assert(p.contains("_chunkval"), "blocking join must be keyed on the chunk value")
    assert(!p.contains("CartesianProduct"), "cartesian product in plan")
    assert(!p.contains("BroadcastNestedLoopJoin"), "O(n²) nested-loop join in plan")
  }

  test("segment dedup: hash-keyed equi-joins only, no cross product, no unpartitioned window") {
    val p = finalPlan("q_text_line_dedup")
    assert(!p.contains("CartesianProduct"), "cartesian product in plan")
    assert(!p.contains("BroadcastNestedLoopJoin"), "O(n²) nested-loop join in plan")
    assert(!p.contains("Window"),
      "segment winner rule must be an order-independent aggregation, not a window")
    assert(p.contains("md5"), "candidate keys must be segment hashes, not text")
  }

  test("cluster labeling has no unpartitioned window and no cross product") {
    val p = finalPlan("q_dedup_clusters")
    val winLines = p.linesIterator.filter(_.contains("windowspecdefinition")).toList
    assert(winLines.nonEmpty, "expected the per-component min/count window")
    assert(winLines.forall(l => l.contains("_comp") || l.contains("u#")),
      s"found a window not partitioned by the component/node key:\n${winLines.mkString("\n")}")
    assert(!p.contains("CartesianProduct"), "cartesian product in plan")
  }

  // (no skip-earlier-bands plan gate for q_dedup_minhash: its final plan
  // reads the CacheGovernor-checkpointed shared relation, so the candidate
  // join is not visible — the property is gated on q_contamination_fuzzy,
  // whose build is in-plan, and both paths share the same generator code)

  test("contamination check broadcasts the benchmark shingles") {
    val p = finalPlan("q_contamination")
    assert(p.contains("BroadcastHashJoin"), "benchmark side should broadcast")
    assert(!p.contains("SortMergeJoin"), "shingle join should not shuffle the corpus side")
  }

  test("PII redaction stays inside whole-stage codegen (no UDF, no shuffle)") {
    val p = finalPlan("q_text_redact")
    assert(p.contains("codegen id :"), "redaction chain must codegen")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"), "no UDFs on the path")
    // per-row projection + final sort only: no join/aggregate exchanges
    assert(!p.contains("HashAggregate"), "redaction needs no aggregation")
  }

  test("temperature sampling broadcasts the group quotas (corpus never reshuffles)") {
    val p = finalPlan("q_corpus_temperature")
    assert(p.contains("BroadcastHashJoin"), "quota table must broadcast")
    assert(!p.contains("SortMergeJoin"), "the corpus side must not shuffle for the quota join")
    val winLines = p.linesIterator.filter(_.contains("windowspecdefinition")).toList
    assert(winLines.isEmpty, s"no per-group rank window expected:\n${winLines.mkString("\n")}")
  }

  test("salted join runs as SMJ keyed on (key, salt) — never silently broadcasts") {
    val p = finalPlan("q_skew_salted_join")
    assert(p.contains("SortMergeJoin"), "salted join must exercise the shuffle path")
    assert(p.contains("_salt"), "join must be keyed on the salt")
  }

  test("bipartite decontamination: cross-side band equi-join, no cross product, no dedup shuffle") {
    val p = finalPlan("q_contamination_fuzzy")
    assert(p.contains("_bandhash"), "candidate join must be keyed on the band hash")
    assert(!p.contains("CartesianProduct"), "cartesian product in plan")
    assert(!p.contains("BroadcastNestedLoopJoin"), "O(n²) nested-loop join in plan")
    // skip-earlier-bands makes candidates distinct at the join: the only
    // aggregates in the plan are the per-side rep collapses, never a
    // pair-dedup over collision rows
    assert(p.contains("graft_first_equal_index"),
      "skip-earlier-bands filter missing from the candidate join")
  }

  test("trained IVF search broadcasts centroids; no cartesian against the corpus") {
    val p = finalPlan("q_sim_ivf_trained")
    assert(!p.contains("CartesianProduct"), "cartesian product in plan")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "centroid table must reach both sides as a broadcast")
    assert(!p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin"),
      "cell-candidate join should not shuffle both full sides")
  }

  test("forecast sink read-back: static partition pruning on the date predicate") {
    val p = finalPlan("q_s5_forecast_sink")
    // the literal date predicate must land in the scan's PartitionFilters
    // (directory-level pruning), not as a post-scan data filter
    val pf = p.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n")
    assert(pf.contains("p_date"),
      s"date predicate did not reach PartitionFilters:\n$pf")
  }

  test("forecast sink: a join on the partition key prunes dynamically (DPP)") {
    import org.apache.spark.sql.functions._
    val path = java.nio.file.Files
      .createTempDirectory("graft-dpp-gate").toString
    graft.sources.Sinks.writeForecasts(
      graft.core.DomainTables.forecasts(spark, sfDir), path)
    // fact side: the date-partitioned sink; dim side filtered on a
    // NON-join column (the star-schema shape) — the surviving dates are
    // only knowable at RUNTIME, so the scan must carry a dynamicpruning
    // subquery, not scan all dates. (A literal filter on the join key
    // itself would be statically propagated instead and prove nothing.)
    val fact = spark.read.parquet(path)
    val dim = graft.core.DomainTables.forecasts(spark, sfDir)
      .filter(col("root_cause") === "error")
      .select(col("prediction_date").as("p_date")).distinct()
    val joined = fact.join(dim, "p_date")
    joined.collect()
    val p = joined.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.toLowerCase.contains("dynamicpruning"),
      "partitioned sink scan must carry a dynamic-partition-pruning " +
        s"subquery when joined on the partition key:\n" +
        p.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n"))
  }

  test("interval merge: islands window and the follow-up groupBy share one exchange") {
    val df = SparkEntry.queries("q_iv_merge")(spark, sfDir)
    df.collect()
    // toString (not formatted) prints "Exchange hashpartitioning(...)"
    // on one line; AQE's toString repeats the whole tree under
    // "== Initial Plan ==", so count only the final section
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    val n = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(n === 1, s"expected one hash exchange, found $n in:\n$p")
  }

  test("cusum: key stats, prefix sum and running min share one keyed exchange") {
    val df = SparkEntry.queries("q_w10_cusum")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val n = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(n === 1, s"expected one hash exchange, found $n in:\n$p")
    assert(!p.contains("windowspecdefinition(ts"), "windows must be keyed, not global")
  }

  test("funnel: one shuffle on the user key, arrays resolved by codegen HOFs (no window)") {
    val df = SparkEntry.queries("q_a13_funnel")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("Window"), "funnel must not need a window")
  }

  test("bm25: corpus stats broadcast; no cartesian against the token stream") {
    val df = SparkEntry.queries("q_text_bm25")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    // the 1-row stats attach is a broadcast nested loop BY DESIGN (the
    // engine's standard scalar attach — same as TF-IDF's); the gate is
    // that nothing data×data is cartesian and the ranking fuses
    assert(!p.contains("CartesianProduct"), "cartesian product in plan")
    assert(p.contains("BroadcastExchange"), "single-row stats must broadcast")
    assert(p.contains("TakeOrderedAndProject"), "top-k must fuse, not globally sort")
  }

  test("bloom prefilter: the 1-row filter broadcasts; probe is a scan-side filter") {
    val df = SparkEntry.queries("q_bloom_prefilter")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("BroadcastExchange"), "filter row must broadcast")
    assert(!p.contains("CartesianProduct"), "cartesian product in plan")
  }

  test("source overlap: hash-keyed equi-join on segment hashes, no cross product") {
    val df = SparkEntry.queries("q_dedup_source_overlap")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("md5"), "pair join must be keyed on segment hashes, not text")
  }

  test("snapshot diff plans as one key-partitioned full-outer join") {
    val df = SparkEntry.queries("q_u4_snapshot_diff")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("FullOuter"), "diff must be a single full-outer join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("fuzzy ER join: variant-hash equi-join, no cross product, no pair-dedup shuffle") {
    val p = finalPlan("q_er_fuzzy_names")
    assert(!p.contains("CartesianProduct"), "cartesian product in plan")
    assert(!p.contains("BroadcastNestedLoopJoin"), "O(n²) nested-loop join in plan")
    assert(p.contains("_h"), "candidate join must be keyed on the deletion-variant hash")
    // first-shared-variant filtering makes candidates unique at the join;
    // a dropDuplicates aggregate over pairs must never reappear
    assert(p.contains("graft_min_common_sorted"),
      "skip-earlier-variants filter missing from the candidate join")
  }

  test("anti range join: broadcast covered-day anti join, no nested-loop NOT EXISTS") {
    val p = finalPlan("q_j11_anti_range")
    assert(!p.contains("CartesianProduct"), "cartesian product in plan")
    // the single-row bounds attach is the ONLY nested-loop allowed; the
    // interval side must never BNL against the fact side
    assert(p.contains("LeftAnti"), "suppression must be a left-anti join")
    // round-11 shape: the anti form aggregates intervals into the
    // distinct covered-day set (bounded by the calendar span) and
    // BROADCASTS it into one equi anti join — no pair expansion, so no
    // bin column anywhere and the anti join's build side is a broadcast
    assert(p.contains("_day"), "suppression must probe the covered-day set")
    assert(!p.contains("_bin"), "anti form must not pair-expand onto bins")
    assert("BroadcastHashJoin LeftAnti|LeftAnti, BuildRight|BroadcastExchange".r
      .findFirstIn(p).nonEmpty, "covered-day set must broadcast")
  }

  test("profiler: one melt exchange on (column, value); min/max broadcast back") {
    val df = SparkEntry.queries("q_a15_profile")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("BroadcastHashJoin"), "min/max row must broadcast-join back")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("count-min: counter table broadcasts into the probe join") {
    val df = SparkEntry.queries("q_text_cms")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("BroadcastHashJoin"), "the d·w counter table must broadcast")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("shard assignment: pure projection, no exchange before the stats aggregate") {
    val df = SparkEntry.queries("q_sample_shards")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the only hash exchange is the 8-group stats aggregate
    val n = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(n <= 1, s"expected at most one hash exchange, found $n")
  }

  test("weighted sample: no shuffle of the corpus — partial top-k only") {
    val df = SparkEntry.queries("q_sample_weighted")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("TakeOrderedAndProject"), "must fuse to TakeOrderedAndProject")
    assert(!p.contains("Exchange hashpartitioning"),
      "weighted sampling must not hash-shuffle the corpus")
  }

  test("group-aware split: the split column is a pure projection; " +
      "only the stats aggregates shuffle") {
    val df = SparkEntry.queries("q_split_group_aware")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the straddle audit's 1-row result must broadcast, never join wide
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "straddle count must attach via broadcast")
    assert(!p.contains("CartesianProduct"), "no data-sized cartesian")
    // exchanges: each countDistinct audit plans as the standard
    // two-phase distinct rewrite (keys: (group, split) then the final
    // key), so the straddle audit + the per-split stats cost 2+2 hash
    // exchanges over GROUP-sized keys — never one per row-op
    val n = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(n <= 4, s"expected at most four hash exchanges, found $n:\n$p")
  }

  test("hard-cap packing: one shard exchange feeds the fold; no window over data") {
    val df = SparkEntry.queries("q_pack_hardcap")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the per-shard fold rides the single groupBy(shard) exchange (plus
    // the deterministic output sort); a Window here would mean the pack
    // went sequential over data
    assert(!p.contains("Window"), "packing must not window over the corpus")
    assert(!p.contains("CartesianProduct"))
    val n = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(n <= 1, s"expected at most one hash exchange (shard groupBy), found $n:\n$p")
  }
}
