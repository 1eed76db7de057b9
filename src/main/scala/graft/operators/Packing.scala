package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing — greedy token-budget bin packing of documents
  * into context-window-sized training rows (the standard pretraining
  * batch-construction step: concatenate documents up to a hard token
  * cap so attention windows run full; reference README.md:102
  * "training data preparation").
  *
  * Algorithm: NEXT-FIT with a HARD cap, in canonical id order within
  * hash shards. Each document is hashed to one of `nShards` shards
  * (portable md5 — same shard on any cluster/engine, a different seed
  * is an independent re-pack); within a shard, documents are packed in
  * ascending id order: keep a running token sum, and a document that
  * would push the sum past `capacity` starts a new bin. A document
  * longer than the cap sits alone in its own bin (the caller's
  * truncation policy applies downstream — packing never drops data).
  *
  * Why next-fit and not first-fit-decreasing: FFD packs ~8% tighter on
  * typical length distributions but needs random access to open bins —
  * a sequential, stateful structure that does not distribute. Next-fit
  * is a pure per-shard FOLD: shards are the unit of parallelism (the
  * blocksFor discipline — size shards so a shard's doc list is
  * comfortably task-local), the fold is one codegen'd HOF `aggregate`
  * over the shard's sorted (id, tokens) array, and the whole operator
  * is one map-side-combinable groupBy — no driver loop, no window over
  * data, nothing sequential across shards. Utilization is measured,
  * not assumed ([[packStats]]).
  *
  * Determinism/portability: the shard hash, the id order, and the fold
  * are all exact integer arithmetic, so the complete assignment
  * replays in ANSI SQL (a linear-recursion CTE walks each shard's
  * ordered docs) — the oracle checks every (doc, shard, bin) row.
  *
  * Relation to [[Sampling.packBudgeted]]: that operator is the SOFT
  * variant (offset = windowed running sum, floor(offset/budget) packs —
  * documents may straddle pack boundaries, fine when the consumer
  * re-chunks a concatenated token stream). This one enforces the HARD
  * cap a fixed-context trainer needs: no document straddles, bins are
  * real batches. */
object Packing {

  /** One row per input doc: (doc_id, doc_tokens, shard, bin) — bin ids
    * are dense per shard, 0-based, in id order. */
  def packBins(
      df: DataFrame, id: Column, tokens: Column,
      capacity: Long, nShards: Int, seed: Long = 0L): DataFrame = {
    require(capacity >= 1, "need a positive token capacity")
    require(nShards >= 1, "need at least one shard")
    val fold =
      s"""aggregate(
         |  _arr,
         |  struct(CAST(0 AS INT) AS bin, CAST(0 AS BIGINT) AS s,
         |         CAST(array() AS array<struct<id: BIGINT, toks: BIGINT, bin: INT>>) AS out),
         |  (a, x) -> struct(
         |    CASE WHEN a.s > 0L AND a.s + x.toks > ${capacity}L THEN a.bin + 1 ELSE a.bin END AS bin,
         |    CASE WHEN a.s > 0L AND a.s + x.toks > ${capacity}L THEN x.toks ELSE a.s + x.toks END AS s,
         |    concat(a.out, array(struct(x.id AS id, x.toks AS toks,
         |      CASE WHEN a.s > 0L AND a.s + x.toks > ${capacity}L THEN a.bin + 1 ELSE a.bin END AS bin))) AS out),
         |  a -> a.out)""".stripMargin
    df.select(id.cast("long").as("_id"), tokens.cast("long").as("_toks"))
      .withColumn("_shard",
        pmod(graft.functions.PortableHash
          .md5Hash60(concat(lit(s"pack:$seed:"), col("_id").cast("string"))),
          lit(nShards.toLong)))
      .groupBy("_shard")
      // sort_array canonicalizes collect_list's arrival order: the fold
      // input is the shard's docs in ascending id order, deterministically
      .agg(sort_array(collect_list(struct(col("_id").as("id"),
        col("_toks").as("toks")))).as("_arr"))
      .select(col("_shard").as("shard"), expr(s"inline($fold)"))
      .select(col("id").as("doc_id"), col("toks").as("doc_tokens"),
        col("shard"), col("bin"))
  }

  /** Packing audit: per (shard, bin) doc count and token sum, the
    * within-cap flag (a bin exceeds `capacity` ONLY as a singleton
    * oversized doc), and fill ratio — the utilization number that says
    * whether the capacity/shard sizing is actually filling context
    * windows. Aggregates the already-packed frame: one
    * map-side-combinable groupBy on (shard, bin). */
  def packStats(packed: DataFrame, capacity: Long): DataFrame =
    packed.groupBy("shard", "bin")
      .agg(count(lit(1)).as("n_docs"), sum(col("doc_tokens")).as("bin_tokens"))
      .withColumn("within_cap",
        col("bin_tokens") <= capacity || col("n_docs") === 1)
      .withColumn("fill_ratio",
        col("bin_tokens").cast("double") / lit(capacity.toDouble))
}
