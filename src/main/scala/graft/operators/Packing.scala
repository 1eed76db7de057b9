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
  * is a pure per-shard FOLD: shards are the unit of parallelism
  * ([[shardsFor]] sizes them from a row-count probe so a shard's doc
  * list is comfortably task-local at any corpus scale), the fold is
  * one codegen'd HOF `aggregate`
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

  /** Shard count for a corpus of `docs` documents: targets
    * `targetDocsPerShard` docs per shard so the per-shard fold array
    * (one ~32-byte struct per doc through collect_list) stays
    * comfortably task-local — ~2 MiB at the 64k default — no matter
    * how large the corpus grows (a fixed shard count means per-shard
    * payload grows linearly with the data and eventually OOMs the
    * aggregation buffer). Clamped to ≥8 so small corpora still pack in
    * parallel; unbounded above — shard count is just a groupBy key
    * cardinality, and at 10¹¹ docs ~1.5M shards is exactly what the
    * shuffle wants. Same plan-build-time count() discipline as
    * [[Similarity.blocksFor]]. */
  def shardsFor(docs: Long, targetDocsPerShard: Long = 65536L): Int = {
    require(targetDocsPerShard >= 1, "need a positive shard target")
    math.max(8L, (docs + targetDocsPerShard - 1) / targetDocsPerShard)
      .min(Int.MaxValue.toLong).toInt
  }

  /** One row per input doc: (doc_id, doc_tokens, shard, bin) — bin ids
    * are dense per shard, 0-based, in id order.
    *
    * @param nShards explicit shard count (a different count is a
    *        different — equally valid — packing, so pin it when a
    *        replayable assignment matters, e.g. the oracle query);
    *        0 (the default) derives it from a corpus row-count probe
    *        via [[shardsFor]] so shard payloads stay bounded at any
    *        scale. */
  def packBins(
      df: DataFrame, id: Column, tokens: Column,
      capacity: Long, nShards: Int = 0, seed: Long = 0L): DataFrame = {
    require(capacity >= 1, "need a positive token capacity")
    require(nShards >= 0, "nShards: explicit positive count, or 0 = auto")
    val shards = if (nShards > 0) nShards else shardsFor(df.count())
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
          lit(shards.toLong)))
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
