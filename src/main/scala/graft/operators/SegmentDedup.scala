package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Segment-level exact corpus dedup with document reconstruction — the
  * C4/RefinedWeb "remove duplicated lines across the corpus" step,
  * generalized to fixed-width token segments (this corpus has no
  * newlines; a W-token window is the line analogue).
  *
  * Semantics: split every document into consecutive W-token segments; a
  * FULL segment (exactly W tokens) that appears verbatim anywhere else
  * in the corpus survives only at its globally-first occurrence (min
  * (doc_id, seg_id) lexicographically); partial tail segments always
  * survive. Documents are then rebuilt from their surviving segments in
  * order, so a fully-duplicated document collapses to its partial tail
  * while the first copy keeps everything — exactly C4's behavior where
  * repeated boilerplate lines vanish from all-but-one page.
  *
  * 100 TB shape: the only relations that reach an exchange are
  * ids-only — (md5(segment), doc_id, seg_id) for candidate generation
  * and (doc_id, drop_ids[]) for rebuild. Document text itself is never
  * exploded into a shuffle: segment hashes are computed by codegen'd
  * HOFs inside the scan projection, the duplicate-winner aggregation is
  * a single hash-partitioned groupBy over 16-byte keys, and the drop
  * lists (O(duplicate occurrences), typically a tiny fraction of the
  * corpus) flow back via an AQE-broadcastable join keyed on doc_id.
  * Rebuild is a per-row HOF filter over the in-place text column.
  */
object SegmentDedup {

  /** Per-document segment-text array: element i is tokens
    * [i*width, min((i+1)*width, n)) joined by a single space. */
  private def segmentsOf(toks: Column, width: Int): Column = {
    val nseg = ceil(size(toks).cast("double") / width).cast("int")
    transform(sequence(lit(0), greatest(nseg, lit(1)) - 1),
      i => array_join(slice(toks, i * width + 1, lit(width)), " "))
  }

  /** Ids-only exploded relation of FULL segments:
    * (_h md5-hex, _id, _seg_id). The text column never leaves the
    * projection — only its 32-char hash does. */
  def fullSegmentIds(df: DataFrame, id: String, text: String, width: Int): DataFrame = {
    val toks = split(col(text), " ")
    df.select(col(id).as("_id"), size(toks).as("_n"),
        posexplode(segmentsOf(toks, width)).as(Seq("_seg_id", "_seg")))
      .where(col("_n") - col("_seg_id") * width >= width)
      .select(md5(col("_seg")).as("_h"), col("_id"), col("_seg_id"))
  }

  /** Per-document drop lists: (_id, _drop_ids sorted array<int>) listing
    * the full segments that are duplicate non-first occurrences. Only
    * documents that lose at least one segment appear. */
  def dropLists(df: DataFrame, id: String, text: String, width: Int): DataFrame = {
    val ids = fullSegmentIds(df, id, text, width)
    // winner = lexicographic min (doc_id, seg_id) — order-independent,
    // so the aggregation is partitioning/AQE-insensitive.
    val dups = ids.groupBy("_h")
      .agg(min(struct(col("_id"), col("_seg_id"))).as("_w"), count(lit(1)).as("_c"))
      .where(col("_c") > 1)
      .select("_h", "_w")
    ids.join(dups, "_h")
      .where(struct(col("_id"), col("_seg_id")) =!= col("_w"))
      .groupBy("_id")
      .agg(array_sort(collect_list(col("_seg_id"))).as("_drop_ids"))
  }

  /** Cross-group content-leakage matrix: for every pair of groups
    * (sources, crawls, snapshots) the number of DISTINCT full W-token
    * segments both contain verbatim, with per-group totals and the
    * segment-set Jaccard — the corpus-governance "how much of source A
    * leaked into source B" report.
    *
    * Same 100 TB discipline as the dedup path: only (group, 16-byte
    * hash) ids reach the exchanges. The pair join is hash-keyed; its
    * fan-out per hash is bounded by the number of GROUPS containing the
    * segment (≤ #groups, a small constant), never by occurrence counts,
    * because the relation is distinct-per-group first. */
  def crossGroupOverlap(
      df: DataFrame, text: String, group: String, width: Int): DataFrame = {
    val toks = split(col(text), " ")
    val rel = df
      .select(col(group).as("_g"), size(toks).as("_n"),
        posexplode(segmentsOf(toks, width)).as(Seq("_seg_id", "_seg")))
      .where(col("_n") - col("_seg_id") * width >= width)
      .select(col("_g"), md5(col("_seg")).as("_h"))
      .distinct()
    val totals = rel.groupBy("_g").agg(count(lit(1)).as("_tot"))
    val pairs = rel.select(col("_g").as("source_a"), col("_h"))
      .join(rel.select(col("_g").as("source_b"), col("_h")), Seq("_h"))
      .where(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("shared_segments"))
    pairs
      .join(totals.select(col("_g").as("source_a"), col("_tot").as("segs_a")), Seq("source_a"))
      .join(totals.select(col("_g").as("source_b"), col("_tot").as("segs_b")), Seq("source_b"))
      .withColumn("jaccard",
        col("shared_segments").cast("double") /
          (col("segs_a") + col("segs_b") - col("shared_segments")).cast("double"))
      .select("source_a", "source_b", "shared_segments", "segs_a", "segs_b", "jaccard")
  }

  /** Rebuild: original rows plus
    *   n_segs      — total segments in the document,
    *   n_dropped   — duplicate full segments removed,
    *   new_n_tokens— token count after removal,
    *   new_text    — surviving segments rejoined in order.
    * Exact and fully hash-oracle-checkable (no RNG, no floats). */
  def dedupSegments(df: DataFrame, id: String, text: String, width: Int): DataFrame = {
    val drops = dropLists(df, id, text, width)
    val joined = df.join(drops, df(id) === drops("_id"), "left").drop("_id")
    val toks = split(col(text), " ")
    val segs = segmentsOf(toks, width)
    val dropIds = coalesce(col("_drop_ids"), array().cast("array<int>"))
    joined
      .withColumn("n_segs", size(segs).cast("long"))
      .withColumn("n_dropped", size(dropIds).cast("long"))
      .withColumn("new_n_tokens", size(toks).cast("long") - col("n_dropped") * width)
      .withColumn("new_text",
        array_join(filter(segs, (_, i) => !array_contains(dropIds, i)), " "))
      .drop("_drop_ids")
  }
}
