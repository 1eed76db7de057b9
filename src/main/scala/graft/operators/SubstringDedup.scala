package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact substring-level deduplication — the span-granular member of
  * the dedup family (N-gram-anchored form of Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better" — public
  * knowledge; reference README.md:102 "training data preparation").
  * Document-level dedup ([[Dedup]]) removes whole near-copies; this
  * operator finds the REGIONS duplicated across (or within) documents
  * — boilerplate headers, license blocks, quoted passages — so a
  * cleaning pipeline can cut spans instead of dropping documents.
  *
  * Semantics: a position p of a document is MARKED iff the L-token
  * window starting at p occurs more than once in the corpus (any doc,
  * including the same one — self-repeats are duplication too). Marked
  * windows then coalesce per document into maximal spans
  * ([[Intervals.mergeIntervals]] — strictly-after opens, touching
  * windows merge). Every duplicated substring of ≥ L tokens is covered
  * (each of its windows is duplicated); spans shorter than L cannot
  * trigger (the window never matches). Reported spans are the per-doc
  * UNION of duplicated L-windows, with touching windows coalescing —
  * so a merged span may contain interior L-windows that are not
  * themselves duplicated (two marked windows ≤ L apart bridge across
  * unmarked straddle windows). That union-of-windows criterion is the
  * window-anchored relaxation of "the span itself occurs elsewhere"
  * that makes the problem one equi-shuffle instead of a suffix array.
  *
  * Scale shape: the gram digest (md5 of the window's joined tokens) is
  * computed MAP-SIDE in the scan stage — the exploded rows that reach
  * the shuffle are narrow (doc, pos, 32-byte digest), never token
  * arrays. Then: one groupBy(gram) with map-side partial counts for
  * the >1 filter, one semi-join back (same key, AQE-coalesced), and
  * the per-DOC window for span merge (no global window). Work is
  * O(tokens · L) digest bytes map-side and O(positions) through both
  * exchanges — linear in corpus size at any duplication density.
  *
  * Determinism: md5 over the explicit ' '-joined window replays
  * identically in ANSI SQL (array_to_string + md5), positions are
  * exact integers, and the island merge is the hash-certified
  * [[Intervals]] discipline — the full span table hash-oracles.
  */
object SubstringDedup {

  /** (doc, pos, gram-digest) rows, digest computed MAP-SIDE so the
    * token arrays never enter a shuffle. The digest projection is the
    * native single-pass [[graft.plans.TextHashNative.gramDigests]]
    * (one joined buffer per doc, MD5 over contiguous regions) —
    * value-identical to the HOF
    * `md5(concat_ws(' ', slice(toks, p+1, L)))` it replaced, which
    * allocated an L-token slice + joined string PER POSITION and made
    * the g1.0 decade run GC-bound (round-11 verdict item 4). */
  private def gramPositions(
      df: DataFrame, id: Column, tokens: Column, L: Int): DataFrame =
    df.select(id.as("_doc"), tokens.as("_toks"))
      .filter(size(col("_toks")) >= L)
      .select(col("_doc"),
        explode(graft.plans.TextHashNative.gramDigests(col("_toks"), L))
          .as("_w"))
      .select(col("_doc"), col("_w.pos").as("pos"), col("_w.gram").as("gram"))

  /** Coalesce marked windows [pos, pos+L) into maximal per-doc spans. */
  private def toSpans(marked: DataFrame, L: Int): DataFrame =
    Intervals.mergeIntervals(
      marked.select(col("_doc").as("doc_id"),
        col("pos").cast("long").as("_s"),
        (col("pos") + lit(L)).cast("long").as("_e")),
      Seq("doc_id"), "_s", "_e")
      .select(col("doc_id"),
        col("w_start").as("span_start"), col("w_end").as("span_end"),
        (col("w_end") - col("w_start")).as("span_tokens"),
        col("n_merged").as("n_windows"))

  /** One row per (doc, maximal duplicated span):
    * (doc_id, span_start, span_end, span_tokens, n_windows) with
    * token positions 0-based, end exclusive. `minTokens` = L, the
    * anchor window length: nothing shorter than L is ever reported,
    * and window-wise duplication is exact at ≥ L (see class doc). */
  def duplicatedSpans(
      df: DataFrame, id: Column, tokens: Column,
      minTokens: Int): DataFrame = {
    require(minTokens >= 2, "need an anchor window of at least 2 tokens")
    val grams = gramPositions(df, id, tokens, minTokens)
    val dup = grams.groupBy("gram")
      .agg(count(lit(1)).as("_c")).filter(col("_c") > 1)
    toSpans(grams.join(dup.select("gram"), Seq("gram"), "left_semi"),
      minTokens)
  }

  /** Additive per-corpus gram-occurrence counts (gram, cnt) — the
    * mergeable state behind INCREMENTAL substring dedup: per-batch
    * counts simply SUM (the histogram/CMS ledger discipline), so a new
    * crawl batch dedups against everything ever seen by merging counter
    * batches instead of rescanning history. Exact counts, not a
    * sketch: the digest already compressed the window, and the >1 mark
    * needs no tolerance story. */
  def gramCounts(
      df: DataFrame, id: Column, tokens: Column, minTokens: Int): DataFrame =
    gramPositions(df, id, tokens, minTokens)
      .groupBy("gram").agg(count(lit(1)).as("cnt"))

  /** Duplicated spans of `df` judged against an EXTERNAL gram-count
    * state (e.g. the merged read-out of a [[gramCounts]] ledger that
    * already includes this batch): positions whose gram has total
    * count > 1 are marked, then windows coalesce per doc. With state =
    * the whole corpus's counts this returns exactly
    * [[duplicatedSpans]] restricted to `df`'s docs — the incremental
    * path is equivalence-testable against the batch one. */
  def spansAgainstCounts(
      df: DataFrame, id: Column, tokens: Column,
      counts: DataFrame, minTokens: Int): DataFrame = {
    require(minTokens >= 2, "need an anchor window of at least 2 tokens")
    val dup = counts.filter(col("cnt") > 1).select("gram")
    toSpans(gramPositions(df, id, tokens, minTokens)
      .join(dup, Seq("gram"), "left_semi"), minTokens)
  }

  /** Cross-corpus contamination SPANS — the GPT-3-style n-gram
    * decontamination criterion at span granularity: regions of
    * `corpus` documents every L-window of which also occurs in the
    * `bench` set (the spans to CUT, where the doc-level
    * [[TextAnalysis.contamination]] only counts shared shingles).
    * Same machinery as [[duplicatedSpans]] with the mark condition
    * "gram ∈ bench grams" instead of "gram count > 1": one distinct
    * over bench digests, one semi-join, the per-doc island merge —
    * O(corpus positions + bench positions) through narrow shuffles. */
  def crossSpans(
      corpus: DataFrame, idC: Column, tokensC: Column,
      bench: DataFrame, idB: Column, tokensB: Column,
      minTokens: Int): DataFrame = {
    require(minTokens >= 2, "need an anchor window of at least 2 tokens")
    val cg = gramPositions(corpus, idC, tokensC, minTokens)
    val bg = gramPositions(bench, idB, tokensB, minTokens)
      .select("gram").distinct()
    toSpans(cg.join(bg, Seq("gram"), "left_semi"), minTokens)
  }

  /** Per-doc NOVELTY of a batch against a history gram state (the
    * merged read-out of a [[gramCounts]] ledger that does NOT yet
    * include this batch): what fraction of each doc's L-windows was
    * never seen before — the "is this crawl adding anything" signal an
    * ingest pipeline reads per batch before paying to keep it.
    * Returns (doc_id, n_windows, novel_windows, novelty) for every doc
    * with ≥ L tokens; the ratio divides two per-doc integers, so it is
    * bit-exact cross-engine. One narrow equi join against the distinct
    * history digests, one map-side-combinable groupBy — O(batch
    * positions) regardless of history size. */
  def noveltyReport(
      df: DataFrame, id: Column, tokens: Column,
      history: DataFrame, minTokens: Int): DataFrame = {
    require(minTokens >= 2, "need an anchor window of at least 2 tokens")
    val seen = history.select("gram").distinct().withColumn("_seen", lit(1))
    gramPositions(df, id, tokens, minTokens)
      .join(seen, Seq("gram"), "left")
      .groupBy(col("_doc").as("doc_id"))
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("_seen").isNull, 1L).otherwise(0L)).as("novel_windows"))
      .withColumn("novelty",
        col("novel_windows").cast("double") / col("n_windows").cast("double"))
  }

  /** Apply a span table (from [[duplicatedSpans]] or [[crossSpans]])
    * to the documents: tokens inside any span are CUT and the
    * remainder re-joined — the "remove the boilerplate, keep the doc"
    * transform a cleaning pipeline actually ships. Docs without spans
    * pass through untouched (left join); a fully-covered doc yields an
    * empty clean_text, not a dropped row — the caller's min-length
    * filter decides its fate downstream.
    *
    * Shape: spans collapse to one array per doc (bounded by doc
    * length), one equi join, then a pure per-row HOF projection —
    * O(doc tokens × its spans) with no further shuffle. */
  def cutSpans(
      df: DataFrame, id: Column, tokens: Column,
      spans: DataFrame): DataFrame = {
    val sp = spans.groupBy("doc_id").agg(
      collect_list(struct(col("span_start").as("s"), col("span_end").as("e")))
        .as("_spans"))
    df.select(id.as("doc_id"), tokens.as("_toks"))
      .join(sp, Seq("doc_id"), "left")
      .withColumn("_kept", filter(
        transform(col("_toks"), (t, i) => struct(i.cast("long").as("p"), t.as("t"))),
        x => coalesce(
          !exists(col("_spans"),
            s => x.getField("p") >= s.getField("s") &&
              x.getField("p") < s.getField("e")),
          lit(true))))
      .select(col("doc_id"),
        size(col("_toks")).cast("long").as("n_tokens"),
        (size(col("_toks")) - size(col("_kept"))).cast("long").as("n_removed"),
        concat_ws(" ", transform(col("_kept"), x => x.getField("t")))
          .as("clean_text"))
  }

  /** Per-doc summary over [[duplicatedSpans]]: duplicated-token count
    * and ratio against the doc's token total — the "what fraction of
    * this document is boilerplate" number a mixing policy consumes.
    * Docs with no duplicated span report 0 (left join on the spine). */
  def duplicationReport(
      df: DataFrame, id: Column, tokens: Column,
      minTokens: Int): DataFrame = {
    val spans = duplicatedSpans(df, id, tokens, minTokens)
      .groupBy("doc_id")
      .agg(sum(col("span_tokens")).as("dup_tokens"),
        count(lit(1)).as("n_spans"))
    df.select(id.as("doc_id"), size(tokens).cast("long").as("n_tokens"))
      .join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        (coalesce(col("dup_tokens"), lit(0L)).cast("double")
          / col("n_tokens")).as("dup_ratio"))
  }
}
