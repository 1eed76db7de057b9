package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-snapshot crawl revisit dedup — the CommonCrawl-shaped
  * ingestion step that PRECEDES every content operator (reference
  * README.md:33 raw-log ingestion; harness north-star dedup family):
  * the same URL is re-fetched every snapshot, and a pipeline must
  * decide — from a ledger, without reprocessing stored content —
  * whether the fetch is a brand-new page, an unchanged revisit (skip:
  * the common case, most of the crawl by volume), or a changed page
  * (reprocess + record the transition).
  *
  * Storage follows the repo's ledger discipline
  * ([[Dedup.writeMinHashRelation]] / N39): the ledger is an
  * APPEND-ONLY parquet event log of (url, content_md5, snap) visit
  * rows — appends are O(batch) delta files, nothing is rewritten —
  * and the current state FOLDS OUT on read. Append ≡ rebuild holds
  * structurally (the fold is a function of the event SET: batch
  * boundaries vanish in the groupBy), and redelivered batches
  * collapse in the same fold (duplicate (url, snap) rows dedup before
  * any ordering logic), so at-least-once delivery needs no writer-side
  * coordination at all.
  *
  * Scale shape: the fold is one map-side-combining groupBy on
  * (url, snap) followed by one per-URL window whose partitions hold
  * at most #snapshots rows — ids/hashes only ever shuffle, never
  * content. The ingestion gate ([[freshDocs]]) is a left join of the
  * incoming snapshot against the folded (url → latest_md5) state on
  * url — broadcastable when the URL universe fits, hash-join
  * otherwise — exactly the anti-join shape of
  * [[Dedup.dedupAgainstIndex]], with which it composes: fresh rows
  * flow into the incremental minhash index, unchanged revisits never
  * touch it.
  */
object CrawlRevisit {

  /** One visit-event row per document of a snapshot. */
  def visitEvents(
      snapshot: DataFrame, url: Column, content: Column,
      snapId: Long): DataFrame =
    snapshot.select(url.as("url"), md5(content).as("content_md5"),
      lit(snapId).as("snap"))

  /** Seed a ledger with the first snapshot. */
  def writeLedger(snapshot: DataFrame, url: Column, content: Column,
      snapId: Long, path: String): Unit = {
    val (fs, root) = LedgerFiles.fsOf(snapshot.sparkSession, path)
    fs.delete(new org.apache.hadoop.fs.Path(root, "visits"), true)
    LedgerFiles.atomicAppendAt(snapshot.sparkSession, path, "visits",
      visitEvents(snapshot, url, content, snapId), snapId)
  }

  /** Delta-append one snapshot (O(batch); idempotent under redelivery
    * both ways: the write is a staged atomic rename keyed by the snap
    * id — a redelivered snapshot's commit already exists and the call
    * no-ops — and the read-side fold collapses duplicate (url, snap)
    * events regardless). */
  def appendSnapshot(snapshot: DataFrame, url: Column, content: Column,
      snapId: Long, path: String): Unit =
    LedgerFiles.atomicAppendAt(snapshot.sparkSession, path, "visits",
      visitEvents(snapshot, url, content, snapId), snapId)

  /** The raw event log — every committed batch. */
  def readVisits(spark: SparkSession, path: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(s"$path/visits")

  /** Fold the event log into per-URL state: first/last snapshot seen,
    * distinct-visit count, the latest content hash, and the number of
    * OBSERVED content transitions (consecutive-visit md5 changes —
    * A→B→A counts twice; distinct-count would say one). */
  def revisitReport(visits: DataFrame): DataFrame = {
    // redelivery collapse: a (url, snap) pair is one visit no matter
    // how many times its batch was delivered (same fetch ⇒ same md5,
    // so any aggregate is the identity; max keeps it deterministic)
    val v = visits.groupBy("url", "snap")
      .agg(max(col("content_md5")).as("content_md5"))
    val w = Window.partitionBy("url").orderBy("snap")
    v.withColumn("_prev", lag(col("content_md5"), 1).over(w))
      .groupBy("url")
      .agg(
        min(col("snap")).as("first_seen"),
        max(col("snap")).as("last_seen"),
        count(lit(1)).as("n_visits"),
        expr("max_by(content_md5, snap)").as("latest_md5"),
        sum(when(col("_prev").isNotNull &&
          col("_prev") =!= col("content_md5"), 1L).otherwise(0L))
          .as("n_changes"))
  }

  /** The ingestion gate: rows of an incoming snapshot whose URL is new
    * to the ledger OR whose content differs from the ledger's latest —
    * everything an unchanged revisit would waste downstream compute
    * on is dropped here. `state` is [[revisitReport]]'s output (or any
    * (url, latest_md5) relation). */
  def freshDocs(
      snapshot: DataFrame, url: Column, content: Column,
      state: DataFrame): DataFrame =
    snapshot
      .withColumn("_url", url)
      .withColumn("_md5", md5(content))
      .join(state.select(col("url").as("_url"), col("latest_md5")),
        Seq("_url"), "left")
      .filter(col("latest_md5").isNull ||
        col("latest_md5") =!= col("_md5"))
      .drop("_url", "_md5", "latest_md5")
}
