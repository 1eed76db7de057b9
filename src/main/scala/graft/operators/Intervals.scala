package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval coalescing and downtime accounting — the classic NOC
  * availability computation (reference README.md:20-38: outage windows
  * over alarm streams → per-site downtime / availability reporting).
  *
  * An alarm stream yields one interval per alarm; concurrent alarms on
  * the same site overlap, and the business quantity is the union of the
  * intervals (a site down twice at once is down once). The union is
  * computed with the islands-and-gaps trick:
  *
  *   1. order each key's intervals by (start, end);
  *   2. a row OPENS a new island iff its start lies strictly after the
  *      running max end of everything before it (touching intervals
  *      merge: [1,5]+[5,8] → [1,8]);
  *   3. the running sum of "opens" numbers the islands; grouping by
  *      (key, island) collapses each union span to one row.
  *
  * Scale shape: ONE hash exchange on the key for the window, and the
  * follow-up groupBy(key, island) reuses that partitioning (its keys
  * extend the window's partition keys, so EnsureRequirements inserts no
  * second shuffle — IntervalsSpec pins this). Per-row state is O(1);
  * nothing is ever collected or broadcast. Hot keys are bounded by the
  * alarms a single site can emit, which is ingest-bounded in practice.
  *
  * Determinism: island numbering depends only on the (start, end) order
  * within a key — ties carry identical running-max contributions — so
  * the output is partitioning-insensitive and hash-oracles cleanly.
  */
object Intervals {

  /** Coalesce overlapping-or-touching [start, end] intervals per key.
    * Output: keys ++ (w_start, w_end, n_merged), one row per union
    * span. `start`/`end` may be any orderable numeric (epoch millis
    * recommended — exact long arithmetic end to end). */
  def mergeIntervals(
      df: DataFrame,
      keys: Seq[String],
      start: String,
      end: String): DataFrame = {
    val kcols = keys.map(col)
    val ordered = Window.partitionBy(kcols: _*).orderBy(col(start), col(end))
    val prevMaxEnd = max(col(end))
      .over(ordered.rowsBetween(Window.unboundedPreceding, -1))
    // First row of a key: prevMaxEnd is NULL, the > is NULL, otherwise(0)
    // applies — island ids then start at 0 in both engines.
    val opens = when(col(start) > prevMaxEnd, 1).otherwise(0)
    df.withColumn("_opens", opens)
      .withColumn("_island",
        sum(col("_opens")).over(ordered.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(kcols :+ col("_island"): _*)
      .agg(
        min(col(start)).as("w_start"),
        max(col(end)).as("w_end"),
        count(lit(1)).as("n_merged"))
      .drop("_island")
  }

  /** [[mergeIntervals]] with a WEIGHT column summed instead of rows
    * counted — the re-merge form an incremental fold needs: a stored
    * already-coalesced window carries the alarm count it absorbed, and
    * merging it with fresh weight-1 alarm intervals must SUM counts,
    * not recount rows. Interval union is island-associative (islands
    * of the overlap-or-touch relation are the same however the rows
    * were pre-merged), so fold-then-merge ≡ merge-all-at-once — the
    * law the streaming outage ledger's oracle replays. */
  def mergeIntervalsWeighted(
      df: DataFrame,
      keys: Seq[String],
      start: String,
      end: String,
      weight: String): DataFrame = {
    val kcols = keys.map(col)
    val ordered = Window.partitionBy(kcols: _*).orderBy(col(start), col(end))
    val prevMaxEnd = max(col(end))
      .over(ordered.rowsBetween(Window.unboundedPreceding, -1))
    val opens = when(col(start) > prevMaxEnd, 1).otherwise(0)
    df.withColumn("_opens", opens)
      .withColumn("_island",
        sum(col("_opens")).over(ordered.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(kcols :+ col("_island"): _*)
      .agg(
        min(col(start)).as("w_start"),
        max(col(end)).as("w_end"),
        sum(col(weight)).cast("long").as("n_merged"))
      .drop("_island")
  }

  // ---- streaming outage-window ledger (N53 under the hash gate) -------

  /** Latest COMPLETE open-window state STRICTLY BEFORE `beforeBatch`:
    * (open windows, watermark). Complete = the batch's `final/b<k>`
    * sibling committed — `final` is the fold's LAST write, so gating on
    * it (the cusumPrior pattern, r19 advisor fix) means a crash window
    * between the state and final commits can never be READ: without
    * the gate, a read in that window transiently dropped every window
    * the half-crashed batch finalized (filtered out of its state,
    * not yet in `final`), breaking read ≡ merge-all-at-once until
    * redelivery. Reading "before" rather than "latest" makes a
    * half-crashed batch's own recompute deterministic — it always
    * folds from the predecessor state, whether or not its own state
    * commit survived. */
  private def outageState(
      spark: org.apache.spark.sql.SparkSession, path: String,
      beforeBatch: Long): (DataFrame, Long) = {
    val empty = spark.range(0).select(
      col("id").as("site_id"), col("id").as("w_start"),
      col("id").as("w_end"), col("id").as("n_merged"))
    val (fs, root) = LedgerFiles.fsOf(spark, path)
    val ids = LedgerFiles.batchDirs(fs, root, "final")
      .map(p => new org.apache.hadoop.fs.Path(p).getName.drop(1).toLong)
      .filter(_ < beforeBatch)
    if (ids.isEmpty) (empty, Long.MinValue)
    else {
      val st = spark.read.parquet(s"$path/state/b${ids.max}")
      (st.filter(col("site_id") >= 0L)
        .select("site_id", "w_start", "w_end", "n_merged"),
        st.agg(max(col("wm"))).head.getLong(0))
    }
  }

  /** Ingestion-time fold for the streaming outage-window tracker (the
    * ledgered form of [[graft.streaming.StreamingOps.outageWindows]],
    * N53 → N45 composition): each micro-batch of (site_id, start_ms,
    * end_ms) alarm intervals merges into the per-site OPEN windows
    * carried in `state/` (weighted islands merge — counts sum), the
    * event-time watermark advances to max(start_ms) − latenessMs, and
    * every merged window whose end the watermark passed is FINAL — no
    * alarm that could still extend it (start ≤ end < wm) can arrive —
    * so it appends to the `final/` ledger exactly once.
    *
    * Exactly-once effect without an applied-batches side table: both
    * writes are [[LedgerFiles.atomicAppendAt]] the batch's OWN id
    * (staging + one rename, no-op if committed), the fold reads the
    * state strictly BEFORE its id, and the batch effect is a pure
    * function of (predecessor state, batch) — so a redelivered or
    * half-crashed batch recomputes identical rows and converges.
    * State is O(open windows); the ledger read never touches alarms.
    *
    * @return the function to pass to `stream.writeStream.foreachBatch` */
  def outageLedgerBatch(
      path: String, latenessMs: Long): (DataFrame, Long) => Unit = {
    (batch, batchId) =>
      val spark = batch.sparkSession
      val (fs, root) = LedgerFiles.fsOf(spark, path)
      val done =
        fs.exists(new org.apache.hadoop.fs.Path(root, s"final/b$batchId"))
      if (!done && !batch.isEmpty) {
        val (open0, wm0) = outageState(spark, path, batchId)
        val maxTs = batch.agg(max(col("start_ms"))).head.getLong(0)
        val wm = math.max(wm0, maxTs - latenessMs)
        val incoming = batch.select(
          col("site_id").cast("long").as("site_id"),
          col("start_ms").cast("long").as("w_start"),
          col("end_ms").cast("long").as("w_end"),
          lit(1L).as("n_merged"))
        val merged = graft.core.CacheGovernor.persistTracked(
          mergeIntervalsWeighted(open0.unionByName(incoming),
            Seq("site_id"), "w_start", "w_end", "n_merged"))
        // the wm rides a sentinel row so an all-finalized state still
        // carries it; readers filter site_id < 0
        val sentinel = spark.range(1).select(
          lit(-1L).as("site_id"), lit(0L).as("w_start"),
          lit(0L).as("w_end"), lit(0L).as("n_merged"))
        // state commits FIRST, final LAST: final/b<id> is the done
        // marker, so a crash between the two recomputes state/b<id>
        // idempotently (atomicAppendAt skips committed dirs)
        LedgerFiles.atomicAppendAt(spark, path, "state",
          merged.filter(col("w_end") >= wm).unionByName(sentinel)
            .withColumn("wm", lit(wm)), batchId)
        LedgerFiles.atomicAppendAt(spark, path, "final",
          merged.filter(col("w_end") < wm)
            .select("site_id", "w_start", "w_end", "n_merged"), batchId)
      }
  }

  /** The complete coalesced-window read over an [[outageLedgerBatch]]
    * ledger: every FINALIZED window (appended exactly once, immutable)
    * plus the still-open state — together ≡ the batch
    * [[mergeIntervals]] over the whole alarm history, which is exactly
    * what the DuckDB oracle replays. `finalized` marks which side a
    * window came from (replayable: w_end < final watermark). */
  def outageLedgerWindows(
      spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    val fin = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$path/final")
      .select("site_id", "w_start", "w_end", "n_merged")
      .withColumn("finalized", lit(true))
    val (open, _) = outageState(spark, path, Long.MaxValue)
    fin.unionByName(open.withColumn("finalized", lit(false)))
  }

  /** Per-key downtime report over coalesced spans: total down time,
    * window count, longest window, and availability against a caller-
    * supplied observation span. All integer arithmetic except the final
    * availability ratio (one long→double division — correctly rounded
    * IEEE, engine-portable below 2^53). */
  def downtimeStats(
      merged: DataFrame,
      keys: Seq[String],
      spanStart: Column,
      spanEnd: Column): DataFrame = {
    val kcols = keys.map(col)
    val dur = col("w_end") - col("w_start")
    merged
      .groupBy(kcols: _*)
      .agg(
        sum(dur).as("downtime"),
        count(lit(1)).as("n_windows"),
        max(dur).as("longest"))
      .withColumn("availability",
        lit(1.0) - col("downtime").cast("double") / (spanEnd - spanStart).cast("double"))
  }
}
