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
