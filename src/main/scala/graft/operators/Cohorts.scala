package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort retention analysis — "of the users/sites first seen in week
  * W, how many were still active in W+k?" (the reference's engagement
  * side: README.md:8-16 tracks operator interactions with the
  * assistant; the NOC twin is site-health cohorting after a rollout).
  *
  * Shape: two user-keyed aggregations (first-seen week; distinct
  * active weeks) joined on the user key — all shuffles are on the
  * high-cardinality user column, never on the tiny cohort grid. The
  * final matrix is O(weeks²) rows; the cohort-size normalization runs
  * a window over THAT aggregated grid, so the unpartitioned-window
  * guard (PlanSpec) never sees raw data under it.
  *
  * Portability: cohorts are epoch-millis of date_trunc('week') — both
  * engines truncate to Monday 00:00 — and the week offset is an exact
  * integer division of millis deltas; the retention ratio is a single
  * long→double division (correctly rounded everywhere).
  */
object Cohorts {

  /** Retention matrix: one row per (cohort_ms, week_offset) with the
    * distinct active-entity count and the retention ratio vs the
    * cohort's week-0 size. */
  def retention(df: DataFrame, user: Column, ts: Column): DataFrame = {
    val weekMs = lit(604800000L)
    val firstSeen = df
      .groupBy(user.as("_u"))
      .agg(unix_millis(date_trunc("week", min(ts))).as("cohort_ms"))
    val activity = df
      .select(user.as("_u"), unix_millis(date_trunc("week", ts)).as("week_ms"))
      .distinct()
    val grid = activity
      .join(firstSeen, "_u")
      .groupBy(col("cohort_ms"),
        ((col("week_ms") - col("cohort_ms")) / weekMs).cast("long").as("week_offset"))
      .agg(countDistinct(col("_u")).as("n_users"))
    val w = Window.partitionBy(col("cohort_ms"))
    grid.withColumn("retention",
      col("n_users").cast("double") /
        max(when(col("week_offset") === 0L, col("n_users"))).over(w).cast("double"))
  }
}
