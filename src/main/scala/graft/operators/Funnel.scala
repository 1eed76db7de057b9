package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered funnel analysis — "how many users reached step i, having
  * passed steps 1..i-1 IN ORDER?" (the reference's interaction flow:
  * README.md:8-16 chat → forecast → schedule; the NOC twin is
  * alarm → ticket → dispatch → resolution escalation).
  *
  * Semantics: a user completes step i at the EARLIEST event of step
  * i's type that is strictly after their step-(i-1) completion time
  * (the standard ordered-funnel definition — re-orderings like
  * click-before-view do not count).
  *
  * Shape: ONE aggregation. collect-the-mins won't do (step i's min
  * depends on step i-1's), so each user's per-step event times are
  * gathered as sorted arrays — bounded by that user's own event counts
  * per step type, not by the corpus — and the strictly-after chain is
  * resolved per row with codegen'd array HOFs (`filter` +
  * `array_min`). Everything shuffles once on the user key; the funnel
  * totals are a second, O(steps)-row aggregate.
  *
  * At 100 TB the risk is a hot user with millions of step events; the
  * arrays carry ONLY events whose type is in the funnel (pre-filtered
  * before the shuffle), which is the same bound any per-user funnel
  * evaluation needs to hold somewhere.
  */
object Funnel {

  /** Per-user step-completion times: user key + `step_1..step_n` epoch
    * millis (NULL = never reached). */
  def completionTimes(
      df: DataFrame,
      user: Column,
      ts: Column,
      eventType: Column,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val perStep = steps.zipWithIndex.map { case (s, i) =>
      sort_array(collect_list(when(eventType === s, unix_millis(ts)))).as(s"_ts_$i")
    }
    val gathered = df
      .filter(eventType.isin(steps: _*))
      .groupBy(user.as("_u"))
      .agg(perStep.head, perStep.tail: _*)
    // step 0 completes at its min; step i at the first element of its
    // sorted times strictly after step i-1's completion (NULL cascades)
    steps.indices.foldLeft(gathered) { case (acc, i) =>
      val t =
        // get() is 0-based and NULL on out-of-bounds (element_at throws
        // under ANSI, the session default)
        if (i == 0) get(col("_ts_0"), lit(0))
        else array_min(filter(col(s"_ts_$i"), x => x > col(s"step_${i}")))
      acc.withColumn(s"step_${i + 1}", t)
    }.select(col("_u").as("user") +: steps.indices.map(i => col(s"step_${i + 1}")): _*)
  }

  /** First-order transition matrix over per-user event sequences (the
    * Markov-chain estimate behind path analysis): counts of adjacent
    * (from → to) event-type pairs in event order, with per-source-state
    * transition probabilities. One per-user window (the same single
    * hash exchange as any lag feature) and one tiny aggregation over
    * the type×type grid; the probability normalization windows over
    * that grid, never over data. */
  def transitionMatrix(
      df: DataFrame,
      user: Column,
      ts: Column,
      eventType: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(user).orderBy(ts, eventType)
    val grid = df
      .select(eventType.as("to_type"),
        lag(eventType, 1).over(w).as("from_type"))
      .filter(col("from_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
    val tot = org.apache.spark.sql.expressions.Window.partitionBy(col("from_type"))
    grid.withColumn("p",
      col("n").cast("double") / sum(col("n")).over(tot).cast("double"))
  }

  /** Funnel summary: one row per step with the ordered-completion user
    * count and the conversion ratio vs step 1. */
  def funnelCounts(
      df: DataFrame,
      user: Column,
      ts: Column,
      eventType: Column,
      steps: Seq[String]): DataFrame = {
    val times = completionTimes(df, user, ts, eventType, steps)
    val counts = times.agg(
      count(col("step_1")).as("_c1"),
      steps.indices.drop(1).map(i => count(col(s"step_${i + 1}")).as(s"_c${i + 1}")): _*)
    val rows = steps.zipWithIndex.map { case (s, i) =>
      struct(lit(i + 1).cast("long").as("step"), lit(s).as("event_type"),
        col(s"_c${i + 1}").as("n_users"),
        (col(s"_c${i + 1}").cast("double") / col("_c1").cast("double")).as("conversion"))
    }
    counts.select(explode(array(rows: _*)).as("r")).select("r.*")
  }
}
