package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Column-level data-quality profiling — the observability operator a
  * long-lived ingest pipeline runs on every batch (schema-drift /
  * null-regression / cardinality-explosion detection; the reference's
  * "growing knowledge base" implies exactly this kind of per-load
  * audit, README.md:11,30).
  *
  * Per profiled column: row count, null count + rate, EXACT distinct
  * count, native-ordering min/max (rendered to string), and the modal
  * value with its frequency (deterministic tie-break: smallest value).
  *
  * Scale shape: ONE melt of the k profiled columns to (column, value)
  * rows and ONE shuffle keyed on (column, value) — map-side partial
  * aggregation collapses each task to its distinct values before the
  * exchange, and the k per-column distinct aggregates that would each
  * cost Spark an Expand+shuffle collapse into that same single pass.
  * Stage 2 reduces the per-value counts (already tiny) to one row per
  * column. Min/max use the column's NATIVE ordering (a string-cast
  * min would order "10" < "9") via one shuffle-free global aggregate
  * whose single row broadcast-joins back.
  *
  * Values are compared/counted through a canonical string rendering,
  * so heterogeneous column types share one melt. Callers profile
  * columns whose rendering is engine-portable (ints, strings, dates,
  * moderate doubles) when an external oracle must replay the profile.
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val melted = df.select(explode(array(cols.map(c =>
      struct(lit(c).as("column_name"), col(c).cast("string").as("val"))): _*)).as("m"))
      .select("m.column_name", "m.val")
    val counts = melted.groupBy("column_name", "val")
      .agg(count(lit(1)).as("cnt"))
    val prof = counts.groupBy("column_name").agg(
      sum(col("cnt")).as("n_rows"),
      coalesce(sum(when(col("val").isNull, col("cnt"))), lit(0L)).as("n_null"),
      count(when(col("val").isNotNull, lit(1))).as("n_distinct"),
      // modal non-null value: max count, ties to the smallest value —
      // min over (−cnt, val) is that ordering as one reduction
      min(when(col("val").isNotNull, struct((-col("cnt")).as("_negcnt"), col("val")))).as("_mode"))
    val mmAggs = cols.map(c => min(col(c)).cast("string").as(s"_min_$c")) ++
      cols.map(c => max(col(c)).cast("string").as(s"_max_$c"))
    val mm = df.agg(mmAggs.head, mmAggs.tail: _*)
    val mmMelted = mm.select(explode(array(cols.map(c =>
      struct(lit(c).as("column_name"),
        col(s"_min_$c").as("min_val"), col(s"_max_$c").as("max_val"))): _*)).as("m"))
      .select("m.column_name", "m.min_val", "m.max_val")
    prof
      .join(broadcast(mmMelted), "column_name")
      .withColumn("null_rate", col("n_null").cast("double") / col("n_rows").cast("double"))
      .select(col("column_name"), col("n_rows"), col("n_null"), col("null_rate"),
        col("n_distinct"), col("min_val"), col("max_val"),
        col("_mode.val").as("mode_val"), (-col("_mode._negcnt")).as("mode_cnt"))
  }
}
