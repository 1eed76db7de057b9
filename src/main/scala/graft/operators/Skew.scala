package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY.md §4 "Skew handling"; ARCHITECTURE.md).
  *
  * AQE splits skewed SHUFFLE partitions automatically, but a single
  * pathological group key (one site emitting 30% of all events) still
  * funnels into one reducer for aggregation. Salting splits each key
  * into `saltBuckets` sub-keys, aggregates partially per (key, salt),
  * then merges — two small shuffles instead of one hot one.
  *
  * Works for any DECOMPOSABLE aggregate (sum/count/min/max and the
  * exact-decimal sums used across this engine). Results are identical
  * to the direct aggregation — the salted form is oracle-checked
  * against plain GROUP BY SQL (q_skew_salted_agg).
  */
object Skew {

  /** Salted two-phase sum/count aggregation.
    *
    * @param sums (outputName → column to exact-decimal-sum)
    */
  def saltedSumCount(
      df: DataFrame,
      key: String,
      saltBuckets: Int,
      sums: Seq[(String, Column)]): DataFrame = {
    val salted = df.withColumn("_salt", pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets)))
    val partial = salted.groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_n"),
        sums.map { case (n, c) =>
          sum(c.cast(org.apache.spark.sql.types.DecimalType(27, 4))).as(s"_s_$n")
        }: _*)
    partial.groupBy(col(key))
      .agg(sum(col("_n")).as("n"),
        sums.map { case (n, _) => sum(col(s"_s_$n")).cast("double").as(n) }: _*)
  }
}
