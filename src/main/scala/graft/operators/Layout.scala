package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout operators for multi-dimensional data skipping
  * (SURVEY.md §4 "Partitioning & shuffle").
  *
  * Sorting a table by ONE key gives parquet min/max pruning on that key
  * and nothing else. Z-ORDERING by two keys interleaves their bits into
  * one sort key, so every file holds a small rectangle of the (a, b)
  * space — range predicates on EITHER column skip most files. This is
  * the standard layout trick for fact tables queried along several
  * dimensions (site AND day, partkey AND suppkey) at 100 TB, where a
  * second full copy sorted the other way is not an option.
  */
object Layout {

  /** Morton (Z-curve) value of two non-negative integer columns: bit i
    * of `a` lands at position 2i, bit i of `b` at 2i+1. Pure built-in
    * arithmetic inside one HOF fold — codegen'd, per-row, exact — and
    * the same integers fall out of any engine (q_zorder_key oracle).
    * `bits` ≤ 31 per column (the z-value stays inside a signed 64-bit
    * long). Inputs must be non-negative (true of every key this engine
    * z-orders; require it upstream). */
  def zValue(a: String, b: String, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits per column must be in [1, 31]")
    expr(
      s"""aggregate(sequence(0, ${bits - 1}), CAST(0 AS BIGINT),
         |  (acc, i) -> acc
         |    + (CAST(shiftright($a, i) AS BIGINT) % 2) * shiftleft(CAST(1 AS BIGINT), 2*i)
         |    + (CAST(shiftright($b, i) AS BIGINT) % 2) * shiftleft(CAST(1 AS BIGINT), 2*i+1))"""
        .stripMargin)
  }

  /** Rewrite a frame into a z-ordered layout: range-partition by the
    * interleaved key (so files tile the z-curve contiguously), sort
    * within partitions, drop the helper column. Write the result with
    * any parquet sink and min/max row-group stats prune on BOTH `a`
    * and `b`. One shuffle, same as any global sort. */
  def zOrderBy(df: DataFrame, a: String, b: String,
      numPartitions: Int, bits: Int = 16): DataFrame =
    df.withColumn("_z", zValue(a, b, bits))
      .repartitionByRange(numPartitions, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
}
