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
    * of `a` lands at position 2i, bit i of `b` at 2i+1. The classic
    * mask-ladder bit spread — five shift/AND steps per column over
    * plain bitwise builtins, so the whole key stays inside whole-stage
    * codegen (the earlier `aggregate(sequence(0, bits-1), ...)` HOF
    * fold computed the identical integers but evaluated an INTERPRETED
    * lambda per bit per row: 16 lambda frames/row was most of
    * q_zorder_key's honestly-measured cost; the ladder is ~10 native
    * ops — LayoutSpec pins ladder ≡ fold on exhaustive fixtures). Same
    * integers fall out of any engine (q_zorder_key oracle replays the
    * fold form in DuckDB). `bits` ≤ 31 per column (the z-value stays
    * inside a signed 64-bit long). Inputs must be non-negative (true
    * of every key this engine z-orders; require it upstream). */
  def zValue(a: String, b: String, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits per column must be in [1, 31]")
    // spread the low `bits` bits of x to even positions: after step k,
    // groups of 2^k bits sit 2^k apart; constants are the standard
    // 64-bit Morton masks
    def spread(c: String): Column = {
      val masked = col(c).cast("long")
        .bitwiseAND(lit((1L << bits) - 1L))
      val steps = Seq(
        16 -> 0x0000FFFF0000FFFFL, 8 -> 0x00FF00FF00FF00FFL,
        4 -> 0x0F0F0F0F0F0F0F0FL, 2 -> 0x3333333333333333L,
        1 -> 0x5555555555555555L)
      steps.foldLeft(masked) { case (x, (sh, mask)) =>
        x.bitwiseOR(shiftleft(x, sh)).bitwiseAND(lit(mask))
      }
    }
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
  }

  /** The original HOF-fold form of [[zValue]] — value-identical, kept
    * as LayoutSpec's parity reference (it is also the shape the DuckDB
    * oracle replays). */
  private[graft] def zValueViaFold(a: String, b: String, bits: Int = 16): Column = {
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
