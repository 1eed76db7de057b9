package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism helpers for the DuckDB-oracle gate (SURVEY.md §7.4.6).
  *
  * Floating-point aggregation is order-dependent; Spark's parallel partial
  * aggregates and DuckDB's single-threaded fold would hash-differ in the
  * last ulp. Fix: aggregate in exact decimal arithmetic (associative,
  * order-independent) and cast the final value back to double. Both
  * engines then produce bit-identical doubles.
  *
  * The matching SQL shape is e.g.
  *   CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)
  */
object OracleCompat {

  /** Exact, order-independent SUM of a double expression → double. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(27, scale))).cast("double")

  /** Exact AVG: decimal sum divided by count, both deterministic. */
  def davg(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(27, scale))).cast("double") / count(c)

  /** Sample stddev via exact decimal moments:
    * sqrt((n*Σx² − (Σx)²) / (n*(n−1))). Matches the same explicit formula
    * in DuckDB SQL — unlike the built-in stddev_samp whose accumulation
    * order differs between engines. */
  def dstddev(c: Column): Column = {
    val n = count(c).cast("double")
    val sx = sum(c.cast(DecimalType(27, 6))).cast("double")
    val sxx = sum((c * c).cast(DecimalType(27, 6))).cast("double")
    sqrt((n * sxx - sx * sx) / (n * (n - lit(1.0))))
  }

  /** Millisecond epoch — the timestamp representation safe to hash-compare
    * across Spark (µs) and DuckDB (ns) readers of the same parquet. */
  def epochMs(c: Column): Column = unix_millis(c)
}
