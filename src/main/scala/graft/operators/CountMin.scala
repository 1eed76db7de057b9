package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable Count–Min frequency sketch (Cormode–Muthukrishnan) — the
  * point-frequency member of the engine's sketch family (HLL
  * cardinality N41, Misra–Gries top-k N43, Bloom membership N49,
  * histogram quantiles N54): d×w integer counters answer "how often did
  * key x occur?" for EVERY key in O(d) reads, where Misra–Gries keeps
  * only the k heaviest. Counters are plain additive counts, so
  * per-batch / per-source sketches SUM into the whole-corpus sketch
  * under any merge tree with no historical rescan.
  *
  * Guarantees: est(x) ≥ true(x) always (counters only ever over-count);
  * est(x) ≤ true(x) + εN with probability 1−δ for w = ⌈e/ε⌉,
  * d = ⌈ln 1/δ⌉ (each depth row is an independent bound; the min takes
  * the best).
  *
  * Portability is the point of this implementation: bucket_j(x) =
  * md5₆₀(j ‖ '|' ‖ x) mod w uses the engine's PORTABLE 60-bit md5
  * family ([[graft.functions.PortableHash]]), so an ANSI-SQL engine
  * recomputes the ENTIRE sketch — every counter and therefore every
  * estimate — bit-identically. The oracle consequently certifies exact
  * sketch equality, a strictly stronger check than the banded oracles
  * the randomized sketches (HLL) must settle for.
  *
  * 100 TB shape: build is one groupBy on (keys, depth, bucket) — the
  * grouping space is d·w per key group, so map-side partial aggregation
  * collapses every task to ≤ d·w rows before the exchange and the
  * shuffle is O(d·w·tasks), independent of corpus size. The d bucket
  * columns are a literal unrolled array (no HOF lambda) — the whole
  * projection stays in whole-stage codegen. Estimation broadcasts the
  * (≤ d·w)-row counter table against the probe keys.
  */
object CountMin {

  /** Portable bucket of `key` for depth row `j`: md5₆₀(j‖'|'‖key) mod w.
    * DuckDB spelling:
    * `('0x' || substr(md5(j::VARCHAR || '|' || key), 1, 15))::BIGINT % w`. */
  def bucket(key: Column, j: Int, width: Int): Column =
    pmod(graft.functions.PortableHash.md5Hash60(
      concat(lit(j.toString), lit("|"), key.cast("string"))), lit(width.toLong))

  /** Build per-group sketches: (keys..., depth, bucket, cnt).
    * Merge = sum cnt over (depth, bucket). */
  def build(
      df: DataFrame, key: Column, depth: Int, width: Int,
      keys: Seq[String] = Nil): DataFrame = {
    require(depth >= 1 && width >= 2, "need depth ≥ 1 and width ≥ 2")
    val buckets = array((0 until depth).map(j => bucket(key, j, width)): _*)
    df.select(keys.map(col) :+ posexplode(buckets).as(Seq("depth", "bucket")): _*)
      .groupBy(keys.map(col) ++ Seq(col("depth").cast("long").as("depth"), col("bucket")): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge sketches that share (depth, width), keeping `keys` groups
    * (e.g. drop the per-day key): counters simply add. */
  def merge(sketch: DataFrame, keys: Seq[String] = Nil): DataFrame =
    sketch.groupBy(keys.map(col) ++ Seq(col("depth"), col("bucket")): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Point-frequency estimates for every row of `probes`: all probe
    * columns plus `est` = min over depth rows of the addressed counter
    * (0 if a bucket was never touched). The counter table rides a
    * broadcast — it is ≤ d·w rows by construction. */
  def estimate(
      sketch: DataFrame, probes: DataFrame, key: Column,
      depth: Int, width: Int): DataFrame = {
    val buckets = array((0 until depth).map(j => bucket(key, j, width)): _*)
    val pcols = probes.columns.map(col).toSeq
    probes
      .select(pcols :+ posexplode(buckets).as(Seq("depth", "bucket")): _*)
      .withColumn("depth", col("depth").cast("long"))
      .join(broadcast(sketch), Seq("depth", "bucket"), "left")
      .groupBy(pcols: _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
