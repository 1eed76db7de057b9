package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Leakage-safe train/val/test splitting — the assignment step every
  * training-data pipeline runs after dedup, done at the GROUP level so
  * near-duplicates can never straddle splits (reference README.md:102
  * "training data preparation"; the standard contamination control:
  * row-level random splits leak whenever two near-identical documents
  * land on opposite sides of the train/eval boundary).
  *
  * The split is a pure projection: hash the group representative (an
  * exact-dup fingerprint, a near-dup cluster rep from Dedup, an entity
  * id from Components — any column that names the leakage unit)
  * through the engine's portable md5-60 family into u ∈ [0, 1) and
  * threshold on the cumulative fractions. Every member of a group
  * shares the rep, hence the u, hence the split — straddling is
  * impossible by construction, and the property is still emitted as a
  * checkable invariant because the CLAIM "this column is the leakage
  * unit" is the part that can rot.
  *
  * Determinism/portability: same row → same split on any cluster, any
  * partition count, any engine (DuckDB recomputes u exactly — the
  * hyperplane-LSH hash convention); a different `seed` is a fresh,
  * independent assignment (epoch rotation, k-fold style re-splits).
  * Scale shape: zero shuffle, zero state — the split column costs one
  * md5 per row at 100 TB.
  *
  * Relation to [[Sampling.withSplit]]: that is the ROW-level split
  * (each doc hashed independently — right for iid rows). This one
  * exists for corpora with duplicate families: the leakage unit, not
  * the row, gets the coin flip. */
object Splits {

  private val Two60 = 1152921504606846976.0 // 2^60

  /** u ∈ [0, 1) from the portable 60-bit hash of the group key. */
  def unitHash(group: Column, seed: Long): Column =
    graft.functions.PortableHash
      .md5Hash60(concat(lit(s"split:$seed:"), group.cast("string")))
      .cast("double") / lit(Two60)

  /** Add `outCol` ∈ {train, val, test} keyed on `group`'s hash:
    * u < trainFrac → train; u < trainFrac+valFrac → val; else test. */
  def groupAwareSplit(
      df: DataFrame, group: Column,
      trainFrac: Double, valFrac: Double,
      seed: Long = 0L, outCol: String = "split"): DataFrame = {
    require(trainFrac > 0 && valFrac >= 0 && trainFrac + valFrac < 1.0,
      "need 0 < trainFrac, 0 <= valFrac, trainFrac + valFrac < 1")
    val u = unitHash(group, seed)
    df.withColumn(outCol,
      when(u < trainFrac, "train")
        .when(u < trainFrac + valFrac, "val")
        .otherwise("test"))
  }

  /** Split audit: per-split doc/group counts plus the leakage
    * invariant — the number of groups observed in MORE than one split
    * (0 by construction when `group` really is the leakage unit; a
    * nonzero value means the caller split on the wrong column). One
    * map-side-combinable groupBy each; the 1-row straddle count rides
    * a broadcast. */
  def splitStats(
      df: DataFrame, group: Column, splitCol: String = "split"): DataFrame = {
    val straddle = df.select(group.as("_g"), col(splitCol).as("_s"))
      .groupBy("_g").agg(countDistinct(col("_s")).as("_ns"))
      .agg(sum(when(col("_ns") > 1, 1L).otherwise(0L)).as("straddling_groups"))
    df.select(group.as("_g"), col(splitCol).as(splitCol))
      .groupBy(splitCol)
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("_g")).as("n_groups"))
      .crossJoin(broadcast(straddle))
  }
}
