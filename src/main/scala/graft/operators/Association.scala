package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Co-occurrence association (lift) between event types — the
  * root-cause-correlation primitive behind the reference's "explains
  * root causes" surface (README.md:9,52): which alarm types fire
  * TOGETHER in the same (site, window) bucket far above what their
  * individual rates predict?
  *
  *   lift(a,b) = P(a,b) / (P(a)·P(b))
  *             = n_ab · N / (n_a · n_b)   over presence buckets
  *
  * — lift ≫ 1 is a correlated pair (shared root cause candidate),
  * lift ≈ 1 independence, lift ≪ 1 mutual exclusion. All counts are
  * exact integers and the score is ONE double division, so the whole
  * table hash-oracles.
  *
  * Scale shape: presence collapses to DISTINCT (bucket, type) rows
  * first — one map-side-combinable shuffle, immune to per-bucket event
  * volume; the pair join is a self-equi-join ON THE BUCKET whose
  * fan-out is bounded by (types present in that bucket)², i.e. the
  * TYPE-ALPHABET squared per bucket, a constant in corpus size; the
  * per-type totals and the bucket count ride broadcasts onto the
  * aggregated pair grid.
  */
object Association {

  /** Pairwise lift over presence buckets defined by `bucketCols`.
    * Output: (type_a, type_b, n_ab, n_a, n_b, n_buckets, lift) for
    * every unordered pair observed together at least once. */
  def cooccurrenceLift(
      df: DataFrame, bucketCols: Seq[Column], typeCol: Column): DataFrame = {
    val present = df.select(bucketCols :+ typeCol.as("_t"): _*).distinct()
    val bkeys = present.columns.dropRight(1)
    // single-row broadcast attach, not a driver-side count action
    val nBuckets = present.select(bkeys.map(col): _*).distinct()
      .agg(count(lit(1)).as("n_buckets"))
    val singles = present.groupBy(col("_t")).agg(count(lit(1)).as("_n"))
    val a = present.toDF(present.columns.dropRight(1) :+ "type_a": _*)
    val b = present.toDF(present.columns.dropRight(1) :+ "type_b": _*)
    a.join(b, bkeys.toSeq)
      .filter(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b")
      .agg(count(lit(1)).as("n_ab"))
      .join(broadcast(singles.select(col("_t").as("type_a"), col("_n").as("n_a"))), "type_a")
      .join(broadcast(singles.select(col("_t").as("type_b"), col("_n").as("n_b"))), "type_b")
      .crossJoin(broadcast(nBuckets))
      .withColumn("lift",
        (col("n_ab") * col("n_buckets")).cast("double") /
          (col("n_a") * col("n_b")).cast("double"))
      .select("type_a", "type_b", "n_ab", "n_a", "n_b", "n_buckets", "lift")
  }
}
