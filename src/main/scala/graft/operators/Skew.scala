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

  /** Salted equi-join for the case AQE's skew split can't fix alone: a
    * hot FACT key joining a dim too large to broadcast. Fact rows
    * scatter deterministically across `saltBuckets` sub-keys; the dim
    * side replicates `saltBuckets`×; the join runs on (key, salt), so
    * one hot key spreads over `saltBuckets` reducers. Price: the dim
    * shuffle grows saltBuckets× — buy it only when the dim is far
    * smaller than the fact (the usual case). Row multiplicity is
    * unchanged for ANY key multiplicities (each fact row joins exactly
    * the dim copies carrying its own salt), so results are identical to
    * the plain join — oracle-checked (q_skew_salted_join). The merge
    * hint pins SMJ: at broadcast-able dim sizes the whole technique is
    * moot, and letting the planner broadcast would silently stop
    * exercising the path the operator exists for. */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      saltBuckets: Int,
      joinType: String = "inner"): DataFrame = {
    require(saltBuckets > 0)
    val f = fact.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets)).cast("int"))
    val d = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    f.join(d.hint("merge"), keys :+ "_salt", joinType).drop("_salt")
  }
}
