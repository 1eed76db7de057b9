package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Rolling-origin forecast backtesting — the evaluation harness behind
  * the reference's outage-forecast loop (README.md:44-53 "Forecasting
  * input/output", README.md:57 "retraining strategy"): before trusting
  * a forecaster, score it on k historical origins, each predicting a
  * horizon it has not seen. The forecaster evaluated here is the
  * SEASONAL-NAIVE baseline (ŷ(t) = y(t − period)) — the standard
  * yardstick every learned model must beat, and deliberately
  * deterministic so the whole backtest hash-oracles (MLlib models are
  * scored by their own contract specs, X3).
  *
  * Scale shape: one groupBy builds the (keys, bucket) grid; the
  * prediction join is a self-equi-join on (keys, bucket + period) —
  * co-partitioned with the grid build, no new shuffle under AQE; fold
  * membership is a broadcast of the k-row origin table; the final
  * score aggregate is map-side-combinable over (fold, keys). Nothing
  * driver-side, nothing O(data²).
  *
  * Metric parity: per-point squared/absolute errors are double ops on
  * exact-decimal bucket means, rounded to 6 dp and summed as exact
  * decimal (the BM25 trick), then one deterministic division + sqrt —
  * RMSE and MAE hash-match an ANSI replay.
  */
object Backtest {

  /** Per-(fold, keys) seasonal-naive scores over a resampled grid.
    *
    * @param step     resample bucket (e.g. "1 hour")
    * @param periodMs seasonal lag in ms (e.g. 86400000 for day-over-day)
    * @param origins  fold origins as (fold_id, startTs, endTs) — each
    *                 fold scores buckets with start ∈ [startTs, endTs)
    * Output: (fold, keys..., n, rmse, mae). */
  def seasonalNaive(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      value: Column,
      step: String,
      periodMs: Long,
      origins: Seq[(Long, String, String)]): DataFrame = {
    require(origins.nonEmpty, "need at least one fold")
    val grid = TimeSeries.resample(df, keys, tsCol, step,
      Seq(graft.core.OracleCompat.davg(value, 6).as("_v")))
      .withColumn("_b", unix_millis(col("bucket_start")))
      .drop("bucket_start")
    val pred = grid.select(
      keys.map(col) :+ (col("_b") + lit(periodMs)).as("_b") :+ col("_v").as("_vp"): _*)
    val folds = origins.map { case (id, s, e) =>
      struct(lit(id).as("fold"),
        unix_millis(lit(s).cast("timestamp")).as("_s"),
        unix_millis(lit(e).cast("timestamp")).as("_e"))
    }
    val foldDf = df.sparkSession.range(1)
      .select(explode(array(folds: _*)).as("f")).select("f.*")
    grid
      .join(pred, keys :+ "_b")
      .join(broadcast(foldDf), col("_b") >= col("_s") && col("_b") < col("_e"))
      .withColumn("_se", round((col("_v") - col("_vp")) * (col("_v") - col("_vp")), 6)
        .cast(DecimalType(27, 6)))
      .withColumn("_ae", round(abs(col("_v") - col("_vp")), 6).cast(DecimalType(27, 6)))
      .groupBy((Seq(col("fold")) ++ keys.map(col)): _*)
      .agg(
        count(lit(1)).as("n"),
        sqrt(sum(col("_se")).cast("double") / count(lit(1))).as("rmse"),
        (sum(col("_ae")).cast("double") / count(lit(1))).as("mae"))
  }
}
