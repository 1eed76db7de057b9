package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.VectorAssembler

/** Outage-forecast pipeline — the data contract around the reference's
  * LSTM (README.md:46-53), with an MLlib logistic-regression stand-in
  * (SURVEY.md §7.4.5: porting model weights is out of scope; the engine
  * contract is feature table in → `outage_forecasts`-shaped table out,
  * README.md:95-103).
  */
object Forecast {

  /** Feature engineering per reference README.md:40-44: per (site, day)
    * aggregates + temporal features + lag features + rolling failure
    * rate. One shuffle for the daily agg, one window pass for lags. */
  def dailyFeatures(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(
        count(lit(1)).cast("double").as("n_events"),
        avg(col("value")).as("val_avg"),
        max(when(col("event_type") === "error", 1.0).otherwise(0.0)).as("had_error"))
    val w = Window.partitionBy("user_id").orderBy("day")
    daily
      .withColumn("dow", dayofweek(col("day")).cast("double"))
      .withColumn("prev_n", lag(col("n_events"), 1, 0.0).over(w))
      .withColumn("prev_err", lag(col("had_error"), 1, 0.0).over(w))
      .withColumn("err_rate_7d",
        avg(col("had_error")).over(w.rowsBetween(-6, 0)))
  }

  /** Train on days before `splitDay`, score the rest; emit the reference
    * forecast schema (README.md:95-103). Seeded, but LBFGS parallel
    * reduction is not bit-reproducible → verified by properties
    * (ForecastSpec), not by hash oracle. */
  def trainAndScore(events: DataFrame, splitDay: String): DataFrame = {
    val feats = graft.core.CacheGovernor.persistTracked(dailyFeatures(events))
    val assembler = new VectorAssembler()
      .setInputCols(Array("n_events", "val_avg", "dow", "prev_n", "prev_err", "err_rate_7d"))
      .setOutputCol("features")
    val train = assembler.transform(feats.filter(col("day") < lit(splitDay).cast("date")))
      .withColumnRenamed("had_error", "label")
    val test = assembler.transform(feats.filter(col("day") >= lit(splitDay).cast("date")))
    val model = new LogisticRegression()
      .setMaxIter(20).setRegParam(0.01).setLabelCol("label").fit(train)
    // vector_to_array is a built-in (codegen-friendly) — no UDF in the
    // scoring plan
    model.transform(test)
      .select(
        concat(lit("S"), col("user_id") + 1).as("site_code"),
        col("day").as("prediction_date"),
        org.apache.spark.ml.functions.vector_to_array(col("probability"))
          .getItem(1).as("outage_probability"),
        when(col("prev_err") === 1.0, "repeat-failure").otherwise("load-spike").as("root_cause"),
        lit("dispatch-fme").as("fme_plan"),
        lit("inspect-site").as("resolution"),
        col("had_error").as("actual"))
  }

  /** Model-quality metrics (reference README.md:53,141): RMSE + AUC of
    * the scored output — inputs for drift alerting (ST6). AUC uses the
    * distributed tie-averaged rank ([[Ranks.tieAveragedRanks]] — no
    * global single-task sort), and RMSE folds over the SAME per-score
    * table, so the scoring pipeline executes exactly once per call.
    *
    * CONTRACT: `actual` must be BINARY 0.0/1.0 (it is — the scored
    * output's `actual` is the had_error indicator from
    * [[trainAndScore]]). The single-pass RMSE decomposition
    * Σ(score−lab)² = npos·(score−1)² + (cnt−npos)·score² per distinct
    * score holds ONLY for 0/1 labels; a caller with real-valued labels
    * must compute RMSE row-wise instead. */
  def metrics(scored: DataFrame): DataFrame = {
    val ranks = Ranks.tieAveragedRanks(
      scored.select(col("outage_probability").as("score"), col("actual").as("lab")),
      col("score"), col("lab") === 1.0)
    val npos = sum(col("_npos"))
    val nneg = sum(col("_cnt") - col("_npos"))
    val n = sum(col("_cnt"))
    val sqErr = sum(col("_npos") * pow(col("_score") - 1.0, 2) +
      (col("_cnt") - col("_npos")) * pow(col("_score"), 2))
    ranks.agg(
      sqrt(sqErr / n).as("rmse"),
      ((sum(col("_npos") * col("_ar")) - npos * (npos + lit(1)) / 2.0) /
        (npos * nneg)).as("auc"),
      n.as("n"))
  }
}
