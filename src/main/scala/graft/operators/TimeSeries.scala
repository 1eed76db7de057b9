package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Composite time-series operators — the part of the reference surface
  * Spark has no single built-in for (SURVEY.md §7.3): as-of alignment
  * (reference README.md:37 "Timestamp alignment"), gap-fill interpolation
  * (README.md:37 "interpolation"), resampling to a fixed grid, and
  * session windows over alarm bursts.
  *
  * All are built from declarative primitives (union, window, sequence)
  * so Catalyst still sees through them; none materializes a cross
  * product or collects to the driver.
  */
object TimeSeries {

  /** As-of join: for each left row, the most recent right row with
    * `rightTs <= leftTs`, per key — J5 in SURVEY.md §2.3.
    *
    * Implementation: tag both sides, union, and take
    * `last(value, ignoreNulls)` over a (key)-partitioned window ordered by
    * (ts, side). The right side sorts before the left at equal
    * timestamps, so an exactly-simultaneous right row is visible.
    *
    * Scale: exactly ONE shuffle (hash by key) + an in-partition sort —
    * no row multiplication, no range explosion, unlike the naive
    * `l JOIN r ON key AND r.ts <= l.ts` which is quadratic per key.
    * Hot keys: the window cannot split a single key across tasks; for
    * skewed keys pre-bucket by coarse time range and as-of within
    * buckets carrying the previous bucket's last row forward.
    *
    * @param valueCols right-side columns to carry; each appears in the
    *                  output as `<name><suffix>` plus `_asof_ts`.
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String],
      suffix: String = "_asof"): DataFrame = {
    val rTagged = right
      .select((keys.map(col) :+ col(rightTs).as("_ts")) ++
        valueCols.map(c => col(c).as(s"$c$suffix")): _*)
      .withColumn("_side", lit(0))
    val lTagged = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
    val u = lTagged.unionByName(rTagged, allowMissingColumns = true)

    // Deterministic tiebreak among equal-ts right rows: order by the
    // carried values too, so `last` picks a stable winner.
    val ord: Seq[Column] = Seq(col("_ts"), col("_side")) ++
      valueCols.map(c => col(s"$c$suffix"))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // One struct per right ROW (non-null even when carried values are
    // null) so timestamp and values always come from the SAME matched
    // row — per-column ignoreNulls would otherwise mix rows when a
    // value column is null (true as-of returns the latest row as-is).
    val rowStruct = struct((col("_ts").as("_asof_ts") +:
      valueCols.map(c => col(s"$c$suffix"))): _*)
    val matched = u.withColumn("_asof_row",
      last(when(col("_side") === 0, rowStruct), ignoreNulls = true).over(w))
    val projected = valueCols.foldLeft(
      matched.withColumn("_asof_ts", col("_asof_row").getField("_asof_ts"))) {
      case (df, c) =>
        df.withColumn(s"$c$suffix", col("_asof_row").getField(s"$c$suffix"))
    }
    projected.filter(col("_side") === 1).drop("_ts", "_side", "_asof_row")
  }

  /** Resample to a fixed grid: tumbling-bucket aggregation — A2 in
    * SURVEY.md §2.4 (reference README.md:37). Pure groupBy(window) →
    * partial aggregation before the shuffle, nothing custom. */
  def resample(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      step: String,
      aggs: Seq[Column]): DataFrame =
    df.groupBy((keys.map(col) :+ window(col(tsCol), step).as("bucket")): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("bucket_start", col("bucket.start"))
      .drop("bucket")

  /** Gap-fill + linear interpolation — W4 in SURVEY.md §2.5 (reference
    * README.md:37): per key, build a dense time grid with `sequence` +
    * `explode`, left-join hourly observations, then linearly interpolate
    * between the last and next known values (carry-forward/backward at
    * the edges).
    *
    * Scale: grid generation is bounded by (span/step) per key and
    * distributes with the key; the window pass is the same single-shuffle
    * shape as [[asOfJoin]]. The observation aggregate uses exact decimal
    * sums so results are reproducible under any parallelism.
    */
  def interpolate(
      df: DataFrame,
      key: String,
      tsCol: String,
      valueCol: String,
      stepSql: String = "interval 1 hour",
      truncUnit: String = "hour"): DataFrame = {
    val bounds = df.groupBy(key).agg(
      date_trunc(truncUnit, min(col(tsCol))).as("_gs"),
      date_trunc(truncUnit, max(col(tsCol))).as("_ge"))
    val grid = bounds.select(col(key),
      explode(expr(s"sequence(_gs, _ge, $stepSql)")).as("_g"))
    val obs = df.groupBy(col(key), date_trunc(truncUnit, col(tsCol)).as("_g"))
      .agg((sum(col(valueCol).cast(DecimalType(27, 2))).cast("double") /
        count(col(valueCol))).as("_v"))

    val j = grid.join(obs, Seq(key, "_g"), "left")
    val wAsc = Window.partitionBy(key).orderBy("_g")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wDesc = Window.partitionBy(key).orderBy("_g")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    j.withColumn("_pv", last(col("_v"), ignoreNulls = true).over(wAsc))
      .withColumn("_pt", last(when(col("_v").isNotNull, col("_g")), ignoreNulls = true).over(wAsc))
      .withColumn("_nv", first(col("_v"), ignoreNulls = true).over(wDesc))
      .withColumn("_nt", first(when(col("_v").isNotNull, col("_g")), ignoreNulls = true).over(wDesc))
      .withColumn("value_interp",
        when(col("_v").isNotNull, col("_v"))
          .when(col("_pv").isNotNull && col("_nv").isNotNull,
            col("_pv") + (col("_nv") - col("_pv")) *
              (unix_millis(col("_g")) - unix_millis(col("_pt"))).cast("double") /
              (unix_millis(col("_nt")) - unix_millis(col("_pt"))).cast("double"))
          .when(col("_pv").isNotNull, col("_pv"))
          .otherwise(col("_nv")))
      .select(col(key), col("_g").as("grid_ts"), col("value_interp"))
  }

  /** Batch sessionization — ST4 in SURVEY.md §2.9 (reference
    * README.md:32,9: alarm bursts = one outage episode): Spark's native
    * `session_window` merges rows separated by < gap into one session. */
  def sessionize(
      df: DataFrame,
      key: String,
      tsCol: String,
      gap: String,
      aggs: Seq[Column]): DataFrame =
    df.groupBy(session_window(col(tsCol), gap), col(key))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("session_start", col("session_window.start"))
      .withColumn("session_end", col("session_window.end"))
      .drop("session_window")

  /** Trailing-k feature sequences for sequence models — W6 in SURVEY.md
    * §2.5 (reference README.md:47 LSTM input): `collect_list` over a row
    * frame, filtered to complete windows. */
  def sequenceWindows(
      df: DataFrame,
      key: String,
      tsCol: String,
      featureCol: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy(key).orderBy(tsCol)
      .rowsBetween(-(k - 1), Window.currentRow)
    df.withColumn("seq", collect_list(col(featureCol)).over(w))
      .filter(size(col("seq")) === k)
  }
}
