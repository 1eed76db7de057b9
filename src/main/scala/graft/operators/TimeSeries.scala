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
    * skewed keys use [[asOfJoinBucketed]], which partitions by
    * (key, coarse time bucket) and carries each bucket's last right row
    * forward — identical results, >1 task per hot key.
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

  /** Skew-safe [[asOfJoin]]: identical results, but the window partitions
    * by (key, coarse time bucket) instead of (key), so one hot key (a
    * site producing 30% of all readings) spans as many tasks as it spans
    * buckets instead of serializing into one.
    *
    * Mechanics: the within-bucket as-of is the same union + window; the
    * cross-bucket part reduces each (key, bucket) to its LAST right row
    * (an aggregate `max` over the same (ts, values) lexicographic order
    * the window uses for `last`, so the winner is the same row), then a
    * window over the tiny per-(key, bucket) frame carries it forward —
    * partitions there hold one row per bucket, never per event. Left
    * rows whose bucket has no earlier right row coalesce to the carry.
    *
    * Cost: two shuffles of the union (window by (key, bucket) + the
    * carry join) vs one — buy the second exchange only when keys are
    * actually skewed.
    *
    * @param bucket coarse time bucket of a timestamp column; must be
    *               monotone in ts (e.g. `date_trunc("day", _)`) so
    *               bucket order equals time order
    */
  def asOfJoinBucketed(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String],
      suffix: String = "_asof",
      bucket: Column => Column = date_trunc("day", _)): DataFrame = {
    val rTagged = right
      .select((keys.map(col) :+ col(rightTs).as("_ts")) ++
        valueCols.map(c => col(c).as(s"$c$suffix")): _*)
      .withColumn("_side", lit(0))
    val lTagged = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
    val u = lTagged.unionByName(rTagged, allowMissingColumns = true)
      .withColumn("_bkt", bucket(col("_ts")))

    val ord: Seq[Column] = Seq(col("_ts"), col("_side")) ++
      valueCols.map(c => col(s"$c$suffix"))
    val w = Window.partitionBy((keys.map(col) :+ col("_bkt")): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rowStruct = struct((col("_ts").as("_asof_ts") +:
      valueCols.map(c => col(s"$c$suffix"))): _*)
    val local = u.withColumn("_asof_local",
      last(when(col("_side") === 0, rowStruct), ignoreNulls = true).over(w))

    // one row per (key, bucket): the bucket's last right row — struct max
    // compares (ts, values) lexicographically, the same tiebreak order
    // the window's `last` resolves, so both pick the same winner
    val wCarry = Window.partitionBy(keys.map(col): _*).orderBy("_bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = u.groupBy((keys.map(col) :+ col("_bkt")): _*)
      .agg(max(when(col("_side") === 0, rowStruct)).as("_bucket_last"))
      .withColumn("_carry", last(col("_bucket_last"), ignoreNulls = true).over(wCarry))
      .select((keys.map(col) :+ col("_bkt") :+ col("_carry")): _*)

    val matched = local.filter(col("_side") === 1)
      .join(carry, keys :+ "_bkt", "left")
      .withColumn("_asof_row", coalesce(col("_asof_local"), col("_carry")))
    val projected = valueCols.foldLeft(
      matched.withColumn("_asof_ts", col("_asof_row").getField("_asof_ts"))) {
      case (df, c) =>
        df.withColumn(s"$c$suffix", col("_asof_row").getField(s"$c$suffix"))
    }
    projected.drop("_ts", "_side", "_bkt", "_asof_local", "_carry", "_asof_row")
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
    val j = denseGrid(df, key, tsCol, valueCol, stepSql, truncUnit)
    val known = when(col("_v").isNotNull, struct(col("_g").as("_t"), col("_v").as("_x")))
    val wAsc = Window.partitionBy(key).orderBy("_g")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // "next known at-or-after" = last-at-or-before under the REVERSED
    // sort: a (current → unbounded following) frame makes Spark rescan
    // the partition remainder per row (O(n²) in partition size); the
    // descending running frame streams in O(n) for one extra
    // in-partition sort
    val wDescStream = Window.partitionBy(key).orderBy(col("_g").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lerp(j
      .withColumn("_prev", last(known, ignoreNulls = true).over(wAsc))
      .withColumn("_next", last(known, ignoreNulls = true).over(wDescStream)), key)
  }

  /** Skew-safe [[interpolate]]: identical results, but both window
    * passes partition by (key, coarse grid bucket), so a hot key's
    * dense grid spans one task per bucket instead of one task total.
    * Cross-bucket context comes from two tiny carry frames — one row
    * per (key, bucket) holding the bucket's last/first KNOWN
    * observation, carried forward/backward by bucket-granular windows —
    * the same carry-last-row-across-buckets shape as
    * [[asOfJoinBucketed]], applied in both directions because linear
    * interpolation needs the next known point too.
    *
    * @param bucket monotone coarse bucket of the grid timestamp
    *               (e.g. `date_trunc("week", _)`)
    */
  def interpolateBucketed(
      df: DataFrame,
      key: String,
      tsCol: String,
      valueCol: String,
      stepSql: String = "interval 1 hour",
      truncUnit: String = "hour",
      bucket: Column => Column = date_trunc("week", _),
      bucketStepSql: String = "interval 1 week"): DataFrame = {
    val bounds = gridBounds(df, key, tsCol, truncUnit)
    val grid = gridOf(bounds, key, stepSql)
    val obs = obsOf(df, key, tsCol, valueCol, truncUnit)
    val j = grid.join(obs, Seq(key, "_g"), "left")
      .withColumn("_bkt", bucket(col("_g")))
    val known = when(col("_v").isNotNull, struct(col("_g").as("_t"), col("_v").as("_x")))
    val wAsc = Window.partitionBy(col(key), col("_bkt")).orderBy("_g")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // streaming reverse frame — see [[interpolate]]: (current →
    // unbounded following) is O(n²) per partition in Spark's WindowExec
    val wDesc = Window.partitionBy(col(key), col("_bkt"))
      .orderBy(col("_g").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // per-(key, bucket) extremes of the KNOWN observations; struct
    // min/max order by (_t, _x) = grid-time order (grid times are
    // unique per key, so the value field never decides)
    val wFwd = Window.partitionBy(key).orderBy("_bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wBwd = Window.partitionBy(key).orderBy("_bkt")
      .rowsBetween(1, Window.unboundedFollowing)
    // The carry table used to aggregate the GRID-SIZED join `j` — a
    // second evaluation of the whole grid subtree feeding a grid-sized
    // exchange (r20, guide §2.3: shuffle fewer bytes). Known
    // observations exist only where `obs` matched, and every obs grid
    // point lies inside its key's [gs, ge] span, so the same per-bucket
    // extremes come from obs-sized input directly. Buckets the grid
    // covers but obs doesn't come from a bucket-granular spine built
    // straight off the per-key bounds: the dense grid hits every
    // bucket between bucket(_gs) and bucket(_ge), so the one-per-bucket
    // sequence enumerates exactly the grid's distinct buckets at
    // buckets-per-key rows instead of a grid-sized explode + distinct.
    // PRECONDITION: `bucketStepSql` must be the step of `bucket`'s
    // truncation unit (week default ↔ interval 1 week).
    val knownObs = when(col("_v").isNotNull,
      struct(col("_g").as("_t"), col("_v").as("_x")))
    val spine = bounds.select(col(key),
      explode(sequence(bucket(col("_gs")), bucket(col("_ge")),
        expr(bucketStepSql))).as("_bkt"))
    val carryAgg = obs.withColumn("_bkt", bucket(col("_g")))
      .groupBy(col(key), col("_bkt"))
      .agg(max(knownObs).as("_lastKnown"), min(knownObs).as("_firstKnown"))
    val carry = spine.join(carryAgg, Seq(key, "_bkt"), "left")
      .withColumn("_carryPrev", last(col("_lastKnown"), ignoreNulls = true).over(wFwd))
      .withColumn("_carryNext", first(col("_firstKnown"), ignoreNulls = true).over(wBwd))
      .select(col(key), col("_bkt"), col("_carryPrev"), col("_carryNext"))
    lerp(j
      .withColumn("_localPrev", last(known, ignoreNulls = true).over(wAsc))
      .withColumn("_localNext", last(known, ignoreNulls = true).over(wDesc))
      .join(carry, Seq(key, "_bkt"), "left")
      .withColumn("_prev", coalesce(col("_localPrev"), col("_carryPrev")))
      .withColumn("_next", coalesce(col("_localNext"), col("_carryNext"))), key)
  }

  /** Per-key grid bounds: (key, _gs, _ge) — one row per key. */
  private def gridBounds(
      df: DataFrame, key: String, tsCol: String, truncUnit: String): DataFrame =
    df.groupBy(key).agg(
      date_trunc(truncUnit, min(col(tsCol))).as("_gs"),
      date_trunc(truncUnit, max(col(tsCol))).as("_ge"))

  /** The per-key dense grid: `sequence` + `explode` over the bounds.
    * The bounds relation is tiny (one row per key, a few KB), so AQE
    * coalesces it to one partition by bytes — but each bounds row FANS
    * OUT to span/step grid rows, so the explode's cost is output-sized,
    * not input-sized, and riding the coalesced partition ran the whole
    * grid generation (and everything up to the next exchange) on ONE
    * task (r20 measured on q_w4). An explicit keyed repartition at the
    * default parallelism spreads generation one-key-per-task; the
    * explicit partition count keeps AQE from re-coalescing it, and
    * defaultParallelism scales it with the cluster instead of pinning a
    * local constant. */
  private def gridOf(
      bounds: DataFrame, key: String, stepSql: String): DataFrame =
    bounds
      // (key, _gs) — NOT key alone: the bounds aggregate is already
      // hash-partitioned by key, so a same-key repartition is elided as
      // redundant and the byte-sized AQE read takes over again; the
      // composite key keeps the explicit exchange (REPARTITION_BY_NUM
      // is never AQE-coalesced) without changing any row
      .repartition(bounds.sparkSession.sparkContext.defaultParallelism,
        col(key), col("_gs"))
      .select(col(key), explode(expr(s"sequence(_gs, _ge, $stepSql)")).as("_g"))

  /** Per-(key, grid point) observation means (exact decimal sums →
    * reproducible under any parallelism). */
  private def obsOf(
      df: DataFrame, key: String, tsCol: String, valueCol: String,
      truncUnit: String): DataFrame =
    df.groupBy(col(key), date_trunc(truncUnit, col(tsCol)).as("_g"))
      .agg((sum(col(valueCol).cast(DecimalType(27, 2))).cast("double") /
        count(col(valueCol))).as("_v"))

  /** Shared grid construction for [[interpolate]]: per-key dense time
    * grid left-joined with the per-grid-point observation means. */
  private def denseGrid(
      df: DataFrame, key: String, tsCol: String, valueCol: String,
      stepSql: String, truncUnit: String): DataFrame =
    gridOf(gridBounds(df, key, tsCol, truncUnit), key, stepSql)
      .join(obsOf(df, key, tsCol, valueCol, truncUnit), Seq(key, "_g"), "left")

  /** Shared interpolation arithmetic over `_prev`/`_next` (_t, _x)
    * structs: linear between known neighbours, carry at the edges. */
  private def lerp(j: DataFrame, key: String): DataFrame = {
    val (pv, pt) = (col("_prev").getField("_x"), col("_prev").getField("_t"))
    val (nv, nt) = (col("_next").getField("_x"), col("_next").getField("_t"))
    j.withColumn("value_interp",
        when(col("_v").isNotNull, col("_v"))
          .when(pv.isNotNull && nv.isNotNull,
            pv + (nv - pv) *
              (unix_millis(col("_g")) - unix_millis(pt)).cast("double") /
              (unix_millis(nt) - unix_millis(pt)).cast("double"))
          .when(pv.isNotNull, pv)
          .otherwise(nv))
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
