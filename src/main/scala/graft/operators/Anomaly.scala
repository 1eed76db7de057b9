package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Metric-stream smoothing + anomaly flagging — the NOC side of the
  * engine (reference README.md:20-38: KPI degradation / outage
  * detection over alarm and performance streams).
  *
  * Everything here is deterministic enough to hash-oracle against
  * DuckDB, which is unusual for floating-point smoothing and worth
  * spelling out:
  *
  *  - EWMA uses α = 1/2, so every weight 2^-j is a power of two:
  *    `x * 2^-j` is EXACT in IEEE double (pure exponent shift), and the
  *    weighted sum is built as an explicit LEFT-ASSOCIATED chain of
  *    adds — both engines evaluate the same operations in the same
  *    order on the same bits. No decimal needed.
  *  - Trailing mean/variance use exact-decimal window sums
  *    (OracleCompat's dsum trick, windowed): decimal addition is
  *    associative, so Spark's partial evaluation order is irrelevant;
  *    the final few double ops are again order-identical.
  *
  * Scale shape: one window partitioned by the series key — the same
  * single hash-partition exchange any per-key window costs, rows never
  * leave their key's partition, depth/lookback are O(1) per row. For
  * hot keys the (key, bucket) carry trick of TimeSeries.interpolateBucketed
  * applies unchanged.
  */
object Anomaly {

  /** Finite-depth EWMA (α = 1/2) of `value` over the trailing `depth`
    * rows (current row included), per key, in event order. Adds `ewma`.
    * The truncated tail is renormalized by the present-weight sum, so
    * the first rows of a series average over what exists. */
  def withEwma(
      df: DataFrame,
      keys: Seq[String],
      order: Seq[String],
      value: String,
      depth: Int = 16): DataFrame = {
    require(depth >= 1 && depth <= 48, s"depth must be in [1,48], got $depth")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(col): _*)
    // name each lag ONCE and build num/den from the named columns:
    // referencing lag(value, j) twice (numerator + denominator) gave
    // Spark 2·(depth−1) separate window FRAMES — ExtractWindowExpressions
    // does not dedupe — and the frame count is the per-row constant of
    // WindowExec (r20 measured: 30 frames → 15 halves the window stage).
    // Values are bit-identical: same expressions, read through a column.
    val lagCols = (1 until depth).map(j => s"_ewma_l$j" -> lag(col(value), j).over(w))
    val terms = (0 until depth).map { j =>
      val x = if (j == 0) col(value) else col(s"_ewma_l$j")
      val wt = math.pow(0.5, j) // exact: power of two
      (x, wt)
    }
    val num = terms.map { case (x, wt) => coalesce(x * wt, lit(0.0)) }.reduceLeft(_ + _)
    val den = terms.map { case (x, wt) => when(x.isNotNull, lit(wt)).otherwise(lit(0.0)) }
      .reduceLeft(_ + _)
    lagCols.foldLeft(df) { case (acc, (name, c)) => acc.withColumn(name, c) }
      .withColumn("ewma", num / den)
      .drop(lagCols.map(_._1): _*)
  }

  /** Seasonal-baseline deviation — "is this reading abnormal FOR THIS
    * HOUR?" (NOC KPIs are strongly periodic: a 2 am traffic level that
    * is normal at 2 am is an outage at 2 pm; trailing-window z-scores
    * (withAnomalyFlags) and CUSUM can't see that, because their
    * baseline mixes all phases of the cycle).
    *
    * The seasonal profile is mean/stddev per (key, slot) — slot is any
    * cyclic bucket of the timestamp (hour-of-day, hour-of-week) — via
    * the exact-decimal moment formulas (OracleCompat), so it
    * hash-oracles. Each row then carries its slot's baseline and
    * z-score; `seasonal_anomaly` flags |x − μ_slot| > z·σ_slot given at
    * least `minN` observations in the slot.
    *
    * Scale shape: the profile aggregate is map-side-combinable down to
    * keys×slots rows and BROADCASTS back onto the stream — the data
    * itself is never shuffled (one scan for the profile, one for the
    * join; the plan gate asserts no data-sized exchange). */
  /** The (keys..., slot, s_n, s_mean, s_sd) seasonal profile on its
    * own — built once on the batch side, broadcast into
    * [[withSeasonalDeviation]] or the stateless streaming gate
    * (StreamingOps.seasonalDeviationFlags). */
  def seasonalProfile(
      df: DataFrame,
      keys: Seq[String],
      slot: Column,
      value: String): DataFrame = {
    import graft.core.OracleCompat.{davg, dstddev}
    df.withColumn("slot", slot.cast("long"))
      .groupBy((keys :+ "slot").map(col): _*).agg(
        count(col(value)).as("s_n"),
        davg(col(value), 6).as("s_mean"),
        // singleton slots have no sample stddev — NULL, not an ANSI
        // divide-by-zero (their rows can't flag: s_n < minN gates them)
        when(count(col(value)) >= 2, dstddev(col(value))).as("s_sd"))
  }

  /** Join `rows` (already carrying `slot`) against a broadcast profile
    * and add `s_z` / `seasonal_anomaly` — shared verbatim by the batch
    * operator and the streaming gate. */
  private[graft] def applySeasonal(
      rows: DataFrame, profile: DataFrame, keys: Seq[String],
      value: String, minN: Int, zThreshold: Double): DataFrame =
    rows
      // LEFT join: a (key, slot) absent from the profile — a new site, or
      // a slot never observed in training — must flow through UNFLAGGED
      // (s_z NULL, seasonal_anomaly false), not be silently dropped; the
      // batch form is unaffected (its profile comes from the same input,
      // so every row matches)
      .join(broadcast(profile), keys :+ "slot", "left")
      .withColumn("s_z",
        when(col("s_sd") > 0.0, (col(value) - col("s_mean")) / col("s_sd")))
      .withColumn("seasonal_anomaly",
        coalesce(
          col("s_n") >= minN &&
            abs(col(value) - col("s_mean")) > lit(zThreshold) * col("s_sd"),
          lit(false)))

  def withSeasonalDeviation(
      df: DataFrame,
      keys: Seq[String],
      slot: org.apache.spark.sql.Column,
      value: String,
      minN: Int = 30,
      zThreshold: Double = 3.0): DataFrame =
    applySeasonal(
      df.withColumn("slot", slot.cast("long")),
      seasonalProfile(df, keys, slot, value),
      keys, value, minN, zThreshold)

  /** Alarm-storm / trending detection: per-(key, bucket) event counts
    * against the mean of the trailing `lookback` buckets — the NOC
    * "alarm storm" trigger (a site suddenly emitting 10× its recent
    * alarm rate) and the corpus-side trending-topic signal.
    *
    * The trailing frame is RANGE-based on the bucket epoch, not
    * row-based: empty buckets (quiet hours) are simply absent from the
    * aggregated grid, and a rows-frame would silently stretch across
    * them; the range frame makes missing buckets count as zero — the
    * storm semantics a paging rule needs. ratio = n·lookback /
    * Σ trailing n is exact integer arithmetic up to ONE double
    * division; NULL (no flag) when there is no history yet.
    *
    * Scale shape: one map-side-combinable groupBy to the bucket grid;
    * the trailing window runs over that aggregated grid only. */
  def stormRatio(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      step: String,
      stepMs: Long,
      lookback: Int,
      threshold: Double): DataFrame = {
    require(lookback >= 1 && threshold > 0.0, "need lookback ≥ 1 and threshold > 0")
    val grid = TimeSeries.resample(df, keys, tsCol, step, Seq(count(lit(1)).as("n")))
      .withColumn("bucket_ms", unix_millis(col("bucket_start")))
      .drop("bucket_start")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("bucket_ms"))
      .rangeBetween(-lookback * stepMs, -stepMs)
    val wAll = Window.partitionBy(keys.map(col): _*)
    grid
      .withColumn("trail_n", coalesce(sum(col("n")).over(w), lit(0L)))
      .withColumn("ratio",
        when(col("trail_n") > 0,
          (col("n") * lit(lookback.toLong)).cast("double") / col("trail_n").cast("double")))
      // warm-up guard: with under lookback buckets of history the ratio's
      // denominator is partial and inflates the head of every series —
      // a storm needs a full trailing span to compare against
      .withColumn("storm", coalesce(
        col("bucket_ms") - min(col("bucket_ms")).over(wAll) >= lit(lookback * stepMs) &&
          col("ratio") >= threshold,
        lit(false)))
  }

  /** One-sided (upper) CUSUM change-point statistic per key, in event
    * order: s_i = max(0, s_{i-1} + (x_i − μ − slack)), the classic
    * Page cumulative-sum detector — s accumulates once the series
    * drifts above its target μ by more than `slack` per observation,
    * and `threshold` crossings flag the change. μ is the series' own
    * mean (the in-control target) computed in the same pass.
    *
    * The recursion LOOKS inherently sequential, but
    *   s_i = P_i − min(0, P_1, …, P_i)   where   P_i = Σ_{j≤i} d_j,
    * d_j = x_j − μ − slack — so it is two running windows (prefix sum +
    * running min), not an iterative loop. Everything stays in exact
    * DECIMAL until the final cast: decimal window sums are associative
    * (Spark's frame evaluation order vs DuckDB's segment tree cannot
    * differ), running MIN is order-free, and μ is one deterministic
    * double division rounded to the decimal grid (the BM25 rounding
    * trick). Adds `cusum` (double) and `cusum_alert`.
    *
    * Scale shape: one hash exchange on the key; the three windows (key
    * stats, prefix sum, running min) share its partitioning and sort. */
  // ---- streaming CUSUM ledger (N70 under the hash gate, r18) ---------

  private val WhatCusum = "cusum monitor ledger"
  private val CusumDec = DecimalType(18, 4)

  /** Seed a CUSUM monitoring ledger: the FROZEN per-key in-control
    * target μ (the textbook streaming-CUSUM setup — μ comes from
    * historical batch profiling, not the unknowable future mean),
    * computed with the exact-decimal rule the batch operator uses
    * (4-dp rounded mean), published under the [[LedgerFiles]] manifest
    * discipline. */
  def writeCusumProfile(
      profile: DataFrame, keys: Seq[String], value: String,
      path: String): Unit = {
    val spark = profile.sparkSession
    val (fs, root) = LedgerFiles.fsOf(spark, path)
    fs.delete(new org.apache.hadoop.fs.Path(root, LedgerFiles.ManifestName), false)
    Seq("mu", "state", "buf", "wm", "final").foreach(t =>
      fs.delete(new org.apache.hadoop.fs.Path(root, t), true))
    val xd = col(value).cast(CusumDec)
    profile.groupBy(keys.map(col): _*)
      .agg(round(sum(xd).cast("double") / count(lit(1)), 4)
        .cast(CusumDec).as("_mu"))
      .write.mode("overwrite").parquet(s"$path/mu/b0")
    LedgerFiles.publishManifest(fs, root, WhatCusum)
  }

  /** The last batch id whose `final/` table committed (final is the
    * fold's LAST write — its commit marks the batch complete, so the
    * state/buf/wm siblings of that id are guaranteed present). */
  private def cusumPrior(
      spark: org.apache.spark.sql.SparkSession, path: String,
      beforeBatch: Long): Option[Long] = {
    val (fs, root) = LedgerFiles.fsOf(spark, path)
    (LedgerFiles.batchDirs(fs, root, "final")
      .map(p => new org.apache.hadoop.fs.Path(p).getName.drop(1).toLong)
      .filter(_ < beforeBatch)) match {
      case Seq() => None
      case ids => Some(ids.max)
    }
  }

  /** Ingestion-time fold for streaming CUSUM (the ledgered form of the
    * transformWithState processor — N70 under the hash gate): CUSUM is
    * ORDER-SENSITIVE (each statistic folds the previous one), so a
    * reading is scored exactly once, when no earlier reading can still
    * arrive: the event-time watermark (max ts − latenessMs) finalizes
    * buffered readings IN (ts, id) ORDER against the carried per-key
    * (running sum p, running min m) state, emits their points
    * append-FINAL, and buffers the rest. All four writes are
    * batch-id-keyed atomic renames with `final` LAST (the
    * batch-complete marker); the fold reads the state of the last
    * COMPLETE batch before its own id, so redelivered and half-crashed
    * batches recompute identical rows and converge — the
    * [[Intervals.outageLedgerBatch]] contract. Decimal arithmetic
    * matches [[withCusum]] exactly, so the whole history replays in
    * ANSI SQL: fold-then-finalize ≡ the one-shot windowed computation
    * restricted to ts < final watermark.
    *
    * @return the function to pass to `stream.writeStream.foreachBatch`
    *         (batch columns: keys ++ (idCol, tsCol: timestamp-like
    *         long ms, value)) */
  def cusumLedgerBatch(
      path: String, keys: Seq[String], tsCol: String, idCol: String,
      value: String, latenessMs: Long,
      slack: Double, threshold: Double): (DataFrame, Long) => Unit = {
    (batch, batchId) =>
      val spark = batch.sparkSession
      val (fs, root) = LedgerFiles.fsOf(spark, path)
      LedgerFiles.requireManifest(fs, root, path, WhatCusum)
      val done =
        fs.exists(new org.apache.hadoop.fs.Path(root, s"final/b$batchId"))
      if (!done && !batch.isEmpty) {
        val kcols = keys.map(col)
        val prior = cusumPrior(spark, path, batchId)
        val incoming = batch.select(
          kcols ++ Seq(col(idCol).cast("long").as("_eid"),
            col(tsCol).cast("long").as("_ts"),
            col(value).cast("double").as("_x")): _*)
        val (buf0, state0, wm0) = prior match {
          case Some(j) => (
            spark.read.parquet(s"$path/buf/b$j"),
            spark.read.parquet(s"$path/state/b$j"),
            spark.read.parquet(s"$path/wm/b$j").head.getLong(0))
          case None => (
            incoming.limit(0),
            incoming.select(kcols: _*).limit(0)
              .withColumn("_p", lit(null).cast(CusumDec))
              .withColumn("_m", lit(null).cast(CusumDec)),
            Long.MinValue)
        }
        val maxTs = incoming.agg(max(col("_ts"))).head.getLong(0)
        val wm = math.max(wm0, maxTs - latenessMs)
        val all = graft.core.CacheGovernor.persistTracked(
          buf0.unionByName(incoming))
        val fin = all.filter(col("_ts") < wm)
        val mu = {
          LedgerFiles.requireManifest(fs, root, path, WhatCusum)
          spark.read.parquet(s"$path/mu/b0")
        }
        // per-key carried fold, expressed as windows over the
        // finalized slice: p_i = p0 + Σ(x−μ−k), m_i = min(m0, min p_j)
        val wRun = Window.partitionBy(kcols: _*)
          .orderBy(col("_ts"), col("_eid"))
          .rowsBetween(Window.unboundedPreceding, 0)
        val scored = graft.core.CacheGovernor.persistTracked(fin
          .join(broadcast(mu), keys)
          .join(state0, keys, "left")
          .withColumn("_d",
            col("_x").cast(CusumDec) - col("_mu") - lit(slack).cast(CusumDec))
          .withColumn("_pp",
            coalesce(col("_p"), lit(0).cast(CusumDec)) + sum(col("_d")).over(wRun))
          .withColumn("_mm",
            least(coalesce(col("_m"), col("_pp")), min(col("_pp")).over(wRun)))
          .withColumn("_s", col("_pp") - least(col("_mm"), lit(0).cast(CusumDec))))
        val points = scored.select(
          kcols ++ Seq(col("_eid"), col("_ts"), col("_x"),
            round(col("_s").cast("double"), 4).as("cusum"),
            (col("_s") > lit(threshold).cast(CusumDec)).as("alert")): _*)
        // carried state: last (p, m) per key from this round's fold,
        // unioned with untouched keys' prior state
        val wLast = Window.partitionBy(kcols: _*)
          .orderBy(col("_ts").desc, col("_eid").desc)
        val foldedState = scored
          .withColumn("_rn", row_number().over(wLast))
          .filter(col("_rn") === 1)
          .select(kcols ++ Seq(col("_pp").as("_p"), col("_mm").as("_m")): _*)
        val carried = state0.join(foldedState.select(kcols: _*),
            keys, "left_anti")
          .unionByName(foldedState)
        import spark.implicits._
        // commit order: buf, state, wm, final LAST (the done marker)
        LedgerFiles.atomicAppendAt(spark, path, "buf",
          all.filter(col("_ts") >= wm), batchId)
        LedgerFiles.atomicAppendAt(spark, path, "state", carried, batchId)
        LedgerFiles.atomicAppendAt(spark, path, "wm",
          Seq(wm).toDF("wm"), batchId)
        LedgerFiles.atomicAppendAt(spark, path, "final", points, batchId)
      }
  }

  /** Every finalized CUSUM point the monitor ever emitted — the
    * append-only union of the `final/` batches, ≡ the one-shot
    * [[withCusum]]-style computation (under the frozen profile μ)
    * restricted to readings the final watermark passed. */
  def cusumLedgerPoints(
      spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    val (fs, root) = LedgerFiles.fsOf(spark, path)
    LedgerFiles.requireManifest(fs, root, path, WhatCusum)
    spark.read.option("recursiveFileLookup", "true").parquet(s"$path/final")
  }

  def withCusum(
      df: DataFrame,
      keys: Seq[String],
      order: Seq[String],
      value: String,
      slack: Double,
      threshold: Double): DataFrame = {
    val dec = DecimalType(18, 4)
    val wAll = Window.partitionBy(keys.map(col): _*)
    val wRun = Window.partitionBy(keys.map(col): _*).orderBy(order.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val xd = col(value).cast(dec)
    val mu = round(sum(xd).over(wAll).cast("double") / count(lit(1)).over(wAll), 4)
      .cast(dec)
    df.withColumn("_p", sum(xd - mu - lit(slack).cast(dec)).over(wRun))
      .withColumn("_m", min(col("_p")).over(wRun))
      .withColumn("_s", col("_p") - least(col("_m"), lit(0).cast(dec)))
      // the decimal statistic is exactly 4-dp; rounding the double cast
      // back to that grid erases DuckDB's int·10⁻ˢᶜᵃˡᵉ cast error (its
      // decimal→double is not correctly rounded; ~1e-13 off)
      .withColumn("cusum", round(col("_s").cast("double"), 4))
      .withColumn("cusum_alert", col("_s") > lit(threshold).cast(dec))
      .drop("_p", "_m", "_s")
  }

  /** Trailing-window z-score anomaly flags: a row is anomalous when its
    * value sits more than `zThreshold` sample standard deviations from
    * the mean of the `lookback` rows strictly before it (needs at least
    * `minN` of them). Adds `trail_n` and `anomaly`. */
  def withAnomalyFlags(
      df: DataFrame,
      keys: Seq[String],
      order: Seq[String],
      value: String,
      lookback: Int = 32,
      minN: Int = 8,
      zThreshold: Double = 3.0): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(col): _*)
      .rowsBetween(-lookback, -1)
    val d = col(value).cast(DecimalType(18, 4))
    // one named column per DISTINCT window aggregate: inlining n/sx/sxx
    // into the anomaly expression gave WindowExec ELEVEN sliding frames
    // (count ×6, sum(x) ×4, sum(x²) ×1 — duplicates are not unified);
    // three named columns make it three frames, same values (r20).
    val withSums = df
      .withColumn("_an_n", count(col(value)).over(w).cast("double"))
      .withColumn("_an_sx", sum(d).over(w).cast("double"))
      .withColumn("_an_sxx", sum(d * d).over(w).cast("double"))
    val (n, sx, sxx) = (col("_an_n"), col("_an_sx"), col("_an_sxx"))
    val mean = sx / n
    val variance = (n * sxx - sx * sx) / (n * (n - lit(1.0)))
    val dev = col(value) - mean
    withSums
      .withColumn("trail_n", n.cast("long"))
      .withColumn("anomaly",
        n >= minN && dev * dev > lit(zThreshold * zThreshold) * variance)
      .drop("_an_n", "_an_sx", "_an_sxx")
  }
}
