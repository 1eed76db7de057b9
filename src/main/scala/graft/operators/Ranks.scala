package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed rank statistics (A9 in SURVEY.md §2; reference
  * README.md:53 model-quality metrics).
  *
  * The naive Mann-Whitney AUC needs a global rank — a
  * `row_number() OVER (ORDER BY score)` with no partitioning, which
  * physically is a single-task sort of the whole input: fine at sf0.1,
  * a scale-killer at 100 TB. This operator computes the SAME
  * tie-averaged ranks fully distributed:
  *
  *  1. aggregate rows per distinct score (map-side combinable; the
  *     distinct-score table is orders of magnitude smaller than rows);
  *  2. range-partition the score table, so partition order follows
  *     score order and equal scores co-locate;
  *  3. per-partition row totals → each partition's global row offset
  *     via a triangular broadcast self-join over one row per partition
  *     (P² pairs of a P-row frame — trivial at any P, and window-free
  *     so the plan contains NO unpartitioned window at all);
  *  4. a per-PARTITION running sum (windowed by partition id — every
  *     partition is an independent window group) plus the offset gives
  *     each score's "rows strictly below" count; the tie-averaged rank
  *     is then `below + (cnt+1)/2`.
  *
  * All sums involved are integers or dyadic rationals (granularity ½)
  * far under 2⁵³, so double arithmetic is exact and order-free — the
  * result hash-matches the oracle's per-row `AVG(rn) OVER (PARTITION BY
  * score)` formulation bit-for-bit.
  */
object Ranks {

  /** Tie-averaged-rank table per distinct score: (_score, _cnt, _npos,
    * _ar) where _ar is the average global rank of that score's tie
    * group and _npos the positive-label count in it. */
  def tieAveragedRanks(df: DataFrame, score: Column, isPos: Column): DataFrame = {
    val byScore = df
      .select(score.as("_score"), isPos.cast("long").as("_p"))
      .groupBy("_score")
      .agg(count(lit(1)).as("_cnt"), sum(col("_p")).as("_npos"))
    // PERSISTED: _pid is only meaningful if every DAG branch below reads
    // the SAME materialized exchange. Unpersisted, the offsets branch and
    // the final join branch each re-evaluate the range exchange with
    // independently sampled boundaries (and independent AQE coalescing),
    // label partitions differently, and the inner join on _pid silently
    // drops rows — measured at ~200k distinct scores: npos+nneg collapsed
    // to half the input. Same session-lifetime cache convention as
    // Dedup.collapseVerify (tracked via CacheGovernor; Bench/Verify
    // isolate per query). RanksSpec stress-tests exactly this
    // cardinality against the single-window reference.
    val ranged = graft.core.CacheGovernor.persistTracked(byScore
      .repartitionByRange(col("_score"))
      .withColumn("_pid", spark_partition_id()))
    val offs = partitionOffsets(ranged, sum(col("_cnt")))
    val w = Window.partitionBy("_pid").orderBy("_score")
    ranged.join(broadcast(offs), "_pid")
      .withColumn("_below", col("_off") + sum(col("_cnt")).over(w) - col("_cnt"))
      .withColumn("_ar", col("_below") + (col("_cnt") + lit(1)) / lit(2.0))
      .select("_score", "_cnt", "_npos", "_ar")
  }

  /** Distributed `row_number() OVER (ORDER BY order…)` — the same
    * range-partition + per-partition-window + broadcast-triangular-
    * offset shape as [[tieAveragedRanks]], generalized to a composite
    * sort key. The plan contains no unpartitioned window, so a global
    * ordering over an arbitrarily large frame never collapses to one
    * task.
    *
    * PRECONDITION: the composite key must be UNIQUE per row — range
    * partitioning may split a tie group across partition boundaries,
    * which would make tied rows' numbers partition-dependent. With a
    * unique key the numbering is total and deterministic.
    *
    * Appends `outCol` (1-based, long). Same persist-the-range-exchange
    * requirement and session-cache convention as [[tieAveragedRanks]].
    */
  def distributedRowNumber(
      df: DataFrame, order: Seq[Column], outCol: String = "rn"): DataFrame = {
    val ranged = graft.core.CacheGovernor.persistTracked(df
      .repartitionByRange(order: _*)
      .withColumn("_pid", spark_partition_id()))
    val offs = partitionOffsets(ranged, count(lit(1)))
    val w = Window.partitionBy("_pid").orderBy(order: _*)
    ranged.join(broadcast(offs), "_pid")
      .withColumn(outCol, col("_off") + row_number().over(w).cast("long"))
      .drop("_pid", "_off")
  }

  /** Per-partition global row offsets for a range-partitioned frame
    * carrying `_pid`: each partition's offset is the sum of `weight`
    * over all lower-id partitions, via the triangular broadcast
    * self-join (P² pairs over one row per partition — trivial at any P,
    * and window-free). Shared by both rank operators so the
    * offset/persist subtleties live in one place. */
  private def partitionOffsets(ranged: DataFrame, weight: Column): DataFrame = {
    val ptot = ranged.groupBy("_pid").agg(weight.as("_pcnt"))
    ptot.select(col("_pid"))
      .join(broadcast(ptot.select(col("_pid").as("_q"), col("_pcnt"))),
        col("_q") < col("_pid"), "left_outer")
      .groupBy("_pid")
      .agg(coalesce(sum(col("_pcnt")), lit(0L)).as("_off"))
  }

  /** Reliability / calibration table for a binary scorer (the
    * ECE-family companion to [[aucStats]]'s discrimination metric —
    * AUC says whether the score RANKS outages above non-outages;
    * calibration says whether the score's LEVEL means what it claims,
    * which is what a forecast consumer paging field engineers on
    * "probability > 0.7" actually relies on).
    *
    * Scores are min-max normalized to [0,1] and binned into `bins`
    * equal-width cells. Per cell: n, mean normalized score (conf),
    * positive rate (acc), gap = acc − conf, and the overall expected
    * calibration error ECE = Σ_cells (n/N)·|gap| attached to every row.
    *
    * Oracle-parity choices: conf is the exact-decimal RAW-score mean
    * normalized afterwards (one deterministic double op — casting the
    * computed normalized double to decimal would hit engine rounding-
    * mode differences); the ECE contributions round to 6 dp and sum as
    * exact decimal. Scale shape: one map-side-combinable groupBy on
    * the cell id; the min/max row and the bins-row ECE total ride
    * broadcasts — the data shuffles nothing. */
  def calibration(
      df: DataFrame, score: Column, isPos: Column, bins: Int): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(bins >= 2, "need at least 2 bins")
    val mm = df.agg(min(score).as("_lo"), max(score).as("_hi"))
    val cells = df
      .select(score.as("_x"), isPos.cast("int").as("_y"))
      .crossJoin(broadcast(mm))
      .withColumn("bin",
        // degenerate-range gate (house discipline — Regression's dxx>0,
        // seasonalProfile's NULL stddev): all-equal scores would make the
        // bin expression 0/0 (NaN) and conf ±Inf; collapse to one bin
        // with NULL conf/gap instead
        when(col("_hi") > col("_lo"),
          least(lit(bins - 1).cast("long"),
            floor((col("_x") - col("_lo")) / (col("_hi") - col("_lo")) * bins)))
          .otherwise(lit(0L)))
      .groupBy("bin")
      .agg(
        count(lit(1)).as("n"),
        sum(col("_x").cast(DecimalType(27, 4))).as("_sx"),
        sum(col("_y")).as("_npos"),
        first(col("_lo")).as("_lo"), first(col("_hi")).as("_hi"))
      .withColumn("conf",
        when(col("_hi") > col("_lo"),
          (col("_sx").cast("double") / col("n") - col("_lo")) / (col("_hi") - col("_lo"))))
      .withColumn("acc", col("_npos").cast("double") / col("n"))
      .withColumn("gap", col("acc") - col("conf"))
    val ece = cells.agg(
      sum(col("n")).as("_nt"),
      sum(round(col("n") * abs(col("gap")), 6).cast(DecimalType(27, 6))).as("_gsum"))
      .select((col("_gsum").cast("double") / col("_nt")).as("ece"))
    cells
      .crossJoin(broadcast(ece))
      .select(col("bin"), col("n"), col("conf"), col("acc"), col("gap"), col("ece"))
  }

  /** Weight-of-evidence feature binning + information value — the
    * risk-modeling companion to [[calibration]] (ECE asks "is the
    * score's level trustworthy?"; WOE/IV asks "how much does this
    * FEATURE separate the classes, bin by bin?" — the standard
    * credit-risk / feature-selection diagnostic):
    *
    *   woe(b) = ln( (pos_b/P) / (neg_b/N) ),
    *   IV     = Σ_b (pos_b/P − neg_b/N) · woe(b)
    *
    * with +0.5 Laplace smoothing so empty cells stay finite (IV rules
    * of thumb: < 0.02 useless, > 0.3 strong). Equi-width bins over
    * [lo, hi) share HistogramSketch.binOf's clamped arithmetic.
    *
    * Oracle parity: the one ln() per bin rounds to 6 dp before the
    * exact-decimal IV sum (the BM25 trick); everything else is exact
    * integers + deterministic double ops. One map-side-combinable
    * groupBy on the bin; totals and the IV row ride broadcasts. */
  def woeBins(
      df: DataFrame, feature: Column, isPos: Column,
      lo: Double, hi: Double, bins: Int): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val cells = df
      .select(HistogramSketch.binOf(feature, lo, hi, bins).as("bin"),
        isPos.cast("int").as("_y"))
      .groupBy("bin")
      .agg(sum(col("_y")).as("n_pos"), sum(lit(1) - col("_y")).as("n_neg"))
    // totals and the IV come from windows over the ALREADY-aggregated
    // ≤bins-row grid — an agg + self-crossjoin would re-execute the
    // data-sized cells scan per branch (the shardStats lesson)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    cells
      .withColumn("_pr",
        (col("n_pos") + lit(0.5)) / (sum(col("n_pos")).over(wAll) + lit(bins / 2.0)))
      .withColumn("_nr",
        (col("n_neg") + lit(0.5)) / (sum(col("n_neg")).over(wAll) + lit(bins / 2.0)))
      .withColumn("woe", round(log(col("_pr") / col("_nr")), 6))
      .withColumn("iv",
        sum(round((col("_pr") - col("_nr")) * col("woe"), 6)
          .cast(DecimalType(27, 6))).over(wAll).cast("double"))
      .select(col("bin"), col("n_pos"), col("n_neg"), col("woe"), col("iv"))
  }

  /** One-row (npos: long, nneg: long, auc: double) via the tie-corrected
    * Mann-Whitney statistic over [[tieAveragedRanks]]. */
  def aucStats(df: DataFrame, score: Column, isPos: Column): DataFrame = {
    val ranks = tieAveragedRanks(df, score, isPos)
    val npos = sum(col("_npos"))
    val nneg = sum(col("_cnt") - col("_npos"))
    ranks.agg(
      npos.cast("long").as("npos"),
      nneg.cast("long").as("nneg"),
      ((sum(col("_npos") * col("_ar")) - npos * (npos + lit(1)) / 2.0) /
        (npos * nneg)).as("auc"))
  }
}
