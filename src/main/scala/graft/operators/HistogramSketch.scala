package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable equi-width histogram quantile sketch — the quantile member
  * of the engine's sketch family (HLL cardinality N41, Misra–Gries
  * frequency N43, Bloom membership N49): per-batch histograms are plain
  * additive bin counts, so daily sketches SUM into the whole-corpus
  * sketch under any merge tree, and quantiles come off the merged
  * counts without ever rescanning history.
  *
  * Guarantees (for values inside [lo, hi)): the q-quantile estimate is
  * the upper edge of the bin holding rank ⌈q·N⌉, so
  *   true q-quantile ∈ (est − w, est]   with   w = (hi − lo) / bins —
  * a deterministic, scale-independent value-error bound, traded against
  * O(bins) state. Out-of-range values clamp to the edge bins (their
  * mass is counted; their VALUE error is unbounded — pick [lo, hi) from
  * domain knowledge, as with any fixed-universe sketch).
  *
  * Unlike GK/KLL/t-digest, every number here is deterministic integer
  * counting plus exact bin-edge arithmetic — the whole sketch AND its
  * quantile read-out hash-oracle across engines, which none of the
  * comparison-based sketches can do.
  *
  * 100 TB shape: build is one groupBy on (keys, bin) — map-side partial
  * aggregation collapses each task to ≤ bins rows before the exchange.
  * Quantile read-out windows over the AGGREGATED histogram (≤ bins rows
  * per key), never over data.
  */
object HistogramSketch {

  /** Clamped equi-width bin index of `v` over [lo, hi) in [0, bins-1].
    * Exact-portable: one subtraction, one division, floor, clamp. */
  def binOf(v: Column, lo: Double, hi: Double, bins: Int): Column = {
    val w = (hi - lo) / bins
    least(lit(bins - 1), greatest(lit(0), floor((v - lit(lo)) / lit(w)).cast("int")))
      .cast("long")
  }

  /** Build per-key histograms: (keys..., bin, cnt). Merge = sum cnt. */
  def build(
      df: DataFrame, value: Column, lo: Double, hi: Double, bins: Int,
      keys: Seq[String] = Nil): DataFrame =
    df.groupBy(keys.map(col) :+ binOf(value, lo, hi, bins).as("bin"): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Merge histograms that share bin edges, dropping `mergeOut` keys
    * (e.g. the per-day key): counts simply add. */
  def merge(hist: DataFrame, keys: Seq[String]): DataFrame =
    hist.groupBy(keys.map(col) :+ col("bin"): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Population Stability Index between two histograms sharing bin
    * edges — the standard distribution-drift score between corpus /
    * feature snapshots (retrain triggers, ingest-mix regressions):
    *
    *   PSI(key) = Σ_bins (p_b − q_b) · ln(p_b / q_b)
    *
    * over Laplace-smoothed shares p_b = (cnt_a + ½) / (n_a + bins/2),
    * so empty bins stay finite and the score is defined for any pair
    * of sketches. (Rule of thumb: < 0.1 stable, > 0.25 drifted.)
    *
    * Determinism: the bin spine is ENUMERATED 0..bins−1 (both engines
    * iterate identical bins, including ones absent from both sides);
    * the one libm ln() per bin hides behind a 6-dp rounding and the
    * per-bin contributions sum as exact decimal — the BM25/TF-IDF
    * trick — so the score hash-oracles.
    *
    * Scale shape: inputs are ALREADY aggregated histograms (≤ bins
    * rows per key); everything here — spine join, totals window,
    * contribution sum — runs on that keys×bins grid, never on data. */
  def psi(
      a: DataFrame, b: DataFrame, bins: Int,
      keys: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val spark = a.sparkSession
    val binSpine = spark.range(bins).select(col("id").as("bin"))
    val spine =
      if (keys.isEmpty) binSpine
      else a.select(keys.map(col): _*).union(b.select(keys.map(col): _*))
        .distinct().crossJoin(binSpine)
    val grid = spine
      .join(a.withColumnRenamed("cnt", "_ca"), keys :+ "bin", "left")
      .join(b.withColumnRenamed("cnt", "_cb"), keys :+ "bin", "left")
      .withColumn("_ca", coalesce(col("_ca"), lit(0L)))
      .withColumn("_cb", coalesce(col("_cb"), lit(0L)))
    val wk = Window.partitionBy(keys.map(col): _*)
    val p = (col("_ca") + lit(0.5)) / (sum(col("_ca")).over(wk) + lit(bins / 2.0))
    val q = (col("_cb") + lit(0.5)) / (sum(col("_cb")).over(wk) + lit(bins / 2.0))
    grid
      .withColumn("_contrib",
        round((p - q) * log(p / q), 6).cast(DecimalType(18, 6)))
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("_ca")).as("n_a"),
        sum(col("_cb")).as("n_b"),
        sum(col("_contrib")).cast("double").as("psi"))
  }

  /** Quantile read-out: for each key and q, the upper edge of the bin
    * containing rank ⌈q·N⌉. Output: (keys..., q, est, n). */
  def quantiles(
      hist: DataFrame, qs: Seq[Double], lo: Double, hi: Double, bins: Int,
      keys: Seq[String] = Nil): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0), "q must be in (0, 1]")
    val w = (hi - lo) / bins
    val kcols = keys.map(col)
    val win = Window.partitionBy(kcols: _*).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = Window.partitionBy(kcols: _*)
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(win))
      .withColumn("n", sum(col("cnt")).over(tot))
    val qframe = qs.map(q => struct(lit(q).as("q"))).toArray
    cum
      .crossJoin(broadcast(hist.sparkSession.range(1).select(
        explode(array(qframe.toIndexedSeq: _*)).as("_q")).select(col("_q.q").as("q"))))
      .filter(col("cum") >= ceil(col("q") * col("n")))
      .groupBy(kcols :+ col("q"): _*)
      .agg(min(col("bin")).as("_b"), min(col("n")).as("n"))
      .withColumn("est", lit(lo) + (col("_b") + lit(1)).cast("double") * lit(w))
      .select(kcols ++ Seq(col("q"), col("est"), col("n")): _*)
  }
}
