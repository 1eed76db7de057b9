package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Per-group closed-form OLS trend fitting — "is this site's KPI
  * drifting, and how fast?" (the reference's degradation-forecast
  * surface, README.md:44-53, as a per-site analytic rather than an
  * MLlib model): for every key, the least-squares line of value
  * against time,
  *
  *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²),
  *   intercept = (Σy − slope·Σx) / n,  r² = slope²·Sxx / Syy,
  *
  * from five exact-decimal moments — ONE map-side-combinable groupBy,
  * no windows, no iteration, deterministic at any partition count
  * (the dstddev discipline applied to regression).
  *
  * x is centered per group as seconds from the group's epoch-min
  * (computed in the same aggregate via min/decimal shifts) — raw
  * epoch-millis x would square to ~10²⁴ and overflow any fixed
  * decimal; centered seconds keep every moment inside DECIMAL(38,6)
  * at century-scale spans. Degenerate groups (n < 2 or zero x/y
  * variance) yield NULL slope/r² instead of an ANSI division error.
  */
object Regression {

  /** Per-key OLS of `value` against event-time seconds.
    * Output: (keys..., n, slope_per_day, intercept, r2) — slope is
    * reported per DAY (the NOC-legible unit). */
  def trendPerKey(
      df: DataFrame, keys: Seq[String], tsCol: String, value: Column): DataFrame = {
    val dec = DecimalType(38, 6)
    // center x inside the aggregate: x = ts_s − min(ts_s) per group via
    // the expanded moments (Σ(x−m) = Σx − n·m etc.) — all exact
    // integer `div`, not `/`: Column `/` on longs is DOUBLE division
    val xs = expr(s"unix_millis($tsCol) div 1000").cast(dec) // whole seconds, exact
    val y = value.cast(dec)
    val g = df.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n"),
      min(xs).as("_xmin"),
      sum(xs).as("_sx"),
      sum(y).as("_sy"),
      sum((xs * xs).cast(dec)).as("_sxx"),
      sum((xs * y).cast(dec)).as("_sxy"),
      sum((y * y).cast(dec)).as("_syy"))
    // shift to x' = x − xmin via the expanded moments
    //   Σx' = Σx − n·m;  Σx'² = Σx² − 2mΣx + n·m²;  Σx'y = Σxy − mΣy
    // — in DOUBLE after the exact decimal sums: decimal-decimal
    // products hit engine-specific precision/scale overflow rules
    // (Spark reduces scale, DuckDB may widen or reject), while the
    // identical double expression is bit-deterministic on both; the
    // cancellation error here is ~1e-11 relative at century spans,
    // invisible next to the shared correct rounding of each moment
    val n = col("n").cast("double")
    val m = col("_xmin").cast("double")
    val sx = col("_sx").cast("double") - n * m
    val sy = col("_sy").cast("double")
    val sxx = col("_sxx").cast("double") - lit(2.0) * m * col("_sx").cast("double") + n * m * m
    val sxy = col("_sxy").cast("double") - m * col("_sy").cast("double")
    val syy = col("_syy").cast("double")
    val dxx = n * sxx - sx * sx
    val dyy = n * syy - sy * sy
    val slope = (n * sxy - sx * sy) / dxx
    // outputs round to 6 dp: the big-moment double casts are correctly
    // rounded in Spark but not in DuckDB (the CUSUM lesson), leaving a
    // ~1e-11-relative cross-engine residue the grid absorbs
    g.withColumn("_slope", when(col("n") >= 2 && dxx > 0.0, slope))
      .withColumn("slope_per_day", round(col("_slope") * lit(86400.0), 6))
      .withColumn("intercept",
        round(when(col("_slope").isNotNull, (sy - col("_slope") * sx) / n), 6))
      .withColumn("r2",
        round(when(col("_slope").isNotNull && dyy > 0.0,
          col("_slope") * col("_slope") * dxx / dyy), 6))
      .select(keys.map(col) ++ Seq(col("n"), col("slope_per_day"),
        col("intercept"), col("r2")): _*)
  }
}
