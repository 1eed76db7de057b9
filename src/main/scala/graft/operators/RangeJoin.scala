package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join without the BroadcastNestedLoop trap.
  *
  * Spark plans a bare `point BETWEEN start AND end` join as a broadcast
  * nested loop (or cartesian product) — O(|points|·|intervals|) compute
  * no matter the selectivity, a scale-killer on fact-sized inputs. The
  * standard fix, implemented here: discretize the domain into
  * fixed-width bins, explode each interval onto every bin it overlaps,
  * hash-equi-join on the bin, and re-check the exact predicate.
  * Candidate work becomes O(points + Σ interval-spans/bin + true
  * matches) and the join shuffles by bin key like any equi-join —
  * partitioned, AQE-skew-splittable, no quadratic blowup.
  *
  * Pick `binSizeDays` near the typical interval length: each interval
  * then lands in ~2 bins, and each point in exactly one (so the output
  * needs no dedup).
  */
object RangeJoin {

  private val epoch = to_date(lit("1970-01-01"))

  /** Inner-join `points` rows onto every `intervals` row whose
    * [startCol, endCol] (dates, inclusive) contains pointCol. */
  def pointInInterval(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binSizeDays: Int): DataFrame = {
    require(binSizeDays > 0, "binSizeDays must be positive")
    val p = points.withColumn("_bin",
      floor(datediff(col(pointCol), epoch) / binSizeDays))
    // inverted intervals match nothing under BETWEEN; they must be
    // dropped BEFORE the explode because Spark's sequence(a, b) counts
    // DOWN when b < a — it would fabricate bins instead of none
    val iv = intervals
      .filter(col(startCol) <= col(endCol))
      .withColumn("_bin",
        explode(sequence(
          floor(datediff(col(startCol), epoch) / binSizeDays),
          floor(datediff(col(endCol), epoch) / binSizeDays))))
    iv.join(p, Seq("_bin"))
      .filter(col(pointCol).between(col(startCol), col(endCol)))
      .drop("_bin")
  }
}
