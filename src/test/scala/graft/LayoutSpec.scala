package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Layout

/** Z-order layout: the interleaved key must confine BOTH dimensions
  * within each output partition — the property that makes parquet
  * min/max stats skip files for predicates on either column, where a
  * single-column sort leaves the other column's per-file range at
  * nearly the full domain. */
class LayoutSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  test("zValue interleaves bits exactly (reference fixtures)") {
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L),
      (65535L, 65535L), (1234L, 4321L)).toDF("a", "b")
      .select(Layout.zValue("a", "b").as("z")).collect().map(_.getLong(0)).toSeq
    assert(got === Seq(0L, 1L, 2L, 3L, 39L, 4294967295L, 34666758L))
  }

  test("mask-ladder zValue equals the HOF fold (all bit widths, edges)") {
    val pairs = Seq((0L, 0L), (1L, 2L), (65535L, 65535L),
      ((1L << 31) - 1, 0L), (0L, (1L << 31) - 1),
      ((1L << 31) - 1, (1L << 31) - 1), (123456789L, 987654321L)) ++
      (0 until 200).map(i => ((i * 2654435761L) % (1L << 31),
        (i * 1103515245L + 12345L) % (1L << 31)))
    val df = pairs.toDF("a", "b")
    Seq(1, 7, 16, 31).foreach { bits =>
      val diff = df.select(
        Layout.zValue("a", "b", bits).as("z1"),
        Layout.zValueViaFold("a", "b", bits).as("z2"))
        .filter(col("z1") =!= col("z2")).count()
      assert(diff === 0L, s"ladder != fold at bits=$bits")
    }
  }

  test("z-order bounds both dims per partition; single-column sort does not") {
    // deterministic uniform 16-bit pairs (independent multiplicative hashes)
    val df = (0 until 4096).map { i =>
      ((i * 2654435761L) % 65536, (i * 1103515245L + 12345L) % 65536)
    }.toDF("a", "b")
    val parts = 16
    def meanRanges(d: DataFrame): (Double, Double) = {
      val r = d.withColumn("_pid", spark_partition_id())
        .groupBy("_pid")
        .agg((max("a") - min("a")).as("ra"), (max("b") - min("b")).as("rb"))
        .agg(avg("ra"), avg("rb")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    val (za, zb) = meanRanges(Layout.zOrderBy(df, "a", "b", parts))
    val (sa, sb) = meanRanges(df.repartitionByRange(parts, col("a"))
      .sortWithinPartitions("a"))
    // single-column layout: a confined tightly, b unconstrained
    assert(sa < 8000, s"a-sorted layout should confine a: $sa")
    assert(sb > 50000, s"a-sorted layout cannot confine b: $sb")
    // z-order: BOTH dims well under half the domain on average (a few
    // partitions straddle quadrant boundaries of the curve — expected)
    assert(za < 32768, s"z-layout mean a-range: $za")
    assert(zb < 32768, s"z-layout mean b-range: $zb")
    // and the combined skipping power beats the single-column layout
    assert(za + zb < (sa + sb) * 0.75, s"z ($za + $zb) vs sort ($sa + $sb)")
  }
}
