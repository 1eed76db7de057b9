package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Anomaly

class AnomalySpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def series(vals: Seq[Double], key: String = "k") =
    vals.zipWithIndex.map { case (v, i) => (key, i.toLong, v) }
      .toDF("key", "t", "value")

  test("ewma of a constant series is that constant") {
    val out = Anomaly.withEwma(series(Seq.fill(40)(7.25)), Seq("key"), Seq("t"), "value")
      .select("ewma").collect()
    assert(out.forall(_.getDouble(0) === 7.25))
  }

  test("ewma first row equals the value; second row is the 2:1 blend") {
    val out = Anomaly.withEwma(series(Seq(10.0, 4.0)), Seq("key"), Seq("t"), "value")
      .orderBy("t").select("ewma").collect()
    assert(out(0).getDouble(0) === 10.0)
    // (4*1 + 10*0.5) / 1.5
    assert(out(1).getDouble(0) === (4.0 + 5.0) / 1.5)
  }

  test("ewma responds to a step and converges toward the new level") {
    val vals = Seq.fill(20)(1.0) ++ Seq.fill(20)(100.0)
    val out = Anomaly.withEwma(series(vals), Seq("key"), Seq("t"), "value")
      .orderBy("t").select("ewma").collect().map(_.getDouble(0))
    assert(out(19) === 1.0)
    assert(out(20) > 50.0 && out(20) < 100.0) // half-weight on the new value
    assert(out(39) > 99.9) // 16 steps after the step: tail influence < 2^-15
  }

  test("anomaly flags exactly the planted spike, not the steady state") {
    val vals = Seq.tabulate(50)(i => if (i == 40) 500.0 else 10.0 + (i % 3))
    val out = Anomaly.withAnomalyFlags(series(vals), Seq("key"), Seq("t"), "value")
      .orderBy("t").select("t", "anomaly", "trail_n").collect()
    val flagged = out.filter(_.getBoolean(1)).map(_.getLong(0)).toSeq
    assert(flagged === Seq(40L))
    // warm-up rows cannot flag
    assert(out.take(8).forall(!_.getBoolean(1)))
  }

  test("flags are per-key: a spike in one series never flags another") {
    val a = Seq.tabulate(40)(i => ("a", i.toLong, if (i == 30) 900.0 else 5.0 + (i % 2)))
    val b = Seq.tabulate(40)(i => ("b", i.toLong, 5.0 + (i % 2)))
    val out = Anomaly.withAnomalyFlags((a ++ b).toDF("key", "t", "value"),
      Seq("key"), Seq("t"), "value")
    assert(out.filter(col("anomaly")).select("key").collect().map(_.getString(0)).toSeq === Seq("a"))
  }

  test("window is partitioned: no single-task global window in the plan") {
    val df = Anomaly.withEwma(series(Seq.fill(10)(1.0)), Seq("key"), Seq("t"), "value")
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("windowspecdefinition(t"), "window must be keyed, not global")
  }
}
