package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.LinearProbe

/** Trainable linear quality probe ([[graft.operators.LinearProbe]]):
  * k iterations of batch gradient descent over exact-ratio features,
  * every per-row product floor-quantized before the distributed sum,
  * the oracle UNROLLED from the same feature fragments / fold orders /
  * constants that drive the Spark loop (the PageRank discipline) —
  * engine and oracle cannot drift, and a single wrong gradient
  * component in any iteration breaks the final-weight hash.
  */
object ProbeQueries {

  private val iters = 6
  private val lr = 0.3

  private val linearProbe = QuerySpec(
    "q_ml_linear_probe",
    LinearProbe.oracleSql("text", iters, lr)) { (s, d) =>
    LinearProbe.train(Tables.documents(s, d), col("text"), iters, lr)
      .orderBy("feature_idx")
  }

  def all: Seq[QuerySpec] = Seq(linearProbe)
}
