package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{Forecast, Similarity}

/** Bound-sizing measurement for the in-band ML oracles: AUC/RMSE of the ML forecast and
  * trained-IVF mean recall at a given sf dir — run at every sf to size the
  * oracle booleans (q_x3_ml_forecast, q_sim_ivf_trained,
  * q_ep3_schedule_clustered) with >=5-sigma margin over the observed
  * cross-scale spread. */
object MeasureMlBounds {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master("local[8]"), 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val scored = Forecast.trainAndScore(Tables.events(spark, sfDir), "2024-01-20")
    val m = Forecast.metrics(scored).collect().head
    println(s"[measure] $sfDir forecast rmse=${m.getDouble(0)} auc=${m.getDouble(1)} n=${m.get(2)}")

    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 100)
    val approx = Similarity.ivfTopKTrained(queries, emb,
      "vec_id", "embedding", "vec_id", "embedding", k = 5, nCells = 16, nProbe = 4)
    val exact = Similarity.bruteForceTopK(queries, emb,
      "vec_id", "embedding", "vec_id", "embedding", k = 5)
    val kth = exact.groupBy("q_id").agg(min(col("cos")).as("_kth"))
    val per = approx.join(kth, "q_id")
      .groupBy("q_id")
      .agg((sum(when(col("cos") >= col("_kth") - 1e-9, 1).otherwise(0)) / 5.0).as("recall"))
    val r = per.agg(avg("recall").as("mean"), min("recall").as("min")).collect().head
    println(s"[measure] $sfDir ivf_trained mean_recall=${r.getDouble(0)} min_recall=${r.getDouble(1)} nq=${per.count()}")

    // schedule-clustered invariants: cluster count and rerun signature
    val s1 = graft.api.NetIntel.scheduleClustered(spark, sfDir, "2024-01-15", 4, 5)
    val nClusters = s1.select("cluster").distinct().count()
    val sig1 = s1.agg(expr("bit_xor(xxhash64(cluster, deploy_rank, site_code, urgency, zone, region))")).collect().head.getLong(0)
    val s2 = graft.api.NetIntel.scheduleClustered(spark, sfDir, "2024-01-15", 4, 5)
    val sig2 = s2.agg(expr("bit_xor(xxhash64(cluster, deploy_rank, site_code, urgency, zone, region))")).collect().head.getLong(0)
    println(s"[measure] $sfDir schedule nClusters=$nClusters rows=${s1.count()} sigEqual=${sig1 == sig2}")
    spark.stop()
  }
}
