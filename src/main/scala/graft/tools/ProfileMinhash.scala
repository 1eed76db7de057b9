package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level CPU profile of the minhash relation build (round 8): the
  * shared collapse→band→verify pipeline is the registry's largest CPU
  * consumer (~53 s executor CPU at sf0.1, attributed to whichever dedup
  * query runs first), so break its cost down stage by stage before
  * touching anything. Each stage pins its input with localCheckpoint so
  * the tally isolates the stage's own work. Measurement tooling only —
  * mirrors Dedup's internals at its default parameters (64/16/0.9).
  */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    val tally = new ProfileQuery.Tally
    spark.sparkContext.addSparkListener(tally)
    def t(label: String)(body: => DataFrame): DataFrame = {
      org.apache.spark.GraftSparkAccess.drainListenerBus(spark.sparkContext)
      val c0 = tally.cpuNs.get; val k0 = tally.tasks.get
      val r0 = tally.shufRead.get; val w0 = tally.shufWrite.get
      val t0 = System.nanoTime()
      val out = body.localCheckpoint()
      val n = out.count()
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.GraftSparkAccess.drainListenerBus(spark.sparkContext)
      println(f"[stage] $label%-34s wall ${wall}%6.2f s  cpu ${(tally.cpuNs.get - c0) / 1e9}%7.2f s  tasks ${tally.tasks.get - k0}%5d  shufR ${(tally.shufRead.get - r0) / 1048576.0}%8.1f MiB  shufW ${(tally.shufWrite.get - w0) / 1048576.0}%8.1f MiB  ($n rows)")
      out
    }

    val numHashes = 64; val bands = 16; val threshold = 0.9; val r = numHashes / bands
    val docs = graft.core.Tables.documents(spark, sfDir)
      .repartition(spark.sparkContext.defaultParallelism)

    val prep = t("1 tokenHashSet")(
      docs.select(col("doc_id").as("_id"),
        graft.plans.TextHashNative.tokenHashSet(col("text")).as("_set")))
    val tagged = t("2 fingerprint")(prep.withColumn("_fp", xxhash64(col("_set"))))
    val reps = t("3 collapse reps")(
      tagged.groupBy("_fp").agg(min(col("_id")).as("_rid"), first(col("_set")).as("_set")))
    val sigs = t("4 minhash signatures")(
      reps.withColumn("_sig", graft.plans.TextHashNative.minHashSig(col("_set"), numHashes)))
    val banded = t("5 band hashes")(
      sigs.select(col("_fp"), size(col("_set")).as("_n"),
          graft.operators.Dedup.bandHashesOfSig(col("_sig"), numHashes, bands).as("_bhs"))
        .select(col("_fp"), col("_n"), col("_bhs"), posexplode(col("_bhs")))
        .withColumnRenamed("pos", "_band").withColumnRenamed("col", "_bandhash"))
    // round-8 pipeline: one orientation + first-matching-band only →
    // candidates leave the join distinct, no dedup stage
    val cand = t("6 band join + skip-earlier-bands")(
      banded.select(col("_fp").as("_fpa"), col("_n").as("_na"),
          col("_bhs").as("_bhsa"), col("_band"), col("_bandhash"))
        .join(banded.select(col("_fp").as("_fpb"), col("_n").as("_nb"),
          col("_bhs").as("_bhsb"), col("_band"), col("_bandhash")),
          Seq("_band", "_bandhash"))
        .filter(col("_fpa") < col("_fpb"))
        .filter(col("_na") >= col("_nb") * threshold - 1e-9 &&
          col("_nb") >= col("_na") * threshold - 1e-9)
        .filter(col("_band") ===
          graft.plans.VectorNative.firstEqualIndex(col("_bhsa"), col("_bhsb")))
        .select("_fpa", "_fpb"))
    val verified = t("8 verify joins + intersect")(
      cand.join(reps.select(col("_fp").as("_fpa"), col("_set").as("_seta")), "_fpa")
        .join(reps.select(col("_fp").as("_fpb"), col("_set").as("_setb")), "_fpb")
        .withColumn("_i", graft.plans.VectorNative.sortedIntersectSize(col("_seta"), col("_setb")))
        .withColumn("jaccard",
          col("_i").cast("double") / (size(col("_seta")) + size(col("_setb")) - col("_i")))
        .filter(col("jaccard") >= threshold)
        .select("_fpa", "_fpb", "jaccard"))
    val members = tagged.select(col("_fp"), col("_id"))
    t("9 expand member pairs")(
      members.select(col("_fp"), col("_id").as("a_id"))
        .join(members.select(col("_fp"), col("_id").as("b_id")), "_fp")
        .filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"), lit(1.0).as("jaccard"))
        .unionByName(verified
          .join(members.select(col("_fp").as("_fpa"), col("_id").as("_ida")), "_fpa")
          .join(members.select(col("_fp").as("_fpb"), col("_id").as("_idb")), "_fpb")
          .select(least(col("_ida"), col("_idb")).as("a_id"),
            greatest(col("_ida"), col("_idb")).as("b_id"), col("jaccard"))))
    spark.stop()
  }
}
