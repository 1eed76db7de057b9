package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level CPU profile of the n-gram Jaccard dedup pipeline
  * (round 8): second-largest CPU consumer after the minhash build
  * (~31 s executor CPU at sf0.1). Mirrors ngramJaccardPairs' stages at
  * its query defaults (n=3, θ=0.8), pinning each stage input with
  * localCheckpoint so the tally isolates per-stage work. Measurement
  * tooling only.
  */
object ProfileNgram {
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

    val n = 3; val threshold = 0.8
    val docs0 = graft.core.Tables.documents(spark, sfDir)
      .repartition(spark.sparkContext.defaultParallelism)

    val docs = t("1 shingleHashSet")(
      docs0.select(col("doc_id").as("_id"),
        graft.plans.TextHashNative.shingleHashSet(col("text"), n).as("_set"))
        .filter(size(col("_set")) > 0))
    val tagged = t("2 fingerprint")(docs.withColumn("_fp", xxhash64(col("_set"))))
    val reps = t("3 collapse reps")(
      tagged.groupBy("_fp").agg(min(col("_id")).as("_rid"), first(col("_set")).as("_set")))
    val ex = t("4 explode shingles")(
      reps.select(col("_fp"), explode(col("_set")).as("_s")))
    val freq = t("5 repeated-shingle df")(
      ex.groupBy("_s").agg(count(lit(1)).as("_df")).filter(col("_df") >= 2))
    val posting = t("6 prefix build (regroup+sort+slice)")(
      ex.join(broadcast(freq), Seq("_s"), "left_outer")
        .groupBy("_fp")
        .agg(collect_list(struct(coalesce(col("_df"), lit(1L)).as("_df"),
          col("_s"))).as("_dfs"))
        .select(col("_fp"), size(col("_dfs")).as("_n"),
          explode(expr("transform(" +
            s"slice(array_sort(_dfs), 1, cast(size(_dfs) - floor(size(_dfs) * $threshold) + 1 as int)), " +
            "x -> x._s)")).as("_s")))
    val rawCand = t("7 posting join + length filter")(
      posting.select(col("_fp").as("_fpa"), col("_n").as("_na"), col("_s"))
        .join(posting.select(col("_fp").as("_fpb"), col("_n").as("_nb"), col("_s")), "_s")
        .filter(col("_na") >= col("_nb") * threshold - 1e-9 &&
          col("_nb") >= col("_na") * threshold - 1e-9)
        .select(least(col("_fpa"), col("_fpb")).as("_fpa"),
          greatest(col("_fpa"), col("_fpb")).as("_fpb"))
        .filter(col("_fpa") =!= col("_fpb")))
    val cand = t("8 dropDuplicates")(rawCand.dropDuplicates("_fpa", "_fpb"))
    val verified = t("9 verify joins + intersect")(
      cand.join(reps.select(col("_fp").as("_fpa"), col("_set").as("_seta")), "_fpa")
        .join(reps.select(col("_fp").as("_fpb"), col("_set").as("_setb")), "_fpb")
        .withColumn("_i", graft.plans.VectorNative.sortedIntersectSize(col("_seta"), col("_setb")))
        .withColumn("jaccard",
          col("_i").cast("double") / (size(col("_seta")) + size(col("_setb")) - col("_i")))
        .filter(col("jaccard") >= threshold)
        .select("_fpa", "_fpb", "jaccard"))
    val members = tagged.select(col("_fp"), col("_id"))
    t("10 expand member pairs")(
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
