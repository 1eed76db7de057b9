package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Dedup

/** Dev tool: stage-by-stage timing of the MinHash dedup pipeline, to
  * attribute cost between collapse, banding, verification and
  * expansion. Usage: runMain graft.ProfileDedup <sfDir>
  */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local(32)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val df = Tables.documents(spark, sfDir)
    time("warmup")(df.count())
    if (args.contains("--bench-history")) {
      // replay the queries Bench runs before the dedup ops, to expose
      // session-state effects on their timings
      SparkEntry.queries.toSeq.sortBy(_._1).takeWhile(_._1 != "q_dedup_minhash")
        .foreach { case (n, fn) =>
          time(s"history $n")(fn(spark, sfDir).count())
        }
    }
    if (args.contains("--repeat-ngram")) {
      val stages = scala.collection.mutable.ArrayBuffer[(Int, Int, Long, String)]()
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val wall = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
          stages += ((si.stageId, si.numTasks, wall, si.name.take(60)))
        }
      })
      (1 to 3).foreach { i =>
        stages.clear()
        time(s"ngram run $i")(
          println("  npairs=" + Dedup.ngramJaccardPairs(df, "doc_id", "text").count()))
        stages.sortBy(-_._3).take(5).foreach { case (id, n, ms, nm) =>
          println(f"    stage $id%4d tasks=$n%3d wall=${ms / 1000.0}%7.2fs $nm")
        }
        spark.catalog.clearCache()
      }
      spark.stop(); return
    }
    // fresh-session timings FIRST: later staged counts leave reusable
    // shuffle files that make re-timings of the full operators misleading
    time("FRESH minhash operator")(
      println("  pairs=" + Dedup.minHashPairs(df, "doc_id", "text").count()))
    time("FRESH ngram operator")(
      println("  npairs=" + Dedup.ngramJaccardPairs(df, "doc_id", "text").count()))
    val docs = df.select(col("doc_id").as("_id"), Dedup.tokenHashSet(col("text")).as("_set"))
    val tagged = docs.withColumn("_fp", xxhash64(col("_set"))) // _set arrives sorted
    time("collapse (reps count)")(
      println("  reps=" + tagged.select("_fp").distinct().count()))
    val reps = tagged.groupBy("_fp")
      .agg(min(col("_id")).as("_rid"), first(col("_set")).as("_set"))
    val sigs = reps.withColumn("_sig",
      graft.plans.TextHashNative.minHashSig(col("_set"), 64))
    time("signatures")(sigs.select(sum(element_at(col("_sig"), 1))).count())
    val banded = sigs.select(col("_fp"),
      posexplode(transform(sequence(lit(0), lit(15)),
        g => xxhash64(concat_ws(",", slice(col("_sig"), g * 4 + 1, lit(4)))))))
      .withColumnRenamed("pos", "_band").withColumnRenamed("col", "_bandhash")
    val cand = banded.select(col("_fp").as("_fpa"), col("_band"), col("_bandhash"))
      .join(banded.select(col("_fp").as("_fpb"), col("_band"), col("_bandhash")),
        Seq("_band", "_bandhash"))
      .filter(col("_fpa") < col("_fpb")).select("_fpa", "_fpb")
    time("band join (raw rows)")(println("  raw=" + cand.count()))
    val candD = cand.dropDuplicates("_fpa", "_fpb")
    time("candidates (distinct)")(println("  cand=" + candD.count()))
    val verified = candD
      .join(reps.select(col("_fp").as("_fpa"), col("_set").as("_seta")), "_fpa")
      .join(reps.select(col("_fp").as("_fpb"), col("_set").as("_setb")), "_fpb")
      .withColumn("_i", graft.plans.VectorNative.sortedIntersectSize(
        array_sort(col("_seta")), array_sort(col("_setb"))))
      .withColumn("jaccard",
        col("_i").cast("double") / (size(col("_seta")) + size(col("_setb")) - col("_i")))
      .filter(col("jaccard") >= 0.9)
    time("verify")(println("  verified=" + verified.count()))
    time("full operator")(
      println("  pairs=" + Dedup.minHashPairs(df, "doc_id", "text").count()))

    // ---- ngram stages (mirrors the SHIPPED round-2 pipeline: broadcast
    // df≥2 attach → one regroup → in-row array_sort/slice prefixes →
    // length-filtered candidate join; prefix k = n − floor(θ·n) + 1,
    // θ = 0.8) ----
    val ndocs = df.select(col("doc_id").as("_id"),
      Dedup.shingleHashSet(col("text"), 3).as("_set"))
      .filter(size(col("_set")) > 0)
    val ntagged = ndocs.withColumn("_fp", xxhash64(col("_set"))) // sorted already
    time("ngram collapse")(
      println("  nreps=" + ntagged.select("_fp").distinct().count()))
    val nreps = ntagged.groupBy("_fp")
      .agg(min(col("_id")).as("_rid"), first(col("_set")).as("_set"))
    val ex = nreps.select(col("_fp"), explode(col("_set")).as("_s"))
    val freq = ex.groupBy("_s").agg(count(lit(1)).as("_df"))
      .filter(col("_df") >= 2)
    time("ngram repeated-df vocab")(println("  vocab=" + freq.count()))
    val posting = ex.join(broadcast(freq), Seq("_s"), "left_outer")
      .groupBy("_fp")
      .agg(collect_list(struct(coalesce(col("_df"), lit(1L)).as("_df"),
        col("_s"))).as("_dfs"))
      .select(col("_fp"), size(col("_dfs")).as("_n"),
        explode(expr("transform(" +
          "slice(array_sort(_dfs), 1, cast(size(_dfs) - floor(size(_dfs) * 0.8) + 1 as int)), " +
          "x -> x._s)")).as("_s"))
    time("ngram postings")(println("  postings=" + posting.count()))
    val ncand = posting.select(col("_fp").as("_fpa"), col("_n").as("_na"), col("_s"))
      .join(posting.select(col("_fp").as("_fpb"), col("_n").as("_nb"), col("_s")), "_s")
      .filter(col("_fpa") < col("_fpb") &&
        col("_na") >= col("_nb") * 0.8 - 1e-9 && col("_nb") >= col("_na") * 0.8 - 1e-9)
      .select("_fpa", "_fpb")
    time("ngram cand raw")(println("  nraw=" + ncand.count()))
    time("ngram cand distinct")(println("  ncand=" + ncand.dropDuplicates("_fpa", "_fpb").count()))
    time("ngram full operator")(
      println("  npairs=" + Dedup.ngramJaccardPairs(df, "doc_id", "text").count()))
    spark.stop()
  }
}
