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
    val docs = df.select(col("doc_id").as("_id"), Dedup.tokenHashSet(col("text")).as("_set"))
    val tagged = docs.withColumn("_fp", xxhash64(array_sort(col("_set"))))
    time("collapse (reps count)")(
      println("  reps=" + tagged.select("_fp").distinct().count()))
    val reps = tagged.groupBy("_fp")
      .agg(min(col("_id")).as("_rid"), first(col("_set")).as("_set"))
    val sigs = reps.withColumn("_sig", Dedup.minHashHashedSignature(col("_set"), 64))
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
      .withColumn("jaccard",
        size(array_intersect(col("_seta"), col("_setb"))).cast("double") /
          size(array_union(col("_seta"), col("_setb"))))
      .filter(col("jaccard") >= 0.9)
    time("verify")(println("  verified=" + verified.count()))
    time("full operator")(
      println("  pairs=" + Dedup.minHashPairs(df, "doc_id", "text").count()))
    spark.stop()
  }
}
