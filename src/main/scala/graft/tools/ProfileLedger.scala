package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Read-path cost of the streaming `_batches` ledger relations after
  * MANY appended micro-batches — the question the append-at-write /
  * merge-at-read sketch family leaves open: each append adds one
  * directory of small files, so after ~100 nightly batches the
  * merge-at-read cost is file-listing + many-small-scan overhead, not
  * data volume. This tool measures it and the compaction floor:
  *
  *  1. minhash index: seed + N appends (StreamingOps.indexAppendBatch),
  *     then time the production read probe (Dedup.minHashPairsAgainst)
  *     on the fragmented index, compact (Dedup.compactMinHashRelation),
  *     and re-time on the compacted copy;
  *  2. Count-Min: N appended counter batches, time readCountMin-merge +
  *     estimate, compact (StreamingOps.compactCountMin), re-time, and
  *     assert merged counters are IDENTICAL pre/post compaction;
  *  3. histogram: same shape via readHistogram / compactHistogram.
  *
  * Usage: runMain graft.tools.ProfileLedger [sfDir] [nBatches] [reps]
  * Numbers land in BASELINE.md (round-10 ledger table).
  */
object ProfileLedger {
  private def fileCount(dir: String): Long = {
    val root = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(root)) 0L
    else {
      val s = java.nio.file.Files.walk(root)
      try s.filter(p => p.toString.endsWith(".parquet")).count()
      finally s.close()
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(100)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val root = java.nio.file.Files.createTempDirectory("graft-ledger").toString

    def timed(label: String, files: Long)(body: => Long): Unit =
      (1 to reps).foreach { rep =>
        val tally = new ProfileQuery.Tally
        spark.sparkContext.addSparkListener(tally)
        val t0 = System.nanoTime()
        val n = body
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(1000)
        spark.sparkContext.removeSparkListener(tally)
        println(f"[ledger] rep$rep $label%-34s wall $wall%7.2f s  cpu ${tally.cpuNs.get / 1e9}%7.2f s  files $files%5d  ($n rows)")
      }

    // ---- 1. minhash index ------------------------------------------
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val mh = s"$root/minhash"
    def slice(b: Int) = docs.filter(pmod(col("doc_id"), lit(nBatches + 1)) === b)
    val tw0 = System.nanoTime()
    graft.operators.Dedup.writeMinHashRelation(slice(0), "doc_id", "text", mh)
    val append = graft.streaming.StreamingOps.indexAppendBatch(mh, "doc_id", "text")
    (1 to nBatches).foreach(b => append(slice(b), b.toLong))
    println(f"[ledger] minhash seed+$nBatches%d appends took ${(System.nanoTime() - tw0) / 1e9}%.1f s wall")
    val probe = docs.limit(50)
    val mhFiles = Seq("reps", "members", "verified").map(s => fileCount(s"$mh/$s")).sum
    timed(s"minhash probe, $nBatches-batch appended", mhFiles) {
      graft.operators.Dedup.minHashPairsAgainst(
        spark, mh, probe, "doc_id", "text").count()
    }
    val mhC = s"$root/minhash_v2"
    val tc0 = System.nanoTime()
    graft.operators.Dedup.compactMinHashRelation(spark, mh, mhC)
    println(f"[ledger] minhash compaction took ${(System.nanoTime() - tc0) / 1e9}%.1f s wall")
    val mhCFiles = Seq("reps", "members", "verified").map(s => fileCount(s"$mhC/$s")).sum
    timed("minhash probe, compacted", mhCFiles) {
      graft.operators.Dedup.minHashPairsAgainst(
        spark, mhC, probe, "doc_id", "text").count()
    }

    // ---- 2. Count-Min ----------------------------------------------
    import graft.streaming.StreamingOps
    val events = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id"), col("event_type"))
    val cm = s"$root/cms"
    val cmAppend = StreamingOps.countMinAppendBatch(cm, "event_type", 4, 256)
    (0 until nBatches).foreach { b =>
      cmAppend(events.filter(pmod(col("event_id"), lit(nBatches)) === b), b.toLong)
    }
    val probes = events.select("event_type").distinct()
    timed(s"cms estimate, $nBatches-batch appended", fileCount(s"$cm/counters")) {
      graft.operators.CountMin.estimate(
        StreamingOps.readCountMin(spark, cm), probes, col("event_type"), 4, 256).count()
    }
    val cmC = s"$root/cms_v2"
    StreamingOps.compactCountMin(spark, cm, cmC)
    timed("cms estimate, compacted", fileCount(s"$cmC/counters")) {
      graft.operators.CountMin.estimate(
        StreamingOps.readCountMin(spark, cmC), probes, col("event_type"), 4, 256).count()
    }
    // compaction must preserve the merged sketch exactly
    val pre = StreamingOps.readCountMin(spark, cm)
      .orderBy("depth", "bucket").collect().toSeq
    val post = StreamingOps.readCountMin(spark, cmC)
      .orderBy("depth", "bucket").collect().toSeq
    require(pre == post, "compacted CMS diverged from the appended relation")
    println(s"[ledger] cms compaction preserves the merged sketch (${pre.size} counters)")

    // ---- 3. histogram ----------------------------------------------
    val hg = s"$root/hist"
    val hgAppend = StreamingOps.histogramAppendBatch(hg, "value", 0.0, 1000.0, 64)
    val evVals = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id"), col("value"))
    (0 until nBatches).foreach { b =>
      hgAppend(evVals.filter(pmod(col("event_id"), lit(nBatches)) === b), b.toLong)
    }
    timed(s"hist quantiles, $nBatches-batch appended", fileCount(s"$hg/bins")) {
      graft.operators.HistogramSketch.quantiles(
        StreamingOps.readHistogram(spark, hg), Seq(0.5, 0.95), 0.0, 1000.0, 64).count()
    }
    val hgC = s"$root/hist_v2"
    StreamingOps.compactHistogram(spark, hg, hgC)
    timed("hist quantiles, compacted", fileCount(s"$hgC/bins")) {
      graft.operators.HistogramSketch.quantiles(
        StreamingOps.readHistogram(spark, hgC), Seq(0.5, 0.95), 0.0, 1000.0, 64).count()
    }

    import scala.reflect.io.Directory
    new Directory(new java.io.File(root)).deleteRecursively()
    spark.stop()
  }
}
