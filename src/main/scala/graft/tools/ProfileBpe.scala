package graft.tools

import org.apache.spark.sql.{SparkSession, functions => F}
import graft.operators.Bpe

/** BPE trainer k-scaling measurement: trains on a gendata corpus's
  * word-frequency table at the given k values, timing each trainer
  * mode — `recount` ([[Bpe.train]], full per-round recount),
  * `delta` ([[Bpe.trainDelta]]) and `batchedN` ([[Bpe.trainBatched]]
  * with batch = N) — and reporting wall seconds, merges completed,
  * and (for batched) how many driver rounds the batching saved. The
  * numbers land in BASELINE.md's k-scaling table: the recount-vs-delta
  * crossover and the batched driver-latency cut are the two claims
  * the large-k design makes.
  *
  * Usage: ProfileBpe <gendataDir> <k1,k2,...> <mode1,mode2,...>
  * e.g.   ProfileBpe /root/repo/gendata/g0.1 64,256,1024 delta,batched16
  */
object ProfileBpe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/gendata/g0.1")
    val ks = args.lift(1).getOrElse("64").split(",").map(_.trim.toInt).toSeq
    val modes = args.lift(2).getOrElse("delta").split(",").map(_.trim).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val words = Bpe.wordFreq(docs, F.col("text")).localCheckpoint(true)
    val nWords = words.count()
    println(s"[bpe] corpus=$dir distinct_words=$nWords")

    for (k <- ks; mode <- modes) {
      val t0 = System.nanoTime()
      val table = mode match {
        case "recount" => Bpe.train(words, "word", "freq", k)
        case "delta" => Bpe.trainDelta(words, "word", "freq", k)
        case "local" => Bpe.trainLocal(words, "word", "freq", k)
        case m if m.startsWith("batched") =>
          Bpe.trainBatched(words, "word", "freq", k, m.drop(7).toInt)
        case other => sys.error(s"unknown mode $other")
      }
      val rows = table.collect()
      val wall = (System.nanoTime() - t0) / 1e9
      val merges = rows.length
      println(f"[bpe] mode=$mode%-10s k=$k%6d merges=$merges%6d wall=${wall}%8.1f s" +
        f"  (${wall / math.max(1, merges)}%6.4f s/merge)")
    }
    spark.stop()
  }
}
