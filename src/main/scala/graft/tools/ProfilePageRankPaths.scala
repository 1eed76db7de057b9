package graft.tools

import org.apache.spark.sql.functions._

/** A/B profiler for [[graft.operators.PageRank]]'s two per-round join
  * regimes — the broadcast fast path vs the co-partitioned shuffle-hash
  * escape hatch (round-10 verdict item 4: the hatch must exist AND its
  * crossover cost be documented, not guessed). Builds the exact
  * q_graph_pagerank customer↔supplier graph from the given data dir,
  * runs 10 rounds through each path, asserts the rank tables are
  * bit-identical, and reports per-path CPU/shuffle via the ProfileQuery
  * listener.
  *
  * Usage: runMain graft.tools.ProfilePageRankPaths <dataDir> [reps]
  */
object ProfilePageRankPaths {
  def main(args: Array[String]): Unit = {
    val dataDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.local(cpus.toInt)
    import graft.operators.PageRank

    def edges = {
      val pairs = graft.core.Tables.orders(spark, dataDir)
        .filter(col("o_orderkey") % 4 === 0)
        .select(col("o_orderkey"), col("o_custkey"))
        .join(graft.core.Tables.lineitem(spark, dataDir)
          .select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey").cast("long") * 2).as("c"),
          (col("l_suppkey").cast("long") * 2 + 1).as("sup"))
      pairs.select(col("c").as("src"), col("sup").as("dst"))
        .union(pairs.select(col("sup").as("src"), col("c").as("dst")))
    }

    val tally = new ProfileQuery.Tally
    spark.sparkContext.addSparkListener(tally)

    def drain(): Unit =
      org.apache.spark.GraftSparkAccess.drainListenerBus(spark.sparkContext)
    def timed(label: String, limit: Long): Long = {
      graft.core.CacheGovernor.reset(spark)
      drain()
      val (c0, s0) = (tally.cpuNs.get, tally.shufWrite.get)
      val t0 = System.nanoTime()
      val h = PageRank.ranks(edges, "src", "dst", iterations = 10,
        broadcastNodeLimit = limit)
        .select(hash(col("node"), col("rank").cast("string")).as("h"))
        .agg(sum(col("h").cast("long"))).head().getLong(0)
      drain()
      println(f"[prpaths] $label%-10s wall ${(System.nanoTime() - t0) / 1e9}%7.2f s" +
        f"  cpu ${(tally.cpuNs.get - c0) / 1e9}%7.2f s" +
        f"  shufW ${(tally.shufWrite.get - s0) / 1024.0 / 1024.0}%8.1f MiB" +
        f"  rankhash $h%d")
      h
    }

    (1 to reps).foreach { r =>
      println(s"[prpaths] rep $r")
      val hb = timed("broadcast", Long.MaxValue)
      val hs = timed("shuffled", 0L)
      require(hb == hs, s"paths diverged: broadcast=$hb shuffled=$hs")
    }
    println("[prpaths] paths bit-identical across all reps")
    spark.stop()
  }
}
