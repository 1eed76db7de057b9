package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Packing

class PackingSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  /** Reference single-threaded next-fit fold over one shard's docs in
    * ascending id order. */
  private def refPack(docs: Seq[(Long, Long)], cap: Long): Map[Long, Int] = {
    var bin = 0; var sum = 0L
    val out = scala.collection.mutable.Map.empty[Long, Int]
    docs.sortBy(_._1).foreach { case (id, t) =>
      // a new bin opens only when the current one is non-empty, so bin
      // ids stay dense even when a shard's FIRST doc is oversized
      if (sum > 0 && sum + t > cap) { bin += 1; sum = t } else sum += t
      out(id) = bin
    }
    out.toMap
  }

  private def pack(docs: Seq[(Long, Long)], cap: Long, shards: Int) =
    Packing.packBins(docs.toDF("doc_id", "toks"),
      col("doc_id"), col("toks"), cap, shards)

  test("single shard equals the reference fold, including the oversize-doc path") {
    val docs = Seq[(Long, Long)](
      (1L, 40L), (2L, 50L), (3L, 20L),   // 40+50 fits 100; +20 overflows
      (4L, 250L),                        // oversize: its own bin
      (5L, 10L), (6L, 95L), (7L, 5L))
    val got = pack(docs, cap = 100L, shards = 1)
      .select("doc_id", "bin").as[(Long, Int)].collect().toMap
    assert(got === refPack(docs, 100L))
    // the oversize doc is alone in its bin
    val stats = Packing.packStats(pack(docs, 100L, 1), 100L).collect()
    val over = stats.filter(_.getAs[Long]("bin_tokens") > 100L)
    assert(over.forall(_.getAs[Long]("n_docs") === 1L))
    assert(stats.forall(_.getAs[Boolean]("within_cap")))
  }

  test("every doc lands exactly once; hard cap holds on every multi-doc bin") {
    val rnd = new scala.util.Random(11)
    val docs = (1L to 3000L).map(i => (i, 1L + rnd.nextInt(300).toLong))
    val packed = pack(docs, cap = 512L, shards = 8)
    assert(packed.count() === 3000L)
    assert(packed.select("doc_id").distinct().count() === 3000L)
    val stats = Packing.packStats(packed, 512L)
    assert(stats.filter(!col("within_cap")).count() === 0L)
    // and the packing is tight enough to be a packing at all
    val fill = stats.agg(avg("fill_ratio")).as[Double].head()
    assert(fill > 0.5, s"next-fit should fill > half the window, got $fill")
  }

  test("assignment is partition-insensitive and matches the per-shard reference") {
    val rnd = new scala.util.Random(7)
    val docs = (1L to 800L).map(i => (i, 1L + rnd.nextInt(120).toLong))
    def run(parts: Int) =
      Packing.packBins(docs.toDF("doc_id", "toks").repartition(parts),
        col("doc_id"), col("toks"), 256L, 4)
        .select("doc_id", "shard", "bin").as[(Long, Long, Int)].collect().toSet
    val got = run(1)
    assert(got === run(9))
    // per-shard reference parity
    val byShard = got.groupBy(_._2)
    val toks = docs.toMap
    byShard.foreach { case (_, rows) =>
      val ref = refPack(rows.toSeq.map(r => (r._1, toks(r._1))), 256L)
      rows.foreach { case (id, _, bin) => assert(bin === ref(id), s"doc $id") }
    }
  }

  test("an oversized FIRST doc keeps bin ids dense at 0") {
    val docs = Seq[(Long, Long)]((1L, 999L), (2L, 10L), (3L, 10L))
    val got = pack(docs, cap = 100L, shards = 1)
      .select("doc_id", "bin").as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 1))
  }

  test("auto-derived shard count bounds the per-shard fold payload") {
    // shardsFor scales with the corpus (never a fixed fan-in) ...
    assert(Packing.shardsFor(100L) === 8)               // small stays parallel
    assert(Packing.shardsFor(1000000L) === 16)          // 1M docs / 64k target
    assert(Packing.shardsFor(100000000000L) === 1525879) // 10¹¹ docs: ~1.5M shards
    // ... and the auto path (nShards omitted) keeps every doc exactly
    // once with the max per-shard doc list bounded near the target —
    // the task-local guarantee the collect_list fold rests on
    val docs = (1L to 5000L).map(i => (i, 7L))
    val packed = Packing.packBins(docs.toDF("doc_id", "toks"),
      col("doc_id"), col("toks"), capacity = 64L,
      nShards = Packing.shardsFor(5000L, targetDocsPerShard = 256L))
    assert(packed.count() === 5000L)
    assert(packed.select("doc_id").distinct().count() === 5000L)
    val maxShard = packed.groupBy("shard").count()
      .agg(max("count")).as[Long].head()
    // md5 sharding is balanced: no shard should hold > 2x the target
    assert(maxShard <= 512L, s"shard payload unbounded: $maxShard docs")
  }

  test("a different seed re-shards; bins stay dense and 0-based per shard") {
    val docs = (1L to 500L).map(i => (i, 10L))
    val a = pack(docs, 100L, 4).select("doc_id", "shard").as[(Long, Long)].collect().toMap
    val b = Packing.packBins(docs.toDF("doc_id", "toks"),
      col("doc_id"), col("toks"), 100L, 4, seed = 9L)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    assert(a.count { case (id, s) => b(id) != s } > 100, "seed must re-shard")
    val bins = pack(docs, 100L, 4).groupBy("shard")
      .agg(min("bin").as("mn"), max("bin").as("mx"), countDistinct("bin").as("nd"))
      .collect()
    bins.foreach { r =>
      assert(r.getAs[Int]("mn") === 0)
      assert(r.getAs[Long]("nd") === r.getAs[Int]("mx") + 1L, "bins must be dense")
    }
  }
}
