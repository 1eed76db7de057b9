package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.BloomSketch

class BloomSketchSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def keysDF(keys: Seq[String]) = keys.toDF("k")

  test("zero false negatives: every inserted key probes true") {
    val keys = (1 to 2000).map(i => s"key-$i")
    val bloom = BloomSketch.bloomFrom(keysDF(keys), col("k"), mBits = 16384, k = 5)
    val flagged = BloomSketch.prefilter(keysDF(keys), col("k"), bloom).count()
    assert(flagged === 2000L)
  }

  test("false-positive rate stays near the theoretical bound") {
    val members = (1 to 2000).map(i => s"key-$i")
    val bloom = BloomSketch.bloomFrom(keysDF(members), col("k"), mBits = 16384, k = 5)
    val probes = (1 to 10000).map(i => s"other-$i")
    val fp = BloomSketch.prefilter(keysDF(probes), col("k"), bloom).count()
    // theoretical fpr = (1 - e^(-kn/m))^k ≈ 0.0198 for n=2000, m=16384,
    // k=5 → E[fp] ≈ 198, σ ≈ 14; 300 is > 7σ of headroom
    assert(fp < 300, s"false positives $fp exceed the bound")
    assert(fp > 0, "suspiciously perfect — probe path likely broken")
  }

  test("merge is the bitwise OR: filter(A ∪ B) has exactly the union's bits") {
    val a = (1 to 500).map(i => s"a-$i")
    val b = (1 to 500).map(i => s"b-$i")
    val whole = BloomSketch.bloomFrom(keysDF(a ++ b), col("k"), mBits = 4096, k = 4)
    // partial aggregation across 8 partitions exercises merge()
    val merged = BloomSketch.bloomFrom(keysDF(a ++ b).repartition(8), col("k"), mBits = 4096, k = 4)
    assert(whole.select("words").head().getSeq[Long](0) ===
      merged.select("words").head().getSeq[Long](0))
    assert(merged.select("n").head().getLong(0) === 1000L)
  }

  test("column probe mirrors the JVM build hashes bit for bit") {
    // a 1-key filter has exactly k bits set; the column probe must find
    // all of them for that key
    val bloom = BloomSketch.bloomFrom(keysDF(Seq("solo")), col("k"), mBits = 1024, k = 7)
    val words = bloom.select("words").head().getSeq[Long](0)
    assert(words.map(java.lang.Long.bitCount).sum <= 7) // k probes, maybe colliding
    val hit = BloomSketch.prefilter(keysDF(Seq("solo")), col("k"), bloom).count()
    assert(hit === 1L)
  }

  test("prefilter keeps possible members and drops definite non-members") {
    val members = Seq("x", "y", "z")
    val bloom = BloomSketch.bloomFrom(keysDF(members), col("k"), mBits = 65536, k = 5)
    val batch = keysDF(Seq("x", "z", "unseen-1", "unseen-2", "unseen-3"))
    val kept = BloomSketch.prefilter(batch, col("k"), bloom)
      .select("k").collect().map(_.getString(0)).toSet
    assert(kept.contains("x") && kept.contains("z"))
    // at m=65536/n=3 the fp odds are ~1e-17 — no unseen key survives
    assert(kept.size === 2)
  }

  test("filters of different shapes refuse to merge") {
    val agg = new BloomSketch.BloomAgg(1024, 4)
    val other = BloomSketch.BF(new Array[Long](32), 2048L, 4, 0L)
    intercept[IllegalArgumentException] {
      agg.merge(agg.zero, other)
    }
  }
}
