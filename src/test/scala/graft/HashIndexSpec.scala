package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.HashIndex

/** Laws of the modality-generic incremental perceptual-hash ledger —
  * spec'd ONCE here and inherited by the image/audio/video callers
  * (N101/N103/N104): seed, O(batch) idempotent delta append,
  * bipartite-only scoring ≡ brute force, banding exactness, and the
  * decoded-flag guard. Hashes here are synthetic 64-bit patterns — the
  * ledger never interprets them, which is the point. */
class HashIndexSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)

  // stored corpus: 8 hashes, two of them equal (ids 3 and 4)
  private lazy val stored = Seq(
    (0L, 0x0000000000000000L), (1L, 0xFFFFFFFFFFFFFFFFL),
    (2L, 0x0F0F0F0F0F0F0F0FL), (3L, 0x1234567812345678L),
    (4L, 0x1234567812345678L), (5L, 0xA5A5A5A5A5A5A5A5L),
    (6L, 0x0000000000000007L), (7L, 0x8000000000000001L)
  ).toDF("media_id", "phash")

  // batch: near-copies at hamming 1-3 of stored rows, one exact copy,
  // one far hash
  private lazy val batch = Seq(
    (100L, 0x0000000000000001L), // hamming 1 of id 0, 2 of id 6
    (101L, 0x1234567812345679L), // hamming 1 of ids 3 AND 4
    (102L, 0x1234567812345678L), // exact copy of ids 3/4 (hamming 0)
    (103L, 0x5A5A5A5A5A5A5A5AL)  // far from everything
  ).toDF("media_id", "phash")

  test("seed + idempotent append: a redelivered batch appends nothing") {
    val dir = java.nio.file.Files.createTempDirectory("hidx").toString
    HashIndex.writeHashIndex(stored, "media_id", "phash", dir)
    assert(HashIndex.storedHashes(spark, dir).count() == 8)
    HashIndex.appendToHashIndex(spark, dir, batch, "media_id", "phash")
    assert(HashIndex.storedHashes(spark, dir).count() == 12)
    HashIndex.appendToHashIndex(spark, dir, batch, "media_id", "phash")
    assert(HashIndex.storedHashes(spark, dir).count() == 12,
      "redelivered batch must be a no-op")
  }

  test("bipartite scoring ≡ brute force at maxHamming 3, including hamming-0 hits") {
    val dir = java.nio.file.Files.createTempDirectory("hidx2").toString
    HashIndex.writeHashIndex(stored, "media_id", "phash", dir)
    val got = HashIndex.nearDupAgainstIndex(spark, dir, batch, "media_id", "phash")
      .select("new_id", "stored_id", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    val s = stored.as[(Long, Long)].collect()
    val b = batch.as[(Long, Long)].collect()
    val brute = (for {
      (nid, nh) <- b; (sid, sh) <- s
      h = hamming(nh, sh) if h <= 3
    } yield (nid, sid, h.toLong)).toSet
    assert(got == brute)
    assert(got.contains((102L, 3L, 0L)) && got.contains((102L, 4L, 0L)),
      "an exact batch copy pairs at hamming 0 with EVERY stored id of that hash")
    assert(!got.exists(_._1 == 103L), "the far hash pairs with nothing")
  }

  test("decoded=false rows never enter the ledger or the scoring") {
    val dir = java.nio.file.Files.createTempDirectory("hidx3").toString
    val flagged = stored.withColumn("decoded", col("media_id") =!= 5L)
    HashIndex.writeHashIndex(flagged, "media_id", "phash", dir)
    assert(HashIndex.storedHashes(spark, dir).count() == 7)
    val probe = Seq((200L, 0xA5A5A5A5A5A5A5A4L)).toDF("media_id", "phash")
    assert(HashIndex.nearDupAgainstIndex(spark, dir, probe, "media_id", "phash")
      .count() == 0, "the undecoded row's hash must not be pairable")
  }

  test("compaction: verbatim copy, identical scoring, canonical-path guard") {
    val dir = java.nio.file.Files.createTempDirectory("hidx5").toString
    HashIndex.writeHashIndex(stored, "media_id", "phash", dir)
    HashIndex.appendToHashIndex(spark, dir, batch, "media_id", "phash")
    val dir2 = java.nio.file.Files.createTempDirectory("hidx5c").toString + "/v2"
    HashIndex.compactHashIndex(spark, dir, dir2)
    assert(HashIndex.storedHashes(spark, dir2).count()
      == HashIndex.storedHashes(spark, dir).count())
    val probe = Seq((300L, 0x1234567812345679L)).toDF("media_id", "phash")
    def score(p: String) = HashIndex.nearDupAgainstIndex(
      spark, p, probe, "media_id", "phash")
      .select("new_id", "stored_id", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    assert(score(dir2) == score(dir) && score(dir2).nonEmpty,
      "the compacted index must score identically")
    intercept[IllegalArgumentException] {
      HashIndex.compactHashIndex(spark, dir, dir + "/")
    }
  }

  test("redelivered id with a CHANGED hash appends nothing (per-id idempotence)") {
    val dir = java.nio.file.Files.createTempDirectory("hidx6").toString
    HashIndex.writeHashIndex(stored, "media_id", "phash", dir)
    // id 3 re-encoded: same media, different hash — the ledger must keep
    // its canonical stored row, not accumulate a duplicate media_id
    val reencoded = Seq((3L, 0xDEADBEEFCAFEF00DL)).toDF("media_id", "phash")
    HashIndex.appendToHashIndex(spark, dir, reencoded, "media_id", "phash")
    val rows = HashIndex.storedHashes(spark, dir)
      .as[(Long, Long)].collect().toSet
    assert(rows.count(_._1 == 3L) == 1, "duplicate media_id after re-encode")
    assert(rows.contains((3L, 0x1234567812345678L)),
      "the stored hash stays canonical")
  }

  test("manifest gate: a half-published index fails loudly; crashed appends invisible") {
    val dir = java.nio.file.Files.createTempDirectory("hidx7").toString
    HashIndex.writeHashIndex(stored, "media_id", "phash", dir)
    // a crashed append's staging dir is never visible to readers
    val staged = new java.io.File(s"$dir/.staging/append")
    staged.mkdirs()
    assert(HashIndex.storedHashes(spark, dir).count() == 8)
    intercept[IllegalStateException] {
      new java.io.File(s"$dir/_manifest").delete()
      HashIndex.storedHashes(spark, dir).count()
    }
  }

  test("maxHamming above the banding guarantee is rejected") {
    val dir = java.nio.file.Files.createTempDirectory("hidx4").toString
    HashIndex.writeHashIndex(stored, "media_id", "phash", dir)
    intercept[IllegalArgumentException] {
      HashIndex.nearDupAgainstIndex(spark, dir, batch, "media_id", "phash",
        maxHamming = 4)
    }
  }
}
