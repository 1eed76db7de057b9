package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{ImageDedup, Multimodal}

class ImageDedupSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def decodeHash(payload: Array[Byte]): (Long, Long) = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    (ImageDedup.aHash64(ImageDedup.lumaGrid(img, 8, 8)),
      ImageDedup.dHash64(ImageDedup.lumaGrid(img, 9, 8)))
  }

  test("aHash recovers the planted pattern across PNG scales and JPEG") {
    (0L until 20L).foreach { g =>
      val bits = ImageDedup.patternBits(g)
      val exp = ImageDedup.expectedAHash(bits)
      // lossless renders at integer scales recover the bits EXACTLY
      Seq(5, 8, 12).foreach { s =>
        val (a, _) = decodeHash(ImageDedup.renderPattern(bits, s, jpeg = false))
        assert(a === exp, s"g=$g png scale=$s")
      }
      // JPEG recompression stays inside the near-dup Hamming budget
      val (aj, _) = decodeHash(ImageDedup.renderPattern(bits, 8, jpeg = true))
      assert(java.lang.Long.bitCount(aj ^ exp) <= 3, s"g=$g jpeg")
    }
  }

  test("dHash is rescale-stable within a pattern, far across patterns") {
    val hashes = (0L until 12L).map { g =>
      val bits = ImageDedup.patternBits(g)
      val (_, d8) = decodeHash(ImageDedup.renderPattern(bits, 8, jpeg = false))
      val (_, d12) = decodeHash(ImageDedup.renderPattern(bits, 12, jpeg = false))
      assert(java.lang.Long.bitCount(d8 ^ d12) <= 3, s"g=$g rescale")
      d8
    }
    for (i <- hashes.indices; j <- i + 1 until hashes.size)
      assert(java.lang.Long.bitCount(hashes(i) ^ hashes(j)) > 3,
        s"patterns $i/$j too close")
  }

  test("hashImages flags undecodable payloads instead of throwing") {
    val media = Seq(
      Multimodal.MediaRecord(1L, "image/png",
        ImageDedup.renderPattern(ImageDedup.patternBits(7L), 8, jpeg = false), 0, 0),
      Multimodal.MediaRecord(2L, "application/garbage",
        Array[Byte](1, 2, 3, 4), 0, 0)).toDS()
    val out = ImageDedup.hashImages(media).collect().sortBy(_.media_id)
    assert(out(0).decoded)
    assert(out(0).ahash === ImageDedup.expectedAHash(ImageDedup.patternBits(7L)))
    assert(!out(1).decoded && out(1).ahash === 0L && out(1).dhash === 0L)
  }

  test("nearDupPairs drops undecoded rows at the API, not by convention") {
    // three failed decodes all hash 0 — unfiltered they would form a
    // spurious hamming-0 clique; the API must drop them when the frame
    // carries the decoded flag
    val rows = Seq(
      (1L, true, 0x0123456789abcdefL), (2L, true, 0x0123456789abcdefL),
      (3L, false, 0L), (4L, false, 0L), (5L, false, 0L))
      .toDF("media_id", "decoded", "ahash")
    val pairs = ImageDedup.nearDupPairs(rows, "media_id", "ahash")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("nearDupPairs equals brute force (collapse + banding are lossless)") {
    val base = 0x0123456789abcdefL
    val far = 0x7edcba9876543210L
    val rows = Seq(
      (1L, base), (2L, base), (3L, base), // identical-hash cluster
      (4L, base ^ (1L << 5) ^ (1L << 40)), // 2 bits off, chunks 0+2
      (5L, far),
      (6L, far ^ (1L << 1) ^ (1L << 20) ^ (1L << 63)), // 3 bits, chunks 0,1,3
      (7L, base ^ 0xF0L)) // 4 bits off base — over the threshold
    val got = ImageDedup
      .nearDupPairs(rows.toDF("id", "h"), "id", "h", maxHamming = 3)
      .select("a_id", "b_id", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    val exp = (for {
      (a, ha) <- rows
      (b, hb) <- rows
      if a < b
      d = java.lang.Long.bitCount(ha ^ hb)
      if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(got === exp)
    // sanity on the fixture's intent
    assert(exp.contains((1L, 4L, 2L)) && exp.contains((5L, 6L, 3L)))
    assert(!exp.exists { case (a, b, _) => Set(a, b) == Set(1L, 7L) })
  }

  test("hash index: append is idempotent and bipartite pairs are exact") {
    import org.apache.spark.sql.functions.col
    val base = 0x0123456789abcdefL
    val far = 0x7edcba9876543210L
    val stored0 = Seq((1L, base), (2L, far)).toDF("id", "h")
    val stored1 = Seq((3L, base ^ 1L)).toDF("id", "h")
    val dir = java.nio.file.Files.createTempDirectory("imgidx").toString
    ImageDedup.writeHashIndex(stored0, "id", "h", dir)
    ImageDedup.appendToHashIndex(spark, dir, stored1, "id", "h")
    ImageDedup.appendToHashIndex(spark, dir, stored1, "id", "h") // redelivery
    assert(graft.operators.HashIndex.storedHashes(spark, dir).count() === 3L)
    // batch: 10 matches base exactly, 11 is 2 bits off base (pairs
    // with 1 at d=2 and 3 at d<=3), 12 is far+5bits (no pairs)
    val batch = Seq(
      (10L, base),
      (11L, base ^ (1L << 5) ^ (1L << 40)),
      (12L, far ^ 0x1fL)).toDF("id", "h")
    val got = ImageDedup
      .nearDupAgainstIndex(spark, dir, batch, "id", "h")
      .select("new_id", "stored_id", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    val storedAll = Seq((1L, base), (2L, far), (3L, base ^ 1L))
    val exp = (for {
      (n, nh) <- Seq((10L, base), (11L, base ^ (1L << 5) ^ (1L << 40)),
        (12L, far ^ 0x1fL))
      (sId, sh) <- storedAll
      d = java.lang.Long.bitCount(nh ^ sh)
      if d <= 3
    } yield (n, sId, d.toLong)).toSet
    assert(got === exp)
    assert(exp.contains((10L, 1L, 0L)) && !exp.exists(_._1 == 12L))
  }

  test("end-to-end: rendered variants pair by group, not across groups") {
    val media = (0L until 24L).map { id =>
      val bits = ImageDedup.patternBits(id / 4)
      val payload = (id % 4).toInt match {
        case 0 => ImageDedup.renderPattern(bits, 8, jpeg = false)
        case 1 => ImageDedup.renderPattern(bits, 12, jpeg = false)
        case 2 => ImageDedup.renderPattern(bits, 5, jpeg = false)
        case _ => ImageDedup.renderPattern(bits, 8, jpeg = true)
      }
      Multimodal.MediaRecord(id, "image", payload, 0, 0)
    }.toDS()
    val hashes = ImageDedup.hashImages(media).filter(_.decoded).toDF()
    val pairs = ImageDedup.nearDupPairs(hashes, "media_id", "ahash")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val exp = (for {
      a <- 0L until 24L
      b <- a + 1 until 24L
      if a / 4 == b / 4
    } yield (a, b)).toSet
    assert(pairs === exp)
  }
}
