package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{AudioDedup, ImageDedup, Multimodal}

class AudioDedupSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  test("energy hash recovers the planted pattern at any rate and gain") {
    (0L until 20L).foreach { g =>
      val bits = ImageDedup.patternBits(g)
      val exp = ImageDedup.expectedAHash(bits)
      Seq((8000, 8000), (16000, 8000), (44100, 4000), (8000, 2000),
        (22050, 12000)).foreach { case (rate, amp) =>
        val h = AudioDedup.audioHash64(AudioDedup.renderClip(bits, rate, amp))
        assert(h === Some(exp), s"g=$g rate=$rate amp=$amp")
      }
      // frame count not a multiple of 64 windows still recovers
      val odd = AudioDedup.audioHash64(
        AudioDedup.renderClip(bits, 8000, 8000, fpw = 13))
      assert(odd === Some(exp), s"g=$g fpw=13")
    }
  }

  test("different patterns land far apart") {
    val hs = (0L until 10L).map(g => AudioDedup
      .audioHash64(AudioDedup.renderClip(ImageDedup.patternBits(g), 8000, 8000)).get)
    for (i <- hs.indices; j <- i + 1 until hs.size)
      assert(java.lang.Long.bitCount(hs(i) ^ hs(j)) > 3, s"$i/$j")
  }

  test("non-PCM, malformed and empty payloads do not hash") {
    assert(AudioDedup.audioHash64(Array[Byte](1, 2, 3)) === None)
    // header-only WAV (zero frames)
    val empty = Multimodal.AudioHeaders.syntheticWav(1, 8000, 16, 0L)
    assert(AudioDedup.audioHash64(empty) === None)
    val media = Seq(
      Multimodal.MediaRecord(1L, "audio/wav",
        AudioDedup.renderClip(ImageDedup.patternBits(3L), 8000, 8000), 0, 0),
      Multimodal.MediaRecord(2L, "application/bin", Array[Byte](9, 9), 0, 0))
      .toDS()
    val out = AudioDedup.hashAudio(media).collect().sortBy(_.media_id)
    assert(out(0).decoded && !out(1).decoded)
  }

  test("hash index machinery is modality-generic: build/append/score audio") {
    val dir = java.nio.file.Files.createTempDirectory("audioidx").toString
    val hashes = (0L until 12L).map { id =>
      val bits = ImageDedup.patternBits(id / 4)
      val h = AudioDedup.audioHash64(AudioDedup.renderClip(bits, 8000, 8000)).get
      (id, h)
    }.toDF("media_id", "ahash")
    val stored = hashes.filter($"media_id" % 3 =!= 2)
    val batch = hashes.filter($"media_id" % 3 === 2)
    ImageDedup.writeHashIndex(stored.filter($"media_id" % 3 === 0), "media_id", "ahash", dir)
    ImageDedup.appendToHashIndex(spark, dir, stored.filter($"media_id" % 3 === 1), "media_id", "ahash")
    ImageDedup.appendToHashIndex(spark, dir, stored.filter($"media_id" % 3 === 1), "media_id", "ahash")
    assert(graft.operators.HashIndex.storedHashes(spark, dir).count() === 8) // redelivery no-op
    val pairs = ImageDedup.nearDupAgainstIndex(spark, dir, batch, "media_id", "ahash")
      .select("new_id", "stored_id").as[(Long, Long)].collect().toSet
    val exp = (for {
      n <- 0L until 12L if n % 3 == 2
      s <- 0L until 12L if s % 3 != 2 && s / 4 == n / 4
    } yield (n, s)).toSet
    assert(pairs === exp)
  }

  test("crafted RIFF chunk sizes terminate instead of looping") {
    // sz = 0xFFFFFFF8 → Int advance 0; sz = 0xFFFFFFF7 → 0 via pad byte.
    Seq(0xFFFFFFF8L, 0xFFFFFFF7L, 0xFFFFFFFFL).foreach { sz =>
      val b = java.nio.ByteBuffer.allocate(64)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(56)
        .put("WAVE".getBytes("US-ASCII"))
      b.put("junk".getBytes("US-ASCII")).putInt(sz.toInt)
      val res = AudioDedup.audioHash64(b.array())
      assert(res === None, f"sz=0x$sz%x must reject, not hang")
    }
  }

  test("end-to-end: clip variants pair by group through the banded join") {
    val media = (0L until 16L).map { id =>
      val bits = ImageDedup.patternBits(id / 4)
      val payload = (id % 4).toInt match {
        case 0 => AudioDedup.renderClip(bits, 8000, 8000)
        case 1 => AudioDedup.renderClip(bits, 16000, 8000)
        case 2 => AudioDedup.renderClip(bits, 44100, 4000)
        case _ => AudioDedup.renderClip(bits, 8000, 2000)
      }
      Multimodal.MediaRecord(id, "audio/wav", payload, 0, 0)
    }.toDS()
    val hashes = AudioDedup.hashAudio(media).filter(_.decoded).toDF()
    val pairs = ImageDedup.nearDupPairs(hashes, "media_id", "ahash")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val exp = (for {
      a <- 0L until 16L
      b <- a + 1 until 16L
      if a / 4 == b / 4
    } yield (a, b)).toSet
    assert(pairs === exp)
  }
}
