package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{ImageDedup, Multimodal, VideoDedup}

class VideoDedupSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  test("mux -> frameSpans round-trips every frame byte-exactly") {
    val frames = (0 until 5).map(j =>
      ImageDedup.renderPattern(ImageDedup.patternBits(j.toLong), 8, jpeg = false))
    val mp4 = VideoDedup.muxFramesMp4(frames, 64, 64)
    val spans = VideoDedup.frameSpans(mp4).get
    assert(spans.length === 5)
    spans.zip(frames).foreach { case ((s, e), f) =>
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(mp4, s, e), f))
    }
  }

  test("muxed files also parse through the metadata decode path") {
    val frames = Seq(ImageDedup.renderPattern(1L, 8, jpeg = false))
    val mp4 = VideoDedup.muxFramesMp4(frames, 64, 64)
    val meta = Multimodal.VideoHeaders.decode(mp4)
    assert(meta === Some((64, 64, 600L, 25L)))
  }

  test("frame-sampled hash is rate, resolution and compression invariant") {
    (0L until 12L).foreach { g =>
      val exp = VideoDedup.expectedVideoHash(g, scenes = 4)
      Seq((1, 8, false), (2, 10, false), (1, 8, true), (3, 5, false),
        (2, 8, true)).foreach { case (fps, scale, jpeg) =>
        val mp4 = VideoDedup.renderVideo(g, 4, fps, scale, jpeg)
        val got = VideoDedup.videoHash64(mp4)
        assert(got.map(_._2) === Some(exp), s"g=$g fps=$fps scale=$scale jpeg=$jpeg")
        assert(got.map(_._1) === Some(4 * fps))
      }
    }
  }

  test("different groups land far apart") {
    val hs = (0L until 10L).map(g =>
      VideoDedup.videoHash64(VideoDedup.renderVideo(g, 4, 1, 8, jpeg = false)).get._2)
    for (i <- hs.indices; j <- i + 1 until hs.size)
      assert(java.lang.Long.bitCount(hs(i) ^ hs(j)) > 3, s"$i/$j")
  }

  test("malformed and crafted containers reject instead of throwing or stalling") {
    assert(VideoDedup.videoHash64(Array[Byte](1, 2, 3)) === None)
    // metadata-only MP4 (no sample table at all)
    val metaOnly = Multimodal.VideoHeaders.syntheticMp4(64, 64, 600L, 600L)
    assert(VideoDedup.videoHash64(metaOnly) === None)
    val frames = Seq(ImageDedup.renderPattern(1L, 8, jpeg = false))
    val good = VideoDedup.muxFramesMp4(frames, 64, 64)
    // truncate mid-mdat: declared sizes overrun the payload
    assert(VideoDedup.videoHash64(good.take(good.length - 40)) === None)
    // corrupt the stsz sample count to a huge value
    val evil = good.clone()
    val zs = indexOfTag(evil, "stsz")
    evil(zs + 12) = 0x7f.toByte // sample_count high byte
    assert(VideoDedup.videoHash64(evil) === None)
    // non-image frame bytes: spans parse but the sampled decode fails
    val junkFrames = Seq(Array.fill[Byte](100)(0x42))
    val junk = VideoDedup.muxFramesMp4(junkFrames, 64, 64)
    assert(VideoDedup.videoHash64(junk) === None)
  }

  private def indexOfTag(p: Array[Byte], name: String): Int = {
    val t = name.getBytes("US-ASCII")
    (0 until p.length - 4).find(i =>
      p(i) == t(0) && p(i + 1) == t(1) && p(i + 2) == t(2) && p(i + 3) == t(3))
      .map(_ - 4).get
  }

  test("end-to-end: re-encoded variants pair by group through the banded join") {
    val media = (0L until 16L).map { id =>
      val g = id / 4
      val payload = (id % 4).toInt match {
        case 0 => VideoDedup.renderVideo(g, 4, 1, 8, jpeg = false)
        case 1 => VideoDedup.renderVideo(g, 4, 2, 10, jpeg = false)
        case 2 => VideoDedup.renderVideo(g, 4, 1, 8, jpeg = true)
        case _ => VideoDedup.renderVideo(g, 4, 3, 5, jpeg = false)
      }
      Multimodal.MediaRecord(id, "video/mp4", payload, 0, 0)
    }.toDS()
    val hashes = VideoDedup.hashVideos(media).toDF()
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
