package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  import TestSession.{spark, sfDir}

  lazy val media = Multimodal.mediaFromDocuments(spark, Tables.documents(spark, sfDir))

  test("chunks reassemble byte-exactly to the original payload") {
    import spark.implicits._
    val reassembled = Multimodal.sampleChunks(media, 256)
      .groupByKey(_.media_id)
      .mapGroups { (id, it) =>
        val bytes = it.toSeq.sortBy(_.chunk_idx).flatMap(_.chunk).toArray
        (id, new String(bytes, "UTF-8"))
      }.toDF("doc_id", "round_trip")
    val diff = Tables.documents(spark, sfDir)
      .join(reassembled, "doc_id")
      .filter(col("text") =!= col("round_trip"))
      .count()
    assert(diff === 0)
  }

  test("image header decode: PNG/JPEG/GIF round-trip and graceful unknowns") {
    import Multimodal.ImageHeaders
    // synthesized headers parse back to the dims they were built with
    assert(ImageHeaders.decode(ImageHeaders.syntheticPng(640, 480)) === ("png", 640, 480))
    assert(ImageHeaders.decode(ImageHeaders.syntheticPng(1, 1)) === ("png", 1, 1))
    assert(ImageHeaders.decode(ImageHeaders.syntheticJpeg(1920, 1080)) === ("jpeg", 1920, 1080))
    assert(ImageHeaders.decode(ImageHeaders.syntheticJpeg(65535, 1)) === ("jpeg", 65535, 1))
    // hand-built GIF89a logical screen descriptor: dims little-endian
    val gif = "GIF89a".getBytes("US-ASCII") ++
      Array(0x20, 0x01, 0xf0, 0x00, 0x00, 0x00, 0x00).map(_.toByte) // 288 x 240
    assert(ImageHeaders.decode(gif) === ("gif", 288, 240))
    // JPEG whose SOF sits behind fill bytes and restart markers
    val padded = Array(0xff, 0xd8, 0xff, 0xff, 0xd0).map(_.toByte) ++
      ImageHeaders.syntheticJpeg(30, 20).drop(2)
    assert(ImageHeaders.decode(padded) === ("jpeg", 30, 20))
    // garbage, truncation, and corrupt lengths fail safe, never loop
    assert(ImageHeaders.decode(null) === ("unknown", -1, -1))
    assert(ImageHeaders.decode(Array[Byte]()) === ("unknown", -1, -1))
    assert(ImageHeaders.decode("not an image at all".getBytes) === ("unknown", -1, -1))
    assert(ImageHeaders.decode(ImageHeaders.syntheticPng(9, 9).take(20)) === ("unknown", -1, -1))
    val corrupt = Array(0xff, 0xd8, 0xff, 0xe0, 0x00, 0x00).map(_.toByte) // len < 2
    assert(ImageHeaders.decode(corrupt) === ("unknown", -1, -1))
    // scan data reached before any SOF
    val scanFirst = Array(0xff, 0xd8, 0xff, 0xda, 0x00, 0x04, 0x00, 0x00).map(_.toByte)
    assert(ImageHeaders.decode(scanFirst) === ("unknown", -1, -1))
  }

  test("decodeDims distributes header parsing over the media Dataset") {
    import spark.implicits._
    import Multimodal.{ImageHeaders, MediaRecord}
    val mixed = Seq(
      MediaRecord(1L, "image/png", ImageHeaders.syntheticPng(320, 200), 0, 0),
      MediaRecord(2L, "image/jpeg", ImageHeaders.syntheticJpeg(64, 48), 0, 0),
      MediaRecord(3L, "text/plain", "just text".getBytes("UTF-8"), 0, 0)
    ).toDS()
    val out = Multimodal.decodeDims(mixed).collect().map(d => d.media_id -> d).toMap
    assert(out(1L).format === "png" && out(1L).width === 320 && out(1L).height === 200)
    assert(out(2L).format === "jpeg" && out(2L).width === 64 && out(2L).height === 48)
    assert(out(3L).format === "unknown" && out(3L).width === -1 && out(3L).height === -1)
  }

  test("ImageIoDecoder: real PNG/JPEG pixel round-trip, graceful non-images") {
    import spark.implicits._
    import Multimodal.MediaRecord
    // REAL images via the JDK encoder: a solid-color PNG (lossless —
    // mean luminance must be exact) and a solid-color JPEG (lossy —
    // near-exact), plus a non-image payload
    def encoded(fmt: String, w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val rgb = (10 << 16) | (20 << 8) | 30
    val wantLuma = 0.299 * 10 + 0.587 * 20 + 0.114 * 30
    val media = Seq(
      MediaRecord(1L, "image/png", encoded("png", 8, 5, rgb), 0, 0),
      MediaRecord(2L, "image/jpeg", encoded("jpg", 16, 4, rgb), 0, 0),
      MediaRecord(3L, "text/plain", "not an image".getBytes("UTF-8"), 0, 0)
    ).toDS()
    val out = Multimodal.decodeImages(media).collect().map(c => c.media_id -> c).toMap
    assert(out(1L).decoded && out(1L).width === 8 && out(1L).height === 5)
    assert(math.abs(out(1L).mean_luma - wantLuma) < 1e-6, s"png luma ${out(1L).mean_luma}")
    assert(out(2L).decoded && out(2L).width === 16 && out(2L).height === 4)
    assert(math.abs(out(2L).mean_luma - wantLuma) < 3.0, s"jpeg luma ${out(2L).mean_luma}")
    assert(!out(3L).decoded && out(3L).width === -1 && out(3L).mean_luma === -1.0)
  }

  test("wav round trip: synthesized containers parse back to their parameters") {
    import Multimodal.AudioHeaders
    val cases = Seq((1, 8000, 16, 100L), (2, 44100, 16, 44100L), (2, 16000, 8, 1L))
    cases.foreach { case (ch, rate, bits, frames) =>
      val got = AudioHeaders.decode(AudioHeaders.syntheticWav(ch, rate, bits, frames))
      assert(got === Some((ch, rate, bits, frames)), s"case $ch/$rate/$bits/$frames")
    }
  }

  test("wav chunk walk skips unknown chunks before fmt/data") {
    import Multimodal.AudioHeaders
    val base = AudioHeaders.syntheticWav(2, 16000, 16, 10L)
    // splice a 6-byte LIST chunk (odd→word-aligned to 6+pad? use even 6)
    val extra = java.nio.ByteBuffer.allocate(8 + 6)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("LIST".getBytes("US-ASCII")).putInt(6).put(Array.fill[Byte](6)(0x7f))
      .array()
    val spliced = base.take(12) ++ extra ++ base.drop(12)
    // RIFF size field is now stale — the walker must not rely on it
    assert(AudioHeaders.decode(spliced) === Some((2, 16000, 16, 10L)))
  }

  test("wav walker bails to unknown on corrupt chunk sizes, no hang") {
    import Multimodal.AudioHeaders
    val base = AudioHeaders.syntheticWav(2, 16000, 16, 10L)
    // corrupt the fmt chunk's size field (offset 16): an Int-truncating
    // walker nets a ZERO advance at 0xFFFFFFF8 (infinite executor loop)
    // or walks backwards/out-of-bounds at the others — the Long-size
    // guard must bail to the unknown path instead
    def withSz(sz: Long): Array[Byte] = {
      val p = base.clone()
      java.nio.ByteBuffer.wrap(p).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(16, sz.toInt)
      p
    }
    assert(AudioHeaders.decode(withSz(0xFFFFFFF8L)) === None) // net-zero advance
    assert(AudioHeaders.decode(withSz(0x80000000L)) === None) // rewind
    assert(AudioHeaders.decode(withSz(0x7FFFFFF0L)) === None) // far past payload
  }

  test("mp4 round trip: synthesized containers parse back to their parameters") {
    import Multimodal.VideoHeaders
    val cases = Seq((320, 240, 600L, 1200L), (1920, 1080, 90000L, 90000L * 7),
      (16, 16, 1000L, 1L))
    cases.foreach { case (w, h, ts, dur) =>
      val got = VideoHeaders.decode(VideoHeaders.syntheticMp4(w, h, ts, dur))
      assert(got === Some((w, h, ts, dur)), s"case $w×$h ts=$ts dur=$dur")
    }
  }

  test("mp4 box walk skips unknown boxes before moov and inside it") {
    import Multimodal.VideoHeaders
    val base = VideoHeaders.syntheticMp4(640, 360, 1000L, 5000L)
    // splice a free box between ftyp (8 hdr + 8 payload = 16 bytes) and moov
    val free = java.nio.ByteBuffer.allocate(16)
      .putInt(16).put("free".getBytes("US-ASCII")).put(Array.fill[Byte](8)(0x11))
      .array()
    val spliced = base.take(16) ++ free ++ base.drop(16)
    assert(VideoHeaders.decode(spliced) === Some((640, 360, 1000L, 5000L)))
  }

  test("mp4 dims come from the first VIDEO trak, skipping an audio-first trak") {
    import Multimodal.VideoHeaders
    // real MP4s often order an audio track (tkhd dims 0×0) before the
    // video track — dims must come from the first trak with nonzero dims
    val got = VideoHeaders.decode(
      VideoHeaders.syntheticMp4AudioFirst(1280, 720, 90000L, 180000L))
    assert(got === Some((1280, 720, 90000L, 180000L)))
  }

  test("non-mp4 payloads decode as unknown, not a crash") {
    import spark.implicits._
    val junk = Seq(
      Multimodal.MediaRecord(1L, "x", "no boxes here at all....".getBytes, 0, 0),
      Multimodal.MediaRecord(2L, "x", Array[Byte](0, 0, 0, 9), 0, 0),
      Multimodal.MediaRecord(3L, "x", Array.emptyByteArray, 0, 0)).toDS()
    val out = Multimodal.decodeVideo(junk).collect()
    assert(out.forall(v => v.format == "unknown" && v.width == -1))
  }

  test("non-wav payloads decode as unknown, not a crash") {
    import spark.implicits._
    val junk = Seq(
      Multimodal.MediaRecord(1L, "x", "not a riff at all".getBytes, 0, 0),
      Multimodal.MediaRecord(2L, "x", Array[Byte](82, 73), 0, 0), // truncated "RI"
      Multimodal.MediaRecord(3L, "x", Array.emptyByteArray, 0, 0)).toDS()
    val out = Multimodal.decodeAudio(junk).collect()
    assert(out.forall(a => a.format == "unknown" && a.channels == -1))
  }

  test("features agree with driver-side recomputation") {
    val feats = Multimodal.extractFeatures(media, new Multimodal.FakeDecoder(256))
      .collect().map(f => f.media_id -> f).toMap
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
    docs.foreach { r =>
      val id = r.getLong(0); val text = r.getString(1)
      val f = feats(id)
      assert(f.byte_len === text.getBytes("UTF-8").length.toLong)
      assert(f.first_byte === (text.getBytes("UTF-8")(0) & 0xff).toLong)
      assert(f.n_chunks === (f.byte_len + 255) / 256)
    }
  }

  test("warc round-trip: synthesized records parse back field-for-field") {
    import Multimodal.WarcHeaders
    val recs = Seq(
      ("response", "https://a.example/1", "hello world".getBytes("UTF-8")),
      ("request", "https://a.example/2", Array[Byte](0, 1, 2, '\r', '\n', 3)),
      ("metadata", "https://a.example/3", Array.emptyByteArray))
    val parsed = WarcHeaders.decode(WarcHeaders.syntheticWarc(recs))
    assert(parsed.map(r => (r._1, r._2, r._3)) ===
      recs.map(r => (r._1, r._2, r._3.length.toLong)))
    assert(parsed(1)._4.toSeq === recs(1)._3.toSeq) // binary payload intact
  }

  test("warc walker honors Content-Length over in-payload decoys") {
    import Multimodal.WarcHeaders
    // payload contains a full fake record header + blank line: a
    // scanner-based parser would split here; the length-based walker
    // must not
    val decoy = "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 0\r\n\r\n"
    val recs = Seq(
      ("response", "u1", s"x $decoy y".getBytes("UTF-8")),
      ("metadata", "u2", "tail".getBytes("UTF-8")))
    val parsed = WarcHeaders.decode(WarcHeaders.syntheticWarc(recs))
    assert(parsed.map(_._2) === Seq("u1", "u2"))
    assert(new String(parsed.head._4, "UTF-8") === s"x $decoy y")
  }

  test("warc malformed records stop the walk; garbage yields no records") {
    import Multimodal.WarcHeaders
    val good = WarcHeaders.syntheticWarc(
      Seq(("response", "u1", "ok".getBytes("UTF-8"))))
    // truncate the record separator: the record itself still parses,
    // nothing after it can
    val truncated = good.dropRight(2) ++ "WARC/1.0\r\n".getBytes("UTF-8")
    assert(WarcHeaders.decode(truncated).map(_._2) === Seq("u1"))
    assert(WarcHeaders.decode("not a warc at all".getBytes("UTF-8")) === Seq())
    assert(WarcHeaders.decode(Array.emptyByteArray) === Seq())
  }
}
