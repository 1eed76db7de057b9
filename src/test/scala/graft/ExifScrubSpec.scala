package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{ExifScrub, ImageDedup, Multimodal}

class ExifScrubSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private val bits = ImageDedup.patternBits(5L)
  private val png = ImageDedup.renderPattern(bits, 2, jpeg = false)
  private val jpg = ImageDedup.renderPattern(bits, 2, jpeg = true)

  test("scrub(plant(x)) restores the original bytes exactly — JPEG") {
    val app1 = ExifScrub.syntheticApp1(20)
    val com = ExifScrub.syntheticCom("shot on camera sn-1234")
    val planted = ExifScrub.plantJpegMeta(jpg, Seq(app1, com))
    val Some((clean, n, removed)) = ExifScrub.scrubJpegBytes(planted)
    assert(clean.sameElements(jpg))
    assert(n === 2L)
    assert(removed === app1.length.toLong + com.length)
    // nothing planted → byte-identity and zero counts (ImageIO emits
    // no droppable segments)
    val Some((same, n0, r0)) = ExifScrub.scrubJpegBytes(jpg)
    assert(same.sameElements(jpg) && n0 === 0L && r0 === 0L)
  }

  test("scrub(plant(x)) restores the original bytes exactly — PNG") {
    val chunks = Seq(
      ExifScrub.syntheticTextChunk("Author", "somebody"),
      ExifScrub.syntheticTextChunk("gps", "52.1,13.4"))
    val planted = ExifScrub.plantPngMeta(png, chunks)
    val Some((clean, n, removed)) = ExifScrub.scrubPngBytes(planted)
    assert(clean.sameElements(png))
    assert(n === 2L)
    assert(removed === chunks.map(_.length.toLong).sum)
    val Some((same, n0, _)) = ExifScrub.scrubPngBytes(png)
    assert(same.sameElements(png) && n0 === 0L)
  }

  test("planted metadata is decodable and pixels survive the scrub") {
    val planted = ExifScrub.plantJpegMeta(jpg,
      Seq(ExifScrub.syntheticApp1(64)))
    // the planted container still decodes (well-formed segment)
    assert(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(planted)) != null)
    val sc = ExifScrub.scrubRecord(
      Multimodal.MediaRecord(1L, "image/jpeg", planted, 0, 0))
    assert(sc.parsed && sc.format === "jpeg")
    assert(ExifScrub.pixelsEqual(planted, sc.payload))
    // idempotent: a second scrub is the identity
    val sc2 = ExifScrub.scrubRecord(
      Multimodal.MediaRecord(1L, "image/jpeg", sc.payload, 0, 0))
    assert(sc2.n_meta === 0L && sc2.payload.sameElements(sc.payload))
  }

  test("malformed and non-image payloads pass through unparsed") {
    val garbage = Array[Byte](1, 2, 3, 4, 5)
    val sc = ExifScrub.scrubRecord(
      Multimodal.MediaRecord(9L, "application/bin", garbage, 0, 0))
    assert(!sc.parsed && sc.payload.sameElements(garbage))
    // truncated JPEG: SOI then a segment whose declared length
    // overruns the payload
    val truncated = Array[Byte](0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xe1.toByte, 0x10, 0x00, 0x00)
    val sc2 = ExifScrub.scrubRecord(
      Multimodal.MediaRecord(10L, "image/jpeg", truncated, 0, 0))
    assert(!sc2.parsed && sc2.payload.sameElements(truncated))
    // PNG chunk declaring a length near Int.MaxValue: `12 + len` would
    // overflow Int and slip past the bound guard — must reject cleanly
    val pngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    val evil = pngSig ++ Array[Byte](
      0x7f, 0xff.toByte, 0xff.toByte, 0xf8.toByte, // len = Int.MaxValue-7
      'I', 'H', 'D', 'R', 0, 0, 0, 0)
    val sc3 = ExifScrub.scrubRecord(
      Multimodal.MediaRecord(11L, "image/png", evil, 0, 0))
    assert(!sc3.parsed && sc3.payload.sameElements(evil))
  }

  test("batch scrub runs as a streamed partition pass") {
    val media = Seq(
      Multimodal.MediaRecord(1L, "image/png",
        ExifScrub.plantPngMeta(png,
          Seq(ExifScrub.syntheticTextChunk("k", "v"))), 0, 0),
      Multimodal.MediaRecord(2L, "image/jpeg", jpg, 0, 0)).toDS()
    val out = ExifScrub.scrubImages(media).collect().sortBy(_.media_id)
    assert(out(0).n_meta === 1L && out(0).format === "png")
    assert(out(1).n_meta === 0L && out(1).format === "jpeg")
  }
}
