package graft.operators

import org.apache.spark.sql.Dataset

/** Image metadata scrub — the multimodal analogue of the typed PII
  * redaction (N89): crawled images routinely carry EXIF GPS fixes,
  * camera serials, author tags and editor fingerprints, and a
  * training-data pipeline must strip them BEFORE anything downstream
  * touches the bytes. The public technique (exiftool-class) is
  * SEGMENT-LEVEL SURGERY, not decode/re-encode: both JPEG and PNG are
  * chunked containers, so metadata segments can be dropped byte-exactly
  * while the entropy-coded pixel data is copied verbatim — pixels are
  * PROVABLY identical because the compressed stream is untouched (the
  * spec decodes both and compares every pixel anyway).
  *
  * What is dropped:
  *  - JPEG: APP1 (EXIF/XMP — GPS, serials live here), APP13
  *    (Photoshop/IPTC) and COM (free-text comment) segments; APP0/JFIF
  *    and all frame/scan segments are kept. The walk honors each
  *    segment's declared 2-byte length and stops structural parsing at
  *    SOS, copying the entropy-coded remainder verbatim.
  *  - PNG: tEXt / zTXt / iTXt (free-text + XMP), eXIf and tIME
  *    ancillary chunks; critical chunks (IHDR/PLTE/IDAT/IEND) and
  *    rendering-relevant ancillaries pass through with their CRCs
  *    untouched.
  *
  * Malformed payloads return unchanged bytes with `parsed=false` —
  * one poisoned blob must not kill a 100 TB scan (the
  * [[Multimodal.ImageIoDecoder]] contract).
  *
  * Scale shape: a per-row byte transform inside mapPartitions (the
  * multimodal batch contract — no Expression can host opaque binary
  * surgery); nothing shuffles.
  */
object ExifScrub {

  /** Scrub result: cleaned payload + audit numbers (metadata segments
    * found/removed and bytes saved — the corpus-level scrub report a
    * pipeline aggregates). */
  final case class Scrubbed(
      media_id: Long,
      format: String,
      parsed: Boolean,
      n_meta: Long,
      bytes_removed: Long,
      payload: Array[Byte])

  private val jpegDrop = Set(0xE1, 0xED, 0xFE) // APP1, APP13, COM
  private val pngDrop = Set("tEXt", "zTXt", "iTXt", "eXIf", "tIME")

  /** JPEG segment walk: copy everything except dropped metadata
    * segments; None when the structure is not a well-formed JPEG. */
  def scrubJpegBytes(p: Array[Byte]): Option[(Array[Byte], Long, Long)] = {
    if (p.length < 4 || (p(0) & 0xff) != 0xff || (p(1) & 0xff) != 0xd8)
      return None
    val out = new java.io.ByteArrayOutputStream(p.length)
    out.write(p, 0, 2) // SOI
    var i = 2
    var dropped = 0L
    var droppedBytes = 0L
    while (i + 1 < p.length) {
      if ((p(i) & 0xff) != 0xff) return None
      val marker = p(i + 1) & 0xff
      if (marker == 0xd9) { // EOI
        out.write(p, i, p.length - i)
        i = p.length
      } else if (marker == 0xda) { // SOS: entropy-coded rest, verbatim
        out.write(p, i, p.length - i)
        i = p.length
      } else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
        out.write(p, i, 2) // standalone marker, no length
        i += 2
      } else {
        if (i + 3 >= p.length) return None
        val len = ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)
        if (len < 2 || i + 2 + len > p.length) return None
        if (jpegDrop.contains(marker)) {
          dropped += 1
          droppedBytes += 2L + len
        } else out.write(p, i, 2 + len)
        i += 2 + len
      }
    }
    Some((out.toByteArray, dropped, droppedBytes))
  }

  private val pngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** PNG chunk walk: copy everything except dropped ancillary chunks;
    * None when the structure is not a well-formed PNG. */
  def scrubPngBytes(p: Array[Byte]): Option[(Array[Byte], Long, Long)] = {
    if (p.length < 8 || !p.take(8).sameElements(pngSig)) return None
    val out = new java.io.ByteArrayOutputStream(p.length)
    out.write(p, 0, 8)
    var i = 8
    var dropped = 0L
    var droppedBytes = 0L
    while (i + 8 <= p.length) {
      val len = ((p(i) & 0xff) << 24) | ((p(i + 1) & 0xff) << 16) |
        ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)
      val tpe = new String(p, i + 4, 4, "US-ASCII")
      // Bound-check in Long: a crafted len near Int.MaxValue overflows
      // `12 + len` to a negative Int that slips past the guard and then
      // throws from out.write — the walk must reject it instead.
      val totalL = 12L + len
      if (len < 0 || i.toLong + totalL > p.length) return None
      val total = totalL.toInt
      if (pngDrop.contains(tpe)) {
        dropped += 1
        droppedBytes += total.toLong
      } else out.write(p, i, total)
      i += total
      if (tpe == "IEND") {
        // trailing garbage after IEND is not copied
        return Some((out.toByteArray, dropped, droppedBytes))
      }
    }
    Some((out.toByteArray, dropped, droppedBytes))
  }

  /** Scrub one media record by sniffing the container from its magic
    * bytes; non-image / malformed payloads pass through unchanged
    * (`parsed=false`). */
  def scrubRecord(r: Multimodal.MediaRecord): Scrubbed = {
    val jpeg = r.payload.length >= 2 &&
      (r.payload(0) & 0xff) == 0xff && (r.payload(1) & 0xff) == 0xd8
    val png = r.payload.length >= 8 && r.payload.take(8).sameElements(pngSig)
    // Same Throwable pass-through as hashAudio/hashImages: any structural
    // surprise the walks miss degrades to parsed=false, never a task kill.
    val res =
      try {
        if (jpeg) scrubJpegBytes(r.payload).map(("jpeg", _))
        else if (png) scrubPngBytes(r.payload).map(("png", _))
        else None
      } catch { case _: Throwable => None }
    res match {
      case Some((fmt, (bytes, n, removed))) =>
        Scrubbed(r.media_id, fmt, parsed = true, n, removed, bytes)
      case None =>
        Scrubbed(r.media_id, "unknown", parsed = false, 0L, 0L, r.payload)
    }
  }

  /** Batch scrub: one pass per partition, streamed. */
  def scrubImages(media: Dataset[Multimodal.MediaRecord]): Dataset[Scrubbed] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      Multimodal.imageIoMemoryCache()
      it.map(scrubRecord)
    }
  }

  /** Decode two payloads and compare dimensions and every pixel —
    * the proof obligation that segment surgery never touched the
    * image content. False when either payload fails to decode. */
  def pixelsEqual(a: Array[Byte], b: Array[Byte]): Boolean = {
    Multimodal.imageIoMemoryCache()
    try {
      val ia = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a))
      val ib = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      if (ia == null || ib == null) return false
      if (ia.getWidth != ib.getWidth || ia.getHeight != ib.getHeight)
        return false
      var y = 0
      while (y < ia.getHeight) {
        var x = 0
        while (x < ia.getWidth) {
          if (ia.getRGB(x, y) != ib.getRGB(x, y)) return false
          x += 1
        }
        y += 1
      }
      true
    } catch { case _: Throwable => false }
  }

  // ---- planted-metadata synthesis (spec + oracle fixtures) -----------

  /** A well-formed JPEG APP1 EXIF-shaped segment with `dataLen` bytes
    * of deterministic payload after the Exif header. */
  def syntheticApp1(dataLen: Int): Array[Byte] = {
    val header = "Exif\u0000\u0000".getBytes("US-ASCII")
    val len = 2 + header.length + dataLen
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xe1)
    out.write((len >> 8) & 0xff); out.write(len & 0xff)
    out.write(header)
    (0 until dataLen).foreach(j => out.write(j & 0x7f))
    out.toByteArray
  }

  /** A JPEG COM comment segment carrying `text`. */
  def syntheticCom(text: String): Array[Byte] = {
    val data = text.getBytes("UTF-8")
    val len = 2 + data.length
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xfe)
    out.write((len >> 8) & 0xff); out.write(len & 0xff)
    out.write(data)
    out.toByteArray
  }

  /** Splice metadata segments into a JPEG right after SOI. */
  def plantJpegMeta(jpeg: Array[Byte], segments: Seq[Array[Byte]]): Array[Byte] = {
    require(jpeg.length >= 2 && (jpeg(0) & 0xff) == 0xff &&
      (jpeg(1) & 0xff) == 0xd8, "not a JPEG")
    val out = new java.io.ByteArrayOutputStream()
    out.write(jpeg, 0, 2)
    segments.foreach(s => out.write(s, 0, s.length))
    out.write(jpeg, 2, jpeg.length - 2)
    out.toByteArray
  }

  /** A CRC-correct PNG tEXt chunk (keyword NUL text). */
  def syntheticTextChunk(keyword: String, text: String): Array[Byte] = {
    val data = (keyword + "\u0000" + text).getBytes("ISO-8859-1")
    val tpe = "tEXt".getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32()
    crc.update(tpe); crc.update(data)
    val c = crc.getValue
    val out = new java.io.ByteArrayOutputStream()
    out.write((data.length >> 24) & 0xff); out.write((data.length >> 16) & 0xff)
    out.write((data.length >> 8) & 0xff); out.write(data.length & 0xff)
    out.write(tpe); out.write(data)
    out.write(((c >> 24) & 0xff).toInt); out.write(((c >> 16) & 0xff).toInt)
    out.write(((c >> 8) & 0xff).toInt); out.write((c & 0xff).toInt)
    out.toByteArray
  }

  /** Splice chunks into a PNG right after the signature + IHDR. */
  def plantPngMeta(png: Array[Byte], chunks: Seq[Array[Byte]]): Array[Byte] = {
    require(png.length >= 8 && png.take(8).sameElements(pngSig), "not a PNG")
    val ihdrTotal = {
      val len = ((png(8) & 0xff) << 24) | ((png(9) & 0xff) << 16) |
        ((png(10) & 0xff) << 8) | (png(11) & 0xff)
      12 + len
    }
    val cut = 8 + ihdrTotal
    val out = new java.io.ByteArrayOutputStream()
    out.write(png, 0, cut)
    chunks.foreach(c => out.write(c, 0, c.length))
    out.write(png, cut, png.length - cut)
    out.toByteArray
  }
}
