package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing — harness north-star (BASELINE.json):
  * image/audio/video as opaque `binary` payloads with typed metadata.
  *
  * The Spark-side mechanics are real and tested: typed Dataset of
  * media records, `mapPartitions` batch processing (the Scala analogue
  * of mapInPandas — one decoder instantiation per partition, streaming
  * iterator, no per-row setup), deterministic chunk/frame explosion.
  * The actual media *decode* is stubbed behind [[MediaDecoder]]: the
  * container ships no image/audio libs, so [[FakeDecoder]] computes
  * deterministic byte-level features instead. Swapping in a real JNI/
  * javacv decoder changes one constructor, none of the plumbing.
  */
object Multimodal {

  /** Disable imageio's DISK-BACKED stream cache process-wide: every
    * ImageIO.read/write otherwise spills through a temp FILE, and at
    * executor concurrency the temp churn made the per-row decode cost
    * grow with scale (measured 14.9× CPU at 10× rows on the EXIF
    * scrub before this; linear after). Our payloads are in-memory
    * byte arrays — the memory cache is strictly right. Idempotent,
    * safe to call from every partition. */
  def imageIoMemoryCache(): Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** One media object: opaque payload + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      kind: String,
      payload: Array[Byte],
      width: Int,
      height: Int)

  /** Per-payload features; produced partition-batched. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      byte_len: Long,
      first_byte: Long,
      n_chunks: Long)

  /** One sampled frame/chunk of a payload. */
  final case class MediaChunk(
      media_id: Long,
      chunk_idx: Long,
      chunk: Array[Byte])

  /** Parsed image-header dimensions; `format` is "png"/"jpeg"/"gif", or
    * "unknown" with width/height -1 for unrecognized payloads. */
  final case class MediaDims(
      media_id: Long,
      format: String,
      width: Int,
      height: Int)

  /** Decoder contract. A real implementation would wrap e.g. libjpeg /
    * ffmpeg bindings; none ship in this container. */
  trait MediaDecoder extends Serializable {
    def features(r: MediaRecord): MediaFeatures
  }

  /** Deterministic stand-in decoder (STUB): byte-level stats only.
    * Real decode is intentionally unimplemented here — see
    * [[ImageIoDecoder]] for the real-content option. */
  final class FakeDecoder(chunkSize: Int) extends MediaDecoder {
    override def features(r: MediaRecord): MediaFeatures =
      MediaFeatures(
        media_id = r.media_id,
        kind = r.kind,
        byte_len = r.payload.length.toLong,
        first_byte = if (r.payload.isEmpty) -1L else (r.payload(0) & 0xff).toLong,
        n_chunks = ((r.payload.length + chunkSize - 1) / chunkSize).toLong)
  }

  /** Decoded-content features from a real pixel decode. `decoded=false`
    * rows carry -1 sentinels (payload not a parseable image). */
  final case class ImageContent(
      media_id: Long,
      decoded: Boolean,
      width: Int,
      height: Int,
      mean_luma: Double)

  /** REAL image content decode via the JDK's built-in `javax.imageio`
    * codecs (PNG/JPEG/GIF/BMP readers ship with every JRE — no native
    * or external libraries): full pixel decode plus a content feature
    * (Rec.601 mean luminance). OPTIONAL — the default pipeline keeps
    * the [[FakeDecoder]] stub; this is the drop-in for corpora whose
    * binary column really holds images. Payloads imageio cannot parse
    * yield a `decoded=false` row, never an exception: one poisoned
    * blob must not kill a 100 TB scan. */
  final class ImageIoDecoder extends Serializable {
    def content(r: MediaRecord): ImageContent = {
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload))
        if (img == null) ImageContent(r.media_id, decoded = false, -1, -1, -1.0)
        else {
          val w = img.getWidth
          val h = img.getHeight
          var sum = 0.0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sum += 0.299 * ((rgb >> 16) & 0xff) +
                0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          ImageContent(r.media_id, decoded = true, w, h, sum / (w.toLong * h))
        }
      } catch {
        case _: Throwable => ImageContent(r.media_id, decoded = false, -1, -1, -1.0)
      }
    }
  }

  /** Batch REAL pixel decode: one [[ImageIoDecoder]] per partition,
    * streamed — same scale shape as [[extractFeatures]]. */
  def decodeImages(media: Dataset[MediaRecord]): Dataset[ImageContent] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      imageIoMemoryCache()
      val dec = new ImageIoDecoder
      it.map(dec.content)
    }
  }

  /** REAL pure-JVM image-header decode — no native codecs needed: the
    * dimension fields of PNG (IHDR), JPEG (SOFn frame header, found by
    * walking the segment chain) and GIF (logical screen descriptor) live
    * at fixed offsets within well-known byte structures, so `width`/
    * `height` come straight out of the payload's magic bytes. This is
    * the piece of media decode that needs no codec library; pixel decode
    * stays behind [[MediaDecoder]]. */
  object ImageHeaders {
    private def be32(p: Array[Byte], i: Int): Int =
      ((p(i) & 0xff) << 24) | ((p(i + 1) & 0xff) << 16) |
        ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)
    private def be16(p: Array[Byte], i: Int): Int =
      ((p(i) & 0xff) << 8) | (p(i + 1) & 0xff)
    private def le16(p: Array[Byte], i: Int): Int =
      (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)

    private val PngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    /** (format, width, height); ("unknown", -1, -1) when no header parses. */
    def decode(p: Array[Byte]): (String, Int, Int) = {
      if (p == null) ("unknown", -1, -1)
      else if (p.length >= 24 && p.startsWith(PngSig) &&
        p(12) == 'I' && p(13) == 'H' && p(14) == 'D' && p(15) == 'R')
        ("png", be32(p, 16), be32(p, 20))
      else if (p.length >= 4 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8)
        jpegDims(p)
      else if (p.length >= 10 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8')
        ("gif", le16(p, 6), le16(p, 8))
      else ("unknown", -1, -1)
    }

    /** Walk the JPEG segment chain to the first SOFn (start-of-frame)
      * marker; height/width are big-endian at +3/+5 past its length
      * field. Skips APPn/COM/quant/huffman segments by their declared
      * lengths; tolerates fill bytes (0xFF padding) and standalone
      * markers (RSTn/TEM, which carry no length). */
    private def jpegDims(p: Array[Byte]): (String, Int, Int) = {
      var i = 2
      while (i + 1 < p.length && (p(i) & 0xff) == 0xff) {
        var m = p(i + 1) & 0xff
        while (m == 0xff && i + 2 < p.length) { i += 1; m = p(i + 1) & 0xff } // fill bytes
        val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
        if (isSof) {
          return if (i + 8 < p.length) ("jpeg", be16(p, i + 7), be16(p, i + 5))
          else ("unknown", -1, -1)
        } else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) {
          i += 2 // standalone marker: no length field
        } else if (m == 0xd9 || m == 0xda) {
          return ("unknown", -1, -1) // EOI / scan data before any SOF
        } else {
          if (i + 3 >= p.length) return ("unknown", -1, -1)
          val len = be16(p, i + 2)
          if (len < 2) return ("unknown", -1, -1) // corrupt length: don't loop
          i += 2 + len
        }
      }
      ("unknown", -1, -1)
    }

    /** Minimal VALID-prefix PNG for fixtures: signature + IHDR with a
      * correct CRC32 (8-bit RGB), which is all [[decode]] reads. */
    def syntheticPng(width: Int, height: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(33)
      b.put(PngSig).putInt(13).put("IHDR".getBytes("US-ASCII"))
        .putInt(width).putInt(height)
        .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      val crc = new java.util.zip.CRC32
      crc.update(b.array(), 12, 17) // chunk type + data
      b.putInt(crc.getValue.toInt)
      b.array()
    }

    /** Minimal JPEG prefix for fixtures: SOI + APP0(JFIF) + COM (so the
      * parser must skip real variable-length segments) + SOF0. */
    def syntheticJpeg(width: Int, height: Int): Array[Byte] = {
      require(width <= 0xffff && height <= 0xffff, "JPEG dims are 16-bit")
      val b = java.nio.ByteBuffer.allocate(42)
      b.put(Array(0xff, 0xd8).map(_.toByte))                       // SOI
      b.put(Array(0xff, 0xe0, 0x00, 0x10).map(_.toByte))           // APP0 len 16
        .put("JFIF".getBytes("US-ASCII")).put(0.toByte)
        .put(Array(0x01, 0x01, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00).map(_.toByte))
      b.put(Array(0xff, 0xfe, 0x00, 0x07).map(_.toByte))           // COM len 7
        .put("graft".getBytes("US-ASCII"))
      b.put(Array(0xff, 0xc0, 0x00, 0x0b, 0x08).map(_.toByte))     // SOF0 len 11, prec 8
        .putShort(height.toShort).putShort(width.toShort)
        .put(1.toByte).put(Array(0x01, 0x11, 0x00).map(_.toByte))  // 1 component
      b.array()
    }
  }

  /** Batch header decode over a media table: [[ImageHeaders.decode]] per
    * payload, partition-streamed like [[extractFeatures]]. */
  def decodeDims(media: Dataset[MediaRecord]): Dataset[MediaDims] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val (f, w, h) = ImageHeaders.decode(r.payload)
      MediaDims(r.media_id, f, w, h)
    })
  }

  /** Parsed audio metadata; `format` is "wav" or "unknown" (all fields
    * −1) for unrecognized payloads. */
  final case class AudioMeta(
      media_id: Long,
      format: String,
      channels: Int,
      sample_rate_hz: Int,
      bits_per_sample: Int,
      n_frames: Long,
      duration_ms: Long)

  /** REAL RIFF/WAVE container parsing — the audio analogue of
    * [[ImageHeaders]]: channels / sample rate / bit depth from the
    * `fmt ` chunk, frame count from `data` size ÷ block align,
    * duration by integer millisecond arithmetic. Pure byte-level
    * little-endian walking of the chunk chain (skips LIST/fact/
    * whatever else precedes fmt/data), no codec libraries — actual
    * PCM sample decode stays behind the [[MediaDecoder]] stub
    * boundary like image pixel decode does. */
  object AudioHeaders {
    private def le16(p: Array[Byte], i: Int): Int =
      (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
    private def le32(p: Array[Byte], i: Int): Long =
      (p(i) & 0xffL) | ((p(i + 1) & 0xffL) << 8) |
        ((p(i + 2) & 0xffL) << 16) | ((p(i + 3) & 0xffL) << 24)
    private def tag(p: Array[Byte], i: Int): String =
      new String(p, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** (channels, sampleRate, bits, frames) or None if not a WAV. */
    def decode(p: Array[Byte]): Option[(Int, Int, Int, Long)] = {
      if (p.length < 44 || tag(p, 0) != "RIFF" || tag(p, 8) != "WAVE") return None
      var off = 12
      var fmt: Option[(Int, Int, Int, Int)] = None // channels, rate, bits, blockAlign
      var dataSize = -1L
      while (off + 8 <= p.length && (fmt.isEmpty || dataSize < 0)) {
        val id = tag(p, off)
        val sz = le32(p, off + 4) // unsigned 32-bit, kept as Long: a corrupt
        // size near 2^32 would overflow Int and stall or rewind the walk
        if (sz < 0L || off.toLong + 8L + sz > p.length.toLong) return None
        if (id == "fmt " && sz >= 16 && off + 8 + 16 <= p.length)
          fmt = Some((le16(p, off + 10), le32(p, off + 12).toInt,
            le16(p, off + 22), le16(p, off + 20)))
        else if (id == "data") dataSize = sz
        off += 8 + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
      }
      fmt.collect { case (ch, rate, bits, ba) if dataSize >= 0 && ba > 0 =>
        (ch, rate, bits, dataSize / ba)
      }
    }

    /** Minimal valid PCM WAV: header + zeroed sample data. */
    def syntheticWav(channels: Int, sampleRate: Int, bits: Int, nFrames: Long): Array[Byte] = {
      val blockAlign = channels * bits / 8
      val dataSize = (nFrames * blockAlign).toInt
      val b = java.nio.ByteBuffer.allocate(44 + dataSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
        .put("WAVE".getBytes("US-ASCII"))
      b.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(channels.toShort)
        .putInt(sampleRate).putInt(sampleRate * blockAlign)
        .putShort(blockAlign.toShort).putShort(bits.toShort)
      b.put("data".getBytes("US-ASCII")).putInt(dataSize)
      b.array()
    }
  }

  /** Partition-batched audio header decode (same mapPartitions shape
    * as [[decodeDims]]); duration_ms = ⌊frames·1000 / rate⌋. */
  def decodeAudio(media: Dataset[MediaRecord]): Dataset[AudioMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        AudioHeaders.decode(r.payload) match {
          case Some((ch, rate, bits, frames)) if rate > 0 =>
            AudioMeta(r.media_id, "wav", ch, rate, bits, frames,
              frames * 1000L / rate)
          case _ => AudioMeta(r.media_id, "unknown", -1, -1, -1, -1L, -1L)
        }
      }
    }
  }

  /** Parsed video metadata; `format` is "mp4" or "unknown" (all fields
    * −1) for unrecognized payloads. */
  final case class VideoMeta(
      media_id: Long,
      format: String,
      width: Int,
      height: Int,
      timescale: Long,
      duration_ms: Long)

  /** REAL ISO-BMFF (MP4) container parsing — the video member of the
    * header-decode family ([[ImageHeaders]], [[AudioHeaders]]):
    * big-endian box-chain walk to `moov` → `mvhd` (timescale +
    * duration, version 0 and 1 layouts) and the first video `trak` →
    * `tkhd` (16.16 fixed-point width/height). Frame/sample DECODE
    * stays behind the [[MediaDecoder]] stub boundary; frame SAMPLING
    * plumbing is [[sampleChunks]]. */
  object VideoHeaders {
    private def be32(p: Array[Byte], i: Int): Long =
      ((p(i) & 0xffL) << 24) | ((p(i + 1) & 0xffL) << 16) |
        ((p(i + 2) & 0xffL) << 8) | (p(i + 3) & 0xffL)
    private def be64(p: Array[Byte], i: Int): Long =
      (be32(p, i) << 32) | be32(p, i + 4)
    private def tag(p: Array[Byte], i: Int): String =
      new String(p, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** Walk sibling boxes in [from, until), returning (payloadStart,
      * payloadEnd) of the first box named `name`. */
    private def findBox(
        p: Array[Byte], from: Int, until: Int, name: String): Option[(Int, Int)] = {
      var off = from
      while (off + 8 <= until) {
        val sz = be32(p, off)
        if (sz < 8 || off + sz > until) return None // corrupt size
        if (tag(p, off + 4) == name) return Some((off + 8, off + sz.toInt))
        off += sz.toInt
      }
      None
    }

    /** Walk sibling boxes in [from, until), returning payload spans of
      * ALL boxes named `name` in order (stops at the first corrupt size,
      * like [[findBox]]). */
    private def findBoxes(
        p: Array[Byte], from: Int, until: Int, name: String): List[(Int, Int)] = {
      val out = List.newBuilder[(Int, Int)]
      var off = from
      var ok = true
      while (ok && off + 8 <= until) {
        val sz = be32(p, off)
        if (sz < 8 || off + sz > until) ok = false // corrupt size
        else {
          if (tag(p, off + 4) == name) out += ((off + 8, off + sz.toInt))
          off += sz.toInt
        }
      }
      out.result()
    }

    /** (width, height) from a tkhd payload, or None. Guards the version
      * byte read too: findBox allows an EMPTY payload (sz == 8), where
      * ths == the and p(ths) may sit past the buffer. */
    private def tkhdDims(p: Array[Byte], ths: Int, the: Int): Option[(Int, Int)] = {
      if (ths >= the || ths >= p.length) return None
      val base = if (p(ths) == 0) ths + 76 else ths + 88 // after matrix
      if (base + 8 > the) None
      else Some(((be32(p, base) >> 16).toInt, (be32(p, base + 4) >> 16).toInt))
    }

    /** (width, height, timescale, durationUnits) or None. Dimensions
      * come from the first trak whose tkhd carries nonzero width AND
      * height (real MP4s often order an audio track — whose tkhd dims
      * are 0 — before the video track), falling back to the first
      * trak's dims when no trak reports any. */
    def decode(p: Array[Byte]): Option[(Int, Int, Long, Long)] = {
      if (p.length < 16 || tag(p, 4) != "ftyp") return None
      for {
        (ms, me) <- findBox(p, 0, p.length, "moov")
        (hs, he) <- findBox(p, ms, me, "mvhd")
        // a truncated/empty mvhd payload decodes as unknown, not AIOOBE
        (ts, dur) <- if (hs >= he) None
          else p(hs) match {
            case 0 if hs + 20 <= he =>
              Some((be32(p, hs + 12), be32(p, hs + 16))) // v0: u32 times
            case v if v != 0 && hs + 32 <= he =>
              Some((be32(p, hs + 20), be64(p, hs + 24))) // v1: u64 times
            case _ => None
          }
        dims <- {
          val perTrak = findBoxes(p, ms, me, "trak").flatMap { case (ks, ke) =>
            findBox(p, ks, ke, "tkhd").flatMap { case (ths, the) =>
              tkhdDims(p, ths, the)
            }
          }
          perTrak.find { case (w, h) => w > 0 && h > 0 }.orElse(perTrak.headOption)
        }
      } yield (dims._1, dims._2, ts, dur)
    }

    private def box(name: String, payload: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length).put(name.getBytes("US-ASCII")).put(payload)
      b.array()
    }
    private def mvhdBox(timescale: Long, durationUnits: Long): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(100)
      b.putInt(0).putInt(0).putInt(0) // ver/flags, ctime, mtime
        .putInt(timescale.toInt).putInt(durationUnits.toInt)
      box("mvhd", b.array())
    }
    private def trakBox(width: Int, height: Int, durationUnits: Long): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(84)
      b.putInt(0).putInt(0).putInt(0).putInt(1) // ver/flags, ctime, mtime, track
        .putInt(0).putInt(durationUnits.toInt)  // reserved, duration
      b.position(76)
      b.putInt(width << 16).putInt(height << 16)
      box("trak", box("tkhd", b.array()))
    }
    private val ftypBox: Array[Byte] =
      box("ftyp", "isom".getBytes("US-ASCII") ++ Array[Byte](0, 0, 2, 0))

    /** Minimal valid MP4: ftyp + moov(mvhd v0 + trak(tkhd v0)). */
    def syntheticMp4(
        width: Int, height: Int, timescale: Long, durationUnits: Long): Array[Byte] =
      ftypBox ++ box("moov",
        mvhdBox(timescale, durationUnits) ++ trakBox(width, height, durationUnits))

    /** Like [[syntheticMp4]], but an audio-style trak (0×0 tkhd dims)
      * is ordered BEFORE the video trak — the real-world layout the
      * first-nonzero-dims selection in [[decode]] exists for. */
    def syntheticMp4AudioFirst(
        width: Int, height: Int, timescale: Long, durationUnits: Long): Array[Byte] =
      ftypBox ++ box("moov",
        mvhdBox(timescale, durationUnits) ++
          trakBox(0, 0, durationUnits) ++ trakBox(width, height, durationUnits))
  }

  /** Partition-batched video header decode (same mapPartitions shape as
    * [[decodeDims]]/[[decodeAudio]]); duration_ms = ⌊units·1000/ts⌋. */
  def decodeVideo(media: Dataset[MediaRecord]): Dataset[VideoMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        VideoHeaders.decode(r.payload) match {
          case Some((w, h, ts, dur)) if ts > 0 =>
            VideoMeta(r.media_id, "mp4", w, h, ts, dur * 1000L / ts)
          case _ => VideoMeta(r.media_id, "unknown", -1, -1, -1L, -1L)
        }
      }
    }
  }

  /** Build a media table from the documents table: payload = UTF-8 bytes
    * of the text (deterministic stand-in for image/audio blobs). */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      lit("text/plain").as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      lit(0).as("width"),
      lit(0).as("height")).as[MediaRecord]
  }

  /** Batch feature extraction: one decoder per partition, streamed.
    * This is the shape that scales — decoder init is amortized across
    * the partition and rows never buffer on the driver. */
  def extractFeatures(
      media: Dataset[MediaRecord],
      decoder: MediaDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it => it.map(decoder.features) }
  }

  /** Deterministic frame/chunk sampling: fixed-size payload slices,
    * exploded to one row per chunk (video frame-sample stand-in). */
  def sampleChunks(media: Dataset[MediaRecord], chunkSize: Int): Dataset[MediaChunk] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      r.payload.grouped(chunkSize).zipWithIndex.map { case (bytes, i) =>
        MediaChunk(r.media_id, i.toLong, bytes)
      }
    }
  }

  /** One record parsed out of a WARC file blob; `warc_type`
    * "unknown"/-1 fields mark a malformed record (parsing stops at the
    * first malformed record — trailing garbage cannot fabricate
    * records). */
  final case class WarcRecord(
      media_id: Long,
      rec_idx: Long,
      warc_type: String,
      target_uri: String,
      content_length: Long,
      payload_md5: String)

  /** REAL WARC/1.0 (ISO 28500) container parsing — the crawl-container
    * member of the header-decode family ([[ImageHeaders]] /
    * [[AudioHeaders]] / [[VideoHeaders]]): a WARC file is a
    * concatenation of records, each a CRLF-terminated header block
    * (version line + named fields, ended by an empty line) followed by
    * exactly Content-Length payload bytes and a CRLF CRLF record
    * separator. The walker slices records by the DECLARED
    * Content-Length (never by scanning payload bytes — payloads are
    * binary and may contain anything, including "WARC/1.0"), reads
    * WARC-Type / WARC-Target-URI case-insensitively, and md5s the
    * payload so downstream joins can dedup records without re-reading
    * file blobs. HTTP-response payload parsing stays behind the
    * [[MediaDecoder]] boundary like pixel decode does. */
  object WarcHeaders {
    private val CRLF = "\r\n"

    /** Parse every record of a WARC blob; stops at the first
      * malformed record. */
    def decode(p: Array[Byte]): Seq[(String, String, Long, Array[Byte])] = {
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(String, String, Long, Array[Byte])]
      var off = 0
      var ok = true
      while (ok && off < p.length) {
        val headEnd = indexOfCrlfCrlf(p, off)
        if (headEnd < 0) ok = false
        else {
          val head = new String(p, off, headEnd - off,
            java.nio.charset.StandardCharsets.UTF_8)
          val lines = head.split(CRLF, -1)
          if (lines.isEmpty || !lines.head.startsWith("WARC/")) ok = false
          else {
            val fields = lines.tail.flatMap { l =>
              val i = l.indexOf(':')
              if (i < 0) None
              else Some(l.substring(0, i).trim.toLowerCase ->
                l.substring(i + 1).trim)
            }.toMap
            val len = fields.get("content-length").flatMap(v =>
              scala.util.Try(v.toLong).toOption).getOrElse(-1L)
            val body = headEnd + 4
            if (len < 0 || body + len + 4 > p.length) ok = false
            else {
              out += ((fields.getOrElse("warc-type", ""),
                fields.getOrElse("warc-target-uri", ""), len,
                java.util.Arrays.copyOfRange(p, body, body + len.toInt)))
              off = body + len.toInt + 4 // payload + CRLF CRLF
            }
          }
        }
      }
      out.toSeq
    }

    private def indexOfCrlfCrlf(p: Array[Byte], from: Int): Int = {
      var i = from
      while (i + 3 < p.length) {
        if (p(i) == '\r' && p(i + 1) == '\n' &&
          p(i + 2) == '\r' && p(i + 3) == '\n') return i
        i += 1
      }
      -1
    }

    /** Synthesize a VALID WARC file from (type, uri, payload) triples
      * — the round-trip fixture writer (syntheticWav discipline). */
    def syntheticWarc(records: Seq[(String, String, Array[Byte])]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      records.zipWithIndex.foreach { case ((tpe, uri, payload), i) =>
        val head = s"WARC/1.0$CRLF" +
          s"WARC-Type: $tpe$CRLF" +
          s"WARC-Record-ID: <urn:uuid:rec-$i>$CRLF" +
          s"WARC-Target-URI: $uri$CRLF" +
          s"Content-Length: ${payload.length}$CRLF$CRLF"
        bos.write(head.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        bos.write(payload)
        bos.write(s"$CRLF$CRLF".getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
      }
      bos.toByteArray
    }
  }

  /** Partition-batched WARC record extraction: one row per parsed
    * record, flattened (media_id, rec_idx, type, uri, length,
    * payload md5) — the shape that scales: file blobs never leave
    * their partition, only record-sized metadata rows move. */
  def decodeWarc(media: Dataset[MediaRecord]): Dataset[WarcRecord] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val recs = WarcHeaders.decode(r.payload)
      if (recs.isEmpty)
        Seq(WarcRecord(r.media_id, -1L, "unknown", "", -1L, ""))
      else recs.zipWithIndex.map { case ((tpe, uri, len, payload), i) =>
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(payload).map("%02x".format(_)).mkString
        WarcRecord(r.media_id, i.toLong, tpe, uri, len, md5)
      }
    }
  }
}
