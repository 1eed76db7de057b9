package graft.operators

import org.apache.spark.sql.Dataset

/** Video content-level near-duplicate hashing — the third member of
  * the perceptual multimodal triple ([[ImageDedup]] pixels,
  * [[AudioDedup]] PCM, this one frames): the same footage re-encoded
  * at a different resolution, frame rate or compression is the video
  * near-dup class, and the public technique family (frame-signature /
  * video-pHash class, reduced to its core) is FRAME-SAMPLED
  * PERCEPTUAL HASHING with temporal aggregation:
  *
  *  1. walk the ISO-BMFF sample table (`stsz` sizes + `stco` chunk
  *     offset — the real box formats) to locate every frame's byte span
  *     without decoding anything;
  *  2. sample k frames at fixed FRACTIONS of the stream (position
  *     ⌊(2i+1)·n / 2k⌋ — duration-fractional, so a frame-rate change
  *     that repeats every frame r times samples the same content);
  *  3. perceptual-hash each sampled frame ([[ImageDedup.aHash64]] over
  *     the 8×8 luma grid — resolution/recompression invariant);
  *  4. aggregate temporally by PER-BIT MAJORITY over the k samples
  *     (bit set iff > k/2 sampled frames set it) into one 64-bit
  *     video hash.
  *
  * Pairing reuses [[ImageDedup.nearDupPairs]] verbatim (4×16-bit
  * Hamming banding over any (id, 64-bit hash) relation).
  *
  * Scale shape: one mapPartitions pass decodes only the k SAMPLED
  * frames per video (never the full stream) and emits one (id, hash)
  * row; ids+hash-only shuffles downstream — the N97 discipline.
  * Malformed/truncated/crafted containers yield decoded=false, never
  * an exception or a stalled walk (the poisoned-blob contract).
  */
object VideoDedup {

  final case class VideoHashes(
      media_id: Long, decoded: Boolean, n_frames: Int, ahash: Long)

  private def be32(p: Array[Byte], i: Int): Long =
    ((p(i) & 0xffL) << 24) | ((p(i + 1) & 0xffL) << 16) |
      ((p(i + 2) & 0xffL) << 8) | (p(i + 3) & 0xffL)

  private def tag(p: Array[Byte], i: Int): String =
    new String(p, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Walk sibling boxes in [from, until); payload span of the first
    * box named `name`. Sizes read as unsigned 32-bit Longs — a crafted
    * size cannot rewind or stall the walk. */
  private def findBox(
      p: Array[Byte], from: Int, until: Int, name: String): Option[(Int, Int)] = {
    var off = from
    while (off + 8 <= until) {
      val sz = be32(p, off)
      if (sz < 8 || off.toLong + sz > until) return None
      if (tag(p, off + 4) == name) return Some((off + 8, off + sz.toInt))
      off += sz.toInt
    }
    None
  }

  private def path(
      p: Array[Byte], from: Int, until: Int, names: String*): Option[(Int, Int)] =
    names.foldLeft(Option((from, until))) { (span, name) =>
      span.flatMap { case (s, e) => findBox(p, s, e, name) }
    }

  /** Upper bound on declared sample counts — a crafted stsz cannot
    * allocate an arbitrary table. */
  private val MaxFrames = 1 << 20

  /** Byte spans of every sample (frame) via the sample table:
    * stsz sample sizes + the first stco chunk offset, samples laid out
    * contiguously in one chunk (exactly what [[muxFramesMp4]] writes,
    * and the single-chunk layout small MJPEG-class files use). None
    * for anything structurally unsound. */
  def frameSpans(p: Array[Byte]): Option[IndexedSeq[(Int, Int)]] = {
    if (p.length < 16 || tag(p, 4) != "ftyp") return None
    for {
      (ms, me) <- findBox(p, 0, p.length, "moov")
      (ss, se) <- path(p, ms, me, "trak", "mdia", "minf", "stbl")
      (zs, ze) <- findBox(p, ss, se, "stsz")
      (cs, ce) <- findBox(p, ss, se, "stco")
      spans <- {
        // stsz: ver/flags u32, sample_size u32 (0 = per-sample table),
        // sample_count u32, then u32 sizes
        if (zs + 12 > ze || cs + 8 > ce) None
        else {
          val fixedSize = be32(p, zs + 4)
          val n = be32(p, zs + 8)
          val entries = be32(p, cs + 4)
          if (n <= 0 || n > MaxFrames || entries < 1 ||
            cs.toLong + 8 + 4 > ce) None
          else {
            var off = be32(p, cs + 8) // first (only) chunk offset
            val out = new scala.collection.immutable.VectorBuilder[(Int, Int)]
            var i = 0
            var ok = true
            while (ok && i < n.toInt) {
              val sz =
                if (fixedSize != 0) fixedSize
                else if (zs.toLong + 12 + 4L * i + 4 <= ze) be32(p, zs + 12 + 4 * i)
                else { ok = false; 0L }
              if (ok) {
                if (sz <= 0 || off + sz > p.length) ok = false
                else {
                  out += ((off.toInt, (off + sz).toInt))
                  off += sz
                }
              }
              i += 1
            }
            if (ok) Some(out.result()) else None
          }
        }
      }
    } yield spans
  }

  /** 64-bit frame-sampled majority hash; None when the container or
    * every sampled frame fails to parse. Returns (frameCount, hash). */
  def videoHash64(p: Array[Byte], samples: Int = 8): Option[(Int, Long)] = {
    Multimodal.imageIoMemoryCache()
    frameSpans(p).flatMap { spans =>
      val n = spans.length
      // decode each distinct sampled frame once (adjacent sample slots
      // often land on the same frame for short streams)
      val cache = scala.collection.mutable.Map.empty[Int, Option[Long]]
      def frameHash(idx: Int): Option[Long] = cache.getOrElseUpdate(idx, {
        val (s, e) = spans(idx)
        try {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(
              java.util.Arrays.copyOfRange(p, s, e)))
          if (img == null) None
          else Some(ImageDedup.aHash64(ImageDedup.lumaGrid(img, 8, 8)))
        } catch { case _: Throwable => None }
      })
      val counts = new Array[Int](64)
      var voted = 0
      var i = 0
      while (i < samples) {
        val idx = ((2L * i + 1) * n / (2L * samples)).toInt
        frameHash(math.min(idx, n - 1)).foreach { h =>
          voted += 1
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) counts(b) += 1
            b += 1
          }
        }
        i += 1
      }
      if (voted < samples) None // any undecodable sampled frame ⇒ no hash
      else {
        var h = 0L
        var b = 0
        while (b < 64) {
          if (2 * counts(b) > samples) h |= (1L << b)
          b += 1
        }
        Some((n, h))
      }
    }
  }

  /** Batch hash extraction, streamed per partition. */
  def hashVideos(
      media: Dataset[Multimodal.MediaRecord],
      samples: Int = 8): Dataset[VideoHashes] = {
    import media.sparkSession.implicits._
    media.mapPartitions {
      _.map { r =>
        try videoHash64(r.payload, samples) match {
          case Some((n, h)) => VideoHashes(r.media_id, decoded = true, n, h)
          case None => VideoHashes(r.media_id, decoded = false, 0, 0L)
        } catch {
          case _: Throwable => VideoHashes(r.media_id, decoded = false, 0, 0L)
        }
      }
    }
  }

  // ---- muxer (fixture writer, the syntheticWav discipline) ------------

  private def box(name: String, payload: Array[Byte]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(8 + payload.length)
    b.putInt(8 + payload.length).put(name.getBytes("US-ASCII")).put(payload)
    b.array()
  }

  /** Real single-chunk MJPEG-class MP4: ftyp + moov(mvhd + trak(tkhd +
    * mdia(mdhd + minf(stbl(stsd + stsz + stco))))) + mdat holding the
    * concatenated frame images; stsz carries the true per-frame sizes
    * and stco the ABSOLUTE offset of the first frame. tkhd/mvhd use
    * the same v0 layouts [[Multimodal.VideoHeaders.decode]] reads, so
    * the metadata query path parses these files too. */
  def muxFramesMp4(
      frames: Seq[Array[Byte]], width: Int, height: Int,
      timescale: Long = 600L, frameDurationUnits: Long = 25L): Array[Byte] = {
    require(frames.nonEmpty, "a video needs at least one frame")
    val durUnits = frameDurationUnits * frames.length
    val mvhd = {
      val b = java.nio.ByteBuffer.allocate(100)
      b.putInt(0).putInt(0).putInt(0)
        .putInt(timescale.toInt).putInt(durUnits.toInt)
      box("mvhd", b.array())
    }
    val tkhd = {
      val b = java.nio.ByteBuffer.allocate(84)
      b.putInt(0).putInt(0).putInt(0).putInt(1)
        .putInt(0).putInt(durUnits.toInt)
      b.position(76)
      b.putInt(width << 16).putInt(height << 16)
      box("tkhd", b.array())
    }
    val mdhd = {
      val b = java.nio.ByteBuffer.allocate(24)
      b.putInt(0).putInt(0).putInt(0)
        .putInt(timescale.toInt).putInt(durUnits.toInt)
        .putShort(0x55c4.toShort).putShort(0) // und language, predef
      box("mdhd", b.array())
    }
    val stsd = {
      // one 'jpeg'-format visual sample entry (header fields only)
      val entry = {
        val b = java.nio.ByteBuffer.allocate(86)
        b.putInt(86).put("jpeg".getBytes("US-ASCII"))
          .putInt(0).putShort(0).putShort(1) // reserved, data_ref_index
        b.position(8 + 24)
        b.putShort(width.toShort).putShort(height.toShort)
        b.array()
      }
      val b = java.nio.ByteBuffer.allocate(8 + entry.length)
      b.putInt(0).putInt(1).put(entry) // ver/flags, entry_count
      box("stsd", b.array())
    }
    val stsz = {
      val b = java.nio.ByteBuffer.allocate(12 + 4 * frames.length)
      b.putInt(0).putInt(0).putInt(frames.length) // ver/flags, size=0, count
      frames.foreach(f => b.putInt(f.length))
      box("stsz", b.array())
    }
    // stco needs the absolute mdat payload offset = |ftyp| + |moov| + 8;
    // moov size is layout-determined, so compute with a placeholder first
    def assemble(chunkOffset: Int): (Array[Byte], Int) = {
      val stco = {
        val b = java.nio.ByteBuffer.allocate(12)
        b.putInt(0).putInt(1).putInt(chunkOffset)
        box("stco", b.array())
      }
      val stbl = box("stbl", stsd ++ stsz ++ stco)
      val minf = box("minf", stbl)
      val mdia = box("mdia", mdhd ++ minf)
      val trak = box("trak", tkhd ++ mdia)
      val moov = box("moov", mvhd ++ trak)
      val head = ftypBox ++ moov
      (head, head.length + 8)
    }
    val (_, realOffset) = assemble(0)
    val (head, _) = assemble(realOffset)
    head ++ box("mdat", frames.flatten.toArray)
  }

  private val ftypBox: Array[Byte] =
    box("ftyp", "isom".getBytes("US-ASCII") ++ Array[Byte](0, 0, 2, 0))

  // ---- planted-scene synthesis (spec + oracle fixtures) ---------------

  /** Deterministic test/query video for group `group`: `scenes`
    * consecutive md5-derived 8×8 block patterns (scene j bits =
    * [[ImageDedup.patternBits]](group·scenes + j)), each rendered
    * `framesPerScene` times at `scale` pixels per cell as PNG or JPEG
    * frames, muxed into a real MP4. Rate (framesPerScene), resolution
    * (scale) and compression (jpeg) are exactly the three re-encodings
    * the sampler must be invariant to. */
  def renderVideo(
      group: Long, scenes: Int, framesPerScene: Int,
      scale: Int, jpeg: Boolean): Array[Byte] = {
    val frames = (0 until scenes).flatMap { j =>
      val bits = ImageDedup.patternBits(group * scenes + j)
      val frame = ImageDedup.renderPattern(bits, scale, jpeg)
      Seq.fill(framesPerScene)(frame)
    }
    muxFramesMp4(frames, 8 * scale, 8 * scale)
  }

  /** The video hash a rendering of group `group` recovers, for any
    * framesPerScene ≥ 1 and k = 2·scenes samples: fractional sampling
    * lands 2 samples inside each scene (position (2i+1)/2k of the
    * stream has non-boundary fractional scene coordinate), each frame
    * hash recovers [[ImageDedup.expectedAHash]] of the scene bits
    * exactly, and the per-bit majority over 2 votes per scene sets a
    * bit iff > scenes/2 scenes set it. Oracles replay this same
    * arithmetic. */
  def expectedVideoHash(group: Long, scenes: Int): Long = {
    val hs = (0 until scenes)
      .map(j => ImageDedup.expectedAHash(ImageDedup.patternBits(group * scenes + j)))
    var h = 0L
    var b = 0
    while (b < 64) {
      val c = hs.count(x => ((x >>> b) & 1L) == 1L)
      if (2 * c > scenes) h |= (1L << b)
      b += 1
    }
    h
  }
}
