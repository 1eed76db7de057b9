package graft.operators

import org.apache.spark.sql.Dataset

/** Perceptual audio near-duplicate hashing — the PCM analogue of
  * [[ImageDedup]] (harness north-star multimodal family): the same
  * recording re-encoded at a different sample rate or gain is the
  * audio near-dup class, and the public technique family
  * (chromaprint/energy-fingerprint class, reduced to its core) hashes
  * the ENERGY ENVELOPE: split the clip into 64 equal-duration
  * windows, take mean |amplitude| per window, set bit i when window i
  * is strictly above the 64-window mean. Duration-fractional windows
  * make the hash sample-rate invariant; the mean threshold makes it
  * gain invariant — exactly the two re-encodings a crawl actually
  * sees. Pairing reuses [[ImageDedup.nearDupPairs]] verbatim (any
  * (id, 64-bit hash) relation).
  *
  * Scale shape: one mapPartitions decode pass (bytes → 64 doubles →
  * one long), ids+hash-only shuffles downstream — the N97 discipline.
  * Malformed/compressed payloads yield decoded=false, never an
  * exception (the multimodal poisoned-blob contract).
  */
object AudioDedup {

  final case class AudioHashes(media_id: Long, decoded: Boolean, ahash: Long)

  private def le16(p: Array[Byte], i: Int): Int =
    ((p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)).toShort.toInt

  private def le32(p: Array[Byte], i: Int): Long =
    (p(i) & 0xffL) | ((p(i + 1) & 0xffL) << 8) |
      ((p(i + 2) & 0xffL) << 16) | ((p(i + 3) & 0xffL) << 24)

  private def tag(p: Array[Byte], i: Int): String =
    new String(p, i, 4, "US-ASCII")

  /** 64-bit energy-envelope hash of a 16-bit PCM WAV payload; None
    * for anything that is not one (non-RIFF, compressed codec, no
    * data, zero frames). Multi-channel clips hash channel 0. */
  def audioHash64(p: Array[Byte]): Option[Long] = {
    if (p.length < 44 || tag(p, 0) != "RIFF" || tag(p, 8) != "WAVE")
      return None
    var off = 12
    var fmt: Option[(Int, Int, Int)] = None // channels, bits, blockAlign
    var dataOff = -1
    var dataSize = -1L
    while (off + 8 <= p.length) {
      val id = tag(p, off)
      val sz = le32(p, off + 4)
      if (id == "fmt " && off + 24 <= p.length) {
        val codec = le16(p, off + 8)
        if (codec != 1) return None // PCM only
        fmt = Some((le16(p, off + 10), le16(p, off + 22), le16(p, off + 20)))
      } else if (id == "data") { dataOff = off + 8; dataSize = sz }
      // Advance in Long: a crafted chunk size near 0xFFFFFFFF would make
      // the Int advance 0 or negative and pin the executor core forever
      // (the poisoned-blob contract forbids hangs as much as throws).
      val adv = 8L + sz + (sz & 1L)
      if (sz > p.length.toLong || off.toLong + adv > Int.MaxValue) return None
      off += adv.toInt
    }
    fmt match {
      case Some((ch, bits, ba)) if dataOff >= 0 && bits == 16 && ba > 0 =>
        val avail = math.min(dataSize, (p.length - dataOff).toLong)
        val frames = (avail / ba).toInt
        if (frames <= 0) return None
        val energy = new Array[Double](64)
        var w = 0
        while (w < 64) {
          val f0 = (w.toLong * frames / 64).toInt
          val f1 = math.max(((w + 1).toLong * frames / 64).toInt, f0 + 1)
          var sum = 0.0
          var f = f0
          while (f < f1) {
            val s = le16(p, dataOff + math.min(f, frames - 1) * ba)
            sum += math.abs(s.toDouble)
            f += 1
          }
          energy(w) = sum / (f1 - f0)
          w += 1
        }
        var mean = 0.0
        var i = 0
        while (i < 64) { mean += energy(i); i += 1 }
        mean /= 64
        var h = 0L
        i = 0
        while (i < 64) {
          if (energy(i) > mean) h |= (1L << i)
          i += 1
        }
        Some(h)
      case _ => None
    }
  }

  /** Batch hash extraction, streamed per partition. */
  def hashAudio(
      media: Dataset[Multimodal.MediaRecord]): Dataset[AudioHashes] = {
    import media.sparkSession.implicits._
    media.mapPartitions {
      _.map { r =>
        try audioHash64(r.payload) match {
          case Some(h) => AudioHashes(r.media_id, decoded = true, h)
          case None => AudioHashes(r.media_id, decoded = false, 0L)
        } catch {
          case _: Throwable => AudioHashes(r.media_id, decoded = false, 0L)
        }
      }
    }
  }

  /** Deterministic test/query clip: 64 equal windows of `fpw` mono
    * 16-bit frames each — window i alternates ±amp when bit i of
    * `bits` is set, ±amp/16 otherwise (|sample| constant per window,
    * so the energy envelope recovers the bits EXACTLY at any rate or
    * gain — the [[ImageDedup.expectedAHash]] degenerate-popcount rule
    * applies identically). */
  def renderClip(
      bits: Long, sampleRate: Int, amp: Int, fpw: Int = 16): Array[Byte] = {
    val frames = 64 * fpw
    val dataSize = frames * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16)
    b.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var f = 0
    while (f < frames) {
      val w = f / fpw
      val v = if (((bits >>> w) & 1L) == 1L) amp else amp / 16
      b.putShort((if ((f & 1) == 0) v else -v).toShort)
      f += 1
    }
    b.array()
  }
}
