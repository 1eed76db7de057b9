package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Perceptual image near-duplicate detection — the first CONTENT-level
  * multimodal dedup operator (reference README.md:33's raw-blob store,
  * harness north-star multimodal family): at 100 TB, image dedup over
  * decoded pixels is the first multimodal operator a training-data
  * pipeline actually runs (the LAION/DataComp-class cleanup step), and
  * the classic public technique is a 64-bit perceptual hash (aHash /
  * dHash — average and difference hash over a box-downsampled
  * grayscale grid) plus a Hamming-banded self-join.
  *
  * Hashes (public constructions):
  *  - aHash: 8×8 box-averaged Rec.601 luma grid; bit i = cell i's luma
  *    strictly above the 64-cell mean. Invariant to uniform rescale
  *    and to mild recompression (a flat cell's mean survives JPEG's
  *    per-block DC quantization), which is exactly the near-dup class
  *    (resize/recompress variants of one source image).
  *  - dHash: 9×8 grid; bit = right neighbor strictly brighter —
  *    gradient signs, robust to global brightness/contrast shifts.
  *
  * Pairing is [[Dedup.simHashPairs]]'s discipline verbatim, retuned
  * for 64 bits: collapse images sharing an IDENTICAL hash first (a
  * k-duplicate cluster otherwise inflates every band bucket by k and
  * the blocking join by k²), band the 64-bit hash into four 16-bit
  * chunks (pigeonhole: ≤ 3 differing bits cannot touch all 4 chunks,
  * so every pair within the default maxHamming=3 shares a chunk
  * exactly), hash-equi-join per chunk over DISTINCT hashes only, then
  * verify true Hamming via `bit_count(xor)`. Scale shape: only
  * (id, 64-bit hash) rows ever shuffle; per-band buckets hold
  * ~distinct/2¹⁶ hashes, so candidates stay ~4·n²/2¹⁶ over DISTINCT
  * fingerprints — never O(n²) over images, and the full-pixel decode
  * is a single mapPartitions pass that never leaves its scan stage.
  */
object ImageDedup {

  /** Perceptual hashes of one image; `decoded=false` rows carry 0
    * hashes and never pair (callers filter them). */
  final case class ImageHashes(
      media_id: Long, decoded: Boolean, ahash: Long, dhash: Long)

  /** gw×gh box-averaged Rec.601 luma grid. Cell (i,j) averages the
    * pixel rectangle [⌊i·w/gw⌋, ⌊(i+1)·w/gw⌋) × [⌊j·h/gh⌋, …) — the
    * deterministic area mapping (no interpolation-kernel dependence),
    * clamped to at least one source pixel for images narrower than
    * the grid. */
  def lumaGrid(
      img: java.awt.image.BufferedImage, gw: Int, gh: Int): Array[Double] = {
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Double](gw * gh)
    var j = 0
    while (j < gh) {
      val y0 = (j.toLong * h / gh).toInt
      val y1 = math.max(((j + 1).toLong * h / gh).toInt, y0 + 1)
      var i = 0
      while (i < gw) {
        val x0 = (i.toLong * w / gw).toInt
        val x1 = math.max(((i + 1).toLong * w / gw).toInt, x0 + 1)
        var sum = 0.0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(math.min(x, w - 1), math.min(y, h - 1))
            sum += 0.299 * ((rgb >> 16) & 0xff) +
              0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        out(j * gw + i) = sum / ((y1 - y0).toLong * (x1 - x0))
        i += 1
      }
      j += 1
    }
    out
  }

  /** 64-bit average hash over an 8×8 luma grid: bit i set iff cell i
    * is STRICTLY above the mean (an all-equal grid hashes to 0 —
    * callers replay the same rule). */
  def aHash64(grid: Array[Double]): Long = {
    require(grid.length == 64, "aHash needs an 8x8 grid")
    var mean = 0.0
    var i = 0
    while (i < 64) { mean += grid(i); i += 1 }
    mean /= 64
    var h = 0L
    i = 0
    while (i < 64) {
      if (grid(i) > mean) h |= (1L << i)
      i += 1
    }
    h
  }

  /** 64-bit difference hash over a 9×8 luma grid (9 columns, 8 rows):
    * bit (row·8 + col) set iff the right neighbor is strictly
    * brighter. */
  def dHash64(grid: Array[Double]): Long = {
    require(grid.length == 72, "dHash needs a 9x8 grid")
    var h = 0L
    var bit = 0
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (grid(y * 9 + x + 1) > grid(y * 9 + x)) h |= (1L << bit)
        bit += 1
        x += 1
      }
      y += 1
    }
    h
  }

  /** Batch perceptual-hash extraction: one imageio decode per row,
    * streamed per partition ([[Multimodal.decodeImages]]'s contract —
    * a poisoned blob yields decoded=false, never an exception). */
  def hashImages(
      media: Dataset[Multimodal.MediaRecord]): Dataset[ImageHashes] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      Multimodal.imageIoMemoryCache()
      it.map { r =>
        try {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.payload))
          if (img == null) ImageHashes(r.media_id, decoded = false, 0L, 0L)
          else ImageHashes(r.media_id, decoded = true,
            aHash64(lumaGrid(img, 8, 8)), dHash64(lumaGrid(img, 9, 8)))
        } catch {
          case _: Throwable => ImageHashes(r.media_id, decoded = false, 0L, 0L)
        }
      }
    }
  }

  /** Drop failed-decode rows ([[HashIndex.dropUndecoded]] — the one
    * definition all modality callers share). */
  private def dropUndecoded(hashes: DataFrame): DataFrame =
    HashIndex.dropUndecoded(hashes)

  /** Near-dup id pairs (a_id < b_id, `hamming`) from a (id, 64-bit
    * hash) relation — collapse → 4×16-bit band → verify → expand,
    * exact for maxHamming ≤ 3 (pigeonhole over 4 chunks). Rows with
    * `decoded=false` (when the column is present) never pair. */
  def nearDupPairs(
      hashes: DataFrame, id: String, hash: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      "4x16-bit banding guarantees recall only for maxHamming <= 3")
    val docs = graft.core.CacheGovernor.persistTracked(
      dropUndecoded(hashes).select(col(id).as("_id"), col(hash).as("_ph")))
    val reps = docs.select("_ph").distinct()
    val chunked = reps.select(col("_ph"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("_ph"), c * 16).bitwiseAND(0xFFFFL)): _*)))
      .withColumnRenamed("pos", "_chunk").withColumnRenamed("col", "_chunkval")
    val a = chunked.select(col("_ph").as("_pha"), col("_chunk"), col("_chunkval"))
    val b = chunked.select(col("_ph").as("_phb"), col("_chunk"), col("_chunkval"))
    val verified = a.join(b, Seq("_chunk", "_chunkval"))
      .filter(col("_pha") < col("_phb"))
      .dropDuplicates("_pha", "_phb")
      .withColumn("hamming", expr("bit_count(_pha ^ _phb)").cast("long"))
      .filter(col("hamming") <= maxHamming)
    val within = docs.select(col("_ph"), col("_id").as("a_id"))
      .join(docs.select(col("_ph"), col("_id").as("b_id")), "_ph")
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), lit(0L).as("hamming"))
    val cross = verified
      .join(docs.select(col("_ph").as("_pha"), col("_id").as("_ida")), "_pha")
      .join(docs.select(col("_ph").as("_phb"), col("_id").as("_idb")), "_phb")
      .select(least(col("_ida"), col("_idb")).as("a_id"),
        greatest(col("_ida"), col("_idb")).as("b_id"), col("hamming"))
    within.unionByName(cross)
  }

  // ---- incremental index (the N33/N39 ledger discipline) --------------
  // The ledger itself is modality-generic and lives in [[HashIndex]]
  // (one discipline for image/audio/video — N101/N103/N104; laws
  // spec'd once in HashIndexSpec). These delegates keep the historical
  // image-tier entry points.

  /** [[HashIndex.writeHashIndex]]. */
  def writeHashIndex(
      hashes: DataFrame, id: String, hash: String, path: String): Unit =
    HashIndex.writeHashIndex(hashes, id, hash, path)

  /** [[HashIndex.appendToHashIndex]]. */
  def appendToHashIndex(
      spark: org.apache.spark.sql.SparkSession, path: String,
      hashes: DataFrame, id: String, hash: String): Unit =
    HashIndex.appendToHashIndex(spark, path, hashes, id, hash)

  /** [[HashIndex.nearDupAgainstIndex]]. */
  def nearDupAgainstIndex(
      spark: org.apache.spark.sql.SparkSession, path: String,
      newHashes: DataFrame, id: String, hash: String,
      maxHamming: Int = 3): DataFrame =
    HashIndex.nearDupAgainstIndex(spark, path, newHashes, id, hash, maxHamming)

  /** Engine-portable 64-bit pattern for a group id: the first 16 hex
    * chars of md5(group.toString) read big-endian — the same value
    * DuckDB's `('0x' || substr(md5(CAST(g AS VARCHAR)), 1, 16))::UBIGINT`
    * yields, so an oracle can plant the exact bits a rendered pattern
    * carries. */
  def patternBits(group: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(group.toString.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    new java.math.BigInteger(hex.substring(0, 16), 16).longValue()
  }

  /** The aHash a rendering of `bits` recovers: the bits themselves,
    * except the two degenerate popcounts (all-dark / all-bright grids
    * have no cell strictly above the mean → hash 0). Oracles replay
    * this same rule. */
  def expectedAHash(bits: Long): Long = {
    val pc = java.lang.Long.bitCount(bits)
    if (pc == 0 || pc == 64) 0L else bits
  }

  /** Deterministic test/query image: an 8×8 two-level block pattern
    * (bit i of `bits` → cell i bright 230, else dark 25), rendered at
    * `scale` pixels per cell as PNG or JPEG. Cells are 8-pixel-aligned
    * at scale 8, so JPEG's 8×8 DCT blocks see flat content and the
    * box-average recovers each cell level to within a few luma units —
    * far inside the > mean margin for any non-degenerate popcount. */
  def renderPattern(bits: Long, scale: Int, jpeg: Boolean): Array[Byte] = {
    Multimodal.imageIoMemoryCache()
    val side = 8 * scale
    val img = new java.awt.image.BufferedImage(
      side, side, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var j = 0
    while (j < 8) {
      var i = 0
      while (i < 8) {
        val v = if (((bits >>> (j * 8 + i)) & 1L) == 1L) 230 else 25
        val rgb = (v << 16) | (v << 8) | v
        var y = j * scale
        while (y < (j + 1) * scale) {
          var x = i * scale
          while (x < (i + 1) * scale) {
            img.setRGB(x, y, rgb)
            x += 1
          }
          y += 1
        }
        i += 1
      }
      j += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, if (jpeg) "jpg" else "png", baos)
    baos.toByteArray
  }
}
