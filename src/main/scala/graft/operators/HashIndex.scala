package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The modality-generic incremental perceptual-hash index — ONE ledger
  * discipline shared by image (N101), audio (N103) and video (N104)
  * near-dup: a stored relation of narrow (media_id, phash) rows — the
  * only state incremental media dedup ever needs (hashes, never
  * pixels/samples/frames) — with
  *  - seed ([[writeHashIndex]]): one overwrite of the projected pairs;
  *  - O(batch) delta append ([[appendToHashIndex]]): batch ids
  *    anti-join the stored ids OF THE BATCH'S HASH BUCKETS (the batch
  *    hash set broadcasts, keeping the stored scan narrow), so a
  *    redelivered batch appends nothing — idempotence without reading
  *    the whole index;
  *  - bipartite scoring ([[nearDupAgainstIndex]]): new batch vs stored
  *    DISTINCT hashes through the 4×16-bit Hamming banding (cross-side
  *    bands only — stored×stored work never recurs), exact for
  *    maxHamming ≤ 3 by pigeonhole.
  * The hash SEMANTICS stay with the modality (ImageDedup.aHash64,
  * AudioDedup.audioHash64, VideoDedup.videoHash64); this module owns
  * only the ledger laws, spec'd once in HashIndexSpec and inherited by
  * all three modality callers. At 100 TB the index is a narrow
  * two-column relation: appends shuffle batch-sized id sets, scoring
  * shuffles band keys of DISTINCT hashes — media bytes never enter an
  * exchange. */
object HashIndex {

  /** Drop failed-decode rows when the relation carries a `decoded`
    * flag: undecodable payloads all hash to 0, so an unfiltered frame
    * would turn every decode failure into one quadratic hamming-0
    * clique. Enforced here at the API rather than by caller
    * convention; relations without the flag (already-projected
    * id+hash pairs) pass through unchanged. */
  private[operators] def dropUndecoded(hashes: DataFrame): DataFrame =
    if (hashes.columns.contains("decoded")) hashes.filter(col("decoded"))
    else hashes

  /** Seed a perceptual-hash index: one narrow (media_id, phash) row
    * per already-ingested item. */
  def writeHashIndex(
      hashes: DataFrame, id: String, hash: String, path: String): Unit =
    dropUndecoded(hashes).select(col(id).as("media_id"), col(hash).as("phash"))
      .write.mode("overwrite").parquet(s"$path/hashes")

  /** Delta-append a batch (O(batch) parquet append). Idempotent:
    * batch ids anti-join the stored ids OF THE BATCH'S HASH BUCKETS
    * (the batch hash set broadcasts, so the stored scan stays narrow)
    * — a redelivered batch appends nothing. */
  def appendToHashIndex(
      spark: SparkSession, path: String,
      hashes: DataFrame, id: String, hash: String): Unit = {
    val batch =
      dropUndecoded(hashes).select(col(id).as("media_id"), col(hash).as("phash"))
    val stored = spark.read.parquet(s"$path/hashes")
      .join(batch.select("phash").distinct(), Seq("phash"), "left_semi")
      .select("media_id")
    batch.join(stored, Seq("media_id"), "left_anti")
      .write.mode("append").parquet(s"$path/hashes")
  }

  /** Compact an appended hash index into a NEW versioned directory
    * (the ledger-family discipline): after many nightly appends the
    * flat `hashes` relation is many small files taxing listing, not
    * data volume. Rows are copied verbatim at a target rows-per-file,
    * so [[nearDupAgainstIndex]] answers identically pre/post. Never
    * compacts a live index onto itself (canonical-path guard — `dir/`
    * or `dir/../dir` cannot slip past). */
  def compactHashIndex(
      spark: SparkSession, path: String, dest: String,
      targetRowsPerFile: Long = 32000000L): Unit = {
    val (fs, _) = LedgerFiles.fsOf(spark, path)
    require(LedgerFiles.canonical(fs, path) != LedgerFiles.canonical(fs, dest),
      "compaction writes a NEW versioned directory; compacting a live " +
        "index onto itself would corrupt readers mid-query")
    val rows = spark.read.parquet(s"$path/hashes")
    val n = rows.count()
    val files = math.max(1L, (n + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    rows.coalesce(files).write.mode("overwrite").parquet(s"$dest/hashes")
  }

  /** Near-dup pairs of a NEW batch against the stored index WITHOUT
    * reprocessing stored media — the nightly-shard shape
    * ([[Dedup.dedupAgainstIndex]] at the perceptual tier): bipartite
    * 4×16-bit chunk join between batch hashes and stored DISTINCT
    * hashes (cross-side bands only — no stored×stored work), Hamming
    * verify, expand to ids. Output: (new_id, stored_id, hamming),
    * exact for maxHamming ≤ 3. A batch row whose hash equals a stored
    * hash pairs at hamming 0 through the same join. */
  def nearDupAgainstIndex(
      spark: SparkSession, path: String,
      newHashes: DataFrame, id: String, hash: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      "4x16-bit banding guarantees recall only for maxHamming <= 3")
    def chunks(df: DataFrame, h: String): DataFrame =
      df.select(col(h),
        posexplode(array((0 until 4).map(c =>
          shiftright(col(h), c * 16).bitwiseAND(0xFFFFL)): _*)))
        .withColumnRenamed("pos", "_chunk")
        .withColumnRenamed("col", "_chunkval")
    val batch = graft.core.CacheGovernor.persistTracked(
      dropUndecoded(newHashes).select(col(id).as("_nid"), col(hash).as("_nh")))
    val stored = graft.core.CacheGovernor.persistTracked(
      spark.read.parquet(s"$path/hashes")
        .select(col("media_id").as("_sid"), col("phash").as("_sh")))
    val cand = chunks(batch.select(col("_nh")).distinct(), "_nh")
      .join(chunks(stored.select(col("_sh")).distinct(), "_sh"),
        Seq("_chunk", "_chunkval"))
      .dropDuplicates("_nh", "_sh")
      .withColumn("hamming", expr("bit_count(_nh ^ _sh)").cast("long"))
      .filter(col("hamming") <= maxHamming)
    cand
      .join(batch, "_nh")
      .join(stored, "_sh")
      .select(col("_nid").as("new_id"), col("_sid").as("stored_id"),
        col("hamming"))
  }
}
