package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The modality-generic incremental perceptual-hash index — ONE ledger
  * discipline shared by image (N101), audio (N103) and video (N104)
  * near-dup: a stored relation of narrow (media_id, phash) rows — the
  * only state incremental media dedup ever needs (hashes, never
  * pixels/samples/frames) — with the full [[LedgerFiles]] contract the
  * semantic and PQ ledgers carry:
  *  - seed ([[writeHashIndex]]): one overwrite of the projected pairs
  *    into `hashes/b0`, manifest published LAST — a crashed seed fails
  *    loudly for every reader instead of serving half a corpus;
  *  - O(batch) delta append ([[appendToHashIndex]]): batch ids
  *    anti-join the FULL stored id column (a narrow one-column
  *    columnar scan), so a redelivered batch appends nothing even
  *    when a re-encode changed its hashes — per-id idempotence, not
  *    per-(id, hash); the append stages under `.staging/` and commits
  *    with ONE rename ([[LedgerFiles.atomicAppend]]), so a crashed
  *    append leaves nothing visible;
  *  - bipartite scoring ([[nearDupAgainstIndex]]): new batch vs stored
  *    DISTINCT hashes through the 4×16-bit Hamming banding (cross-side
  *    bands only — stored×stored work never recurs), exact for
  *    maxHamming ≤ 3 by pigeonhole.
  * The hash SEMANTICS stay with the modality (ImageDedup.aHash64,
  * AudioDedup.audioHash64, VideoDedup.videoHash64); this module owns
  * only the ledger laws, spec'd once in HashIndexSpec and inherited by
  * all three modality callers. At 100 TB the index is a narrow
  * two-column relation: appends shuffle batch-sized id sets (plus one
  * projection scan of the stored id column), scoring shuffles band
  * keys of DISTINCT hashes — media bytes never enter an exchange. */
object HashIndex {

  private val What = "perceptual hash index"

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
    * per already-ingested item, committed under the manifest gate
    * (manifest LAST — a crash mid-seed is loud, never silent). */
  def writeHashIndex(
      hashes: DataFrame, id: String, hash: String, path: String): Unit = {
    val spark = hashes.sparkSession
    val (fs, root) = LedgerFiles.fsOf(spark, path)
    // invalidate readers for the whole re-seed window, then wipe any
    // previous ledger tree so a re-seed cannot leave stale batches
    fs.delete(new Path(root, LedgerFiles.ManifestName), false)
    fs.delete(new Path(root, "hashes"), true)
    dropUndecoded(hashes).select(col(id).as("media_id"), col(hash).as("phash"))
      .write.mode("overwrite").parquet(s"$path/hashes/b0")
    LedgerFiles.publishManifest(fs, root, What)
  }

  /** The committed (media_id, phash) ledger — every `hashes/b<k>`
    * batch, manifest-gated. */
  def storedHashes(spark: SparkSession, path: String): DataFrame = {
    val (fs, root) = LedgerFiles.fsOf(spark, path)
    LedgerFiles.requireManifest(fs, root, path, What)
    spark.read.option("recursiveFileLookup", "true").parquet(s"$path/hashes")
  }

  /** Delta-append a batch, ATOMICALLY (staging + one rename — a crash
    * mid-append leaves nothing visible and redelivery converges).
    * Idempotent PER ID: batch ids anti-join the full stored id set (a
    * one-column columnar scan of the narrow ledger), so a redelivered
    * media_id appends nothing even when re-encoding changed its hash —
    * the stored hash stays canonical, matching the semantic ledger's
    * keeper discipline. */
  def appendToHashIndex(
      spark: SparkSession, path: String,
      hashes: DataFrame, id: String, hash: String): Unit = {
    val batch =
      dropUndecoded(hashes).select(col(id).as("media_id"), col(hash).as("phash"))
    val fresh = batch.join(
      storedHashes(spark, path).select("media_id"), Seq("media_id"), "left_anti")
    if (fresh.isEmpty) return
    LedgerFiles.atomicAppend(spark, path, "hashes", fresh)
  }

  /** Compact an appended hash index into a NEW versioned directory
    * (the ledger-family discipline): after many nightly appends the
    * `hashes` ledger is many small batch directories taxing listing,
    * not data volume. Rows are copied verbatim at a target
    * rows-per-file and the dest manifest publishes LAST, so
    * [[nearDupAgainstIndex]] answers identically pre/post and a
    * crashed compaction is loud. Never compacts a live index onto
    * itself (canonical-path guard — `dir/` or `dir/../dir` cannot
    * slip past). */
  def compactHashIndex(
      spark: SparkSession, path: String, dest: String,
      targetRowsPerFile: Long = 32000000L): Unit = {
    val (fs, _) = LedgerFiles.fsOf(spark, path)
    require(LedgerFiles.canonical(fs, path) != LedgerFiles.canonical(fs, dest),
      "compaction writes a NEW versioned directory; compacting a live " +
        "index onto itself would corrupt readers mid-query")
    // wipe any previous dest state (manifest FIRST — readers go loud
    // for the whole window) so a reused dest cannot serve stale b1+
    // batches beside the fresh b0, mirroring the seed path
    val destRoot = new Path(dest)
    fs.delete(new Path(destRoot, LedgerFiles.ManifestName), false)
    fs.delete(new Path(destRoot, "hashes"), true)
    val rows = storedHashes(spark, path)
    val n = rows.count()
    val files = math.max(1L, (n + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    rows.coalesce(files).write.mode("overwrite").parquet(s"$dest/hashes/b0")
    LedgerFiles.publishManifest(fs, new Path(dest), What)
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
      storedHashes(spark, path)
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
