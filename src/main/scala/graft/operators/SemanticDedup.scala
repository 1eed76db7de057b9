package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.VectorNative.dot

/** Semantic deduplication — the SemDeDup recipe (Abbas et al. 2023,
  * arXiv:2303.09540): cluster document embeddings with k-means, then
  * inside each cluster drop every item whose cosine similarity to a
  * HIGHER-PRIORITY cluster member clears `eps`, where priority is
  * distance-to-centroid descending (the paper's keep-the-example-
  * farthest-from-the-centroid keeper rule; the pairwise test is the
  * paper's upper-triangular max — an item is removed if ANY earlier
  * item is within eps, whether or not that item itself survives, so
  * the rule needs no transitive closure). Complements the exact
  * fingerprint ([[Dedup.fingerprintDups]]) and surface near-dup
  * (MinHash/SimHash) tiers: it removes documents that SAY the same
  * thing in different words, which no lexical tier can see.
  *
  * Engine shape (reference README.md:52's embedding analytics row,
  * harness north-star "deduplication" family):
  *  - Geometry is [[Similarity.lloydCellAssignments]] — exact integer
  *    Lloyd k-means whose every step (hash-seeded init, assign, floor-
  *    mean update, empty-cell carryover) an ANSI-SQL oracle replays
  *    bit-for-bit, so the WHOLE semantic-dedup decision — clustering
  *    included — hash-certifies (q_dedup_semantic).
  *  - The within-cluster pairing is an equi-join on the cell id (hash
  *    shuffle keyed by cell), never a corpus×corpus product. At 100 TB
  *    the paper's own dial applies: nCells grows ∝ corpus (they use
  *    k = 110 000 on LAION-440M) so the expected cell stays O(corpus /
  *    nCells) and the per-cell quadratic term is bounded; embeddings
  *    shuffle ONCE keyed by cell and every comparison is cell-local,
  *    so the plan scales horizontally with executors.
  *  - Priorities come from a cell-keyed window (no unpartitioned
  *    window anywhere — the PlanSpec gate holds).
  */
object SemanticDedup {

  /** `nCells = AutoCells` (the default) derives the cell count from
    * the corpus itself: k = max(1, ⌊√n⌋). The paper's own dial is
    * nCells ∝ corpus (k = 110 000 on LAION-440M) so the per-cell
    * quadratic term stays bounded; at a FIXED comparison budget the
    * in-cell pair cost is ~n²/k and the assignment cost ~n·k, whose
    * sum minimizes at k ≈ √n — the measured bench optimum (BASELINE.md
    * round-15 nCells dial). Callers with a corpus-calibrated k (or a
    * serving-side cell budget) pass it explicitly. */
  val AutoCells: Int = 0

  /** The derived default cell count for `corpus` — ⌊√n⌋, floored at 1.
    * Exact in both engines: n is a 64-bit count and IEEE sqrt is exact
    * on perfect squares far beyond any corpus size, so DuckDB's
    * floor(sqrt(n)) replays it bit-for-bit. */
  def autoCells(corpus: DataFrame): Int =
    math.max(1, math.sqrt(corpus.count().toDouble).toInt)

  private def resolveCells(corpus: DataFrame, nCells: Int): Int =
    if (nCells > 0) nCells else autoCells(corpus)

  /** Per-document semantic-dedup verdict over an embedding corpus.
    *
    * Output, one row per input document, ordered by id:
    * (id, cell, pri, is_dup, dup_of) — `pri` is the document's keeper
    * priority inside its cluster (1 = kept first: farthest from the
    * centroid, ties by id), `dup_of` the highest-priority cluster
    * member within `eps` cosine (NULL when the document is kept).
    * Downstream corpus cuts filter `!is_dup`; attribution/audit reads
    * `dup_of`. */
  def prune(
      corpus: DataFrame, id: String, vec: String,
      nCells: Int = AutoCells, iters: Int = 2, eps: Double = 0.4): DataFrame = {
    val pri = graft.core.CacheGovernor.persistTracked(
      prioritized(corpus, id, vec, resolveCells(corpus, nCells), iters))
    val dupOf = shadowPairs(pri, eps)
      .groupBy("c_id")
      .agg(min_by(col("k_id"), col("k_pri")).as("dup_of"))
    pri.join(dupOf, Seq("c_id"), "left_outer")
      .select(col("c_id").as("id"), col("_cell").as("cell"), col("pri"),
        col("dup_of").isNotNull.as("is_dup"), col("dup_of"))
      .orderBy("id")
  }

  /** [[Similarity.lloydCellAssignments]] plus the in-cell keeper
    * priority (distance-to-centroid DESC, ties by id — a cell-keyed
    * window). */
  private def prioritized(
      corpus: DataFrame, id: String, vec: String,
      nCells: Int, iters: Int): DataFrame =
    Similarity.lloydCellAssignments(corpus, id, vec, nCells, iters)
      .withColumn("pri", row_number().over(
        Window.partitionBy("_cell")
          .orderBy(col("_dist").desc, col("c_id").asc)).cast("long"))

  /** The shadowing relation both [[prune]] and [[writeKeeperIndex]]
    * consume — ONE definition of the upper-triangular eps test so the
    * batch verdicts and the persisted index can never diverge:
    * (c_id, k_id, k_pri) rows where the higher-priority cell member
    * `k_id` sits within `eps` cosine of `c_id`. */
  private def shadowPairs(pri: DataFrame, eps: Double): DataFrame = {
    val keepSide = pri.select(col("_cell"), col("c_id").as("k_id"),
      col("_cv").as("_kv"), col("_cn").as("_kn"), col("pri").as("k_pri"))
    pri.join(keepSide, "_cell")
      .filter(col("k_pri") < col("pri"))
      .filter(dot(col("_cv"), col("_kv")) / (col("_cn") * col("_kn")) >= eps)
      .select("c_id", "k_id", "k_pri")
  }

  /** Tag each row of `df` with `kept` = "absent from `dupIds`" via ONE
    * left join (dupIds carries distinct `idCol` rows). */
  private def withKeptFlag(
      df: DataFrame, dupIds: DataFrame, idCol: String): DataFrame =
    df.join(dupIds.select(col(idCol)).distinct().withColumn("_dup", lit(true)),
      Seq(idCol), "left_outer")
      .withColumn("kept", col("_dup").isNull)
      .drop("_dup")

  // ---- incremental keeper index (the N33/N39 ledger discipline) -------

  // The on-disk contract. An index directory holds:
  //   centroids/        the frozen trained geometry (nCells rows)
  //   rows/b<k>/        one parquet directory per COMMITTED batch of the
  //                     verdict ledger — b0 is the seed, b1+ are appends
  //   _manifest         written LAST by writeKeeperIndex/compactKeeperIndex;
  //                     every reader requires it, so a crash between the
  //                     centroid and rows jobs (or mid-overwrite) leaves a
  //                     directory that FAILS LOUDLY instead of one whose
  //                     new geometry silently treats all history as fresh
  //   .staging/         scratch for atomic publication; never read
  // Appends publish ATOMICALLY: the batch is written under .staging/ and
  // enters the ledger with one filesystem rename, so no partial-commit
  // state can exist — a crashed append leaves nothing visible, and the
  // redelivered batch recomputes every verdict exactly as the
  // uninterrupted run would have. (The earlier flat-append form could
  // expose a partially committed batch: if the surviving fragment held a
  // kept=false row whose in-batch shadower was lost, the redelivered
  // shadower was gated against its own shadow-ee and BOTH members of the
  // near-dup family ended kept=false — a keeper-less family that every
  // future copy of that content would then silently drop against.)
  // Filesystem mechanics (manifest gate, staged atomic publication,
  // canonical-path guard) live in [[LedgerFiles]] — ONE discipline
  // shared with the PQ codes index.
  private val What = "semantic keeper index"

  private def fsOf(spark: SparkSession, path: String): (FileSystem, Path) =
    LedgerFiles.fsOf(spark, path)

  private def requireManifest(fs: FileSystem, root: Path, path: String): Unit =
    LedgerFiles.requireManifest(fs, root, path, What)

  /** Seed a semantic-dedup index from a base corpus: the final Lloyd
    * centroid table (nCells rows of integer micro-coordinates — the
    * FROZEN geometry every later batch is assigned under, by the exact
    * distance rule the build used) and ONE `rows` ledger holding every
    * processed document as (doc_id, cell, vec, nrm, kept). Keepers are
    * the kept=true slice — what [[dupsAgainstKeeperIndex]] scores
    * against; [[appendToKeeperIndex]]'s GATING compares new arrivals
    * against the FULL ledger slice of their cells (dropped rows too) —
    * the upper-triangular rule over the whole arrival order. The
    * manifest is written LAST: a crash anywhere before it leaves an
    * index every reader rejects loudly, never one whose fresh geometry
    * is silently paired with an absent or stale ledger. */
  def writeKeeperIndex(
      corpus: DataFrame, id: String, vec: String, path: String,
      nCells: Int = AutoCells, iters: Int = 2, eps: Double = 0.4): Unit = {
    val spark = corpus.sparkSession
    val (fs, root) = fsOf(spark, path)
    // invalidate readers for the whole re-seed window
    fs.delete(new Path(root, LedgerFiles.ManifestName), false)
    val (asg, cent) =
      Similarity.lloydModel(corpus, id, vec, resolveCells(corpus, nCells), iters)
    cent.select(col("_cell").as("cell"), col("_qc").as("qc"))
      .write.mode("overwrite").parquet(s"$path/centroids")
    val pri = graft.core.CacheGovernor.persistTracked(
      asg.withColumn("pri", row_number().over(
        Window.partitionBy("_cell")
          .orderBy(col("_dist").desc, col("c_id").asc)).cast("long")))
    // wipe any previous ledger tree so a re-seed cannot leave stale
    // append batches beside the new base
    fs.delete(new Path(root, "rows"), true)
    withKeptFlag(pri, shadowPairs(pri, eps), "c_id")
      .select(col("c_id").as("doc_id"), col("_cell").as("cell"),
        col("_cv").as("vec"), col("_cn").as("nrm"), col("kept"))
      .write.mode("overwrite").parquet(s"$path/rows/b0")
    LedgerFiles.publishManifest(fs, root, What)
  }

  /** The full verdict ledger — every committed batch directory under
    * `rows/`, manifest-gated. */
  def ledger(spark: SparkSession, path: String): DataFrame = {
    val (fs, root) = fsOf(spark, path)
    requireManifest(fs, root, path)
    spark.read.option("recursiveFileLookup", "true").parquet(s"$path/rows")
  }

  /** The stored keeper slice (kept=true rows of the ledger). */
  def keepers(spark: SparkSession, path: String): DataFrame =
    ledger(spark, path).filter(col("kept"))
      .select("doc_id", "cell", "vec", "nrm")

  /** Assign a batch to the stored cells under the frozen trained
    * geometry ([[Similarity.lloydAssignVectors]] over the persisted
    * centroid table — O(nCells) broadcast). */
  private def assignToStored(
      spark: SparkSession, path: String,
      batch: DataFrame, id: String, vec: String): DataFrame = {
    val (fs, root) = fsOf(spark, path)
    requireManifest(fs, root, path)
    val cent = spark.read.parquet(s"$path/centroids")
      .select(col("cell").as("_cell"), col("qc").as("_qc"))
    Similarity.lloydAssignVectors(batch, id, vec, cent)
      .withColumnRenamed("_cell", "cell")
  }

  /** Delta-append a batch under the FROZEN stored geometry. A batch
    * document is a duplicate iff ANY already-ledgered document in its
    * cell (kept or dropped — the full arrival history outranks every
    * new arrival), or any smaller-id batch document in its cell, sits
    * within `eps` cosine — the same upper-triangular rule as [[prune]]
    * over the concatenated arrival order, so no recursion. The batch is
    * written under `.staging/` and committed with ONE directory rename,
    * so the append is ATOMIC: a crash before the rename leaves nothing
    * visible and the redelivered batch recomputes every verdict exactly
    * as the uninterrupted run would have, while a crash after it is a
    * full commit the freshness anti-join then skips wholesale. (No
    * partial-commit state can exist — in the earlier flat-append form a
    * surviving kept=false fragment whose in-batch shadower was lost
    * would gate the redelivered shadower and leave the whole near-dup
    * family keeper-less.) Cost is O(batch × cell-slice) — the stored
    * side is semi-join-pruned to the batch's cells; stored×stored work
    * never happens. */
  def appendToKeeperIndex(
      spark: SparkSession, path: String,
      batch: DataFrame, id: String, vec: String,
      eps: Double = 0.4): Unit = {
    val led = ledger(spark, path)
    val fresh0 = batch.join(
      led.select(col("doc_id").as(id)), Seq(id), "left_anti")
    if (fresh0.isEmpty) return
    val asg = graft.core.CacheGovernor.persistTracked(
      assignToStored(spark, path, fresh0, id, vec))
    val stored = led
      .join(asg.select("cell").distinct(), Seq("cell"), "left_semi")
    val dupVsStored = asg.join(stored, "cell")
      .filter(dot(col("_bv"), col("vec")) / (col("_bn") * col("nrm")) >= eps)
      .select("b_id")
    val earlier = asg.select(col("cell"), col("b_id").as("e_id"),
      col("_bv").as("_ev"), col("_bn").as("_en"))
    val dupInBatch = asg.join(earlier, "cell")
      .filter(col("e_id") < col("b_id"))
      .filter(dot(col("_bv"), col("_ev")) / (col("_bn") * col("_en")) >= eps)
      .select("b_id")
    val verdicts = withKeptFlag(asg, dupVsStored.unionByName(dupInBatch), "b_id")
      .select(col("b_id").as("doc_id"), col("cell"),
        col("_bv").as("vec"), col("_bn").as("nrm"), col("kept"))
    LedgerFiles.atomicAppend(spark, path, "rows", verdicts)
  }

  /** Compact an appended keeper index into a NEW versioned directory
    * (the ledger-family discipline, [[Dedup.compactMinHashRelation]]'s
    * contract): after ~100 nightly appends the `rows` ledger is ~100
    * small-file directories and the read path pays listing + many-scan
    * overhead, not data volume. Rewrites rows at a target rows-per-file
    * and the centroid table as one file; contents are copied verbatim,
    * so keepers and verdicts are identical pre/post, and the dest
    * manifest is written LAST so a crashed compaction is rejected by
    * every reader. Never compacts a live index onto itself — the guard
    * compares fully-qualified normalized paths, so `dir/` or
    * `dir/../dir` cannot slip past it. */
  def compactKeeperIndex(
      spark: SparkSession, path: String, dest: String,
      targetRowsPerFile: Long = 4000000L): Unit = {
    val (fs, root) = fsOf(spark, path)
    require(LedgerFiles.canonical(fs, path) != LedgerFiles.canonical(fs, dest),
      "compaction writes a NEW versioned directory; compacting a live " +
        "index onto itself would corrupt readers mid-query")
    // wipe any previous dest state (manifest FIRST) so a reused dest
    // cannot serve stale rows/b1+ batches beside the fresh b0
    val destRoot = new Path(dest)
    fs.delete(new Path(destRoot, LedgerFiles.ManifestName), false)
    fs.delete(new Path(destRoot, "rows"), true)
    fs.delete(new Path(destRoot, "centroids"), true)
    val rows = ledger(spark, path)
    val n = rows.count()
    val files = math.max(1L, (n + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    rows.coalesce(files).write.mode("overwrite").parquet(s"$dest/rows/b0")
    spark.read.parquet(s"$path/centroids").coalesce(1)
      .write.mode("overwrite").parquet(s"$dest/centroids")
    LedgerFiles.publishManifest(fs, new Path(dest), What)
  }

  /** Semantic duplicates of a NEW batch against the stored keepers
    * WITHOUT touching non-keeper history — the nightly-shard shape
    * ([[ImageDedup.nearDupAgainstIndex]] at the embedding tier).
    * Output: (new_id, keeper_id, cell, cos) for every batch document
    * within `eps` of a stored keeper in its assigned cell; bipartite
    * only (batch×keeper-slice), stored×stored never recomputed. */
  def dupsAgainstKeeperIndex(
      spark: SparkSession, path: String,
      batch: DataFrame, id: String, vec: String,
      eps: Double = 0.4): DataFrame = {
    val asg = assignToStored(spark, path, batch, id, vec)
    val stored = keepers(spark, path)
      .join(asg.select("cell").distinct(), Seq("cell"), "left_semi")
    asg.join(stored, "cell")
      .withColumn("cos",
        dot(col("_bv"), col("vec")) / (col("_bn") * col("nrm")))
      .filter(col("cos") >= eps)
      .select(col("b_id").as("new_id"), col("doc_id").as("keeper_id"),
        col("cell"), col("cos"))
  }
}
