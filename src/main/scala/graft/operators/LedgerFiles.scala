package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Shared filesystem discipline for graft's file-ledger indexes (the
  * semantic keeper index, the PQ codes index): manifest-gated reads,
  * atomic batch publication, canonical-path self-compaction guards.
  *
  * The contract:
  *  - a multi-table seed/compaction writes its tables first and a
  *    `_manifest` file LAST (itself staged + renamed, so a truncated
  *    manifest cannot exist); every reader requires the manifest, so a
  *    crash mid-seed fails loudly instead of pairing fresh state with
  *    a stale ledger;
  *  - batch appends write under `.staging/` and commit with ONE
  *    directory rename into `<table>/b<k>` — no partial-commit state
  *    exists, so redelivery after a crash recomputes the whole batch
  *    identically;
  *  - readers list only committed `b<k>` directories (hidden `.`/`_`
  *    paths are filtered by Spark's file index anyway). */
private[graft] object LedgerFiles {

  val ManifestName = "_manifest"

  def fsOf(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** Fully-qualified, `.`/`..`-normalized form of `p` — the comparison
    * key self-compaction guards use (a literal string compare lets
    * `dir/` or `dir/../dir` slip past and corrupt the live index). */
  def canonical(fs: FileSystem, p: String): Path =
    new Path(fs.makeQualified(new Path(p)).toUri.normalize())

  def requireManifest(fs: FileSystem, root: Path, path: String, what: String): Unit =
    if (!fs.exists(new Path(root, ManifestName)))
      throw new IllegalStateException(
        s"'$path' is not a fully-published $what (no $ManifestName). A " +
          "crashed seed/compaction never publishes the manifest, so its " +
          "half-written state can never be read as if it were complete — " +
          "re-seed or re-compact the index.")

  /** Publish the manifest — the LAST step of a seed/compaction. */
  def publishManifest(fs: FileSystem, root: Path, what: String): Unit = {
    val tmp = new Path(root, ".staging/manifest")
    fs.mkdirs(tmp.getParent)
    val out = fs.create(tmp, true)
    out.write(s"graft $what v1\n".getBytes("UTF-8"))
    out.close()
    val dst = new Path(root, ManifestName)
    fs.delete(dst, false)
    if (!fs.rename(tmp, dst))
      throw new IllegalStateException(s"could not publish $dst")
  }

  /** Monotone version of a ledger table — the max committed batch id
    * plus one. Serve-time memo keys (e.g. a cached stored-row count)
    * must include this, so a same-session append invalidates them:
    * keying on the path alone would keep serving the pre-append count
    * and silently shrink ceil(frac·n) candidate budgets. One FS
    * listing, no data read. */
  def version(fs: FileSystem, root: Path, table: String): Long =
    nextBatchId(fs, root, table)

  /** Next free batch directory id under `root/<table>/` (single-writer
    * ledger discipline — appends are serialized by the caller); 0 for
    * a not-yet-created table. */
  def nextBatchId(fs: FileSystem, root: Path, table: String): Long =
    (try fs.listStatus(new Path(root, table)).map(_.getPath.getName)
      catch { case _: java.io.FileNotFoundException => Array.empty[String] })
      .collect { case s if s.length > 1 && s.head == 'b' &&
        s.drop(1).forall(_.isDigit) => s.drop(1).toLong }
      .foldLeft(-1L)(math.max) + 1

  /** [[atomicAppend]] at a CALLER-CHOSEN batch id — the idempotence
    * primitive for micro-batch folds whose effect is deterministic per
    * (prior state, batch): if `<table>/b<batchId>` is already
    * committed, the call is a no-op (a redelivered batch recomputes
    * the identical rows, sees the commit, and skips), so redelivery
    * converges without a separate applied-batches ledger. */
  def atomicAppendAt(
      spark: SparkSession, path: String, table: String,
      rows: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
    val (fs, root) = fsOf(spark, path)
    val dst = new Path(root, s"$table/b$batchId")
    if (fs.exists(dst)) return
    fs.delete(new Path(root, ".staging"), true)
    val tmp = new Path(root, ".staging/append")
    rows.write.mode("overwrite").parquet(tmp.toString)
    fs.mkdirs(dst.getParent)
    if (!fs.rename(tmp, dst))
      throw new IllegalStateException(s"could not commit append to $dst")
    refreshTable(spark, root, table)
  }

  /** Invalidate Spark's session FileStatusCache (and any cached plans)
    * for a table we just committed into BY RENAME: `df.write` into a
    * path refreshes it implicitly, but a raw FileSystem rename does
    * not — without this, the session keeps serving the PRE-commit file
    * listing and a later read inside the same session silently misses
    * the new batch (bit the r18 WAL refactor's redelivery anti-join:
    * the stale listing made a redelivered batch look entirely fresh). */
  private def refreshTable(spark: SparkSession, root: Path, table: String): Unit =
    spark.catalog.refreshByPath(new Path(root, table).toString)

  /** Write `build`'s rows to `.staging/` and commit them into
    * `root/<table>/b<next>` with one rename. `partitionCols` lays the
    * batch out Hive-partitioned INSIDE its b<k> directory (readers
    * union per-batch partition-discovered reads, so directory pruning
    * on the partition column survives the ledger layout). */
  def atomicAppend(
      spark: SparkSession, path: String, table: String,
      rows: org.apache.spark.sql.DataFrame,
      partitionCols: Seq[String] = Nil): Unit = {
    val (fs, root) = fsOf(spark, path)
    // clear any crashed-append leftovers (never visible to readers)
    fs.delete(new Path(root, ".staging"), true)
    val tmp = new Path(root, ".staging/append")
    val w = rows.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(tmp.toString)
    val dst = new Path(root, s"$table/b${nextBatchId(fs, root, table)}")
    fs.mkdirs(dst.getParent)
    if (!fs.rename(tmp, dst))
      throw new IllegalStateException(s"could not commit append to $dst")
    refreshTable(spark, root, table)
  }

  /** Committed batch directories of `root/<table>/`, ascending. */
  def batchDirs(fs: FileSystem, root: Path, table: String): Seq[String] =
    try fs.listStatus(new Path(root, table)).toSeq.map(_.getPath)
      .filter { p =>
        val n = p.getName
        n.length > 1 && n.head == 'b' && n.drop(1).forall(_.isDigit)
      }
      .sortBy(_.getName.drop(1).toLong).map(_.toString)
    catch { case _: java.io.FileNotFoundException => Seq.empty }

  /** Micro-batch redelivery marker, directory-existence based: the
    * fold calls [[markBatchApplied]] LAST, and a redelivered batch
    * sees the committed marker and skips. Staging + one rename — a
    * crash mid-mark leaves nothing, so retry re-runs the (idempotent)
    * batch effect and re-marks. Replaces the old flat
    * `mode("append")` marker row, whose crash window was a TORN
    * parquet file that broke every later read of the ledger. */
  def batchApplied(spark: SparkSession, path: String, batchId: Long): Boolean = {
    val (fs, root) = fsOf(spark, path)
    requireDirMarkers(fs, root, path)
    fs.exists(new Path(root, s"_batches/b$batchId"))
  }

  def markBatchApplied(spark: SparkSession, path: String, batchId: Long): Unit = {
    import spark.implicits._
    val (fs, root) = fsOf(spark, path)
    requireDirMarkers(fs, root, path)
    atomicAppendAt(spark, path, "_batches",
      Seq(batchId).toDF("batch_id"), batchId)
  }

  /** Fail LOUDLY on a pre-r18 `_batches` layout (flat parquet marker
    * rows directly under the directory, written by the removed
    * `mode("append")` pattern): the directory-existence reads above
    * see such a ledger as EMPTY, so a pre-existing streaming relation
    * would silently re-apply every redelivered batch — duplicated
    * appended state with nothing in the logs (r19 advisor fix). The
    * one-time migration is mechanical (one marker directory per
    * recorded id), so go loud instead of guessing. */
  private def requireDirMarkers(fs: FileSystem, root: Path, path: String): Unit = {
    val dir = new Path(root, "_batches")
    val flat =
      try fs.listStatus(dir).filter(_.isFile)
        .map(_.getPath.getName)
        .filter(n => !n.startsWith("_") && !n.startsWith("."))
      catch { case _: java.io.FileNotFoundException => Array.empty[String] }
    if (flat.nonEmpty)
      throw new IllegalStateException(
        s"'$path/_batches' holds legacy FLAT applied-batch marker files " +
          s"(${flat.take(3).mkString(", ")}…) from the removed " +
          "mode(\"append\") pattern; directory-existence reads would " +
          "treat this ledger as empty and re-apply every redelivered " +
          "batch. Migrate once: for each batch_id in the legacy rows, " +
          "create the b<id> marker (LedgerFiles.markBatchApplied), then " +
          "delete the flat files.")
  }

  /** Applied-batch ids of `path`'s `_batches` ledger (directory
    * markers), legacy-layout-gated — compaction's ledger carry-over
    * reads through this so an old-format relation fails loudly
    * instead of silently dropping every marker. */
  def appliedBatchIds(spark: SparkSession, path: String): Seq[Long] = {
    val (fs, root) = fsOf(spark, path)
    requireDirMarkers(fs, root, path)
    batchDirs(fs, root, "_batches")
      .map(p => new Path(p).getName.drop(1).toLong)
  }
}
