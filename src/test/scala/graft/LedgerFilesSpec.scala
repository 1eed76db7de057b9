package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.LedgerFiles

/** The shared ledger-file laws, spec'd ONCE (r18 WAL audit) and
  * inherited by every family that routes through [[LedgerFiles]]:
  * minhash relation, IVF inverted file, semantic keepers, PQ/IVF-PQ
  * codes, perceptual hashes, crawl visits, outage windows, and the
  * streaming `_batches` markers. */
class LedgerFilesSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("ledgerfiles").toString

  test("atomicAppend: staged rename, monotone batch ids, missing table starts at b0") {
    val dir = tmp()
    val (fs, root) = LedgerFiles.fsOf(spark, dir)
    assert(LedgerFiles.nextBatchId(fs, root, "t") === 0L)
    LedgerFiles.atomicAppend(spark, dir, "t", Seq(1L).toDF("x"))
    LedgerFiles.atomicAppend(spark, dir, "t", Seq(2L).toDF("x"))
    assert(LedgerFiles.nextBatchId(fs, root, "t") === 2L)
    assert(LedgerFiles.batchDirs(fs, root, "t").map(
      p => new org.apache.hadoop.fs.Path(p).getName) === Seq("b0", "b1"))
    assert(spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$dir/t").as[Long].collect().toSet === Set(1L, 2L))
    // nothing of the staging area is ever visible to readers
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root, ".staging")) ||
      fs.listStatus(new org.apache.hadoop.fs.Path(root, ".staging")).isEmpty)
  }

  test("atomicAppend with partition columns keeps the Hive layout inside b<k>") {
    val dir = tmp()
    LedgerFiles.atomicAppend(spark, dir, "t",
      Seq((1L, 10L), (2L, 20L)).toDF("v", "_cell"),
      partitionCols = Seq("_cell"))
    val cells = new java.io.File(s"$dir/t/b0").listFiles()
      .filter(_.getName.startsWith("_cell=")).map(_.getName).sorted
    assert(cells.toSeq === Seq("_cell=10", "_cell=20"))
    assert(spark.read.parquet(s"$dir/t/b0")
      .select(col("v"), col("_cell").cast("long")).as[(Long, Long)]
      .collect().toSet === Set((1L, 10L), (2L, 20L)))
  }

  test("atomicAppendAt: caller-keyed ids, committed batch makes redelivery a no-op") {
    val dir = tmp()
    LedgerFiles.atomicAppendAt(spark, dir, "t", Seq(1L).toDF("x"), 7L)
    LedgerFiles.atomicAppendAt(spark, dir, "t", Seq(99L).toDF("x"), 7L)
    assert(spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$dir/t").as[Long].collect().toSeq === Seq(1L),
      "a committed batch id must never be overwritten")
  }

  test("batch markers: applied iff marked, marker survives as a directory") {
    val dir = tmp()
    assert(!LedgerFiles.batchApplied(spark, dir, 3L))
    LedgerFiles.markBatchApplied(spark, dir, 3L)
    assert(LedgerFiles.batchApplied(spark, dir, 3L))
    assert(!LedgerFiles.batchApplied(spark, dir, 4L))
    assert(LedgerFiles.appliedBatchIds(spark, dir) === Seq(3L))
  }

  test("legacy flat _batches markers fail loudly instead of reading as empty") {
    val dir = tmp()
    // the removed mode("append") pattern left parquet marker FILES
    // directly under _batches; directory-existence reads would see an
    // empty ledger and re-apply every redelivered batch
    val legacy = new java.io.File(s"$dir/_batches")
    legacy.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/_batches/part-0000.parquet"), "x")
    val ex = intercept[IllegalStateException] {
      LedgerFiles.batchApplied(spark, dir, 0L)
    }
    assert(ex.getMessage.contains("legacy"))
    intercept[IllegalStateException] {
      LedgerFiles.markBatchApplied(spark, dir, 0L)
    }
    intercept[IllegalStateException] {
      LedgerFiles.appliedBatchIds(spark, dir)
    }
  }

  test("manifest: absent until published, readers fail loudly, publish is last") {
    val dir = tmp()
    val (fs, root) = LedgerFiles.fsOf(spark, dir)
    val ex = intercept[IllegalStateException] {
      LedgerFiles.requireManifest(fs, root, dir, "test ledger")
    }
    assert(ex.getMessage.contains("not a fully-published"))
    LedgerFiles.publishManifest(fs, root, "test ledger")
    LedgerFiles.requireManifest(fs, root, dir, "test ledger") // no throw
  }

  test("canonical paths defeat dir/ and dir/../dir aliasing") {
    val dir = tmp()
    val (fs, _) = LedgerFiles.fsOf(spark, dir)
    assert(LedgerFiles.canonical(fs, dir) === LedgerFiles.canonical(fs, dir + "/"))
    assert(LedgerFiles.canonical(fs, dir) ===
      LedgerFiles.canonical(fs, dir + "/../" + new java.io.File(dir).getName))
  }
}
