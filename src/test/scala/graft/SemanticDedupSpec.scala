package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SemanticDedup

/** Laws of the SemDeDup prune and its incremental keeper index:
  * keeper-priority rule (farthest-from-centroid kept first), the
  * upper-triangular dup rule, eps monotonicity at both extremes, and
  * the ledger discipline (redelivered append is a no-op; batch
  * near-copies of stored keepers flag bipartite). */
class SemanticDedupSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  // Three well-separated directions in R^4, with planted near-copies:
  // ids 0-3 cluster on e1 (0 and 1 are exact duplicates), ids 10-12 on
  // e2 (11 is 12 scaled — cosine exactly 1), ids 20-21 on e3
  // (orthogonal-ish, no dup). Scaling never changes cosine, so the
  // dup structure is knowable by construction.
  private def vec(xs: Double*) = xs.toSeq
  private lazy val base = Seq(
    (0L, vec(1.0, 0.01, 0.0, 0.0)),
    (1L, vec(1.0, 0.01, 0.0, 0.0)), // exact copy of 0
    (2L, vec(0.98, 0.05, 0.01, 0.0)),
    (3L, vec(0.9, 0.2, 0.1, 0.05)),
    (10L, vec(0.0, 1.0, 0.02, 0.0)),
    (11L, vec(0.0, 2.0, 0.4, 0.0)), // 2x of 12 — cosine exactly 1
    (12L, vec(0.0, 1.0, 0.2, 0.0)), // same cluster as 10, NOT within tight eps
    (20L, vec(0.0, 0.0, 1.0, 0.3)),
    (21L, vec(0.1, 0.0, 0.2, 1.0))
  ).toDF("doc_id", "embedding")

  private def prune(eps: Double) =
    SemanticDedup.prune(base, "doc_id", "embedding",
      nCells = 3, iters = 2, eps = eps)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getBoolean(3),
          if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap

  test("auto-dialed nCells: default prune ≡ explicit ⌊√n⌋ cells") {
    // base has 9 rows → the derived default k = ⌊√9⌋ = 3, exactly the
    // explicit k every other test pins — the dial and the pin agree
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    assert(SemanticDedup.autoCells(base) == 3)
    assert(shape(SemanticDedup.prune(base, "doc_id", "embedding", eps = 0.95))
      == shape(SemanticDedup.prune(base, "doc_id", "embedding", nCells = 3, eps = 0.95)))
  }

  test("every document gets exactly one verdict row, pri contiguous per cell") {
    val out = prune(0.95)
    assert(out.keySet == Set(0L, 1L, 2L, 3L, 10L, 11L, 12L, 20L, 21L))
    out.groupBy(_._2._1).foreach { case (_, members) =>
      val pris = members.values.map(_._2).toSeq.sorted
      assert(pris == (1L to pris.size).toSeq, s"priorities not contiguous: $pris")
    }
  }

  test("exact duplicates: exactly one of a copy-pair survives, dup_of points at the keeper") {
    val out = prune(0.999999)
    val (c0, c1) = (out(0L), out(1L))
    assert(c0._1 == c1._1, "exact copies must land in the same cell")
    assert(c0._3 ^ c1._3, "exactly one of an exact-copy pair is the dup")
    val (dup, keeper) = if (c0._3) (0L, 1L) else (1L, 0L)
    assert(out(dup)._4 == keeper, "dup_of must name the surviving copy")
    // the cosine-1 scaled pair behaves identically
    assert(out(11L)._3 ^ out(12L)._3)
  }

  test("pri=1 (farthest from centroid) is never a dup") {
    val out = prune(-1.0) // every same-cell pair is "similar"
    out.groupBy(_._2._1).foreach { case (_, members) =>
      members.foreach { case (_, (_, pri, isDup, _)) =>
        assert(isDup == (pri > 1L),
          "at eps=-1 exactly the non-first member of each cell dups")
      }
    }
  }

  test("eps monotonicity: above-1 threshold dedups nothing") {
    assert(prune(1.000001).values.forall(!_._3))
  }

  test("keeper index: build, idempotent append, bipartite flagging") {
    val dir = java.nio.file.Files.createTempDirectory("semidx").toString
    SemanticDedup.writeKeeperIndex(base, "doc_id", "embedding", dir,
      nCells = 3, iters = 2, eps = 0.999999)
    val keepers0 = SemanticDedup.keepers(spark, dir).count()
    // base has 2 planted dup pairs -> 9 - 2 keepers
    assert(keepers0 == 7)
    // the ledger retains dropped docs as their own seen-markers
    assert(SemanticDedup.ledger(spark, dir).count() == 9)

    // batch: one near-copy of a stored keeper direction, one novel doc
    val batch = Seq(
      (100L, vec(1.0, 0.01, 0.0, 0.0)), // copy of the 0/1 keeper
      (101L, vec(0.3, 0.3, -0.9, 0.1))  // novel direction
    ).toDF("doc_id", "embedding")
    val flagged = SemanticDedup.dupsAgainstKeeperIndex(
      spark, dir, batch, "doc_id", "embedding", eps = 0.999999)
      .select("new_id").as[Long].collect().toSet
    assert(flagged == Set(100L), "only the planted copy flags against the index")

    SemanticDedup.appendToKeeperIndex(spark, dir, batch, "doc_id", "embedding",
      eps = 0.999999)
    val keepers1 = SemanticDedup.keepers(spark, dir).count()
    assert(keepers1 == keepers0 + 1, "only the novel doc joins the keeper set")
    // redelivery: the same batch appends nothing (freshness and data
    // live in the same file — no cross-file crash window)
    SemanticDedup.appendToKeeperIndex(spark, dir, batch, "doc_id", "embedding",
      eps = 0.999999)
    assert(SemanticDedup.keepers(spark, dir).count() == keepers1)
    assert(SemanticDedup.ledger(spark, dir).count() == 11)
  }

  test("within-batch triu rule: earlier batch id shadows a later copy") {
    val dir = java.nio.file.Files.createTempDirectory("semidx2").toString
    SemanticDedup.writeKeeperIndex(base, "doc_id", "embedding", dir,
      nCells = 3, iters = 2, eps = 0.999999)
    val before = SemanticDedup.keepers(spark, dir).count()
    val batch = Seq(
      (200L, vec(-1.0, 0.2, 0.3, -0.5)), // novel
      (201L, vec(-1.0, 0.2, 0.3, -0.5))  // same-batch copy of 200
    ).toDF("doc_id", "embedding")
    SemanticDedup.appendToKeeperIndex(spark, dir, batch, "doc_id", "embedding",
      eps = 0.999999)
    val kept = SemanticDedup.keepers(spark, dir)
      .filter(col("doc_id") >= 200L).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(200L), "the smaller batch id wins the in-batch tie")
    assert(SemanticDedup.keepers(spark, dir).count() == before + 1)
    // the shadowed copy is still ledgered (kept=false), so redelivering
    // the same batch cannot resurrect it
    SemanticDedup.appendToKeeperIndex(spark, dir, batch, "doc_id", "embedding",
      eps = 0.999999)
    assert(SemanticDedup.keepers(spark, dir).count() == before + 1)

    // compaction: contents identical, bipartite verdicts identical
    val dir2 = java.nio.file.Files.createTempDirectory("semidx3").toString
    SemanticDedup.compactKeeperIndex(spark, dir, dir2)
    val a = SemanticDedup.keepers(spark, dir).select("doc_id", "cell")
      .as[(Long, Long)].collect().toSet
    val b = SemanticDedup.keepers(spark, dir2).select("doc_id", "cell")
      .as[(Long, Long)].collect().toSet
    assert(a == b, "compaction must copy the keeper slice verbatim")
    val probe = Seq((300L, vec(-1.0, 0.2, 0.3, -0.5))).toDF("doc_id", "embedding")
    val f1 = SemanticDedup.dupsAgainstKeeperIndex(
      spark, dir, probe, "doc_id", "embedding", eps = 0.999999)
      .select("new_id", "keeper_id").as[(Long, Long)].collect().toSet
    val f2 = SemanticDedup.dupsAgainstKeeperIndex(
      spark, dir2, probe, "doc_id", "embedding", eps = 0.999999)
      .select("new_id", "keeper_id").as[(Long, Long)].collect().toSet
    assert(f1 == f2 && f1 == Set((300L, 200L)),
      "the compacted index must flag the probe against the same keeper")
  }

  test("append gating sees DROPPED ledger rows (arrival-order semantics)") {
    // chain a -- b -- c at eps = 0.9: cos(a,b) = cos(b,c) = cos(25 deg)
    // ~ 0.906 but cos(a,c) = cos(50 deg) ~ 0.64. b is dropped (shadowed
    // by keeper a); c is within eps ONLY of the dropped b, so a
    // keepers-only gate would wrongly keep c — the full-ledger gate
    // (the upper-triangular rule over the whole arrival order) drops it.
    def ang(d: Double) = vec(math.cos(math.toRadians(d)), math.sin(math.toRadians(d)), 0.0, 0.0)
    val dir = java.nio.file.Files.createTempDirectory("semidx4").toString
    SemanticDedup.writeKeeperIndex(
      Seq((1L, ang(0))).toDF("doc_id", "embedding"), "doc_id", "embedding",
      dir, nCells = 1, iters = 1, eps = 0.9)
    SemanticDedup.appendToKeeperIndex(spark, dir,
      Seq((2L, ang(25))).toDF("doc_id", "embedding"), "doc_id", "embedding", eps = 0.9)
    assert(SemanticDedup.keepers(spark, dir).select("doc_id").as[Long].collect().toSet
      == Set(1L), "b is shadowed by keeper a")
    SemanticDedup.appendToKeeperIndex(spark, dir,
      Seq((3L, ang(50))).toDF("doc_id", "embedding"), "doc_id", "embedding", eps = 0.9)
    assert(SemanticDedup.keepers(spark, dir).select("doc_id").as[Long].collect().toSet
      == Set(1L), "c is shadowed by the DROPPED b, not by any keeper")
  }

  test("crashed append is invisible: redelivery converges to the uninterrupted verdicts") {
    // Simulate a crash mid-append: a fragment of the batch (only the
    // LARGER-id copy — the kept=false row whose in-batch shadower was
    // lost) sits under .staging because the commit rename never ran.
    // Readers must not see it, and redelivering the full batch must
    // reach the verdicts of the uninterrupted run: 400 kept, 401 dropped
    // — never the keeper-less family the old flat-append could produce.
    val dir = java.nio.file.Files.createTempDirectory("semidx5").toString
    SemanticDedup.writeKeeperIndex(base, "doc_id", "embedding", dir,
      nCells = 3, iters = 2, eps = 0.999999)
    val before = SemanticDedup.ledger(spark, dir).count()
    val fragment = Seq((401L, vec(0.5, -0.5, 0.7, 0.1), 0L, 1.0, false))
      .toDF("doc_id", "vec", "cell", "nrm", "kept")
    fragment.write.mode("overwrite").parquet(s"$dir/.staging/append")
    assert(SemanticDedup.ledger(spark, dir).count() == before,
      "staging content must be invisible to readers")
    val batch = Seq(
      (400L, vec(0.5, -0.5, 0.7, 0.1)), // novel direction
      (401L, vec(0.5, -0.5, 0.7, 0.1))  // same-batch copy of 400
    ).toDF("doc_id", "embedding")
    SemanticDedup.appendToKeeperIndex(spark, dir, batch, "doc_id", "embedding",
      eps = 0.999999)
    val kept = SemanticDedup.keepers(spark, dir)
      .filter(col("doc_id") >= 400L).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(400L),
      "redelivery after the simulated crash keeps exactly the in-batch winner")
    assert(SemanticDedup.ledger(spark, dir).count() == before + 2)
  }

  test("a half-published index (no manifest) fails loudly everywhere") {
    val dir = java.nio.file.Files.createTempDirectory("semidx6").toString
    SemanticDedup.writeKeeperIndex(base, "doc_id", "embedding", dir,
      nCells = 3, iters = 2, eps = 0.999999)
    // simulate a crash between the centroid and rows jobs of a re-seed:
    // the manifest is deleted first, so the window is manifest-less
    new java.io.File(s"$dir/_manifest").delete()
    val batch = Seq((500L, vec(1.0, 0.0, 0.0, 0.0))).toDF("doc_id", "embedding")
    intercept[IllegalStateException] { SemanticDedup.keepers(spark, dir).count() }
    intercept[IllegalStateException] {
      SemanticDedup.appendToKeeperIndex(spark, dir, batch, "doc_id", "embedding")
    }
    intercept[IllegalStateException] {
      SemanticDedup.dupsAgainstKeeperIndex(spark, dir, batch, "doc_id", "embedding").count()
    }
    intercept[IllegalStateException] {
      SemanticDedup.compactKeeperIndex(spark, dir,
        java.nio.file.Files.createTempDirectory("semidx6c").toString)
    }
  }

  test("self-compaction guard compares canonical paths, not strings") {
    val dir = java.nio.file.Files.createTempDirectory("semidx7").toString
    SemanticDedup.writeKeeperIndex(base, "doc_id", "embedding", dir,
      nCells = 3, iters = 2, eps = 0.999999)
    val name = new java.io.File(dir).getName
    intercept[IllegalArgumentException] {
      SemanticDedup.compactKeeperIndex(spark, dir, dir + "/")
    }
    intercept[IllegalArgumentException] {
      SemanticDedup.compactKeeperIndex(spark, dir, s"$dir/../$name")
    }
  }
}
