package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{ProductQuantization, Similarity}

/** Laws of the PQ-ADC tier: codebook shape/determinism, code
  * compactness (the memory claim), candidate-set size, exact re-run
  * identity, and the measured recall floor at the report row's
  * configuration (m=8, kSub=32, 10% rerank). */
class ProductQuantizationSpec extends AnyFunSuite {
  import TestSession.spark

  private lazy val emb = graft.core.Tables.embeddings(spark, TestSession.sfDir)
  private lazy val queries = emb.filter(col("vec_id") < 100)

  test("codebooks: m·kSub rows, every codeword subDim wide, bit-identical re-run") {
    val cb = ProductQuantization.codebooks(emb, "vec_id", "embedding",
      m = 8, kSub = 16, iters = 2)
    val rows = cb.collect()
    assert(rows.length == 8 * 16)
    assert(rows.forall(_.getSeq[Long](2).length == 8), "subDim = 64/8")
    val again = ProductQuantization.codebooks(emb, "vec_id", "embedding",
      m = 8, kSub = 16, iters = 2).collect()
    assert(rows.map(r => (r.getInt(0), r.getLong(1), r.getSeq[Long](2))).toSet
      == again.map(r => (r.getInt(0), r.getLong(1), r.getSeq[Long](2))).toSet,
      "training must be bit-identical across runs")
  }

  test("encode: exactly m codes per document, every code < kSub") {
    val cb = ProductQuantization.codebooks(emb, "vec_id", "embedding",
      m = 8, kSub = 16, iters = 2)
    val codes = ProductQuantization.encode(emb, "vec_id", "embedding", cb, m = 8)
    val n = emb.count()
    assert(codes.count() == n * 8, "m rows per document")
    assert(codes.agg(max(col("cell"))).head.getLong(0) < 16L)
    assert(codes.groupBy(col("vec_id")).count()
      .filter(col("count") =!= 8L).isEmpty)
  }

  test("adcCandidates: every query gets exactly max(k, ceil(frac·n)) candidates") {
    val n = emb.count()
    val want = math.max(5L, math.ceil(0.10 * n).toLong)
    val per = ProductQuantization.adcCandidates(queries, emb,
      "vec_id", "embedding", "vec_id", "embedding", k = 5,
      m = 8, kSub = 32, iters = 2, candidateFrac = 0.10)
      .groupBy("q_id").count().select("count").distinct().collect()
    assert(per.map(_.getLong(0)).toSeq == Seq(want),
      s"ADC scores the whole corpus, so every query keeps exactly $want")
  }

  test("codes index: append ≡ rebuild, redelivery no-op, manifest fail-loud") {
    val dirInc = java.nio.file.Files.createTempDirectory("pqidx").toString
    val dirFull = java.nio.file.Files.createTempDirectory("pqidxf").toString
    def slice(i: Int) = emb.filter(pmod(col("vec_id"), lit(3)) === i)
    // incremental: seed on slice 0, append 1 and 2, redeliver 1
    ProductQuantization.writePqIndex(slice(0), "vec_id", "embedding", dirInc,
      m = 8, kSub = 32, iters = 2)
    ProductQuantization.appendToPqIndex(spark, dirInc, slice(1), "vec_id", "embedding")
    val rows1 = ProductQuantization.pqCodes(spark, dirInc).count()
    ProductQuantization.appendToPqIndex(spark, dirInc, slice(1), "vec_id", "embedding")
    assert(ProductQuantization.pqCodes(spark, dirInc).count() == rows1,
      "redelivered batch must append nothing")
    ProductQuantization.appendToPqIndex(spark, dirInc, slice(2), "vec_id", "embedding")
    // one-shot rebuild trained on the SAME slice-0 corpus, codes for all
    ProductQuantization.writePqIndex(slice(0), "vec_id", "embedding", dirFull,
      m = 8, kSub = 32, iters = 2)
    ProductQuantization.appendToPqIndex(spark, dirFull,
      emb.filter(pmod(col("vec_id"), lit(3)) =!= 0), "vec_id", "embedding")
    def serve(p: String) = ProductQuantization.adcTopKFrom(
      spark, p, queries, "vec_id", "embedding", 5)
      .collect().map(_.toSeq).toSet
    assert(serve(dirInc) == serve(dirFull),
      "ADC serving must be identical however the codes arrived")
    // compaction: verbatim copy, identical serving, canonical-path guard
    val dirC = java.nio.file.Files.createTempDirectory("pqidxc").toString + "/v2"
    ProductQuantization.compactPqIndex(spark, dirInc, dirC)
    assert(ProductQuantization.pqCodes(spark, dirC).count()
      == ProductQuantization.pqCodes(spark, dirInc).count())
    assert(serve(dirC) == serve(dirInc),
      "the compacted index must serve identically")
    intercept[IllegalArgumentException] {
      ProductQuantization.compactPqIndex(spark, dirInc, dirInc + "/")
    }
    // a half-published index (no manifest) fails loudly
    new java.io.File(s"$dirInc/_manifest").delete()
    intercept[IllegalStateException] {
      ProductQuantization.pqCodes(spark, dirInc).count()
    }
  }

  test("index rerank serving: candidate-bounded raw-vector fetch, recall >= 0.8") {
    val dir = java.nio.file.Files.createTempDirectory("pqidxr").toString
    def slice(i: Int) = emb.filter(pmod(col("vec_id"), lit(3)) === i)
    ProductQuantization.writePqIndex(slice(0), "vec_id", "embedding", dir,
      m = 8, kSub = 32, iters = 2)
    ProductQuantization.appendToPqIndex(spark, dir, slice(1), "vec_id", "embedding")
    ProductQuantization.appendToPqIndex(spark, dir, slice(2), "vec_id", "embedding")
    val n = emb.count()
    // candidate budget: ADC keeps <= max(k, ceil(frac*n)) ids per query
    // off the stored codes — the re-rank's input is bounded by this
    val cand = ProductQuantization.adcCandidatesFrom(spark, dir,
      queries, "vec_id", "embedding", k = 5, candidateFrac = 0.15)
    val cLimit = math.max(5L, math.ceil(0.15 * n).toLong)
    assert(cand.groupBy("q_id").count()
      .agg(max("count")).head.getLong(0) <= cLimit)
    val top = ProductQuantization.adcRerankTopKFrom(spark, dir,
      queries, "vec_id", "embedding", emb, "vec_id", "embedding",
      k = 5, candidateFrac = 0.15)
    // plan gate: the raw-vector fetch is candidate-bounded — the corpus
    // projection is restricted by a LeftSemi join on the candidates'
    // DISTINCT ids BEFORE any vector joins, so full-precision vectors
    // enter exchanges only for candidate rows, never corpus-sized
    val plan = top.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("LeftSemi"),
      s"rerank plan lacks the candidate-id semi-join:\n$plan")
    // serving recall floor at the pinned 15% fraction (measured
    // 0.850/0.860/0.938 tri-scale)
    val exact = Similarity.bruteForceTopK(queries, emb,
      "vec_id", "embedding", "vec_id", "embedding", 5)
      .select("q_id", "c_id")
    val hits = top.join(exact, Seq("q_id", "c_id"), "left_semi").count()
    val recall = hits.toDouble / exact.count()
    assert(recall >= 0.8, f"index rerank recall@5 $recall%.3f below the band")
  }

  test("stored-index serving on an empty query batch returns empty, not a dim mismatch") {
    // r19 advisor fix: Similarity.dimOf falls back to 1 on an empty (or
    // all-null-vector) set, and the serve-time width gate used to compare
    // that placeholder against the stored shape and throw
    val dir = java.nio.file.Files.createTempDirectory("pqidxe").toString
    ProductQuantization.writePqIndex(
      emb.filter(col("vec_id") < 150), "vec_id", "embedding", dir,
      m = 8, kSub = 32, iters = 2)
    val none = emb.filter(col("vec_id") < 0)
    assert(ProductQuantization.adcTopKFrom(spark, dir,
      none, "vec_id", "embedding", k = 5).isEmpty)
    assert(ProductQuantization.adcCandidatesFrom(spark, dir,
      none, "vec_id", "embedding", k = 5).isEmpty)
    // an all-empty APPEND batch skips the width gate too (appends nothing)
    ProductQuantization.appendToPqIndex(spark, dir,
      none, "vec_id", "embedding")
    new scala.reflect.io.Directory(new java.io.File(dir)).deleteRecursively()
  }

  test("ivfpq: probed-cell prune is real, candidates sub-linear, recall >= 0.8, deterministic") {
    val n = emb.count()
    // the coarse prune: per-query probed rows (the ADC scan's input) are
    // STRICTLY fewer than the corpus — the flat ADC scanned all n
    val (asg, cent) = Similarity.lloydModel(emb, "vec_id", "embedding",
      nCells = 16, iters = 2)
    val cellSizes = asg.groupBy("_cell").count()
    val probedPerQuery = Similarity.lloydProbeCells(
      queries, "vec_id", "embedding", cent, nProbe = 8)
      .join(cellSizes, "_cell")
      .groupBy("q_id").agg(sum("count").as("probed"))
    val maxProbed = probedPerQuery.agg(max("probed")).head.getLong(0)
    assert(maxProbed < n, s"probed $maxProbed rows must be < corpus $n")
    // candidate budget: every query keeps <= max(k, ceil(frac*n)) ids,
    // and the fraction sits UNDER the probed share (the verdict's gate)
    val cand = ProductQuantization.ivfpqCandidates(queries, emb,
      "vec_id", "embedding", "vec_id", "embedding", k = 5,
      nCells = 16, nProbe = 8, iters = 2, m = 8, kSub = 32,
      candidateFrac = 0.15)
    val per = cand.groupBy("q_id").count()
    val cLimit = math.max(5L, math.ceil(0.15 * n).toLong)
    assert(per.agg(max("count")).head.getLong(0) <= cLimit)
    assert(cLimit < maxProbed,
      "candidate fraction must prune below the probed-cell share")
    // recall floor at the report configuration + bit-identical re-run
    val exact = Similarity.bruteForceTopK(queries, emb,
      "vec_id", "embedding", "vec_id", "embedding", 5)
      .select("q_id", "c_id")
    def top() = ProductQuantization.ivfpqTopK(queries, emb,
      "vec_id", "embedding", "vec_id", "embedding", 5,
      nCells = 16, nProbe = 8, iters = 2, m = 8, kSub = 32,
      candidateFrac = 0.15)
    val t1 = top()
    val hits = t1.join(exact, Seq("q_id", "c_id"), "left_semi").count()
    val recall = hits.toDouble / exact.count()
    assert(recall >= 0.8, f"ivfpq recall@5 $recall%.3f below the report floor")
    assert(t1.collect().map(_.toSeq).toSet == top().collect().map(_.toSeq).toSet,
      "coarse probe + ADC + re-rank must be bit-identical across runs")
  }

  test("ivfadc index: append ≡ rebuild, redelivery no-op, residual probed-share serving, compaction") {
    val dirInc = java.nio.file.Files.createTempDirectory("ivfpqidx").toString
    val dirFull = java.nio.file.Files.createTempDirectory("ivfpqidxf").toString
    def slice(i: Int) = emb.filter(pmod(col("vec_id"), lit(3)) === i)
    // auto-dialed coarse geometry: nCells = ⌊√n_seed⌋, residual codes
    ProductQuantization.writeIvfPqIndex(slice(0), "vec_id", "embedding",
      dirInc, nCells = 0, iters = 2, m = 16, kSub = 32)
    val wantCells = math.max(1, math.sqrt(slice(0).count().toDouble).toInt)
    assert(ProductQuantization.ivfPqCellCount(spark, dirInc) == wantCells,
      "coarse geometry must auto-dial to ⌊√n⌋ of the seed corpus")
    ProductQuantization.appendToIvfPqIndex(spark, dirInc, slice(1), "vec_id", "embedding")
    val rows1 = ProductQuantization.ivfPqCodes(spark, dirInc).count()
    ProductQuantization.appendToIvfPqIndex(spark, dirInc, slice(1), "vec_id", "embedding")
    assert(ProductQuantization.ivfPqCodes(spark, dirInc).count() == rows1,
      "redelivered batch must append nothing")
    ProductQuantization.appendToIvfPqIndex(spark, dirInc, slice(2), "vec_id", "embedding")
    // one-shot: same seed training, all non-seed rows in one append
    ProductQuantization.writeIvfPqIndex(slice(0), "vec_id", "embedding",
      dirFull, nCells = 0, iters = 2, m = 16, kSub = 32)
    ProductQuantization.appendToIvfPqIndex(spark, dirFull,
      emb.filter(pmod(col("vec_id"), lit(3)) =!= 0), "vec_id", "embedding")
    def serve(p: String) = ProductQuantization.searchIvfPqIndex(
      spark, p, queries, "vec_id", "embedding",
      emb, "vec_id", "embedding", k = 5, nProbe = 0, candidateFrac = 0.10)
      .collect().map(_.toSeq).toSet
    assert(serve(dirInc) == serve(dirFull),
      "serving must be identical however the codes arrived")
    // probed-share prune is real: every stored row carries a coarse
    // cell, and a query's ADC input is bounded by its probed cells
    val byCell = ProductQuantization.ivfPqCodes(spark, dirInc)
      .filter(col("sub") === 0).groupBy("coarse").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = emb.count()
    assert(byCell.values.sum == n, "every doc coarse-assigned exactly once")
    assert(byCell.size > 1, "coarse cells must partition the corpus")
    // recall floor at the auto-dialed (nProbe=⌈k/2⌉, frac=0.10) point —
    // residual encoding's measured tri-scale worst is 0.828
    val exact = Similarity.bruteForceTopK(queries, emb,
      "vec_id", "embedding", "vec_id", "embedding", 5).select("q_id", "c_id")
    val hits = ProductQuantization.searchIvfPqIndex(
      spark, dirInc, queries, "vec_id", "embedding",
      emb, "vec_id", "embedding", k = 5, nProbe = 0, candidateFrac = 0.10)
      .join(exact, Seq("q_id", "c_id"), "left_semi").count()
    assert(hits.toDouble / exact.count() >= 0.8)
    // serve-time width gate: wrong-dim queries fail loudly, never
    // return silently wrong ADC distances
    intercept[IllegalArgumentException] {
      ProductQuantization.searchIvfPqIndex(spark, dirInc,
        queries.select(col("vec_id"), expr("slice(embedding, 1, 32)").as("embedding")),
        "vec_id", "embedding", emb, "vec_id", "embedding", k = 5)
    }
    // compaction: verbatim copy + canonical-path guard + manifest gate
    val dirC = java.nio.file.Files.createTempDirectory("ivfpqidxc").toString + "/v2"
    ProductQuantization.compactIvfPqIndex(spark, dirInc, dirC)
    assert(serve(dirC) == serve(dirInc), "compacted index must serve identically")
    // a DIRTY dest (previously an appended index) must not leak its
    // stale batches under the fresh manifest
    ProductQuantization.compactIvfPqIndex(spark, dirFull, dirC)
    assert(ProductQuantization.ivfPqCodes(spark, dirC).count()
      == ProductQuantization.ivfPqCodes(spark, dirFull).count(),
      "re-compaction onto a reused dest must wipe the old tree first")
    intercept[IllegalArgumentException] {
      ProductQuantization.compactIvfPqIndex(spark, dirInc, dirInc + "/")
    }
    new java.io.File(s"$dirInc/_manifest").delete()
    intercept[IllegalStateException] {
      ProductQuantization.ivfPqCodes(spark, dirInc).count()
    }
  }

  test("stored-count memo: a same-session append widens the candidate budget") {
    val dir = java.nio.file.Files.createTempDirectory("pqidxmemo").toString
    def slice(i: Int) = emb.filter(pmod(col("vec_id"), lit(3)) === i)
    ProductQuantization.writePqIndex(slice(0), "vec_id", "embedding", dir,
      m = 8, kSub = 32, iters = 2)
    val n0 = slice(0).count()
    def perQuery(): Long = ProductQuantization.adcCandidatesFrom(
      spark, dir, queries, "vec_id", "embedding", k = 5, candidateFrac = 0.10)
      .groupBy("q_id").count().select("count").distinct().head.getLong(0)
    assert(perQuery() == math.max(5L, math.ceil(0.10 * n0).toLong))
    ProductQuantization.appendToPqIndex(spark, dir, slice(1), "vec_id", "embedding")
    val n1 = n0 + slice(1).count()
    assert(perQuery() == math.max(5L, math.ceil(0.10 * n1).toLong),
      "the serve-time count memo must see the appended rows (version-keyed)")
  }

  test("report configuration: recall@5 ≥ 0.8 at 10% candidates, deterministic top-k") {
    val exact = Similarity.bruteForceTopK(queries, emb,
      "vec_id", "embedding", "vec_id", "embedding", 5)
      .select("q_id", "c_id")
    val top = ProductQuantization.adcTopK(queries, emb,
      "vec_id", "embedding", "vec_id", "embedding", 5,
      m = 8, kSub = 32, iters = 2, candidateFrac = 0.10)
    val hits = top.join(exact, Seq("q_id", "c_id"), "left_semi").count()
    val recall = hits.toDouble / exact.count()
    assert(recall >= 0.8, f"recall@5 $recall%.3f below the report floor")
    val again = ProductQuantization.adcTopK(queries, emb,
      "vec_id", "embedding", "vec_id", "embedding", 5,
      m = 8, kSub = 32, iters = 2, candidateFrac = 0.10)
    assert(top.collect().map(_.toSeq).toSet == again.collect().map(_.toSeq).toSet,
      "the two-stage ranking must be bit-identical across runs")
  }
}
