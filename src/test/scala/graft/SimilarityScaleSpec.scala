package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** 100×-scale smoke for the two ANN scale paths: a multi-million-row
  * synthetic corpus (generated from xxhash64, never stored) driven
  * through [[Similarity.lshTopK]] and the materialized-IVF search once,
  * with executor-CPU bounds (steal-immune — see BASELINE.md §round-7)
  * and the parallelism-ceiling regression pinned.
  *
  * The ceiling check is on JOIN-KEY CARDINALITY, not local task counts:
  * the local harness runs 8 shuffle partitions either way, but at
  * cluster scale the candidate equi-join can never exceed one task per
  * distinct key — the old fixed nPlanes=4 capped every corpus at 2⁴=16
  * buckets of O(n/16) rows each (16 giant skewed tasks at 100 TB),
  * while [[Similarity.planesFor]] grows the key space with the data. */
class SimilarityScaleSpec extends AnyFunSuite {
  import TestSession.spark

  // CI scale: 400k rows / dim 8. The hazards under test (bucket-key
  // cardinality growth past the old fixed-16 ceiling, partition layout,
  // join shape) are row-count thresholds and plan properties, so 400k
  // exercises them identically to the one-off multi-million-row
  // validation recorded in BASELINE.md §round-7 — while keeping the
  // per-commit suite cost bounded. (A 2M-row version of this spec was
  // measured at 777 s for the LSH path alone when run inside the
  // parallel suite on a contended host — the suite is NOT an isolated
  // bench, so big-corpus wall numbers belong in BASELINE.md, not here.)
  private val rows = 400000L
  private val dim = 8

  private def synthCorpus(n: Long) = spark.range(n).select(
    col("id").as("vec_id"),
    expr(s"transform(sequence(0, ${dim - 1}), " +
      "j -> cast(pmod(xxhash64(id, j), 1000) as double) / 1000.0 - 0.5)")
      .as("embedding"))

  // deterministic quasi-isotropic corpus in [-0.5, 0.5)^dim
  private lazy val corpus = synthCorpus(rows)
  private lazy val queries = corpus.filter(col("vec_id") < 40)

  /** Run `body` under a task-metrics tally and return (result, executor
    * CPU seconds). The measurement host shows 10-90% hypervisor steal
    * (BASELINE.md §round-7), so wall-clock bounds here flake by 2-5×
    * run-to-run; executor CPU time counts actual cycles and is the
    * number the bounds below pin. The listener is JVM-global, so a
    * parallel suite's tasks could inflate the tally — inflation only
    * makes these upper bounds STRICTER, never masks a regression. */
  private def cpuTimed[A](body: => A): (A, Double) = {
    val tally = new graft.tools.ProfileQuery.Tally
    spark.sparkContext.addSparkListener(tally)
    try {
      val r = body
      Thread.sleep(1500) // listener settle
      (r, tally.cpuNs.get / 1e9)
    } finally spark.sparkContext.removeSparkListener(tally)
  }

  test("planesFor scales the bucket count with corpus size (clamped, monotone)") {
    assert(Similarity.planesFor(0) === 4)
    assert(Similarity.planesFor(500) === 4)
    // ≤ 131,072 rows (16 buckets of 8,192) stays at the historical
    // default of 4 planes — small-corpus behavior unchanged
    assert(Similarity.planesFor(8192L * 16) === 4)
    assert(Similarity.planesFor(rows) === 6) // 64 buckets at this spec's scale
    assert(Similarity.planesFor(2000000L) === 8) // 256
    assert(Similarity.planesFor(5000000L) === 10) // 1,024 at the BASELINE.md validation scale
    assert(Similarity.planesFor(100000000000L) === 20) // clamp caps probe fan-out
    val sizes = Seq(1L, 1000L, 100000L, 1000000L, 10000000L, 1000000000L)
    val planes = sizes.map(Similarity.planesFor(_))
    assert(planes === planes.sorted, s"planesFor must be monotone: $planes")
  }

  test("lshTopK at 400k rows: auto planes lift bucket cardinality past the fixed-16 ceiling") {
    graft.core.CacheGovernor.reset(spark)
    val (n, cpu) = cpuTimed {
      Similarity.lshTopK(queries, corpus,
        "vec_id", "embedding", "vec_id", "embedding", k = 5).count()
    }
    assert(n === 40L * 5)
    info(f"lshTopK at $rows rows: $cpu%.1f s executor CPU")
    // generous bound — catches an accidental O(n²) or single-bucket
    // collapse, not host jitter (measured ~8 s CPU on this corpus; a
    // degenerate pairwise plan lands orders of magnitude past it)
    assert(cpu <= 120.0, s"lshTopK burned $cpu s CPU at $rows rows")
    // the ceiling regression: derived 6 planes must spread the corpus
    // over ≥ 48 observed buckets (fixed nPlanes=4 ⇒ exactly ≤ 16)
    val nP = Similarity.planesFor(rows)
    val buckets = Similarity.normalizedView(corpus, "vec_id", "embedding")
      .select(Similarity.lshBucket(col("_v"), nP, dim).as("_b"))
      .agg(countDistinct(col("_b"))).head().getLong(0)
    assert(buckets >= 48, s"only $buckets distinct LSH buckets at $rows rows")
    graft.core.CacheGovernor.reset(spark)
  }

  test("bipartite exact near-dup at 200k x 100: exact pairs, wide stages, bounded shuffle") {
    graft.core.CacheGovernor.reset(spark)
    val aRows = 200000L
    val a = synthCorpus(aRows)
    // benchmark side: exact copies of corpus vectors 0..99 under a
    // disjoint id space — cross-side cos is exactly 1.0 for the copy
    // pairs; random quantized 8-dim vectors collide with cos >= 0.999
    // with probability ~0 over 20M pairs, so the expected count is exact
    val b = synthCorpus(100L).select(
      (col("vec_id") + 50000000L).as("vec_id"), col("embedding"))
    val tally = new graft.tools.ProfileQuery.Tally
    val stageTally = new graft.tools.ProfileQuery.StageTally
    spark.sparkContext.addSparkListener(tally)
    spark.sparkContext.addSparkListener(stageTally)
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(coalesceKey, "true")
    spark.conf.set(coalesceKey, "false")
    val n = try {
      val r = Similarity.nearDupPairsBetween(
        a, "vec_id", "embedding", b, "vec_id", "embedding",
        threshold = 0.999).count()
      Thread.sleep(1500) // listener settle
      r
    } finally {
      spark.conf.set(coalesceKey, prev)
      spark.sparkContext.removeSparkListener(tally)
      spark.sparkContext.removeSparkListener(stageTally)
    }
    val cpu = tally.cpuNs.get / 1e9
    val stats = stageTally.stages
    val shufW = stats.map(_.shufWrite).sum / 1048576.0
    info(f"nearDupPairsBetween at $aRows x 100: $cpu%.1f s executor CPU, " +
      f"$shufW%.1f MiB shuffle written")
    assert(n === 100L, s"expected the 100 planted copy pairs, got $n")
    // the cross-side compute is inherently O(|A|*|B|) dots — bounded,
    // and NEVER via a nested-loop or corpus self-join (PlanSpec gates
    // the registered query; this pins the scale shape)
    assert(cpu <= 180.0, s"bipartite near-dup burned $cpu s CPU")
    // parallelism gate: a small benchmark side legitimately broadcasts
    // (zero shuffle), but any stage that DOES read >=1MiB of shuffle
    // must be cluster-wide — a narrow hot stage here is the regression
    // that serializes the whole decontamination pass at 100 TB
    val narrow = stats.filter(s =>
      s.shufRead >= (1L << 20) &&
        s.numTasks < spark.sparkContext.defaultParallelism)
    assert(narrow.isEmpty,
      "narrow hot stage(s): " + narrow.map(s =>
        s"stage ${s.stageId}: ${s.numTasks} tasks, " +
          f"${s.shufRead / 1048576.0}%.1f MiB shuffle read").mkString("; "))
    // shuffle budget: the measured plan broadcasts the 100-row side
    // (0 MiB shuffled); if stats ever push the planner to a shuffle
    // join instead, the legitimate volume is one pass of the corpus
    // replicated over the SMALL side's block count (~14 MB here, since
    // blocksFor(100) = 1) — so the bound passes either legitimate plan
    // and catches only runaway replication (corpus x corpus grid, BNL)
    assert(stats.map(_.shufWrite).sum <= (64L << 20),
      f"bipartite near-dup shuffled $shufW%.1f MiB")
    graft.core.CacheGovernor.reset(spark)
  }

  test("materialized IVF at 200k rows: partitioned-by-cell layout, bounded search") {
    graft.core.CacheGovernor.reset(spark)
    // 200k is enough to exercise the KMeans passes, the cell-partitioned
    // write and the pruned probe read; the LSH test above carries the
    // parallelism-ceiling check (and BASELINE.md records the big-corpus
    // isolated validation)
    val ivfRows = 200000L
    val ivfCorpus = synthCorpus(ivfRows)
    val ivfQueries = ivfCorpus.filter(col("vec_id") < 40)
    val path = java.nio.file.Files
      .createTempDirectory("graft-ivf-scale").toString
    try {
      val (_, cpuBuild) = cpuTimed {
        Similarity.writeIvfIndex(ivfCorpus, "vec_id", "embedding", path,
          nCells = 32, maxIter = 2)
      }
      info(f"IVF index build at $ivfRows rows: $cpuBuild%.1f s executor CPU")
      assert(cpuBuild <= 240.0, s"index build burned $cpuBuild s CPU at $ivfRows rows")
      // the inverted file IS the layout: partitioned by cell so each
      // probe reads only its cells' files
      val cellDirs = new java.io.File(s"$path/assigned/b0")
        .listFiles().filter(_.getName.startsWith("_cell=")).map(_.getName)
      assert(cellDirs.length === 32, s"expected 32 cell partitions, got ${cellDirs.length}")
      val (found, cpuQ) = cpuTimed {
        Similarity.ivfTopKFrom(spark, path, ivfQueries,
          "vec_id", "embedding", k = 5, nProbe = 4).count()
      }
      assert(found === 40L * 5)
      info(f"IVF search at $ivfRows rows: $cpuQ%.1f s executor CPU")
      assert(cpuQ <= 120.0, s"IVF search burned $cpuQ s CPU at $ivfRows rows")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
      graft.core.CacheGovernor.reset(spark)
    }
  }
}
