package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scale smoke for the text-dedup bipartite path (round 8), mirroring
  * SimilarityScaleSpec's contract for ANN: a six-figure synthetic corpus
  * (generated from xxhash64, never stored) driven through
  * [[Dedup.minHashPairsBetween]] once, with an executor-CPU upper bound
  * (steal-immune) and an EXACT expected pair count — the count doubles
  * as the candidate-distinctness gate, because duplicate candidates
  * surviving the skip-earlier-bands filter would duplicate verified
  * pairs and inflate the expansion.
  */
class DedupScaleSpec extends AnyFunSuite {
  import TestSession.spark

  // 150k corpus docs in 1,500 identical-set families of 100 (the
  // collapse core must shrink 150k docs to 1,500 reps before any
  // banding); 200 bench docs, each sharing its family's exact token set
  // with families 0..199 — identical sets band-collide with probability
  // 1, so the expected cross-side pair count is exactly 200 × 100.
  private val families = 1500L
  private val perFamily = 100L
  private val benchDocs = 200L

  private def textOf(famSql: String) =
    expr(s"array_join(transform(sequence(0, 11), " +
      s"j -> concat('t', pmod(xxhash64($famSql, j), 5000))), ' ')")

  private lazy val corpus = spark.range(families * perFamily).select(
    col("id").as("doc_id"),
    textOf(s"id div $perFamily").as("text"))

  private lazy val bench = spark.range(benchDocs).select(
    (col("id") + 10000000L).as("doc_id"), // disjoint id space
    textOf("id").as("text"))

  /** Run `body` under task- and stage-level tallies with AQE partition
    * coalescing OFF (coalescing legitimately narrows small local
    * shuffles by data size; the property under test is the PLAN's
    * partitioning, which is what survives a 1000-executor cluster).
    * Returns (result, executor CPU s, per-stage stats). */
  private def gauged[A](body: => A): (A, Double, Seq[graft.tools.ProfileQuery.StageStat]) = {
    val tally = new graft.tools.ProfileQuery.Tally
    val stageTally = new graft.tools.ProfileQuery.StageTally
    spark.sparkContext.addSparkListener(tally)
    spark.sparkContext.addSparkListener(stageTally)
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(coalesceKey, "true")
    spark.conf.set(coalesceKey, "false")
    try {
      val r = body
      Thread.sleep(1500) // listener settle
      (r, tally.cpuNs.get / 1e9, stageTally.stages)
    } finally {
      spark.conf.set(coalesceKey, prev)
      spark.sparkContext.removeSparkListener(tally)
      spark.sparkContext.removeSparkListener(stageTally)
    }
  }

  /** The 100×-parallelism gate: every stage that READS real shuffle
    * data must run at least as wide as the cluster. The healthy plans
    * here shuffle ONLY collapsed rep-level frames — measured 170 KB for
    * the 150k-doc collapse exchange and 40 KB for the component window
    * exchange (both lz4-compressed) — while the final one-task
    * count/collect stages read < 1 KB, so 16 KiB separates "carries
    * data the plan must distribute" from "scalar finalization". On
    * local[8] a violation means the plan itself narrowed
    * (single-partition window, repartition(1), global sort) — the class
    * of regression that turns into a one-straggler job on 1000
    * executors. */
  private def assertWideHotStages(
      stats: Seq[graft.tools.ProfileQuery.StageStat], what: String): Unit = {
    val wide = stats.filter(_.shufRead >= (16L << 10))
    assert(wide.nonEmpty, s"$what: no stage read >=16KiB shuffle — fixture too small")
    val narrow = wide.filter(_.numTasks < spark.sparkContext.defaultParallelism)
    assert(narrow.isEmpty,
      s"$what: narrow hot stage(s) " +
        narrow.map(s => s"stage ${s.stageId}: ${s.numTasks} tasks, " +
          f"${s.shufRead / 1024.0}%.1f KiB shuffle read").mkString("; "))
  }

  test("bipartite minhash at 150k docs: exact pair count, bounded CPU, wide stages") {
    graft.core.CacheGovernor.reset(spark)
    val (n, cpu, stats) = gauged {
      Dedup.minHashPairsBetween(
        corpus, "doc_id", "text", bench, "doc_id", "text").count()
    }
    val shufW = stats.map(_.shufWrite).sum / 1048576.0
    info(f"minHashPairsBetween at ${families * perFamily} corpus docs: " +
      f"$cpu%.1f s executor CPU, $shufW%.1f MiB shuffle written")
    // every bench doc matches its family's 100 identical-set corpus
    // members (J=1, guaranteed collision); any candidate duplication or
    // missed collapse changes this count
    assert(n === benchDocs * perFamily,
      s"expected ${benchDocs * perFamily} cross-side pairs, got $n")
    // generous work bound: a degenerate corpus×corpus or uncollapsed
    // plan lands orders of magnitude past this (measured ~15-25 s)
    assert(cpu <= 180.0, s"bipartite pass burned $cpu s CPU")
    assertWideHotStages(stats, "minHashPairsBetween")
    // shuffle volume stays O(collapsed reps), never O(raw corpus):
    // map-side combine collapses each family inside its scan partition,
    // so the only real exchange is ~8 partitions x 1,500 reps (measured
    // 0.2 MiB total, compressed). Re-shuffling the raw 150k-doc text
    // (~12 MB raw, >=3 MiB compressed) or an uncollapsed band join
    // blows this bound immediately.
    assert(stats.map(_.shufWrite).sum <= (2L << 20),
      f"bipartite pass shuffled $shufW%.1f MiB")
    graft.core.CacheGovernor.reset(spark)
  }

  test("fuzzy ER at 100k keys: expected pair count, bounded CPU, wide stages") {
    graft.core.CacheGovernor.reset(spark)
    // 50k groups × 2 rows: key A_g = 16 random hex chars (from xxhash64),
    // key B_g = A_g with the last char replaced — exactly one edit apart.
    // Any OTHER pair within one edit needs two 16-char random hex strings
    // agreeing on ≥15 positions: P ≈ 16·16⁻¹⁵ per pair, ~4·10⁻⁸ expected
    // over all ~5·10⁹ pairs — so the count is groups + (0, rarely 1).
    val groups = 50000L
    val keys = spark.range(2 * groups).select(
      col("id"),
      expr(s"""concat(
        substring(format_string('%016x', xxhash64(id % $groups)), 1, 15),
        CASE WHEN id < $groups
             THEN substring(format_string('%016x', xxhash64(id % $groups)), 16, 1)
             ELSE '!' END)""").as("name"))
    // at THIS fixture size Spark legitimately broadcasts the exploded
    // side (zero shuffle); the property under test is the plan that
    // survives when both sides are cluster-scale, so force the shuffle
    // form the way the coalescing-off toggle forces plan-width
    val bcKey = "spark.sql.autoBroadcastJoinThreshold"
    val prevBc = spark.conf.get(bcKey)
    spark.conf.set(bcKey, "-1")
    val (n, cpu, stats) =
      try gauged {
        graft.operators.FuzzyJoin.editDistancePairs(keys, col("id"), col("name")).count()
      } finally spark.conf.set(bcKey, prevBc)
    val shufW = stats.map(_.shufWrite).sum / 1048576.0
    info(f"editDistancePairs at ${2 * groups} keys: $n pairs, " +
      f"$cpu%.1f s executor CPU, $shufW%.1f MiB shuffle written")
    assert(n >= groups && n <= groups + 4,
      s"expected ~$groups A↔B pairs, got $n")
    // degenerate plans (cartesian verify, missing first-variant dedup)
    // land orders of magnitude past these
    assert(cpu <= 120.0, s"fuzzy ER burned $cpu s CPU")
    assertWideHotStages(stats, "editDistancePairs")
    // the shuffle is O(keys × (L+1) variants) carrying (id, key, variant
    // set) — ~1.7 M exploded rows per side here; an O(n²) candidate
    // blow-up or a pair-dedup exchange over duplicated candidates lands
    // far beyond this
    assert(stats.map(_.shufWrite).sum <= (600L << 20),
      f"fuzzy ER shuffled $shufW%.1f MiB")
    graft.core.CacheGovernor.reset(spark)
  }

  test("clusters from a stored 150k-doc relation: wide stages, bounded shuffle") {
    graft.core.CacheGovernor.reset(spark)
    val path = java.nio.file.Files
      .createTempDirectory("graft-scale-rel").toString
    try {
      Dedup.writeMinHashRelation(corpus, "doc_id", "text", path)
      val (n, cpu, stats) = gauged {
        Dedup.minHashClustersFrom(spark, path).count()
      }
      val shufW = stats.map(_.shufWrite).sum / 1048576.0
      info(f"minHashClustersFrom at ${families * perFamily} docs: " +
        f"$cpu%.1f s executor CPU, $shufW%.1f MiB shuffle written")
      // every doc belongs to its identical-set family's cluster of 100
      // (families share no cross-edges: token sets are random per family)
      assert(n === families * perFamily,
        s"expected ${families * perFamily} clustered docs, got $n")
      assert(cpu <= 180.0, s"cluster closure burned $cpu s CPU")
      assertWideHotStages(stats, "minHashClustersFrom")
      // the closure shuffles the narrow (_fp, _id) member map and the
      // per-component window only — O(members), never O(text): measured
      // 0.2 MiB total (the 150k-row window exchange compresses to
      // ~40 KB; ids are sequential and fingerprints repeat per family)
      assert(stats.map(_.shufWrite).sum <= (2L << 20),
        f"cluster closure shuffled $shufW%.1f MiB")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(path)).deleteRecursively()
      graft.core.CacheGovernor.reset(spark)
    }
  }
}
