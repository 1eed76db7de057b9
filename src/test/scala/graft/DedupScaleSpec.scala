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

  private def cpuTimed[A](body: => A): (A, Double) = {
    val tally = new graft.tools.ProfileQuery.Tally
    spark.sparkContext.addSparkListener(tally)
    try {
      val r = body
      Thread.sleep(1500) // listener settle
      (r, tally.cpuNs.get / 1e9)
    } finally spark.sparkContext.removeSparkListener(tally)
  }

  test("bipartite minhash at 150k docs: exact pair count, bounded CPU") {
    graft.core.CacheGovernor.reset(spark)
    val (n, cpu) = cpuTimed {
      Dedup.minHashPairsBetween(
        corpus, "doc_id", "text", bench, "doc_id", "text").count()
    }
    info(f"minHashPairsBetween at ${families * perFamily} corpus docs: $cpu%.1f s executor CPU")
    // every bench doc matches its family's 100 identical-set corpus
    // members (J=1, guaranteed collision); any candidate duplication or
    // missed collapse changes this count
    assert(n === benchDocs * perFamily,
      s"expected ${benchDocs * perFamily} cross-side pairs, got $n")
    // generous work bound: a degenerate corpus×corpus or uncollapsed
    // plan lands orders of magnitude past this (measured ~15-25 s)
    assert(cpu <= 180.0, s"bipartite pass burned $cpu s CPU")
    graft.core.CacheGovernor.reset(spark)
  }
}
