package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** PageRank (Page et al. 1999) — the influence-ranking member of the
  * graph family next to [[Components]]' connected components: which
  * entities does the interaction graph actually center on (the NOC
  * "root cause correlation" ranking — reference README.md:96 — and the
  * corpus-side link/citation authority score).
  *
  * Fixed-iteration damped form, one rank table of one row per node:
  *
  *   rank₀(n) = 1
  *   rankₜ₊₁(n) = (1−d) + d · Σ_{(s→n) ∈ E} rankₜ(s) / outdeg(s)
  *
  * Dangling mass is NOT redistributed (the "leak" convention — ranks
  * then satisfy Σ rank ≤ N with equality iff no dangling nodes; the
  * spec asserts the conservation identity explicitly so the convention
  * can't drift silently).
  *
  * Scale shape: the iterative-driver contract (KMeans/IVF/BPE/CC
  * discipline) — k rounds, each ONE edge-sized equi-join plus a
  * map-side-combinable groupBy on dst; the rank table localCheckpoints
  * per round (bounded lineage). No driver-side data, no windows, no
  * cartesian.
  *
  * Oracle parity: a distributed float Σ is order-nondeterministic, so
  * each contribution rounds to 9 dp and sums as EXACT DECIMAL (the
  * BM25/CUSUM discipline); the damping update is then one
  * deterministic double expression per node per round. Both engines
  * replay every round bit-identically — the oracle UNROLLS the k
  * iterations as chained CTEs rather than trusting recursive-CTE
  * aggregation. */
object PageRank {

  /** (node, rank) after `iterations` rounds over directed `edges`.
    * Nodes = every distinct src or dst. Parallel edges collapse first
    * (rank flows once per distinct edge — document multi-edges by
    * pre-aggregating a weight column upstream if needed). */
  def ranks(
      edges: DataFrame, src: String, dst: String,
      iterations: Int, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    require(damping > 0 && damping < 1, "damping must be in (0, 1)")
    val e = edges.select(col(src).cast("string").as("_s"),
      col(dst).cast("string").as("_d")).distinct()
      .localCheckpoint(false)
    val outdeg = e.groupBy("_s").agg(count(lit(1)).as("_od"))
    val nodes = e.select(col("_s").as("node"))
      .union(e.select(col("_d").as("node"))).distinct()
      .localCheckpoint(false)
    var rank = nodes.withColumn("rank", lit(1.0))
    (1 to iterations).foreach { _ =>
      val contrib = e
        .join(rank.withColumnRenamed("node", "_s"), "_s")
        .join(outdeg, "_s")
        .select(col("_d").as("node"),
          round(col("rank") / col("_od"), 9).cast(DecimalType(27, 9)).as("_c"))
        .groupBy("node")
        .agg(sum(col("_c")).cast("double").as("_in"))
      rank = nodes
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(1.0 - damping) + lit(damping) * coalesce(col("_in"), lit(0.0)))
            .as("rank"))
        .localCheckpoint(false)
    }
    rank
  }

  /** The oracle SQL for [[ranks]] with the iterations UNROLLED as
    * chained CTEs — generated here so the Spark loop and the SQL can
    * never drift apart. `edgeCte` must define `e(src, dst)` (distinct
    * directed edges). */
  def oracleSql(edgeCte: String, iterations: Int, damping: Double): String = {
    val d = damping
    val iters = (1 to iterations).map { t =>
      s"""r$t AS (
         |  SELECT n.node,
         |         CAST(${1.0 - d} AS DOUBLE) + CAST($d AS DOUBLE) *
         |           CAST(COALESCE(c.s, 0) AS DOUBLE) AS rank
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node,
         |           SUM(CAST(ROUND(r.rank / o.od, 9) AS DECIMAL(27,9))) AS s
         |    FROM e JOIN r${t - 1} r ON r.node = e.src
         |         JOIN outd o ON o.src = e.src
         |    GROUP BY e.dst) c ON c.node = n.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH $edgeCte,
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |outd AS (SELECT src, COUNT(*) AS od FROM e GROUP BY src),
       |r0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS rank FROM nodes),
       |$iters
       |SELECT node, rank FROM r$iterations ORDER BY node""".stripMargin
  }
}
