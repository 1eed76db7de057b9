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
  * discipline) — and the EDGES NEVER RE-SHUFFLE OR RE-SORT: the edge
  * table (out-degree attached) is cached once, and each round
  * BROADCASTS the node-sized rank vector onto it, then ships map-side
  * partial sums into the groupBy(dst). Per round that is O(nodes)
  * traffic, not O(edges) — the naive checkpoint-and-rejoin form
  * measured 96 s CPU / 224 MiB shuffle on the sf0.1 graph; this shape
  * (cached graph-sized layout + broadcast rank + node-side rounding +
  * long-backed decimal agg) runs the same 10 rounds in 9.9 s / 13.5
  * MiB (BASELINE.md round 10). The rank vector is PageRank's entire state;
  * it broadcasts comfortably to ~10⁸ nodes, and past
  * `broadcastNodeLimit` the loop AUTOMATICALLY switches to the
  * co-partitioned escape hatch: edges cached pre-hashed on `_s`,
  * per-round shuffle-hash joins that move only the node-sized rank /
  * out-degree / contribution tables (PageRankSpec pins both paths
  * bit-identical). The rank table localCheckpoints per round (bounded
  * lineage). No driver-side data, no windows, no cartesian.
  *
  * Oracle parity: a distributed float Σ is order-nondeterministic, so
  * each contribution quantizes to INTEGER NANO-UNITS — floor(rank·10⁹
  * / outdeg) as a long — and sums exactly (floor is tie-free on
  * identical IEEE inputs, unlike 9-dp ROUND, whose half-up ties broke
  * cross-engine at sf0.1; long nano-units cap at ~9.2·10¹⁸, i.e.
  * ~10⁹ nodes of incoming mass per destination). The damping update is
  * then one deterministic double expression per node per round. Both
  * engines replay every round bit-identically — the oracle UNROLLS the
  * k iterations as chained CTEs rather than trusting recursive-CTE
  * aggregation. */
object PageRank {

  /** (node, rank) after `iterations` rounds over directed `edges`.
    * Nodes = every distinct src or dst. Parallel edges collapse first
    * (rank flows once per distinct edge — document multi-edges by
    * pre-aggregating a weight column upstream if needed).
    *
    * @param broadcastNodeLimit rank vectors up to this many nodes ship
    *        per round as a broadcast onto the cached edge layout (the
    *        fast path — zero edge movement); past it the SAME algebra
    *        runs as co-partitioned shuffle-hash joins with the edges
    *        cached pre-hashed on `_s`, so only the node-sized tables
    *        move per round. Both paths are bit-identical (the nano-unit
    *        quantization is exact either way; PageRankSpec pins parity).
    *        0 forces the shuffled path (used by the parity spec). */
  def ranks(
      edges: DataFrame, src: String, dst: String,
      iterations: Int, damping: Double = 0.85,
      broadcastNodeLimit: Long = 100000000L): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    require(damping > 0 && damping < 1, "damping must be in (0, 1)")
    // the edge table (with its source's out-degree attached) is cached
    // ONCE and never moves again: every round broadcasts the NODE-sized
    // rank vector onto it (explicit hint — a checkpointed rank has no
    // stats, and without the hint the planner falls back to
    // sorting+shuffling the edges every round: measured 224 MiB / 85 s
    // CPU for the 1.2M-edge sf0.1 graph vs ~4 s this way). The rank
    // vector is PageRank's whole state — broadcastable up to ~10⁸
    // nodes; beyond that the escape hatch is a co-partitioned
    // shuffled-hash join on the cached edge layout, same algebra.
    // ALL three static tables cache — the loop body must never
    // recompute a corpus-sized distinct/aggregate inside a broadcast
    // job (an uncached out-degree table re-shuffled the edge set every
    // round: measured as the entire 90 MiB / 80 s CPU overhead)
    // node ids keep their native type — numeric keys join and hash
    // measurably leaner than strings at this per-round frequency
    // the dedup shuffle runs ONCE: the distinct caches first, the
    // sizing count reads the cache, and the repartitioned copy derives
    // from the cache (counting the uncached frame would execute the
    // O(edges) distinct twice)
    val eRaw = graft.core.CacheGovernor.persistTracked(
      edges.select(col(src).as("_s"), col(dst).as("_d")).distinct())
    // size the cached layout to the GRAPH, not the session default:
    // every round scans these partitions ~2×, and on a small graph
    // 32-wide stages spend more CPU on per-task constants than on rank
    // flow; ~250k edges per partition keeps task overhead ~2% of task
    // work at any scale (0.25 s of flow vs ~5 ms of setup)
    val nEdges = eRaw.count()
    val nParts = math.max(2L, nEdges / 250000L + 1L).toInt
    // the node table caches (and counts) FIRST: its size decides the
    // per-round join regime before the cached edge layout is fixed.
    // The broadcast path wants the edges PRE-HASHED ON `_d`: the
    // per-round groupBy(_d) then reuses the cached partitioning and
    // the round body has ZERO exchanges (the rank vector broadcasts,
    // the aggregation is partition-local) — this removes the
    // partial-combine transition the g-scale curve measured (per-round
    // shuffle grew 18× at 10× data through the round-robin layout's
    // map-side-combine). The one risk is IN-DEGREE skew: a hub dst
    // concentrates its whole inbound edge set in one partition every
    // round, so the layout is chosen by MEASUREMENT — one extra
    // O(edges) max-indegree aggregation, once — and a graph whose
    // hottest dst would overload its partition (> 4× the mean load)
    // keeps the skew-free round-robin layout + per-round exchange of
    // map-side-combined partials instead. The shuffled fallback wants
    // the edges PRE-HASHED on _s so each round's rank⋈edge join moves
    // only the node-sized side.
    val nodesBase = eRaw.select(col("_s").as("node"))
      .union(eRaw.select(col("_d").as("node"))).distinct()
    // nodes ≤ 2·edges, so a graph whose edge count already fits the
    // limit skips the exact node count — one fewer serial setup action
    // (the loop is latency-bound at ~1 job/round; r20, guide §2.6)
    val useBroadcast = 2 * nEdges <= broadcastNodeLimit ||
      nodesBase.count() <= broadcastNodeLimit
    val dstHashSafe = useBroadcast && nEdges > 0 && {
      // nEdges == 0 skips the measurement entirely: max() over an
      // empty edge set returns NULL and getLong would NPE before the
      // degenerate-graph paths below ever ran
      val maxIndeg = eRaw.groupBy("_d").agg(count(lit(1)).as("_c"))
        .agg(max(col("_c"))).head().getLong(0)
      maxIndeg <= math.max(1L, 4L * nEdges / nParts)
    }
    // the dst-hashed regime keeps the node table CO-PARTITIONED with
    // the cached edge layout (hash(node) ≡ hash(_d), same count): the
    // per-round rank update then joins the partition-local contribution
    // aggregate shuffle-hash with ZERO exchanges and, more importantly,
    // without a second per-round broadcast barrier — each round is ONE
    // broadcast job (the rank vector) instead of two (r20, guide §2.4)
    val nodes = graft.core.CacheGovernor.persistTracked(
      if (dstHashSafe) nodesBase.repartition(nParts, col("node"))
      else nodesBase)
    val e = graft.core.CacheGovernor.persistTracked(
      if (dstHashSafe) eRaw.repartition(nParts, col("_d"))
      else if (useBroadcast) eRaw.repartition(nParts)
      else eRaw.repartition(nParts, col("_s")))
    val outdegN = graft.core.CacheGovernor.persistTracked(
      e.groupBy("_s").agg(count(lit(1)).as("_od")))
    // hint factory for the node-sized side of each per-round join:
    // broadcast under the limit, shuffle-hash past it (sort-merge would
    // re-sort the cached edge partitions every round for nothing —
    // the aggregation downstream doesn't need sorted output)
    def nodeSized(df: DataFrame): DataFrame =
      if (useBroadcast) broadcast(df) else df.hint("shuffle_hash")
    var rank = nodes.withColumn("rank", lit(1.0))
    (1 to iterations).foreach { _ =>
      // the rounded per-SOURCE contribution is computed on the
      // node-sized table (16k BigDecimal roundings per round, not one
      // per edge), and the per-edge aggregate sums the nano-unit longs
      // as DECIMAL(18,0) → DECIMAL(28,0): exact at any graph size (the
      // earlier raw-BIGINT sum silently wrapped past ~9.2e18 nano-units
      // ≈ 10⁹ rank units of incoming mass per destination — DuckDB's
      // HUGEINT sum doesn't, so the wrap regime was also a cross-engine
      // divergence). Decimal(28) aggregation buffers stay in whole-stage
      // codegen; measured CPU delta on the sf0.1 graph is noise-level.
      val w = rank.withColumnRenamed("node", "_s")
        .join(nodeSized(outdegN), "_s")
        .select(col("_s"),
          floor(col("rank") * lit(1e9) / col("_od")).cast("long").as("_c"))
      // grouping by the BARE `_d` attribute (aliasing after the agg):
      // the dst-hashed cached layout then satisfies the aggregation's
      // required distribution outright — no exchange in the round body
      val contrib = e
        .join(nodeSized(w), "_s")
        .groupBy(col("_d"))
        .agg((sum(col("_c").cast(DecimalType(18, 0))).cast("double") / lit(1e9))
          .as("_in"))
        .select(col("_d").as("node"), col("_in"))
      // dst-hashed regime: contrib inherits hash(_d → node, nParts)
      // from the cached edge layout and nodes is cached on the same
      // key, so the left join is exchange-free shuffle-hash — no
      // broadcast(contrib) barrier per round
      rank = (if (dstHashSafe)
        nodes.join(contrib.hint("shuffle_hash"), Seq("node"), "left")
      else nodes.join(nodeSized(contrib), Seq("node"), "left"))
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
         |           COALESCE(c.s, CAST(0 AS DOUBLE)) AS rank
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node,
         |           CAST(SUM(CAST(FLOOR(r.rank * 1000000000.0 / o.od) AS BIGINT))
         |             AS DOUBLE) / 1000000000.0 AS s
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
