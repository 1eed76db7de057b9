package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the step that
  * turns near-duplicate PAIRS into duplicate CLUSTERS so a pipeline can
  * keep one canonical document per cluster.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC 2014). State is
  * only the current edge list — no adjacency materialization, no
  * driver-side graph — so the shape holds at billions of edges.
  * Convergence is O(log² n) rounds worst-case and a handful in practice
  * on dedup graphs (near-cliques).
  *
  * Cost shape: each star step is ONE hash exchange + per-partition sort
  * (both neighborhood minima come from a window over the node key — no
  * groupBy-plus-self-join), a round runs as a single job whose action
  * is the convergence signature, and no round runs `distinct` — the
  * transforms are multiset-safe (bounded by |edges| + #nodes) and the
  * small-star self-edge emission canonicalizes the fixpoint on its own.
  *
  * Each round `localCheckpoint`s its edge list: the lineage MUST
  * truncate every round — the star transforms reference the previous
  * frame multiple times, so an uncheckpointed loop grows the logical
  * plan exponentially (plan-string generation alone OOMs near round
  * 10). Superseded rounds' blocks are freed by the context cleaner once
  * their frames go out of scope. On a real cluster prefer a reliable
  * `checkpoint` dir if executor loss mid-computation must be
  * recoverable; the algorithm itself restarts cheaply from the input.
  */
object Components {

  /** Per-node component labels for an edge list.
    *
    * @param edges any orientation, duplicates and self-loops tolerated
    * @param src   long-castable node id column
    * @param dst   long-castable node id column
    * @return (node: long, comp: long) — comp is the MINIMUM node id
    *         reachable from `node`; one row per node that appears in at
    *         least one edge (isolated nodes are their own components and
    *         never enter the edge list — callers union them if needed)
    */
  def connectedComponents(
      edges: DataFrame, src: String, dst: String, maxIter: Int = 30): DataFrame = {
    var e = edges
      .select(col(src).cast("long").as("u"), col(dst).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .localCheckpoint(false)
    // Right-size tiny graphs: localCheckpoint PINS the frame's
    // partitioning, and every subsequent round re-scans those
    // partitions — a 20k-node typo graph inherited 32 near-empty
    // partitions from the candidate join and burned ~54 s executor CPU
    // in pure task overhead across the fixpoint's stages (measured,
    // BASELINE.md). The count is an O(1)-ish action on the
    // already-materialized checkpoint; big graphs (where wide rounds
    // are the point) keep their width.
    val parallelism = e.sparkSession.sparkContext.defaultParallelism
    val nEdges = e.count()
    val rightSize = math.max(2, math.min(parallelism,
      (nEdges / 250000L).toInt * 4 + 2))
    if (nEdges < 250000L * parallelism &&
        rightSize < e.rdd.getNumPartitions)
      e = e.repartition(rightSize).localCheckpoint(false)
    // sentinel: round 1 always runs and its signature both materializes
    // the round and seeds the fixpoint test — the raw input needs no
    // action of its own
    var sig = (-1L, BigDecimal(-1))
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val next = smallStar(largeStar(e)).localCheckpoint(false)
      val nextSig = signature(next) // the round's single action
      e = next
      converged = nextSig == sig
      sig = nextSig
      it += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds")
    // fixpoint is a set of stars: every edge is (member, root). Roots
    // appear only on the v side; they label themselves.
    val members = e.select(col("u").as("node"), col("v").as("comp"))
    val roots = e.select(col("v").as("node")).distinct()
      .withColumn("comp", col("node"))
    members.unionByName(roots)
  }

  /** Large-star: every node connects its LARGER neighbors to the
    * minimum of its closed neighborhood. Output oriented u > v. The
    * minimum is a partition-window aggregate over the symmetrized edge
    * list — one exchange, no join. */
  private def largeStar(e: DataFrame): DataFrame = {
    val und = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
    und
      .withColumn("_m", least(col("u"), min(col("v")).over(Window.partitionBy("u"))))
      .filter(col("v") > col("u")) // emitted (v, _m) has v > u ≥ _m: still oriented
      .select(col("v").as("u"), col("_m").as("v"))
  }

  /** Small-star: every node connects its smaller neighborhood (all of
    * it, under the u > v orientation [[largeStar]] guarantees) plus
    * itself to that neighborhood's minimum. Same single-exchange window
    * shape; `row_number` picks one row per node to carry the self-edge,
    * which is also what canonicalizes duplicates at the fixpoint. */
  private def smallStar(e: DataFrame): DataFrame = {
    val byU = Window.partitionBy("u")
    val s = e
      .withColumn("_m", min(col("v")).over(byU))
      .withColumn("_rn", row_number().over(byU.orderBy("v")))
    val neigh = s.filter(col("v") =!= col("_m"))
      .select(col("v").as("u"), col("_m").as("v"))
    val self = s.filter(col("_rn") === 1)
      .select(col("u"), col("_m").as("v"))
    neigh.unionByName(self)
  }

  /** Oracle SQL replaying [[connectedComponents]]' labels with the
    * fixpoint UNROLLED as `rounds` min-label-propagation rounds — the
    * same generated-from-the-loop-code discipline as
    * [[PageRank.oracleSql]]. A recursive-CTE transitive closure walks
    * O(n·component-size) states and was unevaluatable in DuckDB at
    * bench scale (>100 CPU-min at sf0.1, the registry's one excluded
    * row through round 10); label propagation is O(|e|) per round, and
    * each round ALSO pointer-jumps (comp := comp of comp), so k rounds
    * cover components of diameter ~2^k. Every CTE is MATERIALIZED —
    * each round references the previous one three times, and without
    * materialization DuckDB re-evaluates the whole chain per reference
    * (measured: 222 s at 500 docs for the plain-CTE form vs ~3 s
    * materialized).
    *
    * Correctness does not rest on picking `rounds` big enough by luck:
    * the emitted `converged` column is TRUE iff the last two rounds
    * agree on every label — propagation at a fixpoint means every
    * node's label ≤ all neighbors' labels, which over the symmetrized
    * edge list forces labels constant per component and equal to the
    * component minimum (the Spark side's comp). An under-unrolled
    * oracle therefore emits FALSE and fails the hash loudly instead of
    * silently certifying partial labels; Spark emits literal TRUE
    * because [[connectedComponents]] throws on non-convergence.
    *
    * @param pairCte CTE text defining `p(u, v)` (undirected pairs, any
    *                orientation, u ≠ v)
    * @return SQL yielding (doc_id, cluster_rep, cluster_size, converged)
    *         for every node that appears in at least one pair */
  def labelPropOracleSql(pairCte: String, rounds: Int): String = {
    require(rounds >= 2, "need ≥2 rounds for the convergence self-check")
    val iters = (1 to rounds).map { k =>
      s"""h$k AS MATERIALIZED (
         |  SELECT n.node, LEAST(n.comp, COALESCE(m.mn, n.comp)) AS comp
         |  FROM r${k - 1} n LEFT JOIN (
         |    SELECT e.u AS node, MIN(r.comp) AS mn
         |    FROM e JOIN r${k - 1} r ON r.node = e.v GROUP BY e.u) m
         |  ON m.node = n.node),
         |r$k AS MATERIALIZED (
         |  SELECT h.node, LEAST(h.comp, COALESCE(h2.comp, h.comp)) AS comp
         |  FROM h$k h LEFT JOIN h$k h2 ON h2.node = h.comp)""".stripMargin
    }.mkString(",\n")
    s"""WITH $pairCte,
       |e AS MATERIALIZED (SELECT u, v FROM p UNION SELECT v, u FROM p),
       |r0 AS MATERIALIZED (SELECT DISTINCT u AS node, u AS comp FROM e),
       |$iters,
       |conv AS (SELECT COUNT(*) = 0 AS fx
       |         FROM r$rounds a JOIN r${rounds - 1} b
       |           ON a.node = b.node AND a.comp <> b.comp)
       |SELECT a.node AS doc_id, a.comp AS cluster_rep,
       |       CAST(COUNT(*) OVER (PARTITION BY a.comp) AS BIGINT) AS cluster_size,
       |       conv.fx AS converged
       |FROM r$rounds a CROSS JOIN conv ORDER BY doc_id""".stripMargin
  }

  /** Order-independent multiset signature of an edge list, used as the
    * fixpoint test: (count, sum of per-edge hashes folded into
    * Z_(2³¹−1)). The sum accumulates as DECIMAL(38,0) — headroom for
    * ~10²⁸ edges, so it cannot overflow under ANSI mode at any scale
    * the operator claims. Both star steps are identity exactly on
    * star-shaped edge sets, so signature equality (modulo a ~2⁻⁶⁰
    * collision) means the stars are final. */
  private def signature(e: DataFrame): (Long, BigDecimal) = {
    val r = e.agg(
      count(lit(1)),
      coalesce(
        sum(pmod(xxhash64(col("u"), col("v")), lit(2147483647L))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0))),
        lit(0).cast(org.apache.spark.sql.types.DecimalType(38, 0)))).head()
    (r.getLong(0), BigDecimal(r.getDecimal(1)))
  }
}
