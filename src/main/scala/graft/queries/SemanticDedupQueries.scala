package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Semantic-dedup (SemDeDup, N105) queries (split out of
  * TextVectorQueries in round 16): the batch prune, the incremental
  * crash-atomic keeper index, and its streaming ingestion ledger —
  * all on the exact-integer Lloyd geometry with whole-history DuckDB
  * replays. */
object SemanticDedupQueries {

  /** SemDeDup ([[graft.operators.SemanticDedup.prune]]): exact-replay
    * Lloyd clustering (the q_sim_ivf_lloyd geometry — hash-seeded
    * init, two integer assign/floor-mean rounds, empty-cell carryover)
    * followed by the paper's within-cluster prune: priority =
    * distance-to-final-centroid DESC (ties by id), a document is a
    * duplicate iff ANY higher-priority cluster member sits within eps
    * cosine (upper-triangular rule — no transitive closure). The
    * oracle unrolls the full geometry and replays priority + prune —
    * the ENTIRE semantic-dedup decision, clustering included,
    * hash-certifies: id, cell, in-cell priority, verdict and the
    * shadowing keeper all match bit-for-bit. nCells is AUTO-DIALED
    * from the corpus count (k = ⌊√n⌋ — the fixed-budget optimum; the
    * paper's own dial is nCells ∝ corpus), and the oracle derives the
    * same k from COUNT(*), so the dial itself is inside the hash
    * gate. */
  private val dedupSemantic = QuerySpec(
    "q_dedup_semantic",
    """WITH c AS (SELECT vec_id AS c_id, embedding::DOUBLE[] AS cv FROM embeddings),
      |nk AS (SELECT GREATEST(1, CAST(floor(sqrt(COUNT(*))) AS BIGINT)) AS k FROM c),
      |cq AS (SELECT c_id, cv,
      |         list_transform(cv, x -> CAST(floor((x / sqrt(list_dot_product(cv, cv)) + 2.0) * 1048576.0) AS BIGINT)) AS qx
      |       FROM c),
      |cqq AS (SELECT c_id, cv, qx,
      |          list_dot_product(qx::DOUBLE[], qx::DOUBLE[]) AS qq FROM cq),
      |cent0 AS (SELECT cell, qc FROM (
      |            SELECT CAST(ROW_NUMBER() OVER (
      |              ORDER BY ('0x' || substr(md5(c_id::VARCHAR), 1, 15))::BIGINT, c_id) - 1 AS BIGINT) AS cell,
      |              qx AS qc
      |            FROM cq) z
      |          WHERE cell < (SELECT k FROM nk)),
      |asg1 AS (SELECT c_id, cell, qx FROM (
      |  SELECT t.c_id, ct.cell, t.qx,
      |         ROW_NUMBER() OVER (PARTITION BY t.c_id ORDER BY
      |           t.qq + list_dot_product(ct.qc::DOUBLE[], ct.qc::DOUBLE[])
      |             - 2 * list_dot_product(t.qx::DOUBLE[], ct.qc::DOUBLE[]), ct.cell) AS rn
      |  FROM cqq t CROSS JOIN cent0 ct) z WHERE rn = 1),
      |m1 AS (SELECT cell, d.d, CAST(SUM(qx[d.d]) // COUNT(*) AS BIGINT) AS s
      |       FROM asg1 CROSS JOIN generate_series(1, 64) d(d) GROUP BY cell, d.d),
      |u1 AS (SELECT cell, list(s ORDER BY d) AS qc FROM m1 GROUP BY cell),
      |cent1 AS (SELECT c0.cell, COALESCE(u1.qc, c0.qc) AS qc
      |          FROM cent0 c0 LEFT JOIN u1 ON u1.cell = c0.cell),
      |asg2 AS (SELECT c_id, cell, qx FROM (
      |  SELECT t.c_id, ct.cell, t.qx,
      |         ROW_NUMBER() OVER (PARTITION BY t.c_id ORDER BY
      |           t.qq + list_dot_product(ct.qc::DOUBLE[], ct.qc::DOUBLE[])
      |             - 2 * list_dot_product(t.qx::DOUBLE[], ct.qc::DOUBLE[]), ct.cell) AS rn
      |  FROM cqq t CROSS JOIN cent1 ct) z WHERE rn = 1),
      |m2 AS (SELECT cell, d.d, CAST(SUM(qx[d.d]) // COUNT(*) AS BIGINT) AS s
      |       FROM asg2 CROSS JOIN generate_series(1, 64) d(d) GROUP BY cell, d.d),
      |u2 AS (SELECT cell, list(s ORDER BY d) AS qc FROM m2 GROUP BY cell),
      |cent2 AS (SELECT c1.cell, COALESCE(u2.qc, c1.qc) AS qc
      |          FROM cent1 c1 LEFT JOIN u2 ON u2.cell = c1.cell),
      |asgf AS (SELECT c_id, cell, dist FROM (
      |  SELECT t.c_id, ct.cell,
      |         t.qq + list_dot_product(ct.qc::DOUBLE[], ct.qc::DOUBLE[])
      |           - 2 * list_dot_product(t.qx::DOUBLE[], ct.qc::DOUBLE[]) AS dist,
      |         ROW_NUMBER() OVER (PARTITION BY t.c_id ORDER BY
      |           t.qq + list_dot_product(ct.qc::DOUBLE[], ct.qc::DOUBLE[])
      |             - 2 * list_dot_product(t.qx::DOUBLE[], ct.qc::DOUBLE[]), ct.cell) AS rn
      |  FROM cqq t CROSS JOIN cent2 ct) z WHERE rn = 1),
      |pri AS (SELECT a.c_id, a.cell, c.cv,
      |          CAST(ROW_NUMBER() OVER (PARTITION BY a.cell
      |            ORDER BY a.dist DESC, a.c_id) AS BIGINT) AS pri
      |        FROM asgf a JOIN c ON c.c_id = a.c_id),
      |dup AS (SELECT b.c_id, min_by(a.c_id, a.pri) AS dup_of
      |        FROM pri b JOIN pri a ON a.cell = b.cell AND a.pri < b.pri
      |        WHERE list_dot_product(a.cv, b.cv)
      |                / (sqrt(list_dot_product(a.cv, a.cv)) * sqrt(list_dot_product(b.cv, b.cv))) >= 0.4
      |        GROUP BY b.c_id)
      |SELECT p.c_id AS id, p.cell, p.pri,
      |       d.dup_of IS NOT NULL AS is_dup, d.dup_of
      |FROM pri p LEFT JOIN dup d ON d.c_id = p.c_id
      |ORDER BY id""".stripMargin) { (s, d) =>
    graft.operators.SemanticDedup.prune(
      Tables.embeddings(s, d), "vec_id", "embedding",
      iters = 2, eps = 0.4) // nCells auto-dialed: ⌊√n⌋ (the paper's ∝-corpus dial)
  }

  /** Incremental semantic-dedup keeper index
    * ([[graft.operators.SemanticDedup]] at the N33/N39 ledger tier):
    * build the index from the vec_id%3=0 base (trained Lloyd geometry
    * frozen + the full verdict ledger), delta-append the %3=1 batch
    * under that frozen geometry (the ENTIRE ledgered history outranks;
    * in-batch by id — the upper-triangular rule over the concatenated
    * arrival order), redeliver the batch (the rows ledger must append
    * nothing), COMPACT the appended index into a new versioned dir
    * (the q_st_minhash_ledger discipline — compaction itself sits
    * inside the hash gate), then score the %3=2 batch BIPARTITE
    * against the compacted index's keepers. The oracle replays the
    * whole ledger history — geometry, base prune, append verdicts,
    * final bipartite scores — so every stored decision AND the
    * compaction copy hash-certify. */
  private val dedupSemanticIndex = QuerySpec(
    "q_dedup_semantic_index",
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |b0 AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id % 3 = 0),
      |nk AS (SELECT GREATEST(1, CAST(floor(sqrt(COUNT(*))) AS BIGINT)) AS k FROM b0),
      |cq AS (SELECT c_id, cv,
      |         list_transform(cv, x -> CAST(floor((x / sqrt(list_dot_product(cv, cv)) + 2.0) * 1048576.0) AS BIGINT)) AS qx
      |       FROM b0),
      |cqq AS (SELECT c_id, cv, qx,
      |          list_dot_product(qx::DOUBLE[], qx::DOUBLE[]) AS qq FROM cq),
      |cent0 AS (SELECT cell, qc FROM (
      |            SELECT CAST(ROW_NUMBER() OVER (
      |              ORDER BY ('0x' || substr(md5(c_id::VARCHAR), 1, 15))::BIGINT, c_id) - 1 AS BIGINT) AS cell,
      |              qx AS qc
      |            FROM cq) z
      |          WHERE cell < (SELECT k FROM nk)),
      |asg1 AS (SELECT c_id, cell, qx FROM (
      |  SELECT t.c_id, ct.cell, t.qx,
      |         ROW_NUMBER() OVER (PARTITION BY t.c_id ORDER BY
      |           t.qq + list_dot_product(ct.qc::DOUBLE[], ct.qc::DOUBLE[])
      |             - 2 * list_dot_product(t.qx::DOUBLE[], ct.qc::DOUBLE[]), ct.cell) AS rn
      |  FROM cqq t CROSS JOIN cent0 ct) z WHERE rn = 1),
      |m1 AS (SELECT cell, d.d, CAST(SUM(qx[d.d]) // COUNT(*) AS BIGINT) AS s
      |       FROM asg1 CROSS JOIN generate_series(1, 64) d(d) GROUP BY cell, d.d),
      |u1 AS (SELECT cell, list(s ORDER BY d) AS qc FROM m1 GROUP BY cell),
      |cent1 AS (SELECT c0.cell, COALESCE(u1.qc, c0.qc) AS qc
      |          FROM cent0 c0 LEFT JOIN u1 ON u1.cell = c0.cell),
      |asg2 AS (SELECT c_id, cell, qx FROM (
      |  SELECT t.c_id, ct.cell, t.qx,
      |         ROW_NUMBER() OVER (PARTITION BY t.c_id ORDER BY
      |           t.qq + list_dot_product(ct.qc::DOUBLE[], ct.qc::DOUBLE[])
      |             - 2 * list_dot_product(t.qx::DOUBLE[], ct.qc::DOUBLE[]), ct.cell) AS rn
      |  FROM cqq t CROSS JOIN cent1 ct) z WHERE rn = 1),
      |m2 AS (SELECT cell, d.d, CAST(SUM(qx[d.d]) // COUNT(*) AS BIGINT) AS s
      |       FROM asg2 CROSS JOIN generate_series(1, 64) d(d) GROUP BY cell, d.d),
      |u2 AS (SELECT cell, list(s ORDER BY d) AS qc FROM m2 GROUP BY cell),
      |cent2 AS (SELECT c1.cell, COALESCE(u2.qc, c1.qc) AS qc
      |          FROM cent1 c1 LEFT JOIN u2 ON u2.cell = c1.cell),
      |asgf AS (SELECT c_id, cell, dist FROM (
      |  SELECT t.c_id, ct.cell,
      |         t.qq + list_dot_product(ct.qc::DOUBLE[], ct.qc::DOUBLE[])
      |           - 2 * list_dot_product(t.qx::DOUBLE[], ct.qc::DOUBLE[]) AS dist,
      |         ROW_NUMBER() OVER (PARTITION BY t.c_id ORDER BY
      |           t.qq + list_dot_product(ct.qc::DOUBLE[], ct.qc::DOUBLE[])
      |             - 2 * list_dot_product(t.qx::DOUBLE[], ct.qc::DOUBLE[]), ct.cell) AS rn
      |  FROM cqq t CROSS JOIN cent2 ct) z WHERE rn = 1),
      |pri AS (SELECT a.c_id, a.cell, b0.cv,
      |          ROW_NUMBER() OVER (PARTITION BY a.cell
      |            ORDER BY a.dist DESC, a.c_id) AS pri
      |        FROM asgf a JOIN b0 ON b0.c_id = a.c_id),
      |dup0 AS (SELECT DISTINCT b.c_id
      |         FROM pri b JOIN pri a ON a.cell = b.cell AND a.pri < b.pri
      |         WHERE list_dot_product(a.cv, b.cv)
      |                 / (sqrt(list_dot_product(a.cv, a.cv)) * sqrt(list_dot_product(b.cv, b.cv))) >= 0.4),
      |k0 AS (SELECT p.c_id AS doc_id, p.cell, p.cv AS kv FROM pri p
      |       WHERE p.c_id NOT IN (SELECT c_id FROM dup0)),
      |b1 AS (SELECT vec_id AS b_id, v AS bv FROM e WHERE vec_id % 3 = 1),
      |b1q AS (SELECT b_id, bv,
      |          list_transform(bv, x -> CAST(floor((x / sqrt(list_dot_product(bv, bv)) + 2.0) * 1048576.0) AS BIGINT)) AS qx
      |        FROM b1),
      |b1qq AS (SELECT b_id, bv, qx,
      |           list_dot_product(qx::DOUBLE[], qx::DOUBLE[]) AS qq FROM b1q),
      |b1a AS (SELECT b_id, bv, cell FROM (
      |  SELECT t.b_id, t.bv, ct.cell,
      |         ROW_NUMBER() OVER (PARTITION BY t.b_id ORDER BY
      |           t.qq + list_dot_product(ct.qc::DOUBLE[], ct.qc::DOUBLE[])
      |             - 2 * list_dot_product(t.qx::DOUBLE[], ct.qc::DOUBLE[]), ct.cell) AS rn
      |  FROM b1qq t CROSS JOIN cent2 ct) z WHERE rn = 1),
      |b1dups AS (SELECT DISTINCT n.b_id FROM b1a n JOIN pri k ON k.cell = n.cell
      |           WHERE list_dot_product(n.bv, k.cv)
      |                   / (sqrt(list_dot_product(n.bv, n.bv)) * sqrt(list_dot_product(k.cv, k.cv))) >= 0.4),
      |b1dupb AS (SELECT DISTINCT n.b_id FROM b1a n JOIN b1a p ON p.cell = n.cell AND p.b_id < n.b_id
      |           WHERE list_dot_product(n.bv, p.bv)
      |                   / (sqrt(list_dot_product(n.bv, n.bv)) * sqrt(list_dot_product(p.bv, p.bv))) >= 0.4),
      |k1 AS (SELECT b_id AS doc_id, cell, bv AS kv FROM b1a
      |       WHERE b_id NOT IN (SELECT b_id FROM b1dups)
      |         AND b_id NOT IN (SELECT b_id FROM b1dupb)),
      |keepers AS (SELECT * FROM k0 UNION ALL SELECT * FROM k1),
      |b2 AS (SELECT vec_id AS b_id, v AS bv FROM e WHERE vec_id % 3 = 2),
      |b2q AS (SELECT b_id, bv,
      |          list_transform(bv, x -> CAST(floor((x / sqrt(list_dot_product(bv, bv)) + 2.0) * 1048576.0) AS BIGINT)) AS qx
      |        FROM b2),
      |b2qq AS (SELECT b_id, bv, qx,
      |           list_dot_product(qx::DOUBLE[], qx::DOUBLE[]) AS qq FROM b2q),
      |b2a AS (SELECT b_id, bv, cell FROM (
      |  SELECT t.b_id, t.bv, ct.cell,
      |         ROW_NUMBER() OVER (PARTITION BY t.b_id ORDER BY
      |           t.qq + list_dot_product(ct.qc::DOUBLE[], ct.qc::DOUBLE[])
      |             - 2 * list_dot_product(t.qx::DOUBLE[], ct.qc::DOUBLE[]), ct.cell) AS rn
      |  FROM b2qq t CROSS JOIN cent2 ct) z WHERE rn = 1)
      |SELECT n.b_id AS new_id, k.doc_id AS keeper_id, n.cell,
      |       list_dot_product(n.bv, k.kv)
      |         / (sqrt(list_dot_product(n.bv, n.bv)) * sqrt(list_dot_product(k.kv, k.kv))) AS cos
      |FROM b2a n JOIN keepers k ON k.cell = n.cell
      |WHERE list_dot_product(n.bv, k.kv)
      |        / (sqrt(list_dot_product(n.bv, n.bv)) * sqrt(list_dot_product(k.kv, k.kv))) >= 0.4
      |ORDER BY new_id, keeper_id""".stripMargin) { (s, d) =>
    import graft.operators.SemanticDedup
    val emb = Tables.embeddings(s, d)
    def batch(i: Int) = emb.filter(pmod(col("vec_id"), lit(3)) === i)
    val root = graft.core.CacheGovernor.durableDir(s"semantic_keeper_index:$d") { dir =>
      val path = s"$dir/v1"
      // nCells auto-dialed from the SEED corpus: ⌊√|b0|⌋
      SemanticDedup.writeKeeperIndex(batch(0), "vec_id", "embedding", path,
        iters = 2, eps = 0.4)
      SemanticDedup.appendToKeeperIndex(s, path, batch(1), "vec_id", "embedding", eps = 0.4)
      // redelivered batch — the rows ledger must append nothing
      SemanticDedup.appendToKeeperIndex(s, path, batch(1), "vec_id", "embedding", eps = 0.4)
      // compaction must be a verbatim copy — scoring reads v2
      SemanticDedup.compactKeeperIndex(s, path, s"$dir/v2")
    }
    SemanticDedup.dupsAgainstKeeperIndex(
      s, s"$root/v2", batch(2), "vec_id", "embedding", eps = 0.4)
      .orderBy("new_id", "keeper_id")
  }

  /** One replayed append round of the streaming semantic keeper
    * ledger: batch `i` (rows matching `pred`) assigns under the frozen
    * cent2 geometry, is gated against ALL prior ledgered rows of its
    * cells (kept or dropped — `priorLedger`) plus smaller-id in-batch
    * rows, and extends the ledger. Emits the b{i}* CTEs, the verdict
    * CTE k{i} and the cumulative ledger led{i}. */
  private def semanticAppendSql(i: Int, pred: String, priorLedger: String): String =
    s"""b$i AS (SELECT vec_id AS b_id, v AS bv FROM e WHERE $pred),
       |b${i}q AS (SELECT b_id, bv,
       |    list_transform(bv, x -> CAST(floor((x / sqrt(list_dot_product(bv, bv)) + 2.0) * 1048576.0) AS BIGINT)) AS qx
       |  FROM b$i),
       |b${i}qq AS (SELECT b_id, bv, qx, list_dot_product(qx::DOUBLE[], qx::DOUBLE[]) AS qq FROM b${i}q),
       |b${i}a AS (SELECT b_id, bv, cell FROM (
       |  SELECT t.b_id, t.bv, ct.cell,
       |         ROW_NUMBER() OVER (PARTITION BY t.b_id ORDER BY
       |           t.qq + list_dot_product(ct.qc::DOUBLE[], ct.qc::DOUBLE[])
       |             - 2 * list_dot_product(t.qx::DOUBLE[], ct.qc::DOUBLE[]), ct.cell) AS rn
       |  FROM b${i}qq t CROSS JOIN cent2 ct) z WHERE rn = 1),
       |b${i}ds AS (SELECT DISTINCT n.b_id FROM b${i}a n JOIN $priorLedger k ON k.cell = n.cell
       |    WHERE list_dot_product(n.bv, k.kv)
       |            / (sqrt(list_dot_product(n.bv, n.bv)) * sqrt(list_dot_product(k.kv, k.kv))) >= 0.4),
       |b${i}db AS (SELECT DISTINCT n.b_id FROM b${i}a n JOIN b${i}a p ON p.cell = n.cell AND p.b_id < n.b_id
       |    WHERE list_dot_product(n.bv, p.bv)
       |            / (sqrt(list_dot_product(n.bv, n.bv)) * sqrt(list_dot_product(p.bv, p.bv))) >= 0.4),
       |k$i AS (SELECT b_id AS doc_id, cell, bv AS kv,
       |          b_id NOT IN (SELECT b_id FROM b${i}ds)
       |            AND b_id NOT IN (SELECT b_id FROM b${i}db) AS kept
       |        FROM b${i}a),
       |led$i AS (SELECT doc_id, cell, kv FROM $priorLedger
       |          UNION ALL SELECT doc_id, cell, kv FROM k$i)""".stripMargin

  /** The STREAMING form of the semantic keeper index (N105 under the
    * N8/N39/N93 ingestion-ledger discipline): the %4=0 embeddings
    * slice seeds the index (frozen auto-dialed Lloyd geometry + base
    * verdicts), micro-batches %4=1,2,3 flow through
    * [[graft.streaming.StreamingOps.semanticIndexAppendBatch]] (the
    * foreachBatch fold), batch 2 REDELIVERS (the `_batches` ledger
    * makes it a fast-path no-op — and the append is atomic + id-gated
    * underneath, the belt under the braces), and the query reads the
    * FULL verdict ledger. The oracle replays the entire ingestion
    * history — geometry, base prune, every batch's stored-outranks +
    * in-batch-triu gating — so every verdict the stream ever wrote
    * hash-certifies. */
  private val stSemanticLedger = QuerySpec(
    "q_st_semantic_ledger",
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |b0 AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id % 4 = 0),
      |nk AS (SELECT GREATEST(1, CAST(floor(sqrt(COUNT(*))) AS BIGINT)) AS k FROM b0),
      |cq AS (SELECT c_id, cv,
      |         list_transform(cv, x -> CAST(floor((x / sqrt(list_dot_product(cv, cv)) + 2.0) * 1048576.0) AS BIGINT)) AS qx
      |       FROM b0),
      |cqq AS (SELECT c_id, cv, qx,
      |          list_dot_product(qx::DOUBLE[], qx::DOUBLE[]) AS qq FROM cq),
      |cent0 AS (SELECT cell, qc FROM (
      |            SELECT CAST(ROW_NUMBER() OVER (
      |              ORDER BY ('0x' || substr(md5(c_id::VARCHAR), 1, 15))::BIGINT, c_id) - 1 AS BIGINT) AS cell,
      |              qx AS qc
      |            FROM cq) z
      |          WHERE cell < (SELECT k FROM nk)),
      |asg1 AS (SELECT c_id, cell, qx FROM (
      |  SELECT t.c_id, ct.cell, t.qx,
      |         ROW_NUMBER() OVER (PARTITION BY t.c_id ORDER BY
      |           t.qq + list_dot_product(ct.qc::DOUBLE[], ct.qc::DOUBLE[])
      |             - 2 * list_dot_product(t.qx::DOUBLE[], ct.qc::DOUBLE[]), ct.cell) AS rn
      |  FROM cqq t CROSS JOIN cent0 ct) z WHERE rn = 1),
      |m1 AS (SELECT cell, d.d, CAST(SUM(qx[d.d]) // COUNT(*) AS BIGINT) AS s
      |       FROM asg1 CROSS JOIN generate_series(1, 64) d(d) GROUP BY cell, d.d),
      |u1 AS (SELECT cell, list(s ORDER BY d) AS qc FROM m1 GROUP BY cell),
      |cent1 AS (SELECT c0.cell, COALESCE(u1.qc, c0.qc) AS qc
      |          FROM cent0 c0 LEFT JOIN u1 ON u1.cell = c0.cell),
      |asg2 AS (SELECT c_id, cell, qx FROM (
      |  SELECT t.c_id, ct.cell, t.qx,
      |         ROW_NUMBER() OVER (PARTITION BY t.c_id ORDER BY
      |           t.qq + list_dot_product(ct.qc::DOUBLE[], ct.qc::DOUBLE[])
      |             - 2 * list_dot_product(t.qx::DOUBLE[], ct.qc::DOUBLE[]), ct.cell) AS rn
      |  FROM cqq t CROSS JOIN cent1 ct) z WHERE rn = 1),
      |m2 AS (SELECT cell, d.d, CAST(SUM(qx[d.d]) // COUNT(*) AS BIGINT) AS s
      |       FROM asg2 CROSS JOIN generate_series(1, 64) d(d) GROUP BY cell, d.d),
      |u2 AS (SELECT cell, list(s ORDER BY d) AS qc FROM m2 GROUP BY cell),
      |cent2 AS (SELECT c1.cell, COALESCE(u2.qc, c1.qc) AS qc
      |          FROM cent1 c1 LEFT JOIN u2 ON u2.cell = c1.cell),
      |asgf AS (SELECT c_id, cell, dist FROM (
      |  SELECT t.c_id, ct.cell,
      |         t.qq + list_dot_product(ct.qc::DOUBLE[], ct.qc::DOUBLE[])
      |           - 2 * list_dot_product(t.qx::DOUBLE[], ct.qc::DOUBLE[]) AS dist,
      |         ROW_NUMBER() OVER (PARTITION BY t.c_id ORDER BY
      |           t.qq + list_dot_product(ct.qc::DOUBLE[], ct.qc::DOUBLE[])
      |             - 2 * list_dot_product(t.qx::DOUBLE[], ct.qc::DOUBLE[]), ct.cell) AS rn
      |  FROM cqq t CROSS JOIN cent2 ct) z WHERE rn = 1),
      |pri AS (SELECT a.c_id, a.cell, b0.cv,
      |          ROW_NUMBER() OVER (PARTITION BY a.cell
      |            ORDER BY a.dist DESC, a.c_id) AS pri
      |        FROM asgf a JOIN b0 ON b0.c_id = a.c_id),
      |dup0 AS (SELECT DISTINCT b.c_id
      |         FROM pri b JOIN pri a ON a.cell = b.cell AND a.pri < b.pri
      |         WHERE list_dot_product(a.cv, b.cv)
      |                 / (sqrt(list_dot_product(a.cv, a.cv)) * sqrt(list_dot_product(b.cv, b.cv))) >= 0.4),
      |k0 AS (SELECT p.c_id AS doc_id, p.cell, p.cv AS kv,
      |         p.c_id NOT IN (SELECT c_id FROM dup0) AS kept FROM pri p),
      |led0 AS (SELECT doc_id, cell, kv FROM k0),
      |${semanticAppendSql(1, "vec_id % 4 = 1", "led0")},
      |${semanticAppendSql(2, "vec_id % 4 = 2", "led1")},
      |${semanticAppendSql(3, "vec_id % 4 = 3", "led2")}
      |SELECT doc_id, cell, kept FROM (
      |  SELECT doc_id, cell, kept FROM k0
      |  UNION ALL SELECT doc_id, cell, kept FROM k1
      |  UNION ALL SELECT doc_id, cell, kept FROM k2
      |  UNION ALL SELECT doc_id, cell, kept FROM k3) t
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import graft.operators.SemanticDedup
    import graft.streaming.StreamingOps
    val emb = Tables.embeddings(s, d)
    def slice(i: Int) = emb.filter(pmod(col("vec_id"), lit(4)) === i)
    // durable build-once store, the q_st_minhash_ledger contract
    val root = graft.core.CacheGovernor.durableDir(s"semantic_st_ledger:$d") { dir =>
      val path = s"$dir/v1"
      SemanticDedup.writeKeeperIndex(slice(0), "vec_id", "embedding", path,
        iters = 2, eps = 0.4) // nCells auto-dialed from the seed slice
      val fold = StreamingOps.semanticIndexAppendBatch(
        path, "vec_id", "embedding", eps = 0.4)
      fold(slice(1), 1L)
      fold(slice(2), 2L)
      fold(slice(2), 2L) // redelivered micro-batch — _batches fast-path no-op
      fold(slice(3), 3L)
    }
    SemanticDedup.ledger(s, s"$root/v1")
      .select(col("doc_id"), col("cell"), col("kept"))
      .orderBy("doc_id")
  }

  val all: Seq[QuerySpec] = Seq(
    dedupSemantic, dedupSemanticIndex, stSemanticLedger)
}
