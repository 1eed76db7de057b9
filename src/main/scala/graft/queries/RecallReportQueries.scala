package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{ProductQuantization, Similarity}

/** The ANN recall/cost report (split out of SimilarityQueries in round
  * 17 so the bench's top line is attributable per method): one row per
  * search method with recall@k against the exact top-k and the
  * candidate-set size the method actually scored. [[benchMethods]]
  * exposes each method's top-k frame for per-method bench sub-timing
  * (SparkEntry.benchSubqueries).
  */
object RecallReportQueries {

  private val K = 5

  private def queriesOf(emb: DataFrame): DataFrame =
    emb.filter(col("vec_id") < 100)

  /** Build-once / read-many stored geometries for the report's
    * retraining-heavy methods (r19 verdict item 1, the
    * q_sim_ivfadc_serve pattern): ONE durable build per (JVM, dataset)
    * trains the residual IVFADC index, the flat raw-coded PQ index and
    * the coarse Lloyd geometry — every later execution serves off the
    * stored artifacts. Training is deterministic exact-integer
    * arithmetic and the stored tables are all longs, so serving reads
    * back bit-identical geometry: the report's rows (and its oracle
    * replay, which retrains in SQL) are unchanged. The three builders
    * share one Lloyd training via the session memo, so the build costs
    * what one cold report execution used to pay for training. */
  private def idxRoot(s: SparkSession, d: String): String =
    graft.core.CacheGovernor.durableDir(s"recall_report_idx:$d") { dir =>
      val emb = Tables.embeddings(s, d)
      ProductQuantization.writeIvfPqIndex(emb, "vec_id", "embedding",
        s"$dir/ivfadc", nCells = 0, iters = 2, m = 16, kSub = 32)
      ProductQuantization.writePqIndex(emb, "vec_id", "embedding",
        s"$dir/pq", m = 8, kSub = 32, iters = 2)
      ProductQuantization.writeCoarseGeometry(emb, "vec_id", "embedding",
        s"$dir/coarse", nCells = 0, iters = 2)
    }

  // ---- per-method top-k builders ------------------------------------
  // ONE definition per method, consumed by the report row below AND
  // exposed through [[benchMethods]] so the bench can price each method
  // as its own sub-row (r16 verdict item 5: the aggregate report was
  // the bench's top line with ten opaque methods inside).

  private def bruteTopK(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.bruteForceTopK(queriesOf(emb), emb,
      "vec_id", "embedding", "vec_id", "embedding", K)
  }

  private def lshMethodTopK(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.lshTopK(queriesOf(emb), emb,
      "vec_id", "embedding", "vec_id", "embedding", K)
  }

  private def ivfMethodTopK(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.ivfTopK(queriesOf(emb), emb,
      "vec_id", "embedding", "vec_id", "embedding", K, nCells = 0, nProbe = 4)
  }

  private def ivfTrainedMethodTopK(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.ivfTopKTrained(queriesOf(emb), emb,
      "vec_id", "embedding", "vec_id", "embedding", K, nCells = 0, nProbe = 4)
  }

  private def ivfLloydMethodTopK(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val root = idxRoot(s, d)
    Similarity.ivfTopKFromCells(queriesOf(emb), emb,
      "vec_id", "embedding", "vec_id", "embedding",
      ProductQuantization.coarseCells(s, s"$root/coarse"),
      ProductQuantization.coarseCellOf(s, s"$root/coarse"),
      K, nProbe = 4)
  }

  private def sq8MethodTopK(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Quantization
    val emb = Tables.embeddings(s, d)
    Similarity.bruteForceTopK(queriesOf(emb),
      Quantization.withQuantized(emb, col("embedding"), 256)
        .select(col("vec_id"), col("recon")),
      "vec_id", "embedding", "vec_id", "recon", K)
  }

  // jl16 + sq8: the two reduction halves COMPOUNDED — project corpus
  // and queries 64→16 dims (N85), then SQ8-quantize the projected
  // corpus (N56): a 16× index-memory cut (4× dims × 4× bytes), the
  // production configuration the halves exist for. Queries search
  // full-precision-projected against the quantized corpus; recall
  // replays exactly in SQL (projection and recon are both
  // deterministic IEEE sequences). Measured recall@5: 0.260 sf0.001 /
  // 0.264 sf0.01 / 0.226 sf0.1 (round 11) — the 0.12 floor sits ≥5σ
  // (σ ≈ 0.019 at 500 hit trials) under all three, per the band rule.
  private def jlSq8MethodTopK(s: SparkSession, d: String): DataFrame = {
    import graft.operators.{Quantization, RandomProjection}
    val emb = Tables.embeddings(s, d)
    val projC = emb.select(col("vec_id"),
      RandomProjection.project(col("embedding"), 16, 64).as("pemb"))
    val projQ = queriesOf(emb).select(col("vec_id"),
      RandomProjection.project(col("embedding"), 16, 64).as("pemb"))
    Similarity.bruteForceTopK(projQ,
      Quantization.withQuantized(projC, col("pemb"), 256)
        .select(col("vec_id"), col("recon")),
      "vec_id", "pemb", "vec_id", "recon", K)
  }

  private def jlSq8RerankMethodTopK(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.rerankTopK(queriesOf(emb), emb,
      "vec_id", "embedding", "vec_id", "embedding", K)
  }

  // the codes-only serving point (what q_sim_pq_index serves raw): ADC
  // top-5 with NO rerank — the memory-extreme end of the frontier
  private def pqAdcMethodTopK(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    ProductQuantization.adcCandidatesFrom(s, s"${idxRoot(s, d)}/pq",
      queriesOf(emb), "vec_id", "embedding", K, candidateFrac = 0.0)
  }

  private def pqAdcRerankMethodTopK(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    ProductQuantization.adcRerankTopKFrom(s, s"${idxRoot(s, d)}/pq",
      queriesOf(emb), "vec_id", "embedding",
      emb, "vec_id", "embedding", K, candidateFrac = 0.10)
  }

  // r17 TRUE IVF-PQ, r18 auto-dialed: ⌊√n⌋ exact-integer Lloyd cells
  // (22/22/44 tri-scale), ⌈k/2⌉ probed (50% share) → in-cell ADC over
  // the m=8 / kSub=32 codes → exact re-rank of the ADC top 15%.
  // Measured recall@5: 0.822 / 0.838 / 0.876 at sf0.001/0.01/0.1
  // (deterministic, so the 0.8 band is exact) — the ADC scan touches
  // half the corpus codes, and at a fixed share the PER-CELL work
  // shrinks as cells multiply with √n.
  private def ivfpqMethodTopK(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val root = idxRoot(s, d)
    ProductQuantization.ivfpqTopKFrom(s, s"$root/pq", s"$root/coarse",
      queriesOf(emb), "vec_id", "embedding",
      emb, "vec_id", "embedding", K,
      nProbe = 0, candidateFrac = 0.15)
  }

  // r18: residual IVFADC — the stored index's serving semantics as an
  // in-session report method: ⌊√n⌋ auto-dialed cells, ⌈k/2⌉ probes
  // (50% share), m=16/kSub=32 RESIDUAL codes, 10% rerank budget.
  // Measured recall@5 0.862/0.856/0.888 — strictly dominates the
  // raw-coded ivfpq row (0.822-0.876 at a 15% budget): the frontier's
  // best sub-linear point.
  private def ivfadcMethodTopK(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    ProductQuantization.searchIvfPqIndex(s, s"${idxRoot(s, d)}/ivfadc",
      queriesOf(emb), "vec_id", "embedding",
      emb, "vec_id", "embedding", K,
      nProbe = 0, candidateFrac = 0.10)
  }

  /** Per-method top-k surfaces for bench sub-timing
    * (SparkEntry.benchSubqueries): each frame is the EXACT search the
    * report row scores, priced solo so a bench regression in the
    * aggregate report row is attributable to its method. */
  val benchMethods: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "brute" -> (bruteTopK _),
    "lsh" -> (lshMethodTopK _),
    "ivf" -> (ivfMethodTopK _),
    "ivf_trained" -> (ivfTrainedMethodTopK _),
    "ivf_lloyd" -> (ivfLloydMethodTopK _),
    "sq8" -> (sq8MethodTopK _),
    "jl16_sq8" -> (jlSq8MethodTopK _),
    "jl16_sq8_rerank" -> (jlSq8RerankMethodTopK _),
    "pq_adc" -> (pqAdcMethodTopK _),
    "pq_adc_rerank" -> (pqAdcRerankMethodTopK _),
    "ivfpq_adc_rerank" -> (ivfpqMethodTopK _),
    "ivfadc_rerank" -> (ivfadcMethodTopK _))

  /** ANN recall/cost report — the measured tradeoff table behind the
    * 100 TB similarity story: one row per search method (brute / LSH /
    * hash-seeded IVF / trained IVF / exact-replay Lloyd IVF /
    * SQ8-quantized brute / the compounded jl16+sq8 16×-memory-cut
    * configuration / its 30%-rerank form / the r16 PQ-ADC ~100×-memory
    * form at a 10% rerank) with
    * recall@k against the exact top-k and the CANDIDATE-SET SIZE the
    * method actually scored (via Similarity.lshCandidatePairs /
    * ivfCandidatePairs — the exact sets the searches use, not a
    * re-derivation). Oracle story: brute/LSH/IVF/SQ8 are fully
    * deterministic portable arithmetic, so their recalls AND candidate
    * counts replay exactly in DuckDB (recall = ratio of identical
    * integers — bit-exact, no rounding); the KMeans-trained row has no
    * SQL replay, so it carries NULL recall/candidates plus the same
    * in-band recall boolean q_sim_ivf_trained certifies (cosine-
    * threshold hit rule, tie-robust, gate 0.5 vs 0.678-0.698 measured).
    * In-band bounds sit ≥5σ under the cross-scale measurements recorded
    * in BASELINE.md round 10. */
  private val simRecallReport = QuerySpec(
    "q_sim_recall_report",
    """WITH c AS (SELECT vec_id AS c_id, embedding::DOUBLE[] AS cv FROM embeddings),
      |q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 100),
      |nq AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_queries FROM q),
      |nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_corpus FROM c),
      |exact AS (SELECT q_id, c_id FROM (
      |  SELECT q.q_id, c.c_id,
      |         ROW_NUMBER() OVER (PARTITION BY q.q_id
      |           ORDER BY list_dot_product(q.qv, c.cv) / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.cv, c.cv))) DESC, c.c_id) AS rnk
      |  FROM q CROSS JOIN c) t WHERE rnk <= 5),
      |np AS (
      |  SELECT COALESCE((SELECT MIN(t.p) FROM generate_series(4, 20) t(p)
      |                   WHERE (1::BIGINT << t.p) >= ((SELECT COUNT(*) FROM embeddings) + 8191) // 8192),
      |                  20) AS n),
      |planes AS (
      |  SELECT p.p,
      |         list(((('0x' || substr(md5('graft:plane:' || p.p || ':' || d.d), 1, 15))::BIGINT
      |               / 1152921504606846976.0) * 2 - 1) ORDER BY d.d) AS pw
      |  FROM generate_series(0, 19) p(p), generate_series(0, 63) d(d)
      |  GROUP BY p.p),
      |cb AS (SELECT c.c_id,
      |         SUM(CASE WHEN list_dot_product(c.cv, pl.pw) >= 0
      |                  THEN (1::BIGINT << (np.n - 1 - pl.p)) ELSE 0 END) AS bucket
      |       FROM c, planes pl, np WHERE pl.p < np.n GROUP BY c.c_id),
      |qb AS (SELECT q.q_id,
      |         SUM(CASE WHEN list_dot_product(q.qv, pl.pw) >= 0
      |                  THEN (1::BIGINT << (np.n - 1 - pl.p)) ELSE 0 END) AS bucket
      |       FROM q, planes pl, np WHERE pl.p < np.n GROUP BY q.q_id),
      |qp AS (SELECT q_id, bucket FROM qb
      |       UNION
      |       SELECT qb.q_id, xor(qb.bucket, 1::BIGINT << t.p) AS bucket
      |       FROM qb, generate_series(0, 19) t(p), np WHERE t.p < np.n),
      |lshcand AS (SELECT DISTINCT qp.q_id, cb.c_id
      |            FROM qp JOIN cb ON qp.bucket = cb.bucket),
      |lshtop AS (SELECT q_id, c_id FROM (
      |  SELECT cand.q_id, cand.c_id,
      |         ROW_NUMBER() OVER (PARTITION BY cand.q_id
      |           ORDER BY list_dot_product(q.qv, c.cv) / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.cv, c.cv))) DESC, cand.c_id) AS rnk
      |  FROM lshcand cand JOIN q ON q.q_id = cand.q_id JOIN c ON c.c_id = cand.c_id) t
      |  WHERE rnk <= 5),
      |cent AS (SELECT c_id AS cell, cv AS cellv FROM c
      |         ORDER BY ('0x' || substr(md5(c_id::VARCHAR), 1, 15))::BIGINT, c_id
      |         LIMIT (SELECT CAST(floor(sqrt(COUNT(*))) AS BIGINT) FROM c)),
      |asg AS (SELECT c_id, cell FROM (
      |          SELECT c.c_id, cent.cell,
      |                 ROW_NUMBER() OVER (PARTITION BY c.c_id ORDER BY
      |                   list_dot_product(c.cv, cent.cellv)
      |                     / (sqrt(list_dot_product(c.cv, c.cv)) * sqrt(list_dot_product(cent.cellv, cent.cellv))) DESC,
      |                   cent.cell ASC) AS rn
      |          FROM c CROSS JOIN cent) t WHERE rn = 1),
      |probes AS (SELECT q_id, cell FROM (
      |            SELECT q.q_id, cent.cell,
      |                   ROW_NUMBER() OVER (PARTITION BY q.q_id ORDER BY
      |                     list_dot_product(q.qv, cent.cellv)
      |                       / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(cent.cellv, cent.cellv))) DESC,
      |                     cent.cell ASC) AS pr
      |            FROM q CROSS JOIN cent) t WHERE pr <= 4),
      |ivfcand AS (SELECT p.q_id, a.c_id FROM probes p JOIN asg a ON a.cell = p.cell),
      |ivftop AS (SELECT q_id, c_id FROM (
      |  SELECT ic.q_id, ic.c_id,
      |         ROW_NUMBER() OVER (PARTITION BY ic.q_id
      |           ORDER BY list_dot_product(q.qv, c.cv) / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.cv, c.cv))) DESC, ic.c_id) AS rnk
      |  FROM ivfcand ic JOIN q ON q.q_id = ic.q_id JOIN c ON c.c_id = ic.c_id) t
      |  WHERE rnk <= 5),
      |rng AS (SELECT CAST(MIN(x) AS DOUBLE) AS lo, CAST(MAX(x) AS DOUBLE) AS hi
      |        FROM (SELECT unnest(embedding) AS x FROM embeddings)),
      |rc AS (SELECT c_id,
      |         list_transform(cv, x -> rng.lo +
      |           (CAST(least(255, greatest(0,
      |              CAST(floor((x - rng.lo) / ((rng.hi - rng.lo) / 256.0)) AS INTEGER))) AS DOUBLE) + 0.5)
      |           * ((rng.hi - rng.lo) / 256.0)) AS rv
      |       FROM c, rng),
      |sq8top AS (SELECT q_id, c_id FROM (
      |  SELECT q.q_id, rc.c_id,
      |         ROW_NUMBER() OVER (PARTITION BY q.q_id
      |           ORDER BY list_dot_product(q.qv, rc.rv) / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(rc.rv, rc.rv))) DESC, rc.c_id) AS rnk
      |  FROM q CROSS JOIN rc) t WHERE rnk <= 5),
      |jplanes AS (
      |  SELECT j.j,
      |         list(((('0x' || substr(md5('graft:plane:' || j.j || ':' || d.d), 1, 15))::BIGINT
      |               / 1152921504606846976.0) * 2 - 1) ORDER BY d.d) AS pw
      |  FROM generate_series(0, 15) j(j), generate_series(0, 63) d(d)
      |  GROUP BY j.j),
      |pc AS (SELECT c.c_id,
      |         list(list_dot_product(c.cv, pl.pw) * sqrt(3.0 / 16.0) ORDER BY pl.j) AS pv
      |       FROM c CROSS JOIN jplanes pl GROUP BY c.c_id),
      |pq AS (SELECT q.q_id,
      |         list(list_dot_product(q.qv, pl.pw) * sqrt(3.0 / 16.0) ORDER BY pl.j) AS pv
      |       FROM q CROSS JOIN jplanes pl GROUP BY q.q_id),
      |prng AS (SELECT CAST(MIN(x) AS DOUBLE) AS lo, CAST(MAX(x) AS DOUBLE) AS hi
      |         FROM (SELECT unnest(pv) AS x FROM pc)),
      |prc AS (SELECT c_id,
      |          list_transform(pv, x -> prng.lo +
      |            (CAST(least(255, greatest(0,
      |               CAST(floor((x - prng.lo) / ((prng.hi - prng.lo) / 256.0)) AS INTEGER))) AS DOUBLE) + 0.5)
      |            * ((prng.hi - prng.lo) / 256.0)) AS prv
      |        FROM pc, prng),
      |jrank AS (
      |  SELECT pq.q_id, prc.c_id,
      |         ROW_NUMBER() OVER (PARTITION BY pq.q_id
      |           ORDER BY list_dot_product(pq.pv, prc.prv) / (sqrt(list_dot_product(pq.pv, pq.pv)) * sqrt(list_dot_product(prc.prv, prc.prv))) DESC, prc.c_id) AS rnk
      |  FROM pq CROSS JOIN prc),
      |jtop AS (SELECT q_id, c_id FROM jrank WHERE rnk <= 5),
      |rrcand AS (SELECT q_id, c_id FROM jrank
      |           WHERE rnk <= greatest(5, CAST(ceil(0.30 * (SELECT n_corpus FROM nc)) AS BIGINT))),
      |rrtop AS (SELECT q_id, c_id FROM (
      |  SELECT r.q_id, r.c_id,
      |         ROW_NUMBER() OVER (PARTITION BY r.q_id
      |           ORDER BY list_dot_product(q.qv, c.cv) / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.cv, c.cv))) DESC, r.c_id) AS rnk
      |  FROM rrcand r JOIN q ON q.q_id = r.q_id JOIN c ON c.c_id = r.c_id) t
      |  WHERE rnk <= 5),
      |lvq AS (SELECT c_id,
      |          list_transform(cv, x -> CAST(floor((x / sqrt(list_dot_product(cv, cv)) + 2.0) * 1048576.0) AS BIGINT)) AS qx
      |        FROM c),
      |lvqq AS (SELECT c_id, qx, list_dot_product(qx::DOUBLE[], qx::DOUBLE[]) AS qq FROM lvq),
      |lvcent0 AS (SELECT CAST(ROW_NUMBER() OVER (
      |              ORDER BY ('0x' || substr(md5(c_id::VARCHAR), 1, 15))::BIGINT, c_id) - 1 AS BIGINT) AS cell,
      |              qx AS qc
      |            FROM (SELECT c_id, qx FROM lvq
      |                  ORDER BY ('0x' || substr(md5(c_id::VARCHAR), 1, 15))::BIGINT, c_id
      |                  LIMIT (SELECT CAST(floor(sqrt(COUNT(*))) AS BIGINT) FROM lvq))),
      |lvasg1 AS (SELECT c_id, cell, qx FROM (
      |  SELECT t.c_id, ct.cell, t.qx,
      |         ROW_NUMBER() OVER (PARTITION BY t.c_id ORDER BY
      |           t.qq + list_dot_product(ct.qc::DOUBLE[], ct.qc::DOUBLE[])
      |             - 2 * list_dot_product(t.qx::DOUBLE[], ct.qc::DOUBLE[]), ct.cell) AS rn
      |  FROM lvqq t CROSS JOIN lvcent0 ct) z WHERE rn = 1),
      |lvm1 AS (SELECT cell, d.d, CAST(SUM(qx[d.d]) // COUNT(*) AS BIGINT) AS s
      |         FROM lvasg1 CROSS JOIN generate_series(1, 64) d(d) GROUP BY cell, d.d),
      |lvu1 AS (SELECT cell, list(s ORDER BY d) AS qc FROM lvm1 GROUP BY cell),
      |lvcent1 AS (SELECT c0.cell, COALESCE(u.qc, c0.qc) AS qc
      |            FROM lvcent0 c0 LEFT JOIN lvu1 u ON u.cell = c0.cell),
      |lvasg2 AS (SELECT c_id, cell, qx FROM (
      |  SELECT t.c_id, ct.cell, t.qx,
      |         ROW_NUMBER() OVER (PARTITION BY t.c_id ORDER BY
      |           t.qq + list_dot_product(ct.qc::DOUBLE[], ct.qc::DOUBLE[])
      |             - 2 * list_dot_product(t.qx::DOUBLE[], ct.qc::DOUBLE[]), ct.cell) AS rn
      |  FROM lvqq t CROSS JOIN lvcent1 ct) z WHERE rn = 1),
      |lvm2 AS (SELECT cell, d.d, CAST(SUM(qx[d.d]) // COUNT(*) AS BIGINT) AS s
      |         FROM lvasg2 CROSS JOIN generate_series(1, 64) d(d) GROUP BY cell, d.d),
      |lvu2 AS (SELECT cell, list(s ORDER BY d) AS qc FROM lvm2 GROUP BY cell),
      |lvcent2 AS (SELECT c1.cell, COALESCE(u.qc, c1.qc) AS qc
      |            FROM lvcent1 c1 LEFT JOIN lvu2 u ON u.cell = c1.cell),
      |lvasgf AS (SELECT c_id, cell FROM (
      |  SELECT t.c_id, ct.cell,
      |         ROW_NUMBER() OVER (PARTITION BY t.c_id ORDER BY
      |           t.qq + list_dot_product(ct.qc::DOUBLE[], ct.qc::DOUBLE[])
      |             - 2 * list_dot_product(t.qx::DOUBLE[], ct.qc::DOUBLE[]), ct.cell) AS rn
      |  FROM lvqq t CROSS JOIN lvcent2 ct) z WHERE rn = 1),
      |lvqn AS (SELECT q_id,
      |           list_transform(qv, x -> CAST(floor((x / sqrt(list_dot_product(qv, qv)) + 2.0) * 1048576.0) AS BIGINT)) AS qxq
      |         FROM q),
      |lvqnn AS (SELECT q_id, qxq, list_dot_product(qxq::DOUBLE[], qxq::DOUBLE[]) AS qqq FROM lvqn),
      |lvprobes AS (SELECT q_id, cell FROM (
      |  SELECT t.q_id, ct.cell,
      |         ROW_NUMBER() OVER (PARTITION BY t.q_id ORDER BY
      |           t.qqq + list_dot_product(ct.qc::DOUBLE[], ct.qc::DOUBLE[])
      |             - 2 * list_dot_product(t.qxq::DOUBLE[], ct.qc::DOUBLE[]), ct.cell) AS pr
      |  FROM lvqnn t CROSS JOIN lvcent2 ct) z WHERE pr <= 4),
      |lvcand AS (SELECT p.q_id, a.c_id FROM lvprobes p JOIN lvasgf a ON a.cell = p.cell),
      |lvtop AS (SELECT q_id, c_id FROM (
      |  SELECT ic.q_id, ic.c_id,
      |         ROW_NUMBER() OVER (PARTITION BY ic.q_id
      |           ORDER BY list_dot_product(q.qv, c.cv) / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.cv, c.cv))) DESC, ic.c_id) AS rnk
      |  FROM lvcand ic JOIN q ON q.q_id = ic.q_id JOIN c ON c.c_id = ic.c_id) t
      |  WHERE rnk <= 5),
      |pqseed AS (SELECT cell, qx FROM (
      |  SELECT CAST(ROW_NUMBER() OVER (
      |    ORDER BY ('0x' || substr(md5(c_id::VARCHAR), 1, 15))::BIGINT, c_id) - 1 AS BIGINT) AS cell, qx
      |  FROM lvq) z WHERE cell < 32),
      |pqex AS (SELECT c_id, s.sub, list_slice(qx, s.sub*8 + 1, s.sub*8 + 8) AS sx
      |         FROM lvq CROSS JOIN generate_series(0, 7) s(sub)),
      |pqexx AS (SELECT c_id, sub, sx, list_dot_product(sx::DOUBLE[], sx::DOUBLE[]) AS sxx FROM pqex),
      |pqcb0 AS (SELECT s.sub, cell, list_slice(qx, s.sub*8 + 1, s.sub*8 + 8) AS qc
      |          FROM pqseed CROSS JOIN generate_series(0, 7) s(sub)),
      |pqa1 AS (SELECT c_id, sub, cell FROM (
      |  SELECT e.c_id, e.sub, cb.cell,
      |         ROW_NUMBER() OVER (PARTITION BY e.c_id, e.sub ORDER BY
      |           e.sxx + list_dot_product(cb.qc::DOUBLE[], cb.qc::DOUBLE[])
      |             - 2 * list_dot_product(e.sx::DOUBLE[], cb.qc::DOUBLE[]), cb.cell) AS rn
      |  FROM pqexx e JOIN pqcb0 cb ON cb.sub = e.sub) z WHERE rn = 1),
      |pqm1 AS (SELECT a.sub, a.cell, d.d, CAST(SUM(e.sx[d.d]) // COUNT(*) AS BIGINT) AS v
      |         FROM pqa1 a JOIN pqexx e ON e.c_id = a.c_id AND e.sub = a.sub
      |         CROSS JOIN generate_series(1, 8) d(d) GROUP BY a.sub, a.cell, d.d),
      |pqu1 AS (SELECT sub, cell, list(v ORDER BY d) AS qc FROM pqm1 GROUP BY sub, cell),
      |pqcb1 AS (SELECT c0.sub, c0.cell, COALESCE(u.qc, c0.qc) AS qc
      |          FROM pqcb0 c0 LEFT JOIN pqu1 u ON u.sub = c0.sub AND u.cell = c0.cell),
      |pqa2 AS (SELECT c_id, sub, cell FROM (
      |  SELECT e.c_id, e.sub, cb.cell,
      |         ROW_NUMBER() OVER (PARTITION BY e.c_id, e.sub ORDER BY
      |           e.sxx + list_dot_product(cb.qc::DOUBLE[], cb.qc::DOUBLE[])
      |             - 2 * list_dot_product(e.sx::DOUBLE[], cb.qc::DOUBLE[]), cb.cell) AS rn
      |  FROM pqexx e JOIN pqcb1 cb ON cb.sub = e.sub) z WHERE rn = 1),
      |pqm2 AS (SELECT a.sub, a.cell, d.d, CAST(SUM(e.sx[d.d]) // COUNT(*) AS BIGINT) AS v
      |         FROM pqa2 a JOIN pqexx e ON e.c_id = a.c_id AND e.sub = a.sub
      |         CROSS JOIN generate_series(1, 8) d(d) GROUP BY a.sub, a.cell, d.d),
      |pqu2 AS (SELECT sub, cell, list(v ORDER BY d) AS qc FROM pqm2 GROUP BY sub, cell),
      |pqcb2 AS (SELECT c1.sub, c1.cell, COALESCE(u.qc, c1.qc) AS qc
      |          FROM pqcb1 c1 LEFT JOIN pqu2 u ON u.sub = c1.sub AND u.cell = c1.cell),
      |pqcode AS (SELECT c_id, sub, cell FROM (
      |  SELECT e.c_id, e.sub, cb.cell,
      |         ROW_NUMBER() OVER (PARTITION BY e.c_id, e.sub ORDER BY
      |           e.sxx + list_dot_product(cb.qc::DOUBLE[], cb.qc::DOUBLE[])
      |             - 2 * list_dot_product(e.sx::DOUBLE[], cb.qc::DOUBLE[]), cb.cell) AS rn
      |  FROM pqexx e JOIN pqcb2 cb ON cb.sub = e.sub) z WHERE rn = 1),
      |pqqe AS (SELECT q_id, s.sub, list_slice(qxq, s.sub*8 + 1, s.sub*8 + 8) AS sx
      |         FROM lvqn CROSS JOIN generate_series(0, 7) s(sub)),
      |pqqx AS (SELECT q_id, sub, sx, list_dot_product(sx::DOUBLE[], sx::DOUBLE[]) AS sxx FROM pqqe),
      |pqdt AS (SELECT t.q_id, cb.sub, cb.cell,
      |           t.sxx + list_dot_product(cb.qc::DOUBLE[], cb.qc::DOUBLE[])
      |             - 2 * list_dot_product(t.sx::DOUBLE[], cb.qc::DOUBLE[]) AS dd
      |         FROM pqqx t JOIN pqcb2 cb ON cb.sub = t.sub),
      |pqadc AS (SELECT dt.q_id, cd.c_id, SUM(dt.dd) AS adist
      |          FROM pqcode cd JOIN pqdt dt ON dt.sub = cd.sub AND dt.cell = cd.cell
      |          GROUP BY dt.q_id, cd.c_id),
      |pqadctop AS (SELECT q_id, c_id FROM (
      |  SELECT q_id, c_id, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adist, c_id) AS rnk
      |  FROM pqadc) t WHERE rnk <= 5),
      |pqcand AS (SELECT q_id, c_id FROM (
      |  SELECT q_id, c_id, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adist, c_id) AS rnk
      |  FROM pqadc) t
      |  WHERE rnk <= greatest(5, CAST(ceil(0.10 * (SELECT n_corpus FROM nc)) AS BIGINT))),
      |pqtop AS (SELECT q_id, c_id FROM (
      |  SELECT r.q_id, r.c_id,
      |         ROW_NUMBER() OVER (PARTITION BY r.q_id
      |           ORDER BY list_dot_product(q.qv, c.cv) / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.cv, c.cv))) DESC, r.c_id) AS rnk
      |  FROM pqcand r JOIN q ON q.q_id = r.q_id JOIN c ON c.c_id = r.c_id) t
      |  WHERE rnk <= 5),
      |ipprobes AS (SELECT q_id, cell FROM (
      |  SELECT t.q_id, ct.cell,
      |         ROW_NUMBER() OVER (PARTITION BY t.q_id ORDER BY
      |           t.qqq + list_dot_product(ct.qc::DOUBLE[], ct.qc::DOUBLE[])
      |             - 2 * list_dot_product(t.qxq::DOUBLE[], ct.qc::DOUBLE[]), ct.cell) AS pr
      |  FROM lvqnn t CROSS JOIN lvcent2 ct) z
      |  WHERE pr <= (SELECT (CAST(floor(sqrt(COUNT(*))) AS BIGINT) + 1) // 2 FROM c)),
      |ipadc AS (SELECT dt.q_id, cd.c_id, SUM(dt.dd) AS adist
      |          FROM ipprobes p JOIN lvasgf a ON a.cell = p.cell
      |          JOIN pqcode cd ON cd.c_id = a.c_id
      |          JOIN pqdt dt ON dt.q_id = p.q_id AND dt.sub = cd.sub AND dt.cell = cd.cell
      |          GROUP BY dt.q_id, cd.c_id),
      |ipcand AS (SELECT q_id, c_id FROM (
      |  SELECT q_id, c_id, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adist, c_id) AS rnk
      |  FROM ipadc) t
      |  WHERE rnk <= greatest(5, CAST(ceil(0.15 * (SELECT n_corpus FROM nc)) AS BIGINT))),
      |iptop AS (SELECT q_id, c_id FROM (
      |  SELECT r.q_id, r.c_id,
      |         ROW_NUMBER() OVER (PARTITION BY r.q_id
      |           ORDER BY list_dot_product(q.qv, c.cv) / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.cv, c.cv))) DESC, r.c_id) AS rnk
      |  FROM ipcand r JOIN q ON q.q_id = r.q_id JOIN c ON c.c_id = r.c_id) t
      |  WHERE rnk <= 5),
      |rres AS (SELECT a.c_id, a.cell AS coarse,
      |           list_transform(range(64), i -> q.qx[i+1] - ct.qc[i+1] + 2097152) AS rx
      |         FROM lvasgf a JOIN lvq q ON q.c_id = a.c_id
      |         JOIN lvcent2 ct ON ct.cell = a.cell),
      |rseed AS (SELECT cell, rx FROM (
      |  SELECT CAST(ROW_NUMBER() OVER (
      |    ORDER BY ('0x' || substr(md5(c_id::VARCHAR), 1, 15))::BIGINT, c_id) - 1 AS BIGINT) AS cell, rx
      |  FROM rres) z WHERE cell < 32),
      |rex AS (SELECT c_id, coarse, s.sub, list_slice(rx, s.sub*4 + 1, s.sub*4 + 4) AS sx
      |        FROM rres CROSS JOIN generate_series(0, 15) s(sub)),
      |rexx AS (SELECT c_id, coarse, sub, sx, list_dot_product(sx::DOUBLE[], sx::DOUBLE[]) AS sxx FROM rex),
      |rcb0 AS (SELECT s.sub, cell, list_slice(rx, s.sub*4 + 1, s.sub*4 + 4) AS qc
      |         FROM rseed CROSS JOIN generate_series(0, 15) s(sub)),
      |ra1 AS (SELECT c_id, sub, cell FROM (
      |  SELECT e0.c_id, e0.sub, cb.cell,
      |         ROW_NUMBER() OVER (PARTITION BY e0.c_id, e0.sub ORDER BY
      |           e0.sxx + list_dot_product(cb.qc::DOUBLE[], cb.qc::DOUBLE[])
      |             - 2 * list_dot_product(e0.sx::DOUBLE[], cb.qc::DOUBLE[]), cb.cell) AS rn
      |  FROM rexx e0 JOIN rcb0 cb ON cb.sub = e0.sub) z WHERE rn = 1),
      |rm1 AS (SELECT a.sub, a.cell, d.d, CAST(SUM(e0.sx[d.d]) // COUNT(*) AS BIGINT) AS vv
      |        FROM ra1 a JOIN rexx e0 ON e0.c_id = a.c_id AND e0.sub = a.sub
      |        CROSS JOIN generate_series(1, 4) d(d) GROUP BY a.sub, a.cell, d.d),
      |ru1 AS (SELECT sub, cell, list(vv ORDER BY d) AS qc FROM rm1 GROUP BY sub, cell),
      |rcb1 AS (SELECT c0.sub, c0.cell, COALESCE(u.qc, c0.qc) AS qc
      |         FROM rcb0 c0 LEFT JOIN ru1 u ON u.sub = c0.sub AND u.cell = c0.cell),
      |ra2 AS (SELECT c_id, sub, cell FROM (
      |  SELECT e0.c_id, e0.sub, cb.cell,
      |         ROW_NUMBER() OVER (PARTITION BY e0.c_id, e0.sub ORDER BY
      |           e0.sxx + list_dot_product(cb.qc::DOUBLE[], cb.qc::DOUBLE[])
      |             - 2 * list_dot_product(e0.sx::DOUBLE[], cb.qc::DOUBLE[]), cb.cell) AS rn
      |  FROM rexx e0 JOIN rcb1 cb ON cb.sub = e0.sub) z WHERE rn = 1),
      |rm2 AS (SELECT a.sub, a.cell, d.d, CAST(SUM(e0.sx[d.d]) // COUNT(*) AS BIGINT) AS vv
      |        FROM ra2 a JOIN rexx e0 ON e0.c_id = a.c_id AND e0.sub = a.sub
      |        CROSS JOIN generate_series(1, 4) d(d) GROUP BY a.sub, a.cell, d.d),
      |ru2 AS (SELECT sub, cell, list(vv ORDER BY d) AS qc FROM rm2 GROUP BY sub, cell),
      |rcb2 AS (SELECT c1.sub, c1.cell, COALESCE(u.qc, c1.qc) AS qc
      |         FROM rcb1 c1 LEFT JOIN ru2 u ON u.sub = c1.sub AND u.cell = c1.cell),
      |rcodes AS (SELECT c_id, coarse, sub, cell FROM (
      |  SELECT ea.c_id, ea.coarse, ea.sub, cb.cell,
      |         ROW_NUMBER() OVER (PARTITION BY ea.c_id, ea.sub ORDER BY
      |           ea.sxx + list_dot_product(cb.qc::DOUBLE[], cb.qc::DOUBLE[])
      |             - 2 * list_dot_product(ea.sx::DOUBLE[], cb.qc::DOUBLE[]), cb.cell) AS rn
      |  FROM rexx ea JOIN rcb2 cb ON cb.sub = ea.sub) z WHERE rn = 1),
      |rqres AS (SELECT p.q_id, p.cell AS coarse,
      |            list_transform(range(64), i -> qn.qxq[i+1] - ct.qc[i+1] + 2097152) AS rx
      |          FROM ipprobes p JOIN lvqn qn ON qn.q_id = p.q_id
      |          JOIN lvcent2 ct ON ct.cell = p.cell),
      |rqe AS (SELECT q_id, coarse, s.sub, list_slice(rx, s.sub*4 + 1, s.sub*4 + 4) AS sx
      |        FROM rqres CROSS JOIN generate_series(0, 15) s(sub)),
      |rqx AS (SELECT q_id, coarse, sub, sx, list_dot_product(sx::DOUBLE[], sx::DOUBLE[]) AS sxx FROM rqe),
      |rlut AS (SELECT t.q_id, t.coarse, cb.sub, cb.cell,
      |           t.sxx + list_dot_product(cb.qc::DOUBLE[], cb.qc::DOUBLE[])
      |             - 2 * list_dot_product(t.sx::DOUBLE[], cb.qc::DOUBLE[]) AS dd
      |         FROM rqx t JOIN rcb2 cb ON cb.sub = t.sub),
      |radc AS (SELECT l.q_id, cd.c_id, CAST(SUM(l.dd) AS BIGINT) AS adist
      |         FROM rcodes cd
      |         JOIN rlut l ON l.coarse = cd.coarse AND l.sub = cd.sub AND l.cell = cd.cell
      |         GROUP BY l.q_id, cd.c_id),
      |rcand AS (SELECT q_id, c_id FROM (
      |  SELECT q_id, c_id, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adist, c_id) AS rnk
      |  FROM radc) t
      |  WHERE rnk <= greatest(5, CAST(ceil(0.10 * (SELECT n_corpus FROM nc)) AS BIGINT))),
      |rtop AS (SELECT q_id, c_id FROM (
      |  SELECT r.q_id, r.c_id,
      |         ROW_NUMBER() OVER (PARTITION BY r.q_id
      |           ORDER BY list_dot_product(q.qv, c.cv) / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.cv, c.cv))) DESC, r.c_id) AS rnk
      |  FROM rcand r JOIN q ON q.q_id = r.q_id JOIN c ON c.c_id = r.c_id) t
      |  WHERE rnk <= 5)
      |SELECT * FROM (
      |SELECT 'brute' AS method, CAST(5 AS BIGINT) AS k, nq.n_queries,
      |       CAST(nq.n_queries * nc.n_corpus AS BIGINT) AS candidates,
      |       CAST(1.0 AS DOUBLE) AS recall, TRUE AS recall_in_band
      |FROM nq, nc
      |UNION ALL
      |SELECT 'ivf', CAST(5 AS BIGINT), nq.n_queries,
      |       (SELECT CAST(COUNT(*) AS BIGINT) FROM ivfcand),
      |       CAST((SELECT COUNT(*) FROM ivftop t JOIN exact e ON t.q_id = e.q_id AND t.c_id = e.c_id) AS DOUBLE)
      |         / CAST(nq.n_queries * 5 AS DOUBLE),
      |       TRUE FROM nq
      |UNION ALL
      |SELECT 'ivf_trained', CAST(5 AS BIGINT), nq.n_queries,
      |       CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), TRUE FROM nq
      |UNION ALL
      |SELECT 'ivfadc_rerank', CAST(5 AS BIGINT), nq.n_queries,
      |       (SELECT CAST(COUNT(*) AS BIGINT) FROM rcand),
      |       CAST((SELECT COUNT(*) FROM rtop t JOIN exact e ON t.q_id = e.q_id AND t.c_id = e.c_id) AS DOUBLE)
      |         / CAST(nq.n_queries * 5 AS DOUBLE),
      |       TRUE FROM nq
      |UNION ALL
      |SELECT 'ivfpq_adc_rerank', CAST(5 AS BIGINT), nq.n_queries,
      |       (SELECT CAST(COUNT(*) AS BIGINT) FROM ipcand),
      |       CAST((SELECT COUNT(*) FROM iptop t JOIN exact e ON t.q_id = e.q_id AND t.c_id = e.c_id) AS DOUBLE)
      |         / CAST(nq.n_queries * 5 AS DOUBLE),
      |       TRUE FROM nq
      |UNION ALL
      |SELECT 'ivf_lloyd', CAST(5 AS BIGINT), nq.n_queries,
      |       (SELECT CAST(COUNT(*) AS BIGINT) FROM lvcand),
      |       CAST((SELECT COUNT(*) FROM lvtop t JOIN exact e ON t.q_id = e.q_id AND t.c_id = e.c_id) AS DOUBLE)
      |         / CAST(nq.n_queries * 5 AS DOUBLE),
      |       TRUE FROM nq
      |UNION ALL
      |SELECT 'jl16_sq8', CAST(5 AS BIGINT), nq.n_queries,
      |       CAST(nq.n_queries * nc.n_corpus AS BIGINT),
      |       CAST((SELECT COUNT(*) FROM jtop t JOIN exact e ON t.q_id = e.q_id AND t.c_id = e.c_id) AS DOUBLE)
      |         / CAST(nq.n_queries * 5 AS DOUBLE),
      |       TRUE FROM nq, nc
      |UNION ALL
      |SELECT 'jl16_sq8_rerank', CAST(5 AS BIGINT), nq.n_queries,
      |       (SELECT CAST(COUNT(*) AS BIGINT) FROM rrcand),
      |       CAST((SELECT COUNT(*) FROM rrtop t JOIN exact e ON t.q_id = e.q_id AND t.c_id = e.c_id) AS DOUBLE)
      |         / CAST(nq.n_queries * 5 AS DOUBLE),
      |       TRUE FROM nq
      |UNION ALL
      |SELECT 'lsh', CAST(5 AS BIGINT), nq.n_queries,
      |       (SELECT CAST(COUNT(*) AS BIGINT) FROM lshcand),
      |       CAST((SELECT COUNT(*) FROM lshtop t JOIN exact e ON t.q_id = e.q_id AND t.c_id = e.c_id) AS DOUBLE)
      |         / CAST(nq.n_queries * 5 AS DOUBLE),
      |       TRUE FROM nq
      |UNION ALL
      |SELECT 'pq_adc', CAST(5 AS BIGINT), nq.n_queries,
      |       CAST(nq.n_queries * nc.n_corpus AS BIGINT),
      |       CAST((SELECT COUNT(*) FROM pqadctop t JOIN exact e ON t.q_id = e.q_id AND t.c_id = e.c_id) AS DOUBLE)
      |         / CAST(nq.n_queries * 5 AS DOUBLE),
      |       TRUE FROM nq, nc
      |UNION ALL
      |SELECT 'pq_adc_rerank', CAST(5 AS BIGINT), nq.n_queries,
      |       (SELECT CAST(COUNT(*) AS BIGINT) FROM pqcand),
      |       CAST((SELECT COUNT(*) FROM pqtop t JOIN exact e ON t.q_id = e.q_id AND t.c_id = e.c_id) AS DOUBLE)
      |         / CAST(nq.n_queries * 5 AS DOUBLE),
      |       TRUE FROM nq
      |UNION ALL
      |SELECT 'sq8', CAST(5 AS BIGINT), nq.n_queries,
      |       CAST(nq.n_queries * nc.n_corpus AS BIGINT),
      |       CAST((SELECT COUNT(*) FROM sq8top t JOIN exact e ON t.q_id = e.q_id AND t.c_id = e.c_id) AS DOUBLE)
      |         / CAST(nq.n_queries * 5 AS DOUBLE),
      |       TRUE FROM nq, nc) r
      |ORDER BY method""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val queries = queriesOf(emb)
    val k = K
    val exactPairs = graft.core.CacheGovernor.persistTracked(
      bruteTopK(s, d).select("q_id", "c_id", "cos"))
    val nq = queries.agg(count(lit(1)).cast("long").as("n_queries"))
    val nc = emb.agg(count(lit(1)).cast("long").as("_nc"))
    val allPairs = nq.crossJoin(nc)
      .select(col("n_queries"), (col("n_queries") * col("_nc")).as("candidates"))

    // recall = hits / (n_queries·k): a ratio of identical integers on
    // both engines → the division is bit-exact IEEE, no rounding needed
    def methodRow(
        method: String, topk: org.apache.spark.sql.DataFrame,
        cand: org.apache.spark.sql.DataFrame,
        bound: Double): org.apache.spark.sql.DataFrame = {
      val hits = topk
        .join(exactPairs.select("q_id", "c_id"), Seq("q_id", "c_id"), "left_semi")
        .agg(count(lit(1)).cast("long").as("_hits"))
      nq.crossJoin(hits).crossJoin(cand.select(col("candidates")))
        .withColumn("recall",
          col("_hits").cast("double") / (col("n_queries") * lit(k)).cast("double"))
        .select(lit(method).as("method"), lit(k.toLong).as("k"), col("n_queries"),
          col("candidates"), col("recall"),
          (col("recall") >= lit(bound)).as("recall_in_band"))
    }

    // guide §2.6 (overlap independent jobs): the twelve method rows are
    // independent until the final union, but each one's CONSTRUCTION
    // runs eager Spark jobs (shared-relation localCheckpoints, count
    // probes, the MLlib fit, the serving-candidate snapshots) — built
    // serially they formed a chain of tiny jobs that left a 32-core
    // host ~97% idle (r20 measured: serving-only report 16.5 s wall at
    // 17.9 executor-CPU s). A small pool overlaps them; CacheGovernor's
    // per-key build locks keep racing constructions single-build. The
    // durable geometry is forced FIRST so the fan-out never duplicates
    // the index build. Row ORDER in the final union is unchanged.
    idxRoot(s, d)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    def bg(f: => org.apache.spark.sql.DataFrame) = scala.concurrent.Future(f)
    val rows =
      try scala.concurrent.Await.result(scala.concurrent.Future.sequence(Seq(
        bg { methodRow("brute", exactPairs, allPairs, 1.0) },
        bg {
          methodRow("ivf",
            ivfMethodTopK(s, d),
            Similarity.ivfCandidatePairs(queries, emb,
              "vec_id", "embedding", "vec_id", "embedding",
              nCells = 0, nProbe = 4)
              .agg(count(lit(1)).cast("long").as("candidates")),
            0.3)
        },
        // r15: trained IVF with EXACT-REPLAY integer-Lloyd geometry —
        // the trained row with real recall/candidate numbers (the MLlib
        // row below stays in-band-only)
        bg {
          methodRow("ivf_lloyd",
            ivfLloydMethodTopK(s, d),
            Similarity.ivfCandidatePairsFromCells(queries, emb,
              "vec_id", "embedding", "vec_id", "embedding",
              ProductQuantization.coarseCells(s, s"${idxRoot(s, d)}/coarse"),
              ProductQuantization.coarseCellOf(s, s"${idxRoot(s, d)}/coarse"),
              nProbe = 4)
              .agg(count(lit(1)).cast("long").as("candidates")),
            0.3)
        },
        // trained IVF: no SQL replay (iterative ML) — NULL
        // recall/candidates, in-band boolean via the tie-robust
        // cosine-threshold hit rule (shared contract with
        // q_sim_ivf_trained, gate 0.5)
        bg {
          val kth = exactPairs.groupBy("q_id").agg(min(col("cos")).as("_kth"))
          ivfTrainedMethodTopK(s, d)
            .join(kth, "q_id")
            .agg(sum(when(col("cos") >= col("_kth") - 1e-9, 1).otherwise(0))
              .cast("double").as("_hits"))
            .crossJoin(nq)
            .select(lit("ivf_trained").as("method"), lit(k.toLong).as("k"),
              col("n_queries"),
              lit(null).cast("long").as("candidates"),
              lit(null).cast("double").as("recall"),
              (col("_hits") / (col("n_queries") * lit(k)).cast("double") >= 0.5)
                .as("recall_in_band"))
        },
        bg { methodRow("jl16_sq8", jlSq8MethodTopK(s, d), allPairs, 0.12) },
        // r15: compressed-scan + exact re-rank — the row that moved the
        // frontier past the probed-fraction ceiling: recall@5 ≥ 0.8 at
        // a 30% exact-rerank candidate fraction (measured
        // 0.818/0.804/0.870 at sf0.001/0.01/0.1; deterministic, so the
        // bound is exact, not statistical)
        bg {
          methodRow("jl16_sq8_rerank",
            jlSq8RerankMethodTopK(s, d),
            Similarity.rerankCandidates(queries, emb,
              "vec_id", "embedding", "vec_id", "embedding", k)
              .agg(count(lit(1)).cast("long").as("candidates")),
            0.8)
        },
        bg {
          methodRow("lsh",
            lshMethodTopK(s, d),
            Similarity.lshCandidatePairs(queries, emb,
              "vec_id", "embedding", "vec_id", "embedding")
              .agg(count(lit(1)).cast("long").as("candidates")),
            0.3)
        },
        // r16: flat PQ-ADC (m=8 subspaces × 32 codewords trained by the
        // same exact-integer Lloyd recipe per subspace) — the ~100×
        // memory form. pq_adc is the codes-only serving point (recall@5
        // 0.408/0.422/0.298, band 0.2); pq_adc_rerank re-ranks the ADC
        // top 10% exactly (0.848/0.826/0.908, band 0.8).
        bg { methodRow("pq_adc", pqAdcMethodTopK(s, d), allPairs, 0.2) },
        bg {
          methodRow("pq_adc_rerank",
            pqAdcRerankMethodTopK(s, d),
            ProductQuantization.adcCandidatesFrom(s, s"${idxRoot(s, d)}/pq",
              queries, "vec_id", "embedding", k, candidateFrac = 0.10)
              .agg(count(lit(1)).cast("long").as("candidates")),
            0.8)
        },
        // r17: TRUE IVF-PQ (coarse prune → in-cell ADC → exact
        // re-rank): the candidate fraction sits UNDER the probed-cell
        // share and the ADC scan never touches the whole corpus.
        bg {
          methodRow("ivfpq_adc_rerank",
            ivfpqMethodTopK(s, d),
            ProductQuantization.ivfpqCandidatesFrom(s,
              s"${idxRoot(s, d)}/pq", s"${idxRoot(s, d)}/coarse",
              queries, "vec_id", "embedding", k,
              nProbe = 0, candidateFrac = 0.15)
              .agg(count(lit(1)).cast("long").as("candidates")),
            0.8)
        },
        // r18: the residual IVFADC method (band 0.8; worst 0.856)
        bg {
          methodRow("ivfadc_rerank",
            ivfadcMethodTopK(s, d),
            ProductQuantization.searchIvfPqCandidates(s,
              s"${idxRoot(s, d)}/ivfadc",
              queries, "vec_id", "embedding", k,
              nProbe = 0, candidateFrac = 0.10)
              .agg(count(lit(1)).cast("long").as("candidates")),
            0.8)
        },
        bg { methodRow("sq8", sq8MethodTopK(s, d), allPairs, 0.9) })),
        scala.concurrent.duration.Duration.Inf)
      finally pool.shutdown()

    rows.reduce(_.unionAll(_)).orderBy("method")
  }
  val all: Seq[QuerySpec] = Seq(simRecallReport)
}
