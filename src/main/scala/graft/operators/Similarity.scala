package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.asDouble
import graft.plans.VectorNative.dot

/** Similarity search over embedding columns — J8/X1 in SURVEY.md §2.3,
  * §2.10 (reference README.md:52; harness north-star "similarity
  * search").
  *
  * Two tiers:
  *  - [[bruteForceTopK]]: exact k-NN; corpus broadcast + per-query
  *    window rank. Correct baseline, O(|Q|·|C|) — fine when one side
  *    broadcasts (corpus ≤ O(100 MB)), the oracle-checkable path.
  *  - [[lshTopK]]: random-hyperplane LSH bucketing — the 100 TB path.
  *    Candidates come from an equi-join on bucket signature (hash
  *    shuffle, no cross product ever materialized); rank within
  *    candidates. Deterministic: hyperplanes derive from xxhash64, not
  *    an RNG.
  */
object Similarity {

  /** Exact top-k by cosine. `queries`/`corpus` need (id, vec) columns.
    * Output: q_id, c_id, rnk (1..k), cos. Ties broken by c_id. */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      qId: String, qVec: String,
      cId: String, cVec: String,
      k: Int): DataFrame = {
    // norms once per row BEFORE the pair join (3× fewer dots), dot via
    // the codegen'd native expression — identical doubles to the HOF
    // form, so oracle hashes are unaffected
    val q = queries.select(col(qId).as("q_id"), asDouble(col(qVec)).as("_qv"))
      .withColumn("_qn", sqrt(dot(col("_qv"), col("_qv"))))
    val c = corpus.select(col(cId).as("c_id"), asDouble(col(cVec)).as("_cv"))
      .withColumn("_cn", sqrt(dot(col("_cv"), col("_cv"))))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id").asc)
    q.crossJoin(broadcast(c))
      .withColumn("cos", dot(col("_qv"), col("_cv")) / (col("_qn") * col("_cn")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("q_id", "c_id", "rnk", "cos")
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * xxhash64 folded into [-1, 1]. Same formula on both sides of the
    * bucket join — no RNG state to ship. */
  private def planeWeight(plane: Column, dim: Column): Column =
    (pmod(xxhash64(plane * 64 + dim), lit(2001)) - 1000).cast("double") / 1000.0

  /** Sign-bit bucket signature of a vector under `nPlanes` hyperplanes. */
  def lshBucket(vec: Column, nPlanes: Int): Column =
    aggregate(
      transform(sequence(lit(0), lit(nPlanes - 1)), p => {
        val proj = aggregate(
          zip_with(vec, sequence(lit(0), size(vec) - 1), (x, j) => x * planeWeight(p, j)),
          lit(0.0), (acc, x) => acc + x)
        when(proj >= 0, 1L).otherwise(0L)
      }),
      lit(0L), (acc, b) => acc * 2 + b)

  /** Approximate top-k: candidates share an LSH bucket, with multi-probe
    * on the query side (the exact bucket plus every bucket at Hamming
    * distance 1 — nPlanes+1 probes). Cost scales with the probed corpus
    * fraction ≈ (nPlanes+1)/2^nPlanes.
    *
    * Recall caveat, measured on the harness embeddings: the vectors are
    * isotropic (max pairwise cos ≈ 0.5), and on near-random data ANN
    * recall cannot exceed the probed fraction (plus the self-match) —
    * there is no cluster structure for the hash to exploit. Clustered
    * real-world embedding corpora behave far better. SimilaritySpec
    * asserts recall vs [[bruteForceTopK]] accordingly. */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      qId: String, qVec: String,
      cId: String, cVec: String,
      k: Int,
      nPlanes: Int = 4): DataFrame = {
    val probes: Column = {
      val base = lshBucket(col("_qv"), nPlanes)
      array((base +: (0 until nPlanes).map(p =>
        base.bitwiseXOR(lit(1L << p)))): _*)
    }
    val q = queries.select(col(qId).as("q_id"), asDouble(col(qVec)).as("_qv"))
      .withColumn("_qn", sqrt(dot(col("_qv"), col("_qv"))))
      .withColumn("_bucket", explode(probes))
    val c = corpus.select(col(cId).as("c_id"), asDouble(col(cVec)).as("_cv"))
      .withColumn("_cn", sqrt(dot(col("_cv"), col("_cv"))))
      .withColumn("_bucket", lshBucket(col("_cv"), nPlanes))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id").asc)
    q.join(c, "_bucket")
      .dropDuplicates("q_id", "c_id")
      .withColumn("cos", dot(col("_qv"), col("_cv")) / (col("_qn") * col("_cn")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("q_id", "c_id", "rnk", "cos")
  }

  /** IVF (inverted-file) approximate top-k — the second scale path
    * besides [[lshTopK]]. Centroids are a deterministic hash-seeded
    * sample of the corpus (the `nCells` vectors with smallest
    * xxhash64(id) — no RNG, no training step; swap in k-means centroids
    * for clustered corpora). Every corpus vector is assigned to its
    * max-cosine cell once; each query probes its `nProbe` best cells,
    * so the search cost is ~nProbe/nCells of brute force. The cell
    * assignment IS the partitioning at 100 TB: each cell is a
    * partition-local scan.
    */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      qId: String, qVec: String,
      cId: String, cVec: String,
      k: Int,
      nCells: Int = 16,
      nProbe: Int = 4): DataFrame = {
    val c = corpus.select(col(cId).as("c_id"), asDouble(col(cVec)).as("_cv"))
      .withColumn("_cn", sqrt(dot(col("_cv"), col("_cv"))))
    val centroids = c
      .withColumn("_h", xxhash64(col("c_id")))
      .orderBy("_h").limit(nCells)
      .select(col("c_id").as("_cell"), col("_cv").as("_cellv"), col("_cn").as("_celln"))
    // corpus → best cell (one small crossJoin against nCells rows)
    val assigned = c.crossJoin(broadcast(centroids))
      .withColumn("_sim", dot(col("_cv"), col("_cellv")) / (col("_cn") * col("_celln")))
      .groupBy("c_id")
      .agg(expr("max_by(_cell, struct(_sim, -_cell))").as("_cell"),
        first(col("_cv")).as("_cv"), first(col("_cn")).as("_cn"))
    // query → nProbe best cells
    val q = queries.select(col(qId).as("q_id"), asDouble(col(qVec)).as("_qv"))
      .withColumn("_qn", sqrt(dot(col("_qv"), col("_qv"))))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("_sim", dot(col("_qv"), col("_cellv")) / (col("_qn") * col("_celln")))
      .withColumn("_pr", row_number().over(
        Window.partitionBy("q_id").orderBy(col("_sim").desc, col("_cell").asc)))
      .filter(col("_pr") <= nProbe)
      .select("q_id", "_qv", "_qn", "_cell")
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id").asc)
    probes.join(assigned, "_cell")
      .withColumn("cos", dot(col("_qv"), col("_cv")) / (col("_qn") * col("_cn")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("q_id", "c_id", "rnk", "cos")
  }

  /** All pairs with cosine ≥ threshold (embedding near-dup detection).
    * Brute pairwise with the smaller side broadcast; the LSH bucket join
    * above is the drop-in scale path. */
  def nearDupPairs(
      df: DataFrame, id: String, vec: String, threshold: Double): DataFrame = {
    val a = df.select(col(id).as("a_id"), asDouble(col(vec)).as("_av"))
      .withColumn("_an", sqrt(dot(col("_av"), col("_av"))))
    val b = df.select(col(id).as("b_id"), asDouble(col(vec)).as("_bv"))
      .withColumn("_bn", sqrt(dot(col("_bv"), col("_bv"))))
    a.join(broadcast(b), col("a_id") < col("b_id"))
      .withColumn("cos", dot(col("_av"), col("_bv")) / (col("_an") * col("_bn")))
      .filter(col("cos") >= threshold)
      .select("a_id", "b_id", "cos")
  }
}
