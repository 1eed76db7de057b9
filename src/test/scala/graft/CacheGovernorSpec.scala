package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.{CacheGovernor, Tables}
import graft.operators.Similarity

/** The cross-query shared-relation contract Bench relies on: the
  * embedding near-dup pair relation is built ONCE per (session, input,
  * parameters), reused by both the pair and the centroid entry points,
  * kept across per-query isolation, and dropped by a full reset. */
class CacheGovernorSpec extends AnyFunSuite {
  import TestSession.{spark, sfDir}

  test("embedding pair relation is shared across entry points and parameter-keyed") {
    CacheGovernor.reset(spark)
    assert(CacheGovernor.sharedCount === 0)
    val emb = Tables.embeddings(spark, sfDir)
    // builds TWO shared relations: the normalized (_id,_v,_nrm) view of
    // the corpus (shared with every other embedding operator) and the
    // pair relation itself
    Similarity.nearDupPairs(emb, "vec_id", "embedding", 0.4).count()
    assert(CacheGovernor.sharedCount === 2)
    // same input + params from the OTHER entry point: memo hit, no rebuild
    Similarity.nearDupCentroids(emb, "vec_id", "embedding", 0.4).count()
    assert(CacheGovernor.sharedCount === 2)
    // a differing parameter is a different pair relation (same view)
    Similarity.nearDupPairs(emb, "vec_id", "embedding", 0.5).count()
    assert(CacheGovernor.sharedCount === 3)
    // per-query isolation keeps declared shared relations…
    CacheGovernor.isolate()
    assert(CacheGovernor.sharedCount === 3)
    // …full reset drops them
    CacheGovernor.reset(spark)
    assert(CacheGovernor.sharedCount === 0)
  }

  test("pair and centroid outputs stay consistent under relation reuse") {
    CacheGovernor.reset(spark)
    val emb = Tables.embeddings(spark, sfDir)
    val pairs = Similarity.nearDupPairs(emb, "vec_id", "embedding", 0.4)
      .select(col("a_id"), col("b_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // centroids reuse the SAME memoized relation just built — the
    // clusters partition exactly the paired vectors: every cluster has
    // ≥ 2 members and the member total equals the distinct paired ids
    val sizes = Similarity.nearDupCentroids(emb, "vec_id", "embedding", 0.4)
      .filter(col("dim") === 1)
      .collect()
      .map(r => r.getAs[Long]("cluster_rep") -> r.getAs[Long]("n_members")).toMap
    val paired = pairs.flatMap(p => Seq(p._1, p._2))
    assert(paired.nonEmpty)
    assert(sizes.values.forall(_ >= 2))
    assert(sizes.values.sum === paired.size.toLong)
    CacheGovernor.reset(spark)
  }
}
