package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  import TestSession.{spark, sfDir}

  lazy val emb = Tables.embeddings(spark, sfDir).cache()
  lazy val queries = emb.filter(col("vec_id") < 50)

  lazy val brute = Similarity.bruteForceTopK(
    queries, emb, "vec_id", "embedding", "vec_id", "embedding", k = 5).cache()

  test("brute force: every vector's own nearest neighbour is itself, cos 1") {
    val top1 = brute.filter(col("rnk") === 1).collect()
    assert(top1.length === 50)
    assert(top1.forall(r => r.getAs[Long]("q_id") === r.getAs[Long]("c_id")))
    assert(top1.forall(r => math.abs(r.getAs[Double]("cos") - 1.0) < 1e-9))
  }

  test("LSH multiprobe: recall vs brute force on isotropic data") {
    val lsh = Similarity.lshTopK(
      queries, emb, "vec_id", "embedding", "vec_id", "embedding", k = 5, nPlanes = 4)
    val bf = brute.collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))).toSet
    val got = lsh.collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))).toSet
    val recall = (bf & got).size.toDouble / bf.size
    // ~31% of buckets probed; on isotropic vectors recall ≈ self-match +
    // probed fraction (see Similarity.lshTopK scaladoc). 0.35 is a
    // conservative floor; clustered corpora would score far higher.
    assert(recall >= 0.35, s"recall $recall")
  }

  test("IVF multiprobe: recall floor and self-cell containment") {
    val ivf = Similarity.ivfTopK(
      queries, emb, "vec_id", "embedding", "vec_id", "embedding",
      k = 5, nCells = 16, nProbe = 4)
    val bf = brute.collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))).toSet
    val got = ivf.collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))).toSet
    val recall = (bf & got).size.toDouble / bf.size
    // probing 4/16 cells on isotropic vectors → recall ≈ self-match +
    // ~probed fraction (same argument as LSH; see Similarity scaladoc)
    assert(recall >= 0.3, s"recall $recall")
  }

  test("LSH cosines agree with brute-force cosines on shared pairs") {
    val lsh = Similarity.lshTopK(
      queries, emb, "vec_id", "embedding", "vec_id", "embedding", k = 5, nPlanes = 4)
    val joined = lsh.as("l").join(brute.as("b"),
      col("l.q_id") === col("b.q_id") && col("l.c_id") === col("b.c_id"))
      .select(col("l.cos").as("lc"), col("b.cos").as("bc")).collect()
    assert(joined.nonEmpty)
    assert(joined.forall(r => math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }
}
