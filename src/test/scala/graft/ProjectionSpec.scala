package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{RandomProjection, Similarity}

/** Johnson–Lindenstrauss random projection (operators.RandomProjection).
  * The query-side envelope booleans are deliberately loose; the TIGHT
  * statistical claims (mean norm ratio ≈ 1, bounded spread, pairwise
  * distance preservation) live here. */
class ProjectionSpec extends AnyFunSuite {
  import TestSession.{spark, sfDir}
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sfDir).cache()

  test("projection is linear: proj(a·x) = a·proj(x) componentwise") {
    val toy = Seq((1L, Seq.tabulate(8)(d => (d + 1).toDouble))).toDF("id", "v")
    val scaled = toy.select(col("id"), transform(col("v"), x => x * lit(3.0)).as("v"))
    def p(df: org.apache.spark.sql.DataFrame) =
      df.select(RandomProjection.project(col("v"), outDim = 4, dim = 8).as("y"))
        .head.getSeq[Double](0)
    val y1 = p(toy)
    val y3 = p(scaled)
    y1.zip(y3).foreach { case (a, b) => assert(math.abs(b - 3.0 * a) <= 1e-12) }
  }

  test("planes are prefix-stable: first components agree across outDim choices") {
    val toy = Seq((1L, Seq.tabulate(8)(d => (d + 1).toDouble))).toDF("id", "v")
    // undo the outDim-dependent scale; the underlying dots must agree
    def dots(m: Int) =
      toy.select(RandomProjection.project(col("v"), outDim = m, dim = 8).as("y"))
        .head.getSeq[Double](0).map(_ / math.sqrt(3.0 / m))
    val d4 = dots(4)
    val d8 = dots(8)
    d4.zip(d8.take(4)).foreach { case (a, b) => assert(math.abs(a - b) <= 1e-12) }
  }

  test("unbiased scale: mean norm ratio near 1 with bounded spread on real embeddings") {
    val stats = RandomProjection.withProjection(emb, col("embedding"), outDim = 16)
      .agg(avg("norm_ratio").as("mean"), stddev_samp("norm_ratio").as("sd"),
        min("norm_ratio").as("lo"), max("norm_ratio").as("hi"))
      .head
    val (mean, sd) = (stats.getDouble(0), stats.getDouble(1))
    // E[ratio]=1; relative sd ~ sqrt(2/m)≈0.35 for m=16, mean over the
    // corpus concentrates hard (thousands of vectors)
    assert(math.abs(mean - 1.0) <= 0.1, s"mean norm ratio $mean off 1")
    assert(sd <= 0.6, s"norm-ratio spread $sd out of band")
    assert(stats.getDouble(2) > 0.0 && stats.getDouble(3) < 4.0,
      "norm-ratio envelope violated on real corpus")
  }

  test("pairwise distances are preserved in band (the JL guarantee, sampled pairs)") {
    import graft.plans.VectorNative
    val p = RandomProjection.withProjection(
      emb.filter(col("vec_id") < 400), col("embedding"), outDim = 16)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("x"), col("proj"))
    val a = p.toDF("ida", "xa", "ya")
    val b = p.toDF("idb", "xb", "yb")
    // consecutive-id pairs — deterministic sample (id-filtered, not
    // limit(): unordered limit is not a stable row selection)
    val pairs = a.join(b, col("idb") === col("ida") + 1)
      .withColumn("dx", VectorNative.dot(zip_with(col("xa"), col("xb"), (u, v) => u - v),
        zip_with(col("xa"), col("xb"), (u, v) => u - v)))
      .withColumn("dy", VectorNative.dot(zip_with(col("ya"), col("yb"), (u, v) => u - v),
        zip_with(col("ya"), col("yb"), (u, v) => u - v)))
      .filter(col("dx") > 0)
      .select((col("dy") / col("dx")).as("r"))
    val rs = pairs.agg(avg("r"), min("r"), max("r")).head
    assert(math.abs(rs.getDouble(0) - 1.0) <= 0.15,
      s"mean pairwise distance ratio ${rs.getDouble(0)} off 1")
    assert(rs.getDouble(1) > 0.1 && rs.getDouble(2) < 4.0,
      s"pairwise distortion [${rs.getDouble(1)}, ${rs.getDouble(2)}] out of JL band for m=16")
  }

  test("ANN recall survives projection well above the random-selection floor") {
    val base = emb.filter(col("vec_id") < 500).cache()
    val proj = RandomProjection.withProjection(base, col("embedding"), outDim = 16)
      .select(col("vec_id"), col("proj").as("embedding"))
    val queries = base.filter(col("vec_id") < 20).select("vec_id", "embedding")
    val qProj = RandomProjection.withProjection(queries, col("embedding"), outDim = 16, dim = 64)
      .select(col("vec_id"), col("proj").as("embedding"))
    def topk(q: org.apache.spark.sql.DataFrame, c: org.apache.spark.sql.DataFrame) =
      Similarity.bruteForceTopK(q, c, "vec_id", "embedding", "vec_id", "embedding", k = 10)
        .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = topk(queries, base.select("vec_id", "embedding"))
    val approx = topk(qProj, proj)
    val recall = (exact & approx).size.toDouble / exact.size
    // isotropic corpus = hardest case for any ANN (documented in
    // Similarity); random top-10-of-500 would land ~0.02 — require a
    // clear multiple of that floor
    assert(recall >= 0.15, s"projected recall $recall at the random floor")
  }

  test("dimension-mismatched and zero vectors get null norm_ratio, not garbage") {
    val mixed = Seq(
      (1L, Seq(1.0, 2.0, 3.0, 4.0)),  // matches dim=4
      (2L, Seq(1.0, 2.0)),            // mismatched → proj all null
      (3L, Seq(0.0, 0.0, 0.0, 0.0))   // zero vector → sq = 0
    ).toDF("id", "v")
    val out = RandomProjection.withProjection(mixed, col("v"), outDim = 4, dim = 4)
      .orderBy("id").select("norm_ratio").collect()
    assert(!out(0).isNullAt(0) && out(0).getDouble(0) > 0.0)
    assert(out(1).isNullAt(0), "mismatched vector must yield null norm_ratio")
    assert(out(2).isNullAt(0), "zero vector must yield null norm_ratio")
  }

  test("determinism and partition-insensitivity: repartitioned input, identical output") {
    val sub = emb.filter(col("vec_id") < 100)
    val once = RandomProjection.withProjection(sub, col("embedding"), outDim = 8)
      .select(col("vec_id"), to_json(col("proj")).as("p")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val again = RandomProjection.withProjection(
      sub.repartition(7), col("embedding"), outDim = 8)
      .select(col("vec_id"), to_json(col("proj")).as("p")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(once === again)
  }
}
