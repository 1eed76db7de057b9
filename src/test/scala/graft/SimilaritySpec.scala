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

  test("blocked exact top-k: identical rows to the broadcast plan, no corpus broadcast hint") {
    // force the scale path: a 1-row broadcast limit pushes every corpus
    // past the threshold, so this is the plan a 100 TB corpus would get
    val blocked = Similarity.bruteForceTopK(
      queries, emb, "vec_id", "embedding", "vec_id", "embedding",
      k = 5, broadcastRowLimit = 1)
    // the scale plan must never hint a corpus broadcast (auto-broadcast
    // of the small replicated QUERY side by AQE is fine and wanted)
    val hints = blocked.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hints.isEmpty, s"explicit broadcast hint in blocked plan: $hints")
    val want = brute.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"), r.getAs[Long]("rnk")))
      .toSet
    val got = blocked.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"), r.getAs[Long]("rnk")))
      .toSet
    assert(got === want)
  }

  test("broadcast cutoff derives from corpus bytes, not a fixed row count") {
    // 64-dim rows cost 8·64 + 48 = 560 B → ~120k rows fit the 64 MB
    // budget; a 1024-dim corpus gets ~8k — the cutoff scales with width
    assert(Similarity.broadcastRowsFor(64) === ((64L << 20) / 560L).toInt)
    assert(Similarity.broadcastRowsFor(1024) === ((64L << 20) / 8240L).toInt)
    assert(Similarity.broadcastRowsFor(64) < 2000000,
      "the old fixed cutoff allowed ~0.5 GB broadcasts at 64 dims")
    // the harness corpus sits inside the derived budget → the default
    // takes the broadcast branch; `brute` (default) vs the forced
    // blocked branch identity is the 'blocked exact top-k' test above
    assert(emb.count() <= Similarity.broadcastRowsFor(64))
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

  test("trained IVF: recall >= hash-seeded IVF on a planted-cluster corpus") {
    import spark.implicits._
    // 8 well-separated clusters in 16-dim space (one-hot direction pairs
    // + small deterministic jitter) — the realistic embedding shape the
    // trained centroids exist for. Hash-seeded centroids are a corpus
    // sample: several clusters end up sharing (or missing) a cell, so
    // low-nProbe searches lose neighbours the KMeans cells keep.
    val corpus = (0 until 8).flatMap { cl =>
      (0 until 40).map { m =>
        val v = Array.tabulate(16) { d =>
          val base = if (d == 2 * cl) 1.0f else if (d == 2 * cl + 1) 0.5f else 0.0f
          base + 0.03f * (((cl * 40 + m) * 31 + d * 7) % 11 - 5)
        }
        ((cl * 40 + m).toLong, v)
      }
    }.toDF("vec_id", "embedding")
    val qs = corpus.filter(col("vec_id") % 10 === 0)
    def recallOf(df: org.apache.spark.sql.DataFrame, bf: Set[(Long, Long)]) = {
      val got = df.collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))).toSet
      (bf & got).size.toDouble / bf.size
    }
    val bf = Similarity.bruteForceTopK(qs, corpus,
      "vec_id", "embedding", "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"))).toSet
    val hashed = recallOf(Similarity.ivfTopK(qs, corpus,
      "vec_id", "embedding", "vec_id", "embedding", k = 5, nCells = 8, nProbe = 1), bf)
    val trained = recallOf(Similarity.ivfTopKTrained(qs, corpus,
      "vec_id", "embedding", "vec_id", "embedding", k = 5, nCells = 8, nProbe = 1), bf)
    assert(trained >= hashed,
      s"trained recall $trained must be >= hash-seeded recall $hashed")
    // and the trained cells must actually capture the planted structure
    assert(trained >= 0.95, s"trained recall $trained on separable clusters")
  }

  test("materialized IVF index: search from storage equals the in-process trained search") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-ivf-index").toString
    try {
      Similarity.writeIvfIndex(emb, "vec_id", "embedding", path,
        nCells = 8, maxIter = 10)
      def key(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"),
          r.getAs[Long]("rnk"), r.getAs[Double]("cos")))
        .toSet
      val direct = key(Similarity.ivfTopKTrained(queries, emb,
        "vec_id", "embedding", "vec_id", "embedding",
        k = 5, nCells = 8, nProbe = 2, maxIter = 10))
      val stored = key(Similarity.ivfTopKFrom(spark, path, queries,
        "vec_id", "embedding", k = 5, nProbe = 2))
      assert(stored === direct)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(path)).deleteRecursively()
    }
  }

  test("rerank: recall >= 0.8 at a 30% exact-rerank candidate fraction") {
    val reranked = Similarity.rerankTopK(queries, emb,
      "vec_id", "embedding", "vec_id", "embedding", k = 5)
    val exact = brute.select("q_id", "c_id")
    val hits = reranked.select("q_id", "c_id")
      .join(exact, Seq("q_id", "c_id"), "left_semi").count()
    val recall = hits.toDouble / (50 * 5)
    assert(recall >= 0.8, s"rerank recall $recall")
    // candidate set is the promised fraction, not all-pairs
    val n = emb.count()
    val cand = Similarity.rerankCandidates(queries, emb,
      "vec_id", "embedding", "vec_id", "embedding", k = 5).count()
    assert(cand <= 50L * math.max(5, math.ceil(0.30 * n).toInt))
  }

  test("lloyd IVF: exact-integer geometry, deterministic, recall above probe floor") {
    val a = Similarity.ivfTopKLloyd(queries, emb,
      "vec_id", "embedding", "vec_id", "embedding", k = 5,
      nCells = 16, nProbe = 4, iters = 2)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"),
        r.getAs[Long]("rnk"), r.getAs[Double]("cos"))).toSet
    val k1 = key(a)
    // re-run is bit-identical (integer arithmetic end to end)
    val k2 = key(Similarity.ivfTopKLloyd(queries, emb,
      "vec_id", "embedding", "vec_id", "embedding", k = 5,
      nCells = 16, nProbe = 4, iters = 2))
    assert(k1 === k2)
    assert(k1.groupBy(_._1).forall(_._2.size == 5))
    val hits = a.select("q_id", "c_id")
      .join(brute.select("q_id", "c_id"), Seq("q_id", "c_id"), "left_semi").count()
    assert(hits.toDouble / (50 * 5) >= 0.3,
      s"lloyd recall ${hits.toDouble / 250}")
  }

  test("block-bucketed near-dup pairs equal the brute-force pairwise answer") {
    import spark.implicits._
    val threshold = 0.3
    val blocked = Similarity.nearDupPairs(emb, "vec_id", "embedding", threshold)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val v = emb.select(col("vec_id"),
      graft.functions.VectorFunctions.asDouble(col("embedding")).as("v"))
    val a = v.select(col("vec_id").as("a_id"), col("v").as("av"))
    val b = v.select(col("vec_id").as("b_id"), col("v").as("bv"))
    val brute = a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .withColumn("cos", graft.plans.VectorNative.dot(col("av"), col("bv")) /
        (sqrt(graft.plans.VectorNative.dot(col("av"), col("av"))) *
          sqrt(graft.plans.VectorNative.dot(col("bv"), col("bv")))))
      .filter(col("cos") >= threshold)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(blocked === brute)
    assert(brute.nonEmpty, "threshold 0.3 should catch some pairs on this corpus")
  }

  test("bipartite near-dup pairs equal the brute-force cross-side answer, cross-side only") {
    import spark.implicits._
    val threshold = 0.3
    val corpus = emb.filter(col("vec_id") % 20 =!= 0)
    val bench = emb.filter(col("vec_id") % 20 === 0)
    val got = Similarity.nearDupPairsBetween(
      corpus, "vec_id", "embedding", bench, "vec_id", "embedding", threshold)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val v = emb.select(col("vec_id"),
      graft.functions.VectorFunctions.asDouble(col("embedding")).as("v"))
    val brute = v.filter(col("vec_id") % 20 =!= 0)
      .select(col("vec_id").as("a_id"), col("v").as("av"))
      .crossJoin(v.filter(col("vec_id") % 20 === 0)
        .select(col("vec_id").as("b_id"), col("v").as("bv")))
      .withColumn("cos", graft.plans.VectorNative.dot(col("av"), col("bv")) /
        (sqrt(graft.plans.VectorNative.dot(col("av"), col("av"))) *
          sqrt(graft.plans.VectorNative.dot(col("bv"), col("bv")))))
      .filter(col("cos") >= threshold)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty, "fixture must contain cross-side near-dups at 0.3")
    assert(got === brute)
    assert(got.forall { case (a, b) => a % 20 != 0 && b % 20 == 0 },
      "orientation must be corpus -> benchmark")
  }

  test("banded near-dup: subset of exact on real data; ~full recall on planted near-dups") {
    import spark.implicits._
    // subset property on the real corpus: banding only prunes candidates,
    // the exact-cosine verify is shared
    val exact = Similarity.nearDupPairs(emb, "vec_id", "embedding", 0.3)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val banded = Similarity.nearDupPairsBanded(emb, "vec_id", "embedding", 0.3)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(banded.subsetOf(exact))
    // planted fixture: 50 deterministic base vectors + a tiny-perturbation
    // copy of each (cos ≈ 0.999) — banding must recall nearly all of them
    val planted = (0 until 50).flatMap { i =>
      val base = Array.tabulate(16)(j => math.sin(i * 31 + j * 7).toFloat)
      val near = base.zipWithIndex.map { case (x, j) => x + 0.001f * math.cos(j + i).toFloat }
      Seq((i.toLong, base), (i.toLong + 1000L, near))
    }.toDF("vec_id", "embedding")
    val found = Similarity.nearDupPairsBanded(planted, "vec_id", "embedding", 0.9)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val recall = (0 until 50).count(i => found.contains((i.toLong, i.toLong + 1000L))) / 50.0
    assert(recall >= 0.95, s"planted near-dup recall $recall")
  }

  test("segmented centroid fold: exact mean on one giant cluster, bounded in-row arrays") {
    import spark.implicits._
    // the scaled-down million-member-cluster scenario from the round-2
    // review: ONE cluster of 600 identical integer-valued vectors. With
    // segmentWidth 64 the level-1 collect_list rows hold ≤ 64 elements
    // (ids 0..599 → 10 occupied id-range segments) and the level-2 fold
    // holds 10 — where the previous formulation built one 600-element
    // in-row array per (cluster, dim)
    val n = 600
    val v = Array.tabulate(8)(j => (j + 1).toFloat)
    val planted = (0 until n).map(i => (i.toLong, v)).toDF("vec_id", "embedding")
    val cents = Similarity.nearDupCentroids(planted, "vec_id", "embedding", 0.9,
      segmentWidth = 64L).collect()
    assert(cents.length === 8)
    cents.foreach { r =>
      assert(r.getAs[Long]("n_members") === n.toLong)
      // integer member values: every partial sum is exact, so the mean of
      // n copies of (dim) must equal dim exactly — no tolerance
      assert(r.getAs[Double]("centroid") === r.getAs[Long]("dim").toDouble)
    }
    assert(cents.map(_.getAs[Long]("cluster_rep")).toSet === Set(0L))
  }

  test("banded centroids equal exact centroids on an exact-duplicate fixture") {
    import spark.implicits._
    // 20 clusters × 30 identical one-hot members: within-cluster cos = 1
    // (identical vectors share every band bucket → banded recall 1),
    // cross-cluster cos = 0 exactly — so the banded path must reproduce
    // the exact path bit-for-bit (same components, same segmented fold)
    val planted = (0 until 20).flatMap { c =>
      val base = Array.tabulate(20)(j => if (j == c) 1.0f else 0.0f)
      (0 until 30).map(m => ((c * 100 + m).toLong, base))
    }.toDF("vec_id", "embedding")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val exact = rows(Similarity.nearDupCentroids(
      planted, "vec_id", "embedding", 0.99, segmentWidth = 16L))
    val banded = rows(Similarity.nearDupCentroidsBanded(
      planted, "vec_id", "embedding", 0.99, segmentWidth = 16L))
    assert(exact === banded)
    assert(exact.size === 20 * 20, "20 clusters x 20 dims")
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

  test("seeded IVF index: storage round-trip equals the in-process hash-seeded search") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-ivf-seeded").toString
    try {
      Similarity.writeIvfIndexSeeded(emb, "vec_id", "embedding", path,
        nCells = 8)
      def key(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("c_id"),
          r.getAs[Long]("rnk"), r.getAs[Double]("cos")))
        .toSet
      val direct = key(Similarity.ivfTopK(queries, emb,
        "vec_id", "embedding", "vec_id", "embedding",
        k = 5, nCells = 8, nProbe = 2))
      val stored = key(Similarity.ivfTopKFrom(spark, path, queries,
        "vec_id", "embedding", k = 5, nProbe = 2))
      assert(stored === direct)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(path)).deleteRecursively()
    }
  }

  test("IVF index append: delta-only, assignment-identical to a one-shot build, idempotent") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-ivf-append").toString
    try {
      val partA = emb.filter(col("vec_id") % 3 =!= 0)
      val partB = emb.filter(col("vec_id") % 3 === 0)
      // seed the index on A, then fold B in against A's stored centroids
      Similarity.writeIvfIndex(partA, "vec_id", "embedding", path,
        nCells = 8, maxIter = 10)
      val before = Similarity.ivfAssigned(spark, path)
        .select("c_id").collect().map(_.getLong(0)).toSet
      Similarity.appendToIvfIndex(spark, path, partB, "vec_id", "embedding")
      def assignedSet() = Similarity.ivfAssigned(spark, path)
        // the partition column round-trips as int via directory inference
        .select(col("c_id"), col("_cell").cast("long")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val after = assignedSet()
      // every corpus vector present exactly once, existing rows untouched
      assert(after.map(_._1) === emb.select("vec_id").collect().map(_.getLong(0)).toSet)
      assert(after.size === after.map(_._1).size, "duplicate assignments after append")
      assert(before.subsetOf(after.map(_._1)))
      // redelivery is a no-op (ids anti-joined away)
      Similarity.appendToIvfIndex(spark, path, partB, "vec_id", "embedding")
      assert(assignedSet() === after, "re-appending a delivered batch changed the index")
      // search over the appended index behaves like one over a full
      // assignment against the SAME centroids: every B vector finds
      // itself at rank 1 with cosine 1
      val selfHits = Similarity.ivfTopKFrom(spark, path,
        partB.filter(col("vec_id") < 200), "vec_id", "embedding", k = 1, nProbe = 2)
        .filter(col("q_id") === col("c_id") && col("rnk") === 1)
      assert(selfHits.count() === partB.filter(col("vec_id") < 200).count())
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(path)).deleteRecursively()
    }
  }
}
