package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Dedup

class DedupSpec extends AnyFunSuite {
  import TestSession.{spark, sfDir}

  lazy val docs = Tables.documents(spark, sfDir).cache()

  test("exact dedup is idempotent") {
    val once = Dedup.exact(docs, Seq("text"))
    assert(once.count() === Dedup.exact(once, Seq("text")).count())
  }

  test("fingerprint dup groups have >1 member and exist in this corpus") {
    val groups = Dedup.fingerprintGroups(docs, "doc_id", "text").collect()
    assert(groups.nonEmpty, "corpus is known to contain token-set duplicates")
    assert(groups.forall(_.getAs[Long]("n_docs") > 1))
  }

  test("minhash finds every identical-token-set pair (recall 1.0 at J=1)") {
    // identical sets => identical signatures => guaranteed band collision
    val fpPairs = {
      val f = Dedup.withFingerprint(docs, "text").select("doc_id", "fingerprint")
      val a = f.select(col("doc_id").as("a_id"), col("fingerprint"))
      val b = f.select(col("doc_id").as("b_id"), col("fingerprint"))
      a.join(b, "fingerprint").filter(col("a_id") < col("b_id"))
        .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val mhPairs = Dedup.minHashPairs(docs, "doc_id", "text")
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fpPairs.nonEmpty)
    assert(fpPairs.subsetOf(mhPairs))
  }

  test("simhash: identical token sets are at Hamming distance 0") {
    val f = Dedup.withFingerprint(docs, "text").select("doc_id", "fingerprint")
    val a = f.select(col("doc_id").as("a_id"), col("fingerprint"))
    val b = f.select(col("doc_id").as("b_id"), col("fingerprint"))
    val fpPairs = a.join(b, "fingerprint").filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 0)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(fpPairs.subsetOf(sh))
  }

  test("cross-cluster verify path: near-identical (J<1) pair found with exact jaccard") {
    import spark.implicits._
    // 10 shared tokens + 1 unique each => J = 10/12; distinct fps, so the
    // pair MUST flow through banding + the two-pointer verify (the
    // within-cluster J=1 fast path cannot produce it)
    val shared = (1 to 10).map(i => s"tok$i").mkString(" ")
    val corpus = Seq(
      (1L, s"$shared aaa"),
      (2L, s"$shared bbb"),
      (3L, "completely different words here entirely")).toDF("doc_id", "text")
    val pairs = Dedup.minHashPairs(corpus, "doc_id", "text", threshold = 0.8)
      .collect()
    assert(pairs.length === 1)
    assert(pairs.head.getAs[Long]("a_id") === 1L && pairs.head.getAs[Long]("b_id") === 2L)
    assert(math.abs(pairs.head.getAs[Double]("jaccard") - 10.0 / 12.0) < 1e-12)
  }

  test("simhash collapse: dense duplicate cluster yields exactly the direct-join pairs") {
    import spark.implicits._
    // 30 identical docs (one collapsed representative), one near-dup, one
    // unrelated — the collapse must not change the output pair set
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = ((1L to 30L).map(i => (i, base)) ++ Seq(
      (31L, base + " lambda"),
      (32L, "totally different text with other words entirely here")))
      .toDF("doc_id", "text")
    val collapsed = Dedup.simHashPairs(corpus, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Long]("hamming"))).toSet
    // ground truth: brute-force Hamming over the simhash values (blocking
    // loses nothing at maxHamming ≤ 3 by pigeonhole over the 4 chunks)
    val sh = corpus.select(col("doc_id"), Dedup.simHash(Dedup.tokenSet(col("text"))).as("sh"))
    val a = sh.select(col("doc_id").as("a_id"), col("sh").as("sa"))
    val b = sh.select(col("doc_id").as("b_id"), col("sh").as("sb"))
    val brute = a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .withColumn("hamming", expr("bit_count(sa ^ sb)").cast("long"))
      .filter(col("hamming") <= 3)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Long]("hamming"))).toSet
    assert(brute.count(_._3 == 0L) >= 435, "fixture must contain the dense cluster")
    assert(collapsed === brute)
  }

  test("ngram prefix-filter join returns exactly the full-pairwise answer") {
    import spark.implicits._
    val sample = docs.filter(col("doc_id") < 100)
    val viaPrefix = Dedup.ngramJaccardPairs(sample, "doc_id", "text", 3, 0.8)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // brute-force reference on the same 100 docs
    val g = sample.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
    val a = g.select(col("doc_id").as("a_id"), col("sh").as("ash"))
    val b = g.select(col("doc_id").as("b_id"), col("sh").as("bsh"))
    val brute = a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .withColumn("j", size(array_intersect(col("ash"), col("bsh"))).cast("double") /
        size(array_union(col("ash"), col("bsh"))))
      .filter(col("j") >= 0.8).select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(viaPrefix === brute)
  }

  test("materialized minhash relation: pairs and clusters round-trip through storage") {
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft-minhash-rel").toString
    try {
      Dedup.writeMinHashRelation(docs, "doc_id", "text", path)
      val pairsDirect = Dedup.minHashPairs(docs, "doc_id", "text")
        .select("a_id", "b_id", "jaccard").as[(Long, Long, Double)].collect().toSet
      val pairsStored = Dedup.minHashPairsFrom(spark, path)
        .select("a_id", "b_id", "jaccard").as[(Long, Long, Double)].collect().toSet
      assert(pairsStored === pairsDirect)
      val clustersDirect = Dedup.minHashClusters(docs, "doc_id", "text")
        .as[(Long, Long, Long)].collect().toSet
      val clustersStored = Dedup.minHashClustersFrom(spark, path)
        .as[(Long, Long, Long)].collect().toSet
      assert(clustersStored === clustersDirect)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(path)).deleteRecursively()
    }
  }

  test("bipartite minhash = brute-force cross-side jaccard (and only cross-side)") {
    import spark.implicits._
    // real corpus split: src0 as the "benchmark", the rest as the corpus
    val corpus = docs.filter(col("source") =!= "src0")
    val bench = docs.filter(col("source") === "src0")
    val got = Dedup.minHashPairsBetween(
      corpus, "doc_id", "text", bench, "doc_id", "text", threshold = 0.9)
      .select("a_id", "b_id", "jaccard").as[(Long, Long, Double)].collect().toSet
    val t = docs.select(col("doc_id"), col("source"), Dedup.tokenSet(col("text")).as("toks"))
    val brute = t.filter(col("source") =!= "src0")
      .select(col("doc_id").as("a_id"), col("toks").as("ta"))
      .crossJoin(t.filter(col("source") === "src0")
        .select(col("doc_id").as("b_id"), col("toks").as("tb")))
      .withColumn("jaccard", size(array_intersect(col("ta"), col("tb"))).cast("double") /
        size(array_union(col("ta"), col("tb"))))
      .filter(col("jaccard") >= 0.9)
      .select("a_id", "b_id", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(brute.nonEmpty, "fixture must contain cross-source near-dups")
    assert(got === brute)
    // orientation: every a_id is a corpus doc, every b_id a benchmark doc
    val benchIds = bench.select("doc_id").as[Long].collect().toSet
    assert(got.forall { case (a, b, _) => !benchIds.contains(a) && benchIds.contains(b) })
  }

  test("bipartite minhash catches identical cross-side docs with jaccard exactly 1") {
    import spark.implicits._
    val a = Seq((1L, "alpha beta gamma delta"), (2L, "unrelated corpus words here"))
      .toDF("doc_id", "text")
    val b = Seq((10L, "alpha beta gamma delta"), (11L, "other benchmark text entirely"))
      .toDF("doc_id", "text")
    val got = Dedup.minHashPairsBetween(a, "doc_id", "text", b, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    assert(got === Set((1L, 10L, 1.0)))
  }

  test("incremental minhash vs stored index = bipartite pairs on the same split") {
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft-minhash-incr").toString
    try {
      val corpus = docs.filter(col("doc_id") < 250)
      val batch = docs.filter(col("doc_id") >= 250)
      Dedup.writeMinHashRelation(corpus, "doc_id", "text", path)
      val viaIndex = Dedup.minHashPairsAgainst(spark, path, batch, "doc_id", "text")
        .select("a_id", "b_id", "jaccard").as[(Long, Long, Double)].collect().toSet
      val direct = Dedup.minHashPairsBetween(
        batch, "doc_id", "text", corpus, "doc_id", "text")
        .select("a_id", "b_id", "jaccard").as[(Long, Long, Double)].collect().toSet
      assert(direct.nonEmpty, "fixture must contain cross-split near-dups")
      assert(viaIndex === direct)
      // orientation: batch ids left, indexed ids right
      assert(viaIndex.forall { case (a, b, _) => a >= 250 && b < 250 })
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(path)).deleteRecursively()
    }
  }

  test("append to stored minhash index: index + batch1 + batch2 = full rebuild") {
    import spark.implicits._
    val pathIncr = java.nio.file.Files
      .createTempDirectory("graft-minhash-append").toString
    val pathFull = java.nio.file.Files
      .createTempDirectory("graft-minhash-full").toString
    try {
      // three ingest waves over the real corpus — wave boundaries cut
      // straight through duplicate clusters, so the seam logic (new x
      // stored cross pairs, new x new self pairs, member-only appends
      // for already-indexed fingerprints) all exercise for real
      val wave1 = docs.filter(col("doc_id") < 200)
      val wave2 = docs.filter(col("doc_id") >= 200 && col("doc_id") < 350)
      val wave3 = docs.filter(col("doc_id") >= 350)
      Dedup.writeMinHashRelation(wave1, "doc_id", "text", pathIncr)
      Dedup.appendToMinHashRelation(spark, pathIncr, wave2, "doc_id", "text")
      Dedup.appendToMinHashRelation(spark, pathIncr, wave3, "doc_id", "text")
      Dedup.writeMinHashRelation(docs, "doc_id", "text", pathFull)
      // same expanded pair listing...
      def pairsOf(p: String) = Dedup.minHashPairsFrom(spark, p)
        .select("a_id", "b_id", "jaccard").as[(Long, Long, Double)].collect().toSet
      val incr = pairsOf(pathIncr)
      assert(incr.nonEmpty, "fixture must contain near-dups")
      assert(incr === pairsOf(pathFull))
      // ...same clusters...
      def clustersOf(p: String) = Dedup.minHashClustersFrom(spark, p)
        .as[(Long, Long, Long)].collect().toSet
      assert(clustersOf(pathIncr) === clustersOf(pathFull))
      // ...and the same collapsed rep relation (fingerprint -> band
      // hashes), i.e. future appends against either index behave alike
      def repsOf(p: String) = spark.read.option("recursiveFileLookup", "true").parquet(s"$p/reps")
        .select(col("_fp"), col("_bhs")).as[(Long, Seq[Long])].collect().toSet
      assert(repsOf(pathIncr) === repsOf(pathFull))
      // no duplicated rep rows across the appends
      val reps = repsOf(pathIncr)
      assert(reps.size === reps.map(_._1).size)
      // compaction into a fresh versioned dir: far fewer files, same
      // pairs, same meta — and the compacted index serves appends-vs
      // queries exactly like the original
      val pathCompact = java.nio.file.Files
        .createTempDirectory("graft-minhash-compact").toString + "/v2"
      // b<k> ledger layout since r18: count parquet files recursively
      def nFiles(p: String, sub: String): Int = {
        def walk(f: java.io.File): Int =
          if (f.isDirectory) f.listFiles().map(walk).sum
          else if (f.getName.endsWith(".parquet")) 1 else 0
        walk(new java.io.File(s"$p/$sub"))
      }
      Dedup.compactMinHashRelation(spark, pathIncr, pathCompact)
      assert(nFiles(pathCompact, "members") < nFiles(pathIncr, "members"),
        "compaction must shrink the member file count after 3 writes")
      assert(pairsOf(pathCompact) === incr)
      assert(Dedup.readMinHashRelationMeta(spark, pathCompact)
        === Dedup.readMinHashRelationMeta(spark, pathIncr))
      new scala.reflect.io.Directory(
        new java.io.File(pathCompact)).deleteRecursively()
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(pathIncr)).deleteRecursively()
      new Directory(new java.io.File(pathFull)).deleteRecursively()
    }
  }

  test("idempotent append: re-applying an overlapping batch leaves the index rebuild-equivalent") {
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft-minhash-idem").toString
    val pathFull = java.nio.file.Files
      .createTempDirectory("graft-minhash-idem-full").toString
    try {
      val wave1 = docs.filter(col("doc_id") < 250)
      val wave2 = docs.filter(col("doc_id") >= 250)
      Dedup.writeMinHashRelation(wave1, "doc_id", "text", path)
      Dedup.appendToMinHashRelation(spark, path, wave2, "doc_id", "text")
      // a retried/overlapping batch (contains ALREADY-INDEXED docs):
      // with assumeNewDocs = false the member delta anti-joins the
      // stored map, so nothing duplicates
      Dedup.appendToMinHashRelation(spark, path,
        docs.filter(col("doc_id") >= 200), "doc_id", "text",
        assumeNewDocs = false)
      Dedup.writeMinHashRelation(docs, "doc_id", "text", pathFull)
      assert(spark.read.option("recursiveFileLookup", "true").parquet(s"$path/members").count()
        === spark.read.option("recursiveFileLookup", "true").parquet(s"$pathFull/members").count(),
        "overlapping idempotent append must not duplicate member rows")
      def pairsOf(p: String) = Dedup.minHashPairsFrom(spark, p)
        .select("a_id", "b_id", "jaccard").as[(Long, Long, Double)].collect().toSet
      assert(pairsOf(path) === pairsOf(pathFull))
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(path)).deleteRecursively()
      new Directory(new java.io.File(pathFull)).deleteRecursively()
    }
  }

  test("crash redelivery: verified/members committed, reps lost → idempotent re-append converges") {
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft-minhash-crash").toString
    try {
      val wave1 = docs.filter(col("doc_id") < 250)
      val wave2 = docs.filter(col("doc_id") >= 250)
      Dedup.writeMinHashRelation(wave1, "doc_id", "text", path)
      Dedup.appendToMinHashRelation(spark, path, wave2, "doc_id", "text",
        assumeNewDocs = false)
      def counts() = Seq("verified", "members", "reps").map(t =>
        t -> spark.read.option("recursiveFileLookup", "true")
          .parquet(s"$path/$t").count()).toMap
      val after = counts()
      // simulate the r19 advisor's crash window: the batch committed
      // verified and members but died before the reps commit — its
      // fingerprints are still absent from reps, so a redelivered batch
      // recomputes the same delta. Wipe the reps append (b1), refresh
      // the session's file listing, redeliver.
      def rmTree(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rmTree)
        f.delete()
      }
      rmTree(new java.io.File(s"$path/reps/b1"))
      spark.catalog.refreshByPath(s"$path/reps")
      Dedup.appendToMinHashRelation(spark, path, wave2, "doc_id", "text",
        assumeNewDocs = false)
      assert(counts() === after,
        "redelivery after a partial commit must not duplicate any sub-table")
      // and the pair listing still equals a clean rebuild
      val pathFull = java.nio.file.Files
        .createTempDirectory("graft-minhash-crash-full").toString
      Dedup.writeMinHashRelation(docs, "doc_id", "text", pathFull)
      def pairsOf(p: String) = Dedup.minHashPairsFrom(spark, p)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSeq.sorted
      assert(pairsOf(path) === pairsOf(pathFull),
        "converged index must list each pair exactly once")
      new scala.reflect.io.Directory(
        new java.io.File(pathFull)).deleteRecursively()
    } finally {
      new scala.reflect.io.Directory(
        new java.io.File(path)).deleteRecursively()
    }
  }

  test("stored minhash index rejects mismatched banding parameters") {
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft-minhash-meta").toString
    try {
      val corpus = docs.filter(col("doc_id") < 100)
      Dedup.writeMinHashRelation(corpus, "doc_id", "text", path,
        numHashes = 64, bands = 16, threshold = 0.9)
      assert(Dedup.readMinHashRelationMeta(spark, path) === Some((64, 16, 0.9)))
      val batch = docs.filter(col("doc_id") >= 100 && col("doc_id") < 120)
      // mismatched band layout: immediate failure, not silent recall loss
      intercept[IllegalArgumentException] {
        Dedup.minHashPairsAgainst(spark, path, batch, "doc_id", "text",
          numHashes = 32, bands = 8)
      }
      // lower threshold than stored: candidates were never generated
      intercept[IllegalArgumentException] {
        Dedup.minHashPairsAgainst(spark, path, batch, "doc_id", "text",
          threshold = 0.5)
      }
      intercept[IllegalArgumentException] {
        Dedup.appendToMinHashRelation(spark, path, batch, "doc_id", "text",
          numHashes = 32, bands = 8)
      }
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(path)).deleteRecursively()
    }
  }

  test("minhash clusters = union-find closure of minhash pairs") {
    import spark.implicits._
    val pairs = Dedup.minHashPairs(docs, "doc_id", "text")
      .select("a_id", "b_id").as[(Long, Long)].collect()
    // driver-side union-find over the pair relation
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val roots = parent.keys.map(k => k -> find(k)).toMap
    val sizes = roots.values.groupBy(identity).map { case (r, g) => r -> g.size.toLong }
    val expected = roots.map { case (d, r) => (d, r, sizes(r)) }.toSet
    val got = Dedup.minHashClusters(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    assert(got.nonEmpty)
    assert(got === expected)
  }
}
