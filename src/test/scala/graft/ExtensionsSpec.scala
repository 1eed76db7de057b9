package graft

import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  test("graft_dot is registered on the SQL surface via SparkSessionExtensions") {
    val r = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .collect().head.getDouble(0)
    assert(r === 32.0)
  }

  test("graft_dot returns NULL on length mismatch, like the HOF form") {
    val r = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(1.0D, 2.0D, 3.0D)) AS d").collect().head
    assert(r.isNullAt(0))
  }

  test("sortedIntersectSize equals size(array_intersect) on sorted sets") {
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    import graft.plans.VectorNative
    val docs = graft.core.Tables.documents(spark, TestSession.sfDir)
      .select(col("doc_id"), array_sort(Dedup.tokenHashSet(col("text"))).as("s"))
    val a = docs.select(col("doc_id").as("a_id"), col("s").as("sa")).filter(col("a_id") < 50)
    val b = docs.select(col("doc_id").as("b_id"), col("s").as("sb")).filter(col("b_id") < 50)
    val diff = a.crossJoin(b)
      .withColumn("fast", VectorNative.sortedIntersectSize(col("sa"), col("sb")))
      .withColumn("ref", size(array_intersect(col("sa"), col("sb"))))
      .filter(col("fast") =!= col("ref")).count()
    assert(diff === 0)
  }

  test("SQL surface coerces int-typed array literals (no silent garbage)") {
    // `array(1,3,5)` is array<int>; without the builder-inserted casts,
    // getLong over the int-backed ArrayData read garbage and these
    // returned silently wrong values
    val r = spark.sql(
      """SELECT
        |  graft_sorted_intersect_size(array(1, 3, 5), array(3, 5, 7)) AS isz,
        |  graft_first_equal_index(array(1, 2, 3), array(9, 2, 3)) AS fei,
        |  graft_dot(array(1, 2, 3), array(4, 5, 6)) AS d
        |""".stripMargin).collect().head
    assert(r.getAs[Int]("isz") === 2)
    assert(r.getAs[Int]("fei") === 1)
    assert(r.getAs[Double]("d") === 32.0)
  }

  test("the full native family is registered on the SQL surface") {
    import org.apache.spark.sql.functions._
    // each call must parse, resolve, and return the Column-API value
    val r = spark.sql(
      """SELECT
        |  graft_sorted_intersect_size(array(1L, 3L, 5L), array(3L, 5L, 7L)) AS isz,
        |  graft_first_equal_index(array(1L, 2L, 3L), array(9L, 2L, 3L)) AS fei,
        |  graft_token_hash_set('a b a c') AS ths,
        |  graft_shingle_hash_set('a b c d', 3) AS shs,
        |  size(graft_minhash_sig(graft_token_hash_set('a b c'), 64)) AS sig_k,
        |  graft_simhash60('alpha beta gamma') AS sh,
        |  graft_cdc_boundaries('some text to chunk here', 8, 4) AS cdc,
        |  size(graft_deletion_hash_set('abc')) AS dhs_n,
        |  graft_hashed_count_vec('a b a', 8) AS hcv
        |""".stripMargin).collect().head
    assert(r.getAs[Int]("isz") === 2)
    assert(r.getAs[Int]("fei") === 1)
    assert(r.getSeq[Long](r.fieldIndex("ths")).length === 3) // a b c distinct
    assert(r.getSeq[Long](r.fieldIndex("shs")).length === 2) // two 3-shingles
    assert(r.getAs[Int]("sig_k") === 64)
    // SQL value must equal the Column-API value for the same input
    import spark.implicits._
    val viaColumn = Seq("alpha beta gamma").toDF("t")
      .select(graft.plans.TextHashNative.simHash(col("t")).as("sh"))
      .collect().head.getLong(0)
    assert(r.getAs[Long]("sh") === viaColumn)
    assert(r.getSeq[Int](r.fieldIndex("cdc")).nonEmpty)
    assert(r.getAs[Int]("dhs_n") === 4) // 'abc' + three single-char deletions
    assert(r.getSeq[Long](r.fieldIndex("hcv")).sum === 3L) // mass-conserving
  }

  test("parameterized SQL functions reject non-literal parameters") {
    val err = intercept[Exception] {
      spark.sql("SELECT graft_minhash_sig(graft_token_hash_set('a'), cast(rand()*4 as int))")
        .collect()
    }
    assert(err.getMessage.contains("integer literal"),
      s"expected a literal-parameter error, got: ${err.getMessage}")
  }

  test("firstEqualIndex equals the HOF first-agreeing-index on random band arrays") {
    import org.apache.spark.sql.functions._
    import graft.plans.VectorNative
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // many short arrays over a tiny value domain => plenty of agreements
    // at varied positions, plus no-agreement and empty edge cases
    val rows = (1 to 2000).map { i =>
      val n = rnd.nextInt(17)
      (i, Seq.fill(n)(rnd.nextInt(4).toLong), Seq.fill(n)(rnd.nextInt(4).toLong))
    } :+ ((0, Seq.empty[Long], Seq.empty[Long]))
    val df = rows.toDF("i", "a", "b")
      .withColumn("fast", VectorNative.firstEqualIndex(col("a"), col("b")))
    // reference semantics (Seq.indexWhere) computed on the driver
    val got = df.select("i", "fast").as[(Int, Int)].collect().toMap
    rows.foreach { case (i, a, b) =>
      val expected = a.zip(b).indexWhere { case (x, y) => x == y }
      assert(got(i) === expected, s"row $i: a=$a b=$b")
    }
  }

  test("minCommonSorted equals array_min(array_intersect) on sorted sets") {
    import org.apache.spark.sql.functions._
    import graft.plans.VectorNative
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // small value domain forces plenty of shared and disjoint cases
    val rows = (1 to 300).map { i =>
      (i, Seq.fill(rnd.nextInt(12))(rnd.nextInt(20).toLong).distinct.sorted,
        Seq.fill(rnd.nextInt(12))(rnd.nextInt(20).toLong).distinct.sorted)
    } :+ ((0, Seq.empty[Long], Seq.empty[Long]))
    val df = rows.toDF("i", "a", "b")
      .withColumn("fast", VectorNative.minCommonSorted(col("a"), col("b")))
      .withColumn("ref", array_min(array_intersect(col("a"), col("b"))))
    assert(df.filter(!(col("fast") <=> col("ref"))).count() === 0)
    // SQL surface, including int-literal coercion
    val r = spark.sql(
      """SELECT graft_min_common_sorted(array(2, 5, 9), array(3, 5, 7)) AS m,
        |       graft_min_common_sorted(array(1L), array(2L)) AS none""".stripMargin)
      .collect().head
    assert(r.getAs[Long]("m") === 5L)
    assert(r.isNullAt(r.fieldIndex("none")))
  }

  test("native token/shingle/minhash projections are value-equal to the HOF forms") {
    import org.apache.spark.sql.functions._
    import graft.plans.TextHashNative
    val docs = graft.core.Tables.documents(spark, TestSession.sfDir).limit(200)
    // token hash set: sorted-distinct xxhash64 of the split tokens
    val tokHof = array_sort(array_distinct(transform(split(col("text"), " "), t => xxhash64(t))))
    assert(docs.select((TextHashNative.tokenHashSet(col("text")) === tokHof).as("ok"))
      .filter(!col("ok")).count() === 0)
    // shingle hash set: xxhash64 chain over each 3-tuple of token hashes
    val th = transform(split(col("text"), " "), t => xxhash64(t))
    val shHof = array_sort(when(size(th) >= 3,
      array_distinct(transform(sequence(lit(1), size(th) - 2),
        i => xxhash64(element_at(th, i), element_at(th, i + 1), element_at(th, i + 2)))))
      .otherwise(array().cast("array<bigint>")))
    assert(docs.select((TextHashNative.shingleHashSet(col("text"), 3) === shHof).as("ok"))
      .filter(!col("ok")).count() === 0)
    // minhash signature: per-slot equality with the affine-family HOF
    val set = TextHashNative.tokenHashSet(col("text"))
    val sigHof = graft.operators.Dedup.minHashHashedSignature(set, 16)
    assert(docs.select((TextHashNative.minHashSig(set, 16) === sigHof).as("ok"))
      .filter(!col("ok")).count() === 0)
    // simhash: bit-identical to the HOF vote fold over distinct tokens
    val simHof = graft.operators.Dedup.simHash(graft.operators.Dedup.tokenSet(col("text")))
    assert(docs.select((TextHashNative.simHash(col("text")) === simHof).as("ok"))
      .filter(!col("ok")).count() === 0)
  }

  test("native gram digests are value-equal to the md5-over-slice HOF form") {
    import org.apache.spark.sql.functions._
    import graft.plans.TextHashNative
    val L = 8
    val docs = graft.core.Tables.documents(spark, TestSession.sfDir).limit(200)
      .select(split(col("text"), " ").as("_toks"))
      .filter(size(col("_toks")) >= L)
    val hof = transform(sequence(lit(0), size(col("_toks")) - lit(L)),
      p => struct(p.as("pos"),
        md5(concat_ws(" ", slice(col("_toks"), p + 1, lit(L)))).as("gram")))
    assert(docs
      .select((TextHashNative.gramDigests(col("_toks"), L) === hof).as("ok"))
      .filter(!col("ok")).count() === 0)
    // explicit edges: exact-L doc, multi-byte UTF-8, empty-string and
    // null tokens (null takes the slow path; concat_ws skips it)
    val edge = Seq(
      Seq("a", "b", "c"), Seq("héllo", "wörld", "✓"),
      Seq("", "x", ""), Seq("a", null, "b"))
      .toDF("_toks")
    val eHof = transform(sequence(lit(0), size(col("_toks")) - lit(2)),
      p => struct(p.as("pos"),
        md5(concat_ws(" ", slice(col("_toks"), p + 1, lit(2)))).as("gram")))
    assert(edge
      .select((TextHashNative.gramDigests(col("_toks"), 2) === eHof).as("ok"))
      .filter(!col("ok")).count() === 0)
    // shorter than L yields the empty array
    assert(Seq(Seq("one")).toDF("_toks")
      .select(size(TextHashNative.gramDigests(col("_toks"), 2)).as("n"))
      .head().getInt(0) === 0)
  }

  test("native CDC boundaries are value-equal to the composed-HOF form") {
    import org.apache.spark.sql.functions._
    import graft.plans.TextHashNative
    val docs = graft.core.Tables.documents(spark, TestSession.sfDir).limit(200)
      .select(col("text").as("_t"))
      .union(spark.sql(
        """SELECT * FROM VALUES ('short'), (''), ('exactly8'), ('ααββγγδδεε'),
          |('𝔘𝔫𝔦𝔠𝔬𝔡𝔢 𝔰𝔲𝔭𝔭𝔩𝔢𝔪𝔢𝔫𝔱𝔞𝔯𝔶'),
          |('aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa') AS t(_t)""".stripMargin))
    val hof = docs
      .withColumn("_codes",
        expr("transform(sequence(1, length(_t)), i -> ascii(substring(_t, i, 1)))"))
      .withColumn("ref", expr(
        """CASE WHEN length(_t) >= 8 THEN
          |  filter(sequence(8, length(_t)),
          |    i -> aggregate(slice(_codes, i - 7, 8),
          |           CAST(0 AS BIGINT), (a, x) -> (a * 31 + x) % 1000003)
          |         % 64 = 0)
          |ELSE CAST(array() AS ARRAY<INT>) END""".stripMargin))
      .withColumn("fast", TextHashNative.cdcBoundaries(col("_t"), 8, 64))
    assert(hof.filter(not(col("fast") === col("ref"))).count() === 0)
    // and at a window/divisor pair that exercises the pow path differently
    val hof2 = docs
      .withColumn("_codes",
        expr("transform(sequence(1, length(_t)), i -> ascii(substring(_t, i, 1)))"))
      .withColumn("ref", expr(
        """CASE WHEN length(_t) >= 3 THEN
          |  filter(sequence(3, length(_t)),
          |    i -> aggregate(slice(_codes, i - 2, 3),
          |           CAST(0 AS BIGINT), (a, x) -> (a * 31 + x) % 1000003)
          |         % 7 = 0)
          |ELSE CAST(array() AS ARRAY<INT>) END""".stripMargin))
      .withColumn("fast", TextHashNative.cdcBoundaries(col("_t"), 3, 7))
    assert(hof2.filter(not(col("fast") === col("ref"))).count() === 0)
  }

  test("native text projections reject non-string inputs at analysis time") {
    import org.apache.spark.sql.functions._
    import graft.plans.TextHashNative
    val docs = graft.core.Tables.documents(spark, TestSession.sfDir)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      docs.select(TextHashNative.tokenHashSet(col("doc_id"))).collect()
    }
    assert(e.getMessage.contains("graft_token_hash_set"))
  }

  test("graft_dot matches the HOF composition on real embeddings") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions
    import graft.plans.VectorNative
    val v = col("embedding").cast("array<double>")
    val diff = graft.core.Tables.embeddings(spark, TestSession.sfDir)
      .select((VectorNative.dot(v, v) - VectorFunctions.dot(v, v)).as("d"))
      .filter(col("d") =!= 0.0).count()
    assert(diff === 0) // bit-identical, not just close
  }
}
