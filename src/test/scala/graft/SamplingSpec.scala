package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite {
  import TestSession.{spark, sfDir}

  lazy val docs = Tables.documents(spark, sfDir).cache()

  test("split is disjoint, exhaustive, and insensitive to partitioning") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = Sampling.withSplit(docs, col("doc_id"), splits)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a.size === docs.count())
    // same assignment after an arbitrary repartition (seeded sample()
    // famously fails this)
    val b = Sampling.withSplit(docs.repartition(7), col("doc_id"), splits)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b)
    // fractions land near their targets (hash uniformity)
    val n = a.size.toDouble
    val frac = a.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(math.abs(frac("train") - 0.8) < 0.05, frac.toString)
    assert(math.abs(frac("val") - 0.1) < 0.03, frac.toString)
    assert(math.abs(frac("test") - 0.1) < 0.03, frac.toString)
  }

  test("stratified sampling is monotone: raising a fraction only adds rows") {
    val lo = Sampling.stratifiedSample(docs, col("doc_id"), col("lang"),
      Map("en" -> 0.2), defaultFraction = 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val hi = Sampling.stratifiedSample(docs, col("doc_id"), col("lang"),
      Map("en" -> 0.6), defaultFraction = 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(lo.subsetOf(hi))
    assert(hi.size > lo.size)
  }

  test("temperature sampling flattens the group distribution toward n^alpha") {
    import spark.implicits._
    // skewed corpus: 1000 / 100 / 16 / 2 docs per group
    val skewed = (
      (0 until 1000).map(i => (i.toLong, "big")) ++
      (1000 until 1100).map(i => (i.toLong, "mid")) ++
      (1100 until 1116).map(i => (i.toLong, "small")) ++
      (1116 until 1118).map(i => (i.toLong, "tiny"))).toDF("id", "grp")
    val kept = Sampling.temperatureSample(skewed, col("id"), col("grp"), 0.5)
      .groupBy("grp").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // quotas: round(sqrt(n)) = 32 / 10 / 4 / 1(floor); hash selection
    // hits them in expectation — allow binomial noise, assert the SHAPE:
    // each group kept close to its quota and the skew collapsed
    assert(math.abs(kept("big") - 32.0) <= 12, kept.toString)
    assert(math.abs(kept("mid") - 10.0) <= 6, kept.toString)
    assert(kept.getOrElse("small", 0L) >= 1 && kept("small") <= 8, kept.toString)
    // 500x big/tiny input skew compressed to ~quota ratio (~30x)
    assert(kept("big").toDouble / math.max(kept.getOrElse("tiny", 1L), 1L) < 60,
      kept.toString)
    // alpha = 1 keeps every row (quota = n, threshold = full range)
    val all = Sampling.temperatureSample(skewed, col("id"), col("grp"), 1.0)
    assert(all.count() === 1118L)
    // repartition-insensitive: identical kept set (hash-derived, no RNG)
    val a = Sampling.temperatureSample(skewed, col("id"), col("grp"), 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.temperatureSample(skewed.repartition(7), col("id"), col("grp"), 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a === b)
  }

  test("packing: pack totals bounded by budget + one document; repartition-stable") {
    val budget = 500L
    val toks = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val packed = Sampling.packBudgeted(toks, col("doc_id"), col("n_tokens"), budget, 4)
      .select("doc_id", "shard", "pack", "n_tokens").cache()
    // greedy-contiguous guarantee: a pack overflows by at most its last doc
    val bad = packed.groupBy("shard", "pack")
      .agg(sum("n_tokens").as("tot"), max("n_tokens").as("mx"))
      .filter(col("tot") >= lit(budget) + col("mx"))
      .count()
    assert(bad === 0)
    // deterministic under arbitrary physical layout
    val again = Sampling.packBudgeted(toks.repartition(11), col("doc_id"),
      col("n_tokens"), budget, 4)
      .select("doc_id", "shard", "pack", "n_tokens")
    assert(packed.except(again).count() === 0 && again.except(packed).count() === 0)
    packed.unpersist()
  }

  test("fraction 1.0 keeps every row of its stratum; 0.0 drops all") {
    val kept = Sampling.stratifiedSample(docs, col("doc_id"), col("lang"),
      Map("en" -> 1.0), defaultFraction = 0.0)
    val en = docs.filter(col("lang") === "en")
    assert(kept.count() === en.count())
    assert(kept.filter(col("lang") =!= "en").count() === 0)
  }

  test("deterministic shuffle: a permutation, partition-insensitive, seed-sensitive") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    def posMap(df: org.apache.spark.sql.DataFrame, seed: Long) =
      Sampling.deterministicShuffle(df, col("doc_id"), seed)
        .select("doc_id", "shuffle_pos").as[(Long, Long)].collect().toMap
    val base = posMap(docs, 42L)
    val n = docs.count()
    // exact permutation of 1..N
    assert(base.values.toSeq.sorted === (1L to n))
    // identical order regardless of physical partitioning
    assert(posMap(docs.repartition(7), 42L) === base)
    // a different seed is a genuinely different order
    val reseeded = posMap(docs, 43L)
    assert(reseeded !== base)
    assert(reseeded.values.toSeq.sorted === (1L to n))
  }

  test("frequencyBuckets matches NTILE exactly when bucket count does not divide N") {
    import spark.implicits._
    // 73 rows, 10 buckets: NTILE front-loads the remainder — sizes
    // 8,8,8,7,7,7,7,7,7,7. The even-spread floor((rn-1)k/N) formula
    // would give 8,7,7,8,7,7,8,7,7,7 — this pins the distinction.
    val df = (1L to 73L).map(i => (i, (i * 37) % 100)).toDF("id", "m")
    val got = Sampling.frequencyBuckets(df, col("m"), col("id"), 10)
      .groupBy("bucket").count().orderBy("bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got === (1L to 10L).map(b => (b, if (b <= 3) 8L else 7L)).toArray)
    // and per-row assignment equals the window NTILE reference
    val ref = df.withColumn("bucket",
      ntile(10).over(org.apache.spark.sql.expressions.Window
        .orderBy(col("m").asc_nulls_last, col("id").asc)).cast("long"))
    val gotRows = Sampling.frequencyBuckets(df, col("m"), col("id"), 10)
      .select("id", "bucket").as[(Long, Long)].collect().toSet
    assert(gotRows === ref.select("id", "bucket").as[(Long, Long)].collect().toSet)
    spark.catalog.clearCache()
  }

  test("weightedSample: exactly k rows, partition-insensitive, seed-sensitive") {
    import spark.implicits._
    val rows = (1 to 500).map(i => (i.toLong, 1.0 + (i % 13))).toDF("k", "w")
    val a = Sampling.weightedSample(rows.coalesce(1), col("k"), col("w"), 50)
      .select("k").collect().map(_.getLong(0)).toSet
    val b = Sampling.weightedSample(rows.repartition(17), col("k"), col("w"), 50)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(a.size === 50)
    assert(a === b)
    val c = Sampling.weightedSample(rows, col("k"), col("w"), 50, seed = 7L)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(a !== c) // a fresh seed is a fresh draw
  }

  test("weightedSample: non-positive and NULL weights never sample") {
    import spark.implicits._
    val rows = Seq((1L, Some(5.0)), (2L, Some(0.0)), (3L, Some(-1.0)),
      (4L, None: Option[Double]), (5L, Some(2.0))).toDF("k", "w")
    val got = Sampling.weightedSample(rows, col("k"), col("w"), 10)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 5L))
  }

  test("weightedSample: overwhelming weights dominate the sample") {
    import spark.implicits._
    // u^(1/w): w=1e6 pushes priority to ~1 regardless of u; w=1e-3
    // pushes it to ~0 — the 10 heavy rows must all be picked.
    val rows = (1 to 100).map(i =>
      (i.toLong, if (i <= 10) 1e6 else 1e-3)).toDF("k", "w")
    val got = Sampling.weightedSample(rows, col("k"), col("w"), 10)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(got === (1L to 10L).toSet)
  }

  test("weightedSample plans a TakeOrderedAndProject, not a global sort") {
    val plan = Sampling.weightedSample(docs, col("doc_id"), col("n_chars"), 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("frequencyBuckets sorts NULL measures last, like SQL") {
    import spark.implicits._
    val df = Seq((1L, Some(5L)), (2L, None), (3L, Some(1L)), (4L, Some(9L)))
      .toDF("id", "m")
    val got = Sampling.frequencyBuckets(df, col("m"), col("id"), 4)
      .select("id", "bucket").as[(Long, Long)].collect().toMap
    assert(got(2L) === 4L, s"NULL measure must land in the last bucket: $got")
    assert(got(3L) === 1L)
    spark.catalog.clearCache()
  }

  test("shard assignment is deterministic and partition-insensitive") {
    import spark.implicits._
    val ids = spark.range(500).toDF("id")
    def assign(df: org.apache.spark.sql.DataFrame) =
      Sampling.withShard(df, col("id"), nShards = 8, seed = 3L)
        .select("id", "shard").as[(Long, Long)].collect().toMap
    val a = assign(ids.coalesce(1))
    val b = assign(ids.repartition(13))
    assert(a === b)
    assert(a.values.forall(s => s >= 0 && s < 8))
    // a different seed is an independent resharding, not a rotation
    val c = Sampling.withShard(ids, col("id"), 8, seed = 4L)
      .select("id", "shard").as[(Long, Long)].collect().toMap
    assert(a.count { case (k, v) => c(k) != v } > 300, "reseed must move most rows")
  }

  test("shard stats: counts conserve N and ratios average to 1") {
    val sharded = Sampling.withShard(spark.range(1000).toDF("id"), col("id"), 8)
    val stats = Sampling.shardStats(sharded, 8).collect()
    assert(stats.map(_.getAs[Long]("n")).sum === 1000L)
    val ratios = stats.map(_.getAs[Double]("balance_ratio"))
    assert(math.abs(ratios.sum - 8.0) < 1e-9)
    // md5 sharding of distinct keys: no shard should be pathological
    assert(ratios.forall(r => r > 0.5 && r < 1.5), ratios.toSeq.toString)
  }

  test("mixRates: exact target shares by construction, rates bounded, binder near 1") {
    import graft.queries.CurationPipelineQueries.ReweightTargets
    val rates = Sampling.mixRates(docs, col("source"),
      size(graft.operators.TextAnalysis.wsTokens(col("text"))), ReweightTargets)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rates.length === ReweightTargets.size)
    // planned_s = w_s * C -> realized shares equal the declared mix
    // EXACTLY: cross-multiplied proportionality, no tolerance
    for (a <- rates; b <- rates)
      assert(a._4 * b._3 === b._4 * a._3,
        s"planned tokens not proportional to weights: $a vs $b")
    // no source upsampled; the binding source's rate sits at ~1
    assert(rates.forall(r => r._5 <= 1000000L && r._4 <= r._2))
    val c = rates.map(r => r._2 / r._3).min
    assert(rates.exists(r => r._5 >= 1000000L * c / (c + 1)),
      s"no binding source near rate 1 in ${rates.mkString(",")}")
  }

  test("mixSample: realized token shares track the declared mix; undeclared sources drop") {
    import spark.implicits._
    // planted fixture: 4 sources, 1500/2500/4000/8000 docs of exactly
    // 10 tokens each + one undeclared source -- big enough that the
    // 1/10000-bucket sampler's realized share lands within a few
    // percent of the target
    val text = Seq.fill(10)("tok").mkString(" ")
    val sizes = Seq("a" -> 1500, "b" -> 2500, "c" -> 4000, "d" -> 8000,
      "zz_undeclared" -> 500)
    val rows = sizes.flatMap { case (src, n) =>
      (0 until n).map(i => (s"$src:$i", src, text))
    }.toDF("doc_id", "source", "text")
    val targets = Seq("a" -> 4L, "b" -> 3L, "c" -> 2L, "d" -> 1L)
    val kept = Sampling.mixSample(rows, col("doc_id"), col("source"),
      size(split(col("text"), " ")), targets)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!kept.contains("zz_undeclared"), "undeclared source must drop")
    val total = kept.values.sum.toDouble
    val wSum = targets.map(_._2).sum.toDouble
    targets.foreach { case (src, w) =>
      val realized = kept.getOrElse(src, 0L) / total
      val want = w / wSum
      assert(math.abs(realized - want) <= 0.03,
        f"source $src realized $realized%.3f vs target $want%.3f")
    }
    // partitioning-immune, like every hash sampler here
    val again = Sampling.mixSample(rows.repartition(13), col("doc_id"),
      col("source"), size(split(col("text"), " ")), targets)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again === kept)
  }

  test("mixRatesEpochs: exact shares, binding source one epoch, upsampled sources epochs >= 2") {
    import graft.queries.CurationPipelineQueries.ReweightTargets
    val plan = Sampling.mixRatesEpochs(docs, col("source"),
      size(graft.operators.TextAnalysis.wsTokens(col("text"))), ReweightTargets)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(plan.length === ReweightTargets.size)
    // planned proportional to weights EXACTLY (cross-multiplied)
    for (a <- plan; b <- plan)
      assert(a._4 * b._3 === b._4 * a._3,
        s"planned tokens not proportional to weights: $a vs $b")
    // realized = epochs·tokens + residual reproduces planned: the
    // residual rate is the exact remainder over tokens
    plan.foreach { case (_, tok, _, planned, epochs, rate) =>
      assert(epochs === planned / tok)
      assert(rate === (planned - epochs * tok) * 1000000L / tok)
    }
    // the max-bound C: every source gets at least ~one full pass
    // (planned = w·⌊tokens_max/w_max⌋ ≥ tokens − w, so the realized
    // ratio in micro-units sits within w/tokens of 10⁶), the binding
    // source sits AT one pass, and with weights spanning 30/5 at least
    // one source upsamples to epochs >= 2
    plan.foreach { case (src, tok, w, _, epochs, rate) =>
      assert(epochs * 1000000L + rate >= 1000000L - (w * 1000000L) / tok - 1,
        s"source $src below one pass: epochs=$epochs rate=$rate")
    }
    assert(plan.exists(p => p._5 * 1000000L + p._6 <= 1000000L),
      s"no binding source at ~one pass in ${plan.mkString(",")}")
    assert(plan.exists(_._5 >= 2L),
      s"no upsampled source at epochs >= 2 in ${plan.mkString(",")}")
  }

  test("mixSampleEpochs: full passes exact, residual tracks its rate, partitioning-immune") {
    import spark.implicits._
    val text = Seq.fill(10)("tok").mkString(" ")
    val sizes = Seq("a" -> 1000, "b" -> 4000, "c" -> 3000,
      "zz_undeclared" -> 300)
    val rows = sizes.flatMap { case (src, n) =>
      (0 until n).map(i => (s"$src:$i", src, text))
    }.toDF("doc_id", "source", "text")
    // equal weights over 10k/40k/30k tokens: C = 40k -> 'a' runs 4
    // exact epochs (no residual), 'b' binds at one pass, 'c' runs one
    // pass plus a 1/3 residual
    val targets = Seq("a" -> 1L, "b" -> 1L, "c" -> 1L)
    val kept = Sampling.mixSampleEpochs(rows, col("doc_id"), col("source"),
      size(split(col("text"), " ")), targets)
    assert(kept.filter(col("source") === "zz_undeclared").isEmpty,
      "undeclared source must drop")
    val bySrc = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("b") === 4000L, "binding source: exactly one full pass")
    assert(bySrc("a") === 4000L, "integral upsampling is exact: 4 x 1000")
    assert(math.abs(bySrc("c") - 4000L) <= 120L,
      s"one pass + 1/3 residual must land near 4000, got ${bySrc("c")}")
    // full epochs are EXACT deterministic copies, distinct per epoch tag
    val aFull = kept.filter(col("source") === "a" && col("epoch") < 4)
    assert(aFull.count() === 4000L)
    assert(aFull.select("doc_id", "epoch").distinct().count() === 4000L)
    // partitioning-immune
    val again = Sampling.mixSampleEpochs(rows.repartition(13),
      col("doc_id"), col("source"), size(split(col("text"), " ")), targets)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again === bySrc)
  }

  test("mixSampleEpochs fails loudly past the 64-epoch oracle ceiling") {
    import spark.implicits._
    // a near-empty source with the same weight as a big one demands
    // C/tokens = 10000 epochs — past the generate_series(0, 64) bound
    // the certifying oracle unrolls, so both engines must FAIL rather
    // than silently diverge (r19 advisor fix)
    val rows = ((0 until 1000).map(i => (s"big:$i", "big", 10L)) :+
      (("tiny:0", "tiny", 1L))).toDF("doc_id", "source", "n_tok")
    val ex = intercept[Exception] {
      Sampling.mixSampleEpochs(rows, col("doc_id"), col("source"),
        col("n_tok"), Seq("big" -> 1L, "tiny" -> 1L)).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("ceiling")),
      s"expected the epoch-ceiling error, got: ${messages(ex)}")
  }
}
