package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SubstringDedup

class SubstringDedupSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private val L = 4

  /** Brute-force reference: mark every position whose L-gram occurs
    * more than once corpus-wide, merge touching [p, p+L) windows. */
  private def ref(docs: Seq[(Long, String)]): Set[(Long, Long, Long)] = {
    val grams = docs.flatMap { case (id, t) =>
      val w = t.split(" ")
      (0 to w.length - L).map(p => (id, p, w.slice(p, p + L).mkString(" ")))
    }
    val counts = grams.groupBy(_._3).map { case (g, xs) => g -> xs.size }
    val marked = grams.filter(g => counts(g._3) > 1)
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted)
    marked.toSeq.flatMap { case (id, ps) =>
      val spans = scala.collection.mutable.ListBuffer.empty[(Long, Long)]
      ps.foreach { p =>
        if (spans.nonEmpty && p <= spans.last._2)
          spans(spans.length - 1) = (spans.last._1, math.max(spans.last._2, p + L))
        else spans += ((p.toLong, (p + L).toLong))
      }
      spans.map { case (s, e) => (id, s, e) }
    }.toSet
  }

  private def run(docs: Seq[(Long, String)], parts: Int = 3) =
    SubstringDedup.duplicatedSpans(
      docs.toDF("id", "text").repartition(parts),
      col("id"), split(col("text"), " "), L)

  test("finds planted cross-doc duplicates and merges windows into maximal spans") {
    val boiler = "copyright header block do not remove ever"
    val docs = Seq(
      1L -> s"$boiler alpha beta gamma delta epsilon",
      2L -> s"zeta eta $boiler theta iota",
      3L -> "totally unrelated words only once here nothing shared")
    val got = run(docs)
      .select("doc_id", "span_start", "span_end").as[(Long, Long, Long)]
      .collect().toSet
    assert(got === ref(docs))
    // the boilerplate forms ONE merged span per doc, not one per window
    assert(got.count(_._1 == 1L) === 1)
    assert(got.count(_._1 == 2L) === 1)
    assert(!got.exists(_._1 == 3L))
    // span length equals the shared region (7 boilerplate tokens)
    val (_, s, e) = got.find(_._1 == 1L).get
    assert(e - s === 7)
  }

  test("detects self-repeats within a single document") {
    val docs = Seq(1L -> "x y z w filler x y z w")
    val got = run(docs).select("doc_id", "span_start", "span_end")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === ref(docs))
    assert(got === Set((1L, 0L, 4L), (1L, 5L, 9L)))
  }

  test("docs shorter than the window and unique text report nothing") {
    val docs = Seq(1L -> "a b c", 2L -> "one two three four five six")
    assert(run(docs).count() === 0)
  }

  test("matches the reference on a random corpus with planted partner copies") {
    val rnd = new scala.util.Random(5)
    val vocab = ('a' to 'p').map(_.toString)
    val base = (1L to 60L).map(i =>
      i -> Seq.fill(6 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val docs = base ++ base.take(6).map { case (i, t) => (i + 100L) -> s"$t extra" }
    assert(run(docs, parts = 1)
      .select("doc_id", "span_start", "span_end").as[(Long, Long, Long)]
      .collect().toSet === ref(docs))
    // partition-insensitive
    assert(run(docs, parts = 7)
      .select("doc_id", "span_start", "span_end").as[(Long, Long, Long)]
      .collect().toSet === ref(docs))
  }

  test("cross spans mark only corpus regions present in the bench side") {
    val bench = Seq(10L -> "the quick brown fox jumps over lazy dogs")
    val corpus = Seq(
      1L -> "intro words the quick brown fox jumps over lazy dogs outro",
      2L -> "no overlap with anything benchy in this doc at all",
      // corpus-only duplication must NOT mark (cross, not self, criterion)
      3L -> "repeat me now ok repeat me now ok",
      4L -> "repeat me now ok repeat me now ok")
    val got = SubstringDedup.crossSpans(
        corpus.toDF("id", "text"), col("id"), split(col("text"), " "),
        bench.toDF("id", "text"), col("id"), split(col("text"), " "), L)
      .select("doc_id", "span_start", "span_end").as[(Long, Long, Long)]
      .collect().toSet
    // doc 1: the 8 shared tokens sit at positions 2..10
    assert(got === Set((1L, 2L, 10L)))
  }

  test("cutSpans removes exactly the span tokens; spanless and fully-covered docs handled") {
    val docs = Seq(
      1L -> "keep1 keep2 a b c d cut cut keep3",
      2L -> "untouched doc with no spans at all",
      3L -> "x x x x")
    val spans = Seq((1L, 6L, 8L), (3L, 0L, 4L))
      .toDF("doc_id", "span_start", "span_end")
    val got = SubstringDedup.cutSpans(
        docs.toDF("id", "text"), col("id"), split(col("text"), " "), spans)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 9L, 2L, "keep1 keep2 a b c d keep3")))
    assert(got(2L) === ((2L, 7L, 0L, "untouched doc with no spans at all")))
    assert(got(3L) === ((3L, 4L, 4L, "")))
  }

  test("novelty report scores batch windows against history grams") {
    val history = Seq(1L -> "a b c d e f g h")
    val batch = Seq(
      10L -> "a b c d e f g h",        // full copy of history: novelty 0
      11L -> "q r s t u v w x y z",    // nothing shared: novelty 1
      12L -> "a b c d x y z w q")      // window 0 seen (a b c d), rest novel
    val hist = SubstringDedup.gramCounts(
      history.toDF("id", "text"), col("id"), split(col("text"), " "), L)
    val got = SubstringDedup.noveltyReport(
        batch.toDF("id", "text"), col("id"), split(col("text"), " "), hist, L)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(10L) === ((10L, 5L, 0L, 0.0)))
    assert(got(11L) === ((11L, 7L, 7L, 1.0)))
    assert(got(12L)._2 === 6L && got(12L)._3 === 5L)
  }

  test("duplication report: ratios per doc, zero rows for clean docs") {
    val docs = Seq(
      1L -> "p q r s t u v w",
      2L -> "p q r s t u v w",   // full copy: 8/8 duplicated
      3L -> "unique stuff nothing shared at all")
    val got = SubstringDedup.duplicationReport(
      docs.toDF("id", "text"), col("id"), split(col("text"), " "), L)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L)._3 === 8L && got(1L)._5 === 1.0)
    assert(got(2L)._3 === 8L)
    assert(got(3L)._3 === 0L && got(3L)._5 === 0.0 && got(3L)._4 === 0L)
  }
}
