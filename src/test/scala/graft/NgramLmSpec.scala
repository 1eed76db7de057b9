package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.NgramLm

class NgramLmSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  /** Reference single-threaded bigram add-k cross-entropy. */
  private def refXent(corpus: Seq[(Long, String)], k: Double): Map[Long, Double] = {
    val toks = corpus.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val bigrams = toks.flatMap { case (_, ws) => ws.zip(ws.drop(1)) }
    val cLr = bigrams.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val cL = bigrams.groupBy(_._1).map { case (l, xs) => l -> xs.size.toLong }
    val v = toks.flatMap(_._2).distinct.size.toDouble
    toks.collect { case (id, ws) if ws.length >= 2 =>
      val lps = ws.zip(ws.drop(1)).map { p =>
        val raw = math.log((cLr.getOrElse(p, 0L) + k) / (cL.getOrElse(p._1, 0L) + k * v))
        BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }
      id -> -(lps.sum.toDouble) / lps.size
    }.toMap
  }

  test("self-scored cross-entropy matches the reference on a hand corpus") {
    val corpus = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the cat"),
      (3L, "colorless green ideas sleep furiously"),
      (4L, "the the the the"),
      (5L, "single"))
    val got = NgramLm.selfCrossEntropy(
      corpus.toDF("doc_id", "text"), col("doc_id"), col("text"))
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    val want = refXent(corpus, 0.5)
    assert(got.keySet === want.keySet) // doc 5 has no bigram → absent
    got.foreach { case (id, x) =>
      assert(math.abs(x - want(id)) < 1e-9, s"doc $id: $x vs ${want(id)}")
    }
    // in-distribution docs score lower than the one-off word salad
    assert(got(1L) < got(3L) && got(2L) < got(3L),
      s"coherent docs must out-score word salad: $got")
  }

  test("scoring is partition-insensitive") {
    val corpus = (1L to 200L).map(i =>
      (i, (0 until 6).map(j => s"w${(i * 7 + j * 3) % 23}").mkString(" ")))
    def run(parts: Int) = NgramLm.selfCrossEntropy(
      corpus.toDF("doc_id", "text").repartition(parts), col("doc_id"), col("text"))
      .as[(Long, Long, Double)].collect().toSet
    assert(run(1) === run(11))
  }

  test("a foreign model prices unseen bigrams at 1/V, never NULL/Inf") {
    val ref = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val model = NgramLm.bigramModel(ref, col("text"))
    val scored = NgramLm.crossEntropy(
      Seq((9L, "delta epsilon zeta")).toDF("doc_id", "text"),
      col("doc_id"), col("text"), model)
      .as[(Long, Long, Double)].collect()
    assert(scored.length === 1)
    val (_, n, x) = scored.head
    assert(n === 2L)
    // every bigram unseen: logp = ln(k / (k·V)) = ln(1/V), V = 3
    assert(math.abs(x - math.log(3.0)) < 1e-5, s"xent $x vs ln 3")
    assert(!x.isNaN && !x.isInfinite)
  }

  test("repetitive boilerplate scores LOWER than unique prose under the corpus model") {
    // 50 copies of one template + one unique doc: template bigrams are
    // high-probability, unique bigrams are one-offs
    val corpus = (1L to 50L).map(i => (i, "click here to unsubscribe now")) :+
      (99L, "quarterly congestion varies across remote highland sites")
    val got = NgramLm.selfCrossEntropy(
      corpus.toDF("doc_id", "text"), col("doc_id"), col("text"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(got(1L) < got(99L),
      s"boilerplate ${got(1L)} must score below unique prose ${got(99L)}")
  }
}
