package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Dsir

class DsirSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  // two distinct vocabularies: target-flavored and noise-flavored
  private def corpus = {
    val tgt = (0 until 20).map(i =>
      (i.toLong, s"alpha beta gamma delta alpha beta t$i", true))
    val similar = (20 until 30).map(i =>
      (i.toLong, s"alpha beta gamma delta epsilon s$i", false))
    val noise = (30 until 60).map(i =>
      (i.toLong, s"zeta eta theta iota kappa n$i x$i", false))
    (tgt ++ similar ++ noise).toDF("doc_id", "text", "is_tgt")
  }

  test("target-like docs out-rank noise docs by importance weight") {
    val out = Dsir.importanceSelect(corpus, col("doc_id"), col("text"),
        col("is_tgt"), dim = 64, keepFrac = 0.5)
      .join(corpus.select("doc_id", "is_tgt"), "doc_id")
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Double]("logw"), r.getAs[Boolean]("is_tgt"))).toSeq
    val tgtMean = out.filter(_._3).map(_._2).sum / out.count(_._3)
    val noiseMean = out.filter(x => x._1 >= 30).map(_._2).sum / 30
    assert(tgtMean > noiseMean + 1.0)
    // target-ADJACENT raw docs (shared vocab, not marked target) also
    // out-rank noise — the point of the likelihood ratio
    val simMean = out.filter(x => x._1 >= 20 && x._1 < 30).map(_._2).sum / 10
    assert(simMean > noiseMean)
  }

  test("selection keeps exactly ceil(frac · n) docs") {
    val out = Dsir.importanceSelect(corpus, col("doc_id"), col("text"),
      col("is_tgt"), dim = 64, keepFrac = 0.25)
    assert(out.filter(col("selected") === 1).count() ===
      math.ceil(0.25 * 60).toLong)
    // ranks are a permutation of 1..n
    assert(out.agg(countDistinct(col("sel_rank"))).head().getLong(0) === 60L)
  }

  test("importance table is partition-count-insensitive") {
    def run(parts: Int) = Dsir.importanceSelect(
        corpus.repartition(parts), col("doc_id"), col("text"),
        col("is_tgt"), dim = 32, keepFrac = 0.3)
      .select("doc_id", "n_feats", "logw", "sel_rank", "selected")
      .collect().map(_.toSeq).toSet
    assert(run(1) === run(7))
  }
}
