package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  test("encodeTokens keeps null-text docs (NULL ids) instead of dropping them") {
    val docs = Seq(
      (1L, "a b a"),
      (2L, null.asInstanceOf[String]),
      (3L, "b b b")).toDF("doc_id", "text")
    val enc = TextAnalysis.encodeTokens(docs, "doc_id", "text", vocabSize = 2)
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(enc.keySet === Set(1L, 2L, 3L))
    assert(enc(2L).isEmpty, "null text must encode to NULL ids, not vanish")
    // vocab over non-null texts: b (4 occurrences) -> 1, a (2) -> 2
    assert(enc(1L).contains("2,1,2"))
    assert(enc(3L).contains("1,1,1"))
    spark.catalog.clearCache()
  }

  test("vocabulary ranks by count desc with term tiebreak") {
    val docs = Seq((1L, "x y y z z")).toDF("doc_id", "text")
    val v = TextAnalysis.vocabulary(docs, "doc_id", "text")
      .orderBy("rank").collect().map(r => (r.getString(0), r.getLong(3)))
    assert(v === Array(("y", 1L), ("z", 2L), ("x", 3L)))
    spark.catalog.clearCache()
  }
}
