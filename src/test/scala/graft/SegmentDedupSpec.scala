package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.SegmentDedup

class SegmentDedupSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def toy(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("exact duplicate doc loses all full segments; first copy keeps everything") {
    val t = (1 to 25).map(i => s"w$i").mkString(" ") // 2 full segs + 5-token tail
    val out = SegmentDedup.dedupSegments(toy(1L -> t, 2L -> t), "doc_id", "text", 10)
      .orderBy("doc_id")
      .select("doc_id", "n_segs", "n_dropped", "new_n_tokens", "new_text")
      .collect()
    assert(out(0).getLong(1) === 3 && out(0).getLong(2) === 0)
    assert(out(0).getString(4) === t) // winner untouched
    assert(out(1).getLong(2) === 2) // both full segs dropped
    assert(out(1).getLong(3) === 5) // only the 5-token tail survives
    assert(out(1).getString(4) === (21 to 25).map(i => s"w$i").mkString(" "))
  }

  test("intra-document repeated segments are deduped too") {
    val seg = (1 to 10).map(i => s"r$i").mkString(" ")
    val out = SegmentDedup
      .dedupSegments(toy(1L -> s"$seg $seg $seg"), "doc_id", "text", 10)
      .select("n_dropped", "new_text").head()
    assert(out.getLong(0) === 2 && out.getString(1) === seg)
  }

  test("partial tail segments are never dropped, even when identical") {
    // two docs that are exactly the same 7-token string: one partial seg each
    val t = "a b c d e f g"
    val out = SegmentDedup.dedupSegments(toy(1L -> t, 2L -> t), "doc_id", "text", 10)
      .select("doc_id", "n_dropped", "new_text").orderBy("doc_id").collect()
    assert(out.forall(_.getLong(1) === 0))
    assert(out.forall(_.getString(2) === t))
  }

  test("winner is the global lexicographic-min (doc_id, seg_id) occurrence") {
    // doc 5 contains the segment twice; doc 3 contains it once later.
    val seg = (1 to 10).map(i => s"t$i").mkString(" ")
    val filler = (1 to 10).map(i => s"f$i").mkString(" ")
    val d3 = s"$filler $seg" // seg at seg_id 1
    val d5 = s"$seg $seg" // seg at seg_id 0 and 1
    val out = SegmentDedup.dedupSegments(toy(3L -> d3, 5L -> d5), "doc_id", "text", 10)
      .select("doc_id", "n_dropped", "new_text").orderBy("doc_id").collect()
    // winner is (3, 1): doc 3 keeps both its segments; doc 5 drops both copies
    assert(out(0).getLong(1) === 0 && out(0).getString(2) === d3)
    assert(out(1).getLong(1) === 2 && out(1).getString(2) === "")
  }

  test("no duplicates -> reconstruction is the identity") {
    val docs = toy(
      1L -> (1 to 23).map(i => s"a$i").mkString(" "),
      2L -> (1 to 9).map(i => s"b$i").mkString(" "),
      3L -> (1 to 40).map(i => s"c$i").mkString(" "))
    val out = SegmentDedup.dedupSegments(docs, "doc_id", "text", 10)
    assert(out.filter(col("new_text") =!= col("text")).count() === 0)
    assert(out.filter(col("n_dropped") =!= 0).count() === 0)
    assert(out.filter(col("new_n_tokens") =!= size(split(col("text"), " "))).count() === 0)
  }

  test("real corpus: drops fire, token accounting is consistent") {
    val out = SegmentDedup
      .dedupSegments(Tables.documents(spark, TestSession.sfDir), "doc_id", "text", 10)
      .select(col("n_dropped"), col("new_n_tokens"),
        size(split(col("new_text"), " ")).cast("long").as("rebuilt_toks"),
        size(split(col("text"), " ")).cast("long").as("orig_toks"))
      .cache()
    try {
      assert(out.agg(sum("n_dropped")).head.getLong(0) > 0,
        "corpus is known to contain exact-duplicate documents")
      // new_n_tokens must equal the rebuilt text's token count unless the
      // rebuild emptied the doc (split("") -> [""], size 1)
      val bad = out.filter(col("new_n_tokens") =!= col("rebuilt_toks") &&
        !(col("new_n_tokens") === 0 && col("rebuilt_toks") === 1))
      assert(bad.count() === 0)
      assert(out.filter(col("new_n_tokens") > col("orig_toks")).count() === 0)
    } finally out.unpersist()
  }

  test("candidate generation is ids-only: exploded relation carries no text column") {
    val ids = SegmentDedup.fullSegmentIds(
      Tables.documents(spark, TestSession.sfDir), "doc_id", "text", 10)
    assert(ids.columns.toSet === Set("_h", "_id", "_seg_id"))
  }

  test("crossGroupOverlap counts distinct shared full segments per source pair") {
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val segA = (1 to 10).map(i => s"a$i").mkString(" ")
    val segB = (1 to 10).map(i => s"b$i").mkString(" ")
    val df = Seq(
      ("A", s"$shared $segA"),            // A: shared + own
      ("A", s"$shared extra tail"),       // same shared segment again: distinct-counted once
      ("B", s"$shared $segB"),            // B: shared + own
      ("C", segB)                          // C shares segB with B only
    ).toDF("source", "text")
    val out = SegmentDedup.crossGroupOverlap(df, "text", "source", 10)
      .orderBy("source_a", "source_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(out.toSeq === Seq(
      ("A", "B", 1L, 2L, 2L, 1.0 / 3.0),  // shared seg; A has {shared, segA}, B {shared, segB}
      ("B", "C", 1L, 2L, 1L, 1.0 / 2.0))) // segB; no A-C overlap row at all
  }

  test("crossGroupOverlap ignores partial tail segments") {
    // 5-token texts produce no FULL segment, so identical tails never count
    val df = Seq(("A", "x1 x2 x3 x4 x5"), ("B", "x1 x2 x3 x4 x5")).toDF("source", "text")
    assert(SegmentDedup.crossGroupOverlap(df, "text", "source", 10).count() === 0)
  }
}
