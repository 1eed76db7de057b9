package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.operators.GopherRepetition

class GopherRepetitionSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def reportOf(texts: (Long, String)*): Map[Long, Row] =
    GopherRepetition.report(
      texts.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap

  private def frac(r: Row, name: String): Double =
    r.getDouble(r.fieldIndex(name))

  test("per-language adjusted thresholds flip a near-threshold doc") {
    // a doc whose top2 fraction lands in (0.20, 0.25]: fails the
    // English Table-A1 threshold, passes the zh-adjusted (+0.05) one.
    // Construction: a 21-char 2-gram ("aaaaaaaaaa bbbbbbbbbb") ×2 =
    // 42 chars of top-gram mass over a 183-char text (35 distinct
    // 3-char fillers keep every ≥5-gram unique, so all dup fractions
    // are 0): top2 = 42/183 ≈ 0.2295.
    val big = "aaaaaaaaaa bbbbbbbbbb"
    val fillers = (0 until 35).map(i => f"f$i%02d")
    val text = (Seq(fillers.head, big, fillers(1), big) ++ fillers.drop(2))
      .mkString(" ")
    assert(text.length === 183)
    val df = Seq((1L, text, "en"), (2L, text, "zh"))
      .toDF("doc_id", "text", "lang")
    val rep = GopherRepetition.report(df, "doc_id", "text")
      .join(df.select("doc_id", "lang"), "doc_id")
    val got = rep.select(
        org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("gopher_keep"),
        GopherRepetition.keepWithAdjust(
          GopherRepetition.langAdjustCol(
            org.apache.spark.sql.functions.col("lang"))).as("keep_lang"))
      .orderBy("doc_id")
      .as[(Long, Int, Boolean)].collect().toSeq
    // same signals, different verdicts: en drops, zh keeps
    assert(got === Seq((1L, 0, false), (2L, 0, true)))
    val r = reportOf(1L -> text)(1L)
    assert(frac(r, "top2_frac") === 42.0 / 183)
  }

  test("adjusted-threshold SQL emits precomputed IEEE double sums") {
    // 0.18 + 0.05 in IEEE doubles is 0.22999999999999998, one ulp
    // under decimal 0.23. The oracle must compare against the SAME
    // double the engine computes, so the generated SQL must contain
    // the precomputed literal, never a SQL-side `+ adj` that DuckDB
    // would evaluate as exact DECIMAL addition.
    val sql = GopherRepetition.keepWithAdjustSql("lang")
    assert((0.18 + 0.05).toString === "0.22999999999999998")
    assert(sql.contains("0.22999999999999998"))
    assert(!sql.contains("+"))
    // unlisted languages fall to the unadjusted Table-A1 literal
    assert(sql.contains("ELSE 0.18 END"))
  }

  test("top-gram fractions match a hand computation") {
    // "a b a b a b" (11 chars): tokens a,b,a,b,a,b
    // 2-grams: "a b"×3, "b a"×2 → top = 3·3 = 9 chars → 9/11
    // 3-grams: "a b a"×2, "b a b"×2 → tie on (cnt, len) → either
    //   yields 2·5 = 10 → 10/11
    // 4-grams: "a b a b"×2, "b a b a"×1 → wait: positions 1..3 give
    //   "a b a b", "b a b a", "a b a b" → top 2·7 = 14 → 14/11 (>1 OK)
    val r = reportOf(1L -> "a b a b a b")(1L)
    assert(frac(r, "top2_frac") === 9.0 / 11)
    assert(frac(r, "top3_frac") === 10.0 / 11)
    assert(frac(r, "top4_frac") === 14.0 / 11)
  }

  test("dup-gram fraction counts all occurrences of repeated grams") {
    // 12 tokens: the 5-gram "x y z w v" occurs twice (pos 1 and 7,
    // non-overlapping), every other 5-gram once.
    // text chars: 12 tokens ·1 char + 11 spaces = 23
    // dup5 = 2 · 9 = 18 → 18/23; 6-gram "x y z w v q" twice? pos1:
    // x y z w v q, pos7: x y z w v r → no. dup6 = 0 unless another
    // repeat exists; grams at pos 2..6 unique. → dup6_frac = 0
    val r = reportOf(1L -> "x y z w v q x y z w v r")(1L)
    assert(frac(r, "dup5_frac") === 18.0 / 23)
    assert(frac(r, "dup6_frac") === 0.0)
  }

  test("short and gram-free docs report all-zero fractions and keep=1") {
    val m = reportOf(1L -> "one", 2L -> "a b")
    val r1 = m(1L) // 1 token: no 2-grams at all
    GopherRepetition.topThresholds.foreach { case (n, _) =>
      assert(frac(r1, s"top${n}_frac") === 0.0) }
    GopherRepetition.dupThresholds.foreach { case (n, _) =>
      assert(frac(r1, s"dup${n}_frac") === 0.0) }
    assert(r1.getInt(r1.fieldIndex("gopher_keep")) === 1)
    val r2 = m(2L) // one 2-gram occurring once → top2 = 3/3 = 1.0
    assert(frac(r2, "top2_frac") === 1.0)
    assert(r2.getInt(r2.fieldIndex("gopher_keep")) === 0)
  }

  test("keep decision applies each Gopher threshold") {
    // 80 distinct tokens: every gram unique → top-n fraction is one
    // gram's chars over the whole text (well under every threshold at
    // this length — the thresholds implicitly assume non-tiny docs),
    // dup fractions 0
    val clean = reportOf(1L -> (0 until 80).map(i => s"t$i").mkString(" "))(1L)
    assert(clean.getInt(clean.fieldIndex("gopher_keep")) === 1)
    // heavy 2-gram repetition → top2 way over 0.20 → reject
    val spam = reportOf(2L -> "buy now buy now buy now buy now")(2L)
    assert(frac(spam, "top2_frac") > 0.20)
    assert(spam.getInt(spam.fieldIndex("gopher_keep")) === 0)
  }

  test("report is partition-insensitive and one row per doc") {
    val docs = (0L until 40L)
      .map(i => (i, if (i % 3 == 0) "spam spam spam spam spam"
                    else s"tok${i} alpha beta gamma delta tok${i + 1}"))
    val a = GopherRepetition.report(
      docs.toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val b = GopherRepetition.report(
      docs.toDF("doc_id", "text").repartition(7), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
    assert(a.size === 40)
  }

  test("single-pass expression matches the distributed groupBy reference") {
    // adversarial shapes: consecutive/leading/trailing spaces (empty
    // tokens), multi-byte UTF-8, heavy repetition, unique text, and a
    // doc shorter than every window
    val docs = Seq(
      0L -> "a  b a  b a  b",           // empty tokens preserve structure
      1L -> "héllo wörld héllo wörld héllo wörld x",
      2L -> " lead and trail ",
      3L -> "spam spam spam spam spam spam spam spam",
      4L -> (0 until 60).map(i => s"u$i").mkString(" "),
      5L -> "tiny",
      6L -> "x y z w v q x y z w v r x y z w v q") ++
      (0L until 50L).map(i =>
        (100L + i, s"w${i % 7} w${(i + 1) % 5} w${i % 3} w${i % 7} w${(i + 1) % 5} common tail w${i % 11}"))
    val df = docs.toDF("doc_id", "text")
    val a = GopherRepetition.report(df, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val b = GopherRepetition.reportViaShuffle(df.repartition(5), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("top-gram choice is the (cnt, len) max; ties value-equivalent") {
    // the implementation orders by packed (cnt, len) only — grams
    // tying on both yield the same fraction, so their choice is
    // arbitrary but output-equivalent (no gram-lexicographic order is
    // promised). Assert via a len-DISTINCT tie on cnt:
    // "aaa b"×2 (5 chars) vs "c d"×2 (3 chars) → longer wins.
    val r = reportOf(1L -> "aaa b x aaa b y c d z c d")(1L)
    // text chars: 4·3 + 7·1 ... compute: tokens aaa,b,x,aaa,b,y,c,d,z,c,d
    // chars = 3+1+1+3+1+1+1+1+1+1+1 = 15 + 10 spaces = 25
    // top2 by (cnt,len): "aaa b"×2 len5 → 10/25 = 0.4
    assert(frac(r, "top2_frac") === 10.0 / 25)
  }
}
