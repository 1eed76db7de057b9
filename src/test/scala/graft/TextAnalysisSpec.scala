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

  test("redactPii scrubs emails, IPs, phones; leaves clean text alone") {
    val rows = Seq(
      ("mail me at jo.anne+x@sub.example.co.uk today",
        "mail me at <EMAIL> today"),
      ("two hits: a@b.io and c.d@e-f.org .",
        "two hits: <EMAIL> and <EMAIL> ."),
      ("server 192.168.1.255 then 10.0.0.1 up",
        "server <IP> then <IP> up"),
      ("call +44-201-55512345 or +1 800 12345678 now",
        "call <PHONE> or <PHONE> now"),
      ("mixed u@v.net from 8.8.8.8 tel +1-555-0000",
        "mixed <EMAIL> from <IP> tel <PHONE>"),
      // non-matches must survive untouched: version strings (3 octets),
      // decimals, bare digit runs, @ without a TLD
      ("v1.2.3 costs 9.99 at 5551234 for user@localhost",
        "v1.2.3 costs 9.99 at 5551234 for user@localhost"))
      .toDF("raw", "want")
    val bad = rows.select(TextAnalysis.redactPii(col("raw")).as("got"), col("want"))
      .filter(col("got") =!= col("want")).collect()
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("CDC chunks: reassemble exactly, and boundaries survive a prefix edit") {
    val sentence = "the quick brown fox jumps over the lazy dog and runs far " +
      "away into the deep dark forest tonight"
    val docs = Seq(
      (1L, sentence),
      (2L, "XY " + sentence), // prefix edit: suffix chunks must realign
      (3L, "short"), // below the window: one whole-document chunk
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val chunks = TextAnalysis.cdcChunks(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    // chunks reassemble to the exact original
    assert(chunks(1L).mkString === sentence)
    assert(chunks(2L).mkString === "XY " + sentence)
    assert(chunks(3L) === Seq("short"))
    assert(!chunks.contains(4L), "null text yields no chunks")
    // doc 1 actually split (the fixture crosses at least one boundary)
    assert(chunks(1L).size >= 2, chunks(1L).toString)
    // the CDC property: after the first post-edit boundary, chunking
    // realigns — the final chunks of the edited doc equal the original's
    assert(chunks(1L).last === chunks(2L).last,
      s"suffix chunks must realign: ${chunks(1L)} vs ${chunks(2L)}")
  }

  test("vocabulary ranks by count desc with term tiebreak") {
    val docs = Seq((1L, "x y y z z")).toDF("doc_id", "text")
    val v = TextAnalysis.vocabulary(docs, "doc_id", "text")
      .orderBy("rank").collect().map(r => (r.getString(0), r.getLong(3)))
    assert(v === Array(("y", 1L), ("z", 2L), ("x", 3L)))
    spark.catalog.clearCache()
  }

  test("hashed features match the portable-bucket recomputation, mass-conserving") {
    val docs = Seq((1L, "a b a c"), (2L, ""), (3L, "a  a")).toDF("doc_id", "text")
    val dim = 8
    val got = docs.select(col("doc_id"),
      TextAnalysis.hashedFeatures(col("text"), dim).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // recompute via the column-level portable hash the oracle mirrors
    def bucket(t: String): Int = {
      val md = graft.functions.PortableHash.md5ThreadLocal
      (graft.functions.PortableHash.md5Hash60(t, md) % dim).toInt
    }
    def ref(text: String): Seq[Long] = {
      val v = Array.fill(dim)(0L)
      text.split(" ", -1).filter(_.nonEmpty).foreach(t => v(bucket(t)) += 1)
      v.toSeq
    }
    assert(got(1L) === ref("a b a c"))
    assert(got(1L).sum === 4L, "components must conserve token mass")
    assert(got(2L) === Seq.fill(dim)(0L), "empty text → zero vector")
    assert(got(3L) === ref("a  a"), "empty tokens from double spaces don't count")
    assert(got(3L).sum === 2L)
  }
}
