package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Bpe

class BpeSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  /** Reference greedy left-to-right non-overlapping merge scan. */
  private def scanMerge(syms: List[String], l: String, r: String): List[String] = {
    val buf = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
        buf += (l + r); i += 2
      } else { buf += syms(i); i += 1 }
    }
    buf.toList
  }

  /** Reference single-threaded BPE trainer (Sennrich). */
  private def refBpe(words: Map[String, Long], k: Int): Seq[(Long, String, String, Long)] = {
    var vocab = words.toSeq.map { case (w, f) => (w.split("").toList, f) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var round = 1
    var done = false
    while (round <= k && !done) {
      val counts = vocab.flatMap { case (s, f) =>
        s.zip(s.drop(1)).map(p => p -> f)
      }.groupBy(_._1).map { case (p, xs) => (p, xs.map(_._2).sum) }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((round.toLong, l, r, c))
        vocab = vocab.map { case (s, f) => (scanMerge(s, l, r), f) }
        round += 1
      }
    }
    out.toSeq
  }

  private def trainOn(words: Map[String, Long], k: Int, parts: Int = 1) =
    Bpe.train(words.toSeq.toDF("word", "freq").repartition(parts), "word", "freq", k)
      .orderBy("rank").as[(Long, String, String, Long)].collect().toSeq

  test("the fold merge equals the left-to-right scan on adversarial shapes") {
    val cases = Seq(
      ("aaa", "a", "a"), ("aaaa", "a", "a"), ("aaaaa", "a", "a"),
      ("abab", "a", "b"), ("aab", "a", "b"), ("bab", "b", "a"),
      ("xyx", "x", "y"), ("", "a", "b"), ("a", "a", "a"))
    cases.foreach { case (w, l, r) =>
      val got = Seq(w).toDF("w")
        .select(graft.operators.Bpe.mergeOnce(split(col("w"), ""), lit(l), lit(r)))
        .as[Seq[String]].collect().head.toList
      assert(got === scanMerge(w.split("").toList, l, r), s"word=$w merge=($l,$r)")
    }
  }

  test("training matches the reference on a tie-heavy corpus") {
    // 'ab' and 'ba' pair counts tie; lexicographic break picks ('a','b')
    val words = Map("abab" -> 2L, "baba" -> 2L, "cc" -> 5L)
    assert(trainOn(words, 6) === refBpe(words, 6))
  }

  test("training matches the reference on seeded random corpora") {
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { _ =>
      val words = (1 to 30).map { _ =>
        val len = 1 + rnd.nextInt(8)
        (Seq.fill(len)("abcd" (rnd.nextInt(4))).mkString, 1L + rnd.nextInt(20))
      }.groupBy(_._1).map { case (w, xs) => (w, xs.map(_._2).sum) }
      assert(trainOn(words, 10) === refBpe(words, 10))
    }
  }

  test("the merge table is partition-count-insensitive") {
    val words = Map("hello" -> 10L, "help" -> 7L, "hull" -> 3L, "jello" -> 5L)
    assert(trainOn(words, 8, parts = 1) === trainOn(words, 8, parts = 7))
  }

  test("training stops early when no pair remains") {
    val words = Map("ab" -> 3L) // one pair, then single symbols only
    val got = trainOn(words, 10)
    assert(got === Seq((1L, "a", "b", 3L)))
  }

  private def trainDeltaOn(words: Map[String, Long], k: Int, parts: Int = 1) =
    Bpe.trainDelta(words.toSeq.toDF("word", "freq").repartition(parts), "word", "freq", k)
      .orderBy("rank").as[(Long, String, String, Long)].collect().toSeq

  test("delta training equals full-recount training on tie-heavy and random corpora") {
    // exact-integer retract/add deltas must reproduce the recounted
    // pair table bit-for-bit, so the merge tables are identical
    val tie = Map("abab" -> 2L, "baba" -> 2L, "cc" -> 5L)
    assert(trainDeltaOn(tie, 6) === refBpe(tie, 6))
    val rnd = new scala.util.Random(7)
    (1 to 2).foreach { _ =>
      val words = (1 to 30).map { _ =>
        val len = 1 + rnd.nextInt(8)
        (Seq.fill(len)("abcd" (rnd.nextInt(4))).mkString, 1L + rnd.nextInt(20))
      }.groupBy(_._1).map { case (w, xs) => (w, xs.map(_._2).sum) }
      assert(trainDeltaOn(words, 10) === refBpe(words, 10), s"words=$words")
    }
  }

  test("delta training: overlapping-run retraction (aaaa) and early stop match") {
    // 'aaaa' merging (a,a) retracts 3 pairs and adds 1 — the signed-
    // delta arithmetic must handle overlapping runs exactly
    val runs = Map("aaaa" -> 3L, "aaa" -> 2L, "ba" -> 1L)
    assert(trainDeltaOn(runs, 8) === refBpe(runs, 8))
    assert(trainDeltaOn(Map("ab" -> 3L), 10) === Seq((1L, "a", "b", 3L)))
  }

  test("delta training is partition-count-insensitive and equals train on the corpus table") {
    val words = Map("hello" -> 10L, "help" -> 7L, "hull" -> 3L, "jello" -> 5L)
    assert(trainDeltaOn(words, 8, parts = 7) === trainOn(words, 8, parts = 1))
    val docs = Seq((1L, "the cat sat on the mat"), (2L, "the bat and the cat"),
      (3L, "on and on and on")).toDF("doc_id", "text")
    val freq = Bpe.wordFreq(docs, col("text"))
    val full = Bpe.train(freq, "word", "freq", 10)
      .orderBy("rank").as[(Long, String, String, Long)].collect().toSeq
    val delta = Bpe.trainDelta(freq, "word", "freq", 10)
      .orderBy("rank").as[(Long, String, String, Long)].collect().toSeq
    assert(delta === full)
  }

  private def trainBatchedOn(
      words: Map[String, Long], k: Int, batch: Int, parts: Int = 1) =
    Bpe.trainBatched(words.toSeq.toDF("word", "freq").repartition(parts),
        "word", "freq", k, batch)
      .orderBy("rank").as[(Long, String, String, Long)].collect().toSeq

  test("batched training equals sequential greedy where pairs don't interact") {
    // four symbol-disjoint high-count pairs, well separated in count
    // from anything a merge could create — the exactness condition
    val words = Map("abab" -> 50L, "cdcd" -> 40L, "efef" -> 30L,
      "ghgh" -> 20L, "xy" -> 1L)
    (1 to 4).foreach { b =>
      assert(trainBatchedOn(words, 4, batch = b) === refBpe(words, 4),
        s"batch=$b")
    }
    // and the state stays exact ACROSS rounds: train far past the
    // disjoint prefix and compare the full table
    assert(trainBatchedOn(words, 10, batch = 4) === refBpe(words, 10))
  }

  test("batched training stops accepting at the first symbol conflict") {
    // stale top-3 is (a,b)=100, (b,c)=95, (c,d)=95: (b,c) conflicts
    // with the accepted (a,b), so acceptance STOPS — (c,d) must not
    // be taken even though its symbols are disjoint, because the
    // merge of (a,b) creates (ab,c) pairs that sequential greedy
    // would rank against it
    val words = Map("abcd" -> 95L, "ab" -> 5L)
    assert(trainBatchedOn(words, 3, batch = 3) === refBpe(words, 3))
  }

  test("batched training is partition-insensitive; batch=1 equals delta") {
    val words = Map("hello" -> 10L, "help" -> 7L, "hull" -> 3L, "jello" -> 5L)
    assert(trainBatchedOn(words, 8, batch = 4, parts = 7) ===
      trainBatchedOn(words, 8, batch = 4, parts = 1))
    assert(trainBatchedOn(words, 8, batch = 1) === trainDeltaOn(words, 8))
    // early stop: runs out of pairs before k
    assert(trainBatchedOn(Map("ab" -> 3L), 10, batch = 4) ===
      Seq((1L, "a", "b", 3L)))
  }

  private def trainLocalOn(words: Map[String, Long], k: Int) =
    Bpe.trainLocal(words.toSeq.toDF("word", "freq"), "word", "freq", k)
      .orderBy("rank").as[(Long, String, String, Long)].collect().toSeq

  test("local trainer equals the reference on tie-heavy and random corpora") {
    val tie = Map("abab" -> 5L, "baba" -> 5L, "aabb" -> 5L, "bbaa" -> 5L)
    assert(trainLocalOn(tie, 6) === refBpe(tie, 6))
    val rnd = new scala.util.Random(77)
    (0 until 5).foreach { t =>
      val words = (0 until 40).map { _ =>
        val len = 1 + rnd.nextInt(7)
        (0 until len).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      }.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
      assert(trainLocalOn(words, 12) === refBpe(words, 12), s"trial $t")
    }
    // overlapping-run retraction and early stop
    assert(trainLocalOn(Map("aaaa" -> 3L), 10) === refBpe(Map("aaaa" -> 3L), 10))
    assert(trainLocalOn(Map("ab" -> 3L), 10) === Seq((1L, "a", "b", 3L)))
  }

  test("local trainer equals the distributed trainers on a corpus table") {
    val docs = Seq(
      (1L, "low lower lowest low low"),
      (2L, "new newer newest new lower"),
      (3L, "on and on and on")).toDF("doc_id", "text")
    val freq = Bpe.wordFreq(docs, col("text"))
    val local = Bpe.trainLocal(freq, "word", "freq", 10)
      .orderBy("rank").as[(Long, String, String, Long)].collect().toSeq
    val delta = Bpe.trainDelta(freq, "word", "freq", 10)
      .orderBy("rank").as[(Long, String, String, Long)].collect().toSeq
    assert(local === delta)
  }

  test("corpus encoding applies merges in rank order and reconstructs every word") {
    val docs = Seq((1L, "aaab ab cc"), (2L, "ab aaab")).toDF("doc_id", "text")
    val words = Bpe.wordFreq(docs, col("text"))
    val merges = Bpe.train(words, "word", "freq", 3)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val enc = Bpe.encodeCorpus(docs, col("doc_id"), col("text"), merges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getSeq[String](3)))
    assert(enc.length === 5) // every non-empty token once
    enc.foreach { case (_, _, word, subs) =>
      assert(subs.mkString === word, "subwords must concatenate back to the word")
      assert(subs === merges.foldLeft(word.split("").toList) {
        case (s, (l, r)) => scanMerge(s, l, r)
      }, s"encoding of $word must equal the reference merge sequence")
    }
  }

  test("symbol vocab conserves weighted symbol mass through merges") {
    val words = Map("aaab" -> 4L, "ab" -> 2L)
    val ref = refBpe(words, 3)
    val vocabDf = Bpe.symbolVocab(words.toSeq.toDF("word", "freq"), "word", "freq", 3)
      .as[(String, Long)].collect().toMap
    // replay the reference encoding and count symbols
    var enc = words.toSeq.map { case (w, f) => (w.split("").toList, f) }
    ref.foreach { case (_, l, r, _) => enc = enc.map { case (s, f) => (scanMerge(s, l, r), f) } }
    val want = enc.flatMap { case (s, f) => s.map(_ -> f) }
      .groupBy(_._1).map { case (sym, xs) => (sym, xs.map(_._2).sum) }
    assert(vocabDf === want)
  }
}
