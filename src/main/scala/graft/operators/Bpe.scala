package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units") — the
  * vocabulary-LEARNING step upstream of the engine's vocabulary build
  * (N11) and token-id encode (N12): greedily merge the most frequent
  * adjacent symbol pair k times, starting from characters.
  *
  * Scale shape — the standard decomposition: merges depend ONLY on the
  * word-frequency table, so the corpus aggregates once to
  * (word, freq) — O(distinct words), shuffled once — and every round
  * runs over that table: adjacent-pair counting is an explode +
  * map-side-combinable groupBy, argmax is a 1-row TakeOrdered to the
  * driver (the KMeans/IVF iterative contract: one scalar-ish action per
  * round), and re-encoding is a per-row fold. Round frames checkpoint
  * (bounded lineage, the CC discipline). Corpus size only ever enters
  * through the one word-count aggregation.
  *
  * Determinism: ties break (pair count DESC, left ASC, right ASC) — a
  * total order, so the merge table is identical on any cluster at any
  * partition count (spec-asserted).
  *
  * The per-round merge is the greedy LEFT-TO-RIGHT non-overlapping
  * scan, expressed as a fold: keep appending symbols; when the
  * accumulator's last symbol is `l` and the next is `r`, replace the
  * last with `l||r`. The fold equals the two-pointer scan because a
  * just-merged last symbol `l||r` can never equal `l` again (r is
  * non-empty), so no double-merge chain can form — BpeSpec pins this
  * equivalence against a reference scan on the adversarial shapes
  * (aaa, aaaa, abab, aab).
  */
object Bpe {

  /** One greedy left-to-right merge pass of (l, r) over a symbol
    * array (fold form — see object doc). */
  private[graft] def mergeOnce(arr: Column, l: Column, r: Column): Column =
    aggregate(arr, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 && element_at(acc, -1) === l && x === r,
        concat(slice(acc, lit(1), size(acc) - 1), array(concat(l, r))))
        .otherwise(concat(acc, array(x))))

  /** Corpus → (word, freq), the only corpus-sized pass. */
  def wordFreq(docs: DataFrame, text: Column): DataFrame =
    docs.select(explode(split(text, " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Train up to `k` merges on a (word, freq) table. Output:
    * (rank, left, right, pair_freq), rank 1-based in merge order.
    * Stops early when no adjacent pair remains.
    *
    * This is the REFERENCE implementation (full pair recount each
    * round, O(total symbols) shuffled per round) — simple enough to
    * audit against the single-threaded Sennrich trainer. Production
    * paths use [[trainDelta]], which maintains the pair table
    * incrementally and is spec-pinned identical to this. */
  def train(words: DataFrame, wordCol: String, freqCol: String, k: Int): DataFrame = {
    require(k >= 1, "need at least one merge round")
    val spark = words.sparkSession
    var vocab = words
      .select(split(col(wordCol), "").as("_syms"), col(freqCol).cast("long").as("_f"))
      .localCheckpoint(false)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var round = 1
    var done = false
    while (round <= k && !done) {
      val best = vocab
        .select(col("_f"), explode(pairsOf(col("_syms"))).as("_p"))
        .groupBy(col("_p.l").as("l"), col("_p.r").as("r"))
        .agg(sum(col("_f")).as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val row = best.head
        val (l, r, c) = (row.getString(0), row.getString(1), row.getLong(2))
        merges += ((round.toLong, l, r, c))
        vocab = vocab
          .withColumn("_syms", mergeOnce(col("_syms"), lit(l), lit(r)))
          .localCheckpoint(false)
        round += 1
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("rank", "left", "right", "pair_freq")
  }

  /** Adjacent symbol pairs of a symbol array, as (l, r) structs —
    * shared by both trainers and NgramLm's bigram model (one
    * definition, so pair construction can never silently diverge). */
  private[operators] def pairsOf(syms: Column): Column = {
    val n = size(syms)
    zip_with(slice(syms, lit(1), n - 1), slice(syms, lit(2), n - 1),
      (a, b) => struct(a.as("l"), b.as("r")))
  }

  /** [[train]] with PER-ROUND PAIR-COUNT DELTAS — the production path
    * for large k. [[train]] re-counts every adjacent pair of every word
    * each round: an O(total symbols) explode + shuffle per round, which
    * at production vocab sizes (k ≈ 32k merges) dominates. Here the
    * pair-count table is MAINTAINED instead: after merging (l, r), only
    * words that actually contain the (l, r) adjacency change, so their
    * old pairs retract (−freq) and their re-encoded pairs add (+freq),
    * and the per-round SHUFFLE is O(pairs of touched words) — under the
    * Zipfian corpus shape the touched set shrinks rapidly with rank,
    * which is what makes large-k training tractable. The argmax stays
    * one 1-row action per round over the O(distinct pairs) state table
    * (the KMeans/IVF iterative-driver contract), and the per-round
    * projection over the word table stays shuffle-free.
    *
    * Exactness: deltas are exact integer arithmetic, so the maintained
    * table equals [[train]]'s per-round recount bit-for-bit and the
    * merge table is IDENTICAL — BpeSpec pins trainDelta ≡ train on the
    * adversarial fixtures, under repartitioning, and on the corpus
    * word-frequency table; the q_text_vocab_bpe hash oracle certifies
    * it against the reference-implementation SQL per run. */
  def trainDelta(words: DataFrame, wordCol: String, freqCol: String, k: Int): DataFrame = {
    require(k >= 1, "need at least one merge round")
    val spark = words.sparkSession
    var vocab = words
      .select(split(col(wordCol), "").as("_syms"), col(freqCol).cast("long").as("_f"))
      .localCheckpoint(false)
    var pairCounts = vocab
      .select(col("_f"), explode(pairsOf(col("_syms"))).as("_p"))
      .groupBy(col("_p.l").as("l"), col("_p.r").as("r"))
      .agg(sum(col("_f")).as("cnt"))
      .localCheckpoint(false)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var round = 1
    var done = false
    while (round <= k && !done) {
      val best = pairCounts
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val row = best.head
        val (l, r, c) = (row.getString(0), row.getString(1), row.getLong(2))
        merges += ((round.toLong, l, r, c))
        val isHit = exists(pairsOf(col("_syms")),
          p => p.getField("l") === lit(l) && p.getField("r") === lit(r))
        val aff = vocab.filter(isHit)
          .withColumn("_new", mergeOnce(col("_syms"), lit(l), lit(r)))
        val deltas = aff
          .select((-col("_f")).as("_d"), explode(pairsOf(col("_syms"))).as("_p"))
          .unionAll(aff
            .select(col("_f").as("_d"), explode(pairsOf(col("_new"))).as("_p")))
          .groupBy(col("_p.l").as("l"), col("_p.r").as("r"))
          .agg(sum(col("_d")).as("cnt"))
        // EAGER checkpoints: the lazy (eager=false) form left an
        // unmaterialized checkpoint chain threading through every
        // round's plan — at k ≈ 100+ rounds the nested dependency
        // stack overflowed executor threads (measured at g0.1
        // k=256). Eager truncation bounds the chain at one round.
        pairCounts = pairCounts.unionAll(deltas)
          .groupBy("l", "r").agg(sum(col("cnt")).as("cnt"))
          .filter(col("cnt") > 0L)
          .localCheckpoint()
        vocab = vocab
          .withColumn("_syms",
            when(isHit, mergeOnce(col("_syms"), lit(l), lit(r)))
              .otherwise(col("_syms")))
          .localCheckpoint()
        round += 1
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("rank", "left", "right", "pair_freq")
  }

  /** [[trainDelta]] with BATCHED MERGE SELECTION — the large-k path.
    * trainDelta's per-merge driver round-trip (one 1-row argmax action
    * per merge) is a latency wall at production vocab sizes: 32k
    * merges = 32k Spark jobs regardless of data size. Public fast-BPE
    * practice batches: per round, take the stale top-`batch` pairs and
    * accept the maximal PREFIX whose pairs are pairwise
    * symbol-disjoint (scanning in (cnt DESC, l, r) rank order, STOP at
    * the first pair sharing a symbol with an accepted one), then apply
    * all accepted merges in one pass — so the driver round count drops
    * toward k/batch while each round keeps trainDelta's exact integer
    * state maintenance.
    *
    * Exactness contract (spec-pinned, BpeSpec):
    *  - the pair-count STATE is always exact — deltas recompute from
    *    the actual old/new symbol arrays, so no selection policy can
    *    corrupt counts;
    *  - the merge TABLE (order + counts) equals sequential greedy
    *    whenever batch pairs don't interact: merging a disjoint pair
    *    (A,B) cannot change the count of (C,D) with {C,D}∩{A,B}=∅,
    *    so every accepted pair's stale count IS its merge-time count.
    *    Acceptance reserves the CREATED symbol A·B alongside A and B,
    *    so a later batch member referencing the newly creatable
    *    symbol (accept (a,b), then see ('ab',c)) also conflict-stops —
    *    without that, applyAll's same-round fold would merge freshly
    *    created 'ab' occurrences with c and the recorded pair_freq
    *    would understate the merge-time count;
    *  - the documented deviation: a merge can CREATE pairs around its
    *    new symbol (cnt ≤ the merged pair's), and sequential greedy
    *    would rank those against later batch members while the batch
    *    cannot — so batched order may differ there (e.g. words
    *    {"abcd"×95, "ab"×5}: sequential merges (a,b) then (ab,c);
    *    batch 2 accepts (a,b)+(c,d) because (b,c) conflicts first but
    *    (c,d) doesn't — that is why acceptance stops at the FIRST
    *    conflict instead of skipping past it, which narrows, but does
    *    not close, the window). `batch = 1` degenerates to exact
    *    [[trainDelta]] behavior. */
  def trainBatched(words: DataFrame, wordCol: String, freqCol: String,
      k: Int, batch: Int = 16): DataFrame = {
    require(k >= 1 && batch >= 1, "need k >= 1 and batch >= 1")
    val spark = words.sparkSession
    var vocab = words
      .select(split(col(wordCol), "").as("_syms"), col(freqCol).cast("long").as("_f"))
      .localCheckpoint(false)
    var pairCounts = vocab
      .select(col("_f"), explode(pairsOf(col("_syms"))).as("_p"))
      .groupBy(col("_p.l").as("l"), col("_p.r").as("r"))
      .agg(sum(col("_f")).as("cnt"))
      .localCheckpoint(false)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var done = false
    while (merges.size < k && !done) {
      val top = pairCounts
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(math.min(batch, k - merges.size)).collect()
      if (top.isEmpty) done = true
      else {
        val used = scala.collection.mutable.Set.empty[String]
        val accepted = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        var conflict = false
        top.foreach { row =>
          val (l, r, c) = (row.getString(0), row.getString(1), row.getLong(2))
          if (!conflict && !used(l) && !used(r)) {
            // reserve the CREATED symbol too: a later batch member
            // referencing l+r (e.g. accept (a,b) then ('ab',c)) is
            // not merge-independent — applyAll's fold would merge
            // newly created 'ab' occurrences with c in the same
            // round, so its stale count would understate the
            // merge-time count. Forcing a conflict stop there keeps
            // every accepted pair's recorded pair_freq == its
            // merge-time count.
            accepted += ((l, r, c)); used += l; used += r; used += (l + r)
          } else conflict = true
        }
        accepted.foreach { case (l, r, c) =>
          merges += ((merges.size + 1L, l, r, c))
        }
        val hitAny = accepted.map { case (l, r, _) =>
          exists(pairsOf(col("_syms")),
            p => p.getField("l") === lit(l) && p.getField("r") === lit(r))
        }.reduce(_ || _)
        def applyAll(syms: Column): Column =
          accepted.foldLeft(syms) { case (acc, (l, r, _)) =>
            mergeOnce(acc, lit(l), lit(r))
          }
        val aff = vocab.filter(hitAny).withColumn("_new", applyAll(col("_syms")))
        val deltas = aff
          .select((-col("_f")).as("_d"), explode(pairsOf(col("_syms"))).as("_p"))
          .unionAll(aff
            .select(col("_f").as("_d"), explode(pairsOf(col("_new"))).as("_p")))
          .groupBy(col("_p.l").as("l"), col("_p.r").as("r"))
          .agg(sum(col("_d")).as("cnt"))
        // eager for the same chain-depth reason as trainDelta
        pairCounts = pairCounts.unionAll(deltas)
          .groupBy("l", "r").agg(sum(col("cnt")).as("cnt"))
          .filter(col("cnt") > 0L)
          .localCheckpoint()
        vocab = vocab
          .withColumn("_syms", when(hitAny, applyAll(col("_syms")))
            .otherwise(col("_syms")))
          .localCheckpoint()
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("rank", "left", "right", "pair_freq")
  }

  /** Exact greedy BPE on the driver over a COLLECTED word-frequency
    * table — the production-default trainer and the missing piece of
    * the public fast-BPE recipe (HuggingFace tokenizers, SentencePiece,
    * GPT-2's original trainer are all in-memory single-process over
    * counted words): the corpus-sized work is the one distributed
    * [[wordFreq]] aggregation; the merge LOOP depends only on the
    * distinct-word table, which is tiny even at web scale (~10⁷ rows ≈
    * hundreds of MB — far under a driver heap; 16.5k rows at g1.0).
    * Running it in-JVM removes the per-merge driver round-trip that
    * BASELINE.md's k-scaling table measured as THE large-k wall
    * (~0.1-0.25 s/merge for every distributed variant — 32k merges
    * would cost hours), replacing it with microseconds per merge.
    *
    * Exactness: identical merge table to [[train]]/[[trainDelta]]
    * (BpeSpec parity) — same (cnt DESC, left ASC, right ASC) total
    * order with UTF-8-byte string comparison (Spark's binary string
    * ordering), same greedy left-to-right non-overlapping merge scan.
    * State is maintained incrementally (pair counts + per-pair word
    * postings), so each merge costs O(words containing the pair ·
    * their length), the same delta the distributed trainer computes.
    *
    * Scale contract: callers whose DISTINCT-WORD table cannot fit on
    * the driver (beyond ~10⁸ distinct words — past every published
    * natural-language corpus) stay on [[trainDelta]]/[[trainBatched]];
    * that is the documented trade, not a hidden collect on corpus
    * data. */
  def trainLocal(
      words: DataFrame, wordCol: String, freqCol: String, k: Int): DataFrame = {
    require(k >= 1, "need at least one merge round")
    val spark = words.sparkSession
    val rows = words
      .select(col(wordCol).cast("string"), col(freqCol).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    import spark.implicits._
    trainLocalArrays(rows, k).toDF("rank", "left", "right", "pair_freq")
  }

  /** UTF-8-byte (unsigned) string order — what Spark's string sort and
    * therefore the distributed trainers' tie-break uses; Java's
    * UTF-16 compareTo differs above the BMP. */
  private def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes("UTF-8")
    val y = b.getBytes("UTF-8")
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  /** The in-memory exact trainer behind [[trainLocal]] (shared with
    * its spec). */
  private[graft] def trainLocalArrays(
      words: Array[(String, Long)], k: Int): Seq[(Long, String, String, Long)] = {
    import scala.collection.mutable
    val syms: Array[Array[String]] =
      words.map(_._1.split("").filter(_.nonEmpty))
    val freq: Array[Long] = words.map(_._2)
    val counts = mutable.HashMap.empty[(String, String), Long]
    val postings = mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    def addPairs(i: Int, sign: Long): Unit = {
      val s = syms(i)
      var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        val c = counts.getOrElse(p, 0L) + sign * freq(i)
        if (c == 0L) counts.remove(p) else counts.update(p, c)
        if (sign > 0) postings.getOrElseUpdate(p, mutable.HashSet.empty) += i
        j += 1
      }
    }
    var i = 0
    while (i < syms.length) { addPairs(i, 1L); i += 1 }
    def mergeScan(s: Array[String], l: String, r: String): Array[String] = {
      val out = mutable.ArrayBuffer.empty[String]
      var j = 0
      while (j < s.length) {
        if (j + 1 < s.length && s(j) == l && s(j + 1) == r) {
          out += (l + r); j += 2
        } else { out += s(j); j += 1 }
      }
      out.toArray
    }
    val merges = mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var round = 1
    var done = false
    while (round <= k && !done) {
      // argmax under the distributed total order (cnt DESC, l, r ASC)
      var best: (String, String) = null
      var bc = 0L
      counts.foreach { case (p, c) =>
        if (c > bc || (c == bc && c > 0L && best != null &&
          (utf8Less(p._1, best._1) ||
            (p._1 == best._1 && utf8Less(p._2, best._2))))) {
          best = p; bc = c
        }
      }
      if (best == null) done = true
      else {
        merges += ((round.toLong, best._1, best._2, bc))
        val (l, r) = best
        // postings may hold stale word ids (pair long gone from the
        // word) — the adjacency re-check below makes them harmless
        val hits = postings.getOrElse(best, mutable.HashSet.empty).toArray
        var h = 0
        while (h < hits.length) {
          val w = hits(h)
          val s = syms(w)
          var contains = false
          var j = 0
          while (!contains && j < s.length - 1) {
            contains = s(j) == l && s(j + 1) == r
            j += 1
          }
          if (contains) {
            addPairs(w, -1L)
            syms(w) = mergeScan(s, l, r)
            addPairs(w, 1L)
          }
          h += 1
        }
        postings.remove(best)
        // counts(best) reached 0 inside addPairs (postings is a
        // superset of current containers, and the greedy scan leaves
        // no (l, r) adjacency behind), so no manual removal is needed
        round += 1
      }
    }
    merges.toSeq
  }

  /** Re-encode a corpus under a trained merge list — the apply side of
    * [[train]], shaped for scale the way every tokenizer pipeline
    * shards it: the DISTINCT-WORD vocabulary encodes once (k folds over
    * the vocab table, checkpointed), and the corpus-sized side only
    * broadcast-joins the encoded vocabulary — the k merge passes never
    * touch corpus-scale data. Output: one row per corpus token
    * (id, pos, word, subwords). */
  def encodeCorpus(
      docs: DataFrame, id: Column, text: Column,
      merges: Seq[(String, String)]): DataFrame = {
    val vocab = docs.select(explode(split(text, " ")).as("word"))
      .filter(length(col("word")) > 0).distinct()
    val encoded = merges.zipWithIndex.foldLeft(
      vocab.withColumn("subwords", split(col("word"), ""))) {
      case (acc, ((l, r), i)) =>
        val next = acc.withColumn("subwords", mergeOnce(col("subwords"), lit(l), lit(r)))
        // bound the fold's plan depth like the training loop does
        if ((i + 1) % 4 == 0) next.localCheckpoint(false) else next
    }
    docs
      .select(id.as("id"), posexplode(split(text, " ")).as(Seq("pos", "word")))
      .filter(length(col("word")) > 0)
      .join(broadcast(encoded), "word")
      .select(col("id"), col("pos").cast("long").as("pos"), col("word"), col("subwords"))
  }

  /** The symbol vocabulary after training: every distinct symbol in the
    * re-encoded word table, with its total weighted frequency. */
  def symbolVocab(words: DataFrame, wordCol: String, freqCol: String, k: Int): DataFrame = {
    val mergeList = train(words, wordCol, freqCol, k)
      .select("left", "right").collect().map(r => (r.getString(0), r.getString(1)))
    val syms = mergeList.foldLeft(
      words.select(split(col(wordCol), "").as("_syms"), col(freqCol).cast("long").as("_f"))) {
      case (acc, (l, r)) =>
        acc.withColumn("_syms", mergeOnce(col("_syms"), lit(l), lit(r)))
          .localCheckpoint(false)
    }
    syms.select(explode(col("_syms")).as("symbol"), col("_f"))
      .groupBy("symbol").agg(sum(col("_f")).as("freq"))
  }
}
