package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication suite — harness north-star (BASELINE.json):
  * exact, bag-fingerprint, MinHash+LSH, SimHash, n-gram Jaccard with
  * prefix filtering. Every method is candidate-generation-by-equi-join:
  * no method ever materializes the full O(n²) pair space, which is what
  * makes them viable at 100 TB.
  */
object Dedup {

  /** Distinct word set of a document — the unit all set-based methods
    * work over. */
  def tokenSet(text: Column): Column = array_distinct(split(text, " "))

  // ---- exact / fingerprint -------------------------------------------

  /** Exact dedup on chosen columns: plain hash-groupBy. */
  def exact(df: DataFrame, cols: Seq[String]): DataFrame =
    df.dropDuplicates(cols)

  /** Bag-of-words fingerprint: md5 of the sorted distinct token set.
    * Catches reorderings/repetitions that byte-exact dedup misses; one
    * shuffle on the 32-char fingerprint. */
  def withFingerprint(df: DataFrame, text: String): DataFrame =
    df.withColumn("fingerprint",
      md5(concat_ws(" ", array_sort(tokenSet(col(text)))).cast("binary")))

  /** Fingerprint duplicate groups: fingerprint → group size + id range. */
  def fingerprintGroups(df: DataFrame, id: String, text: String): DataFrame =
    withFingerprint(df, text)
      .groupBy("fingerprint")
      .agg(count(lit(1)).as("n_docs"), min(col(id)).as("min_doc"), max(col(id)).as("max_doc"))
      .filter(col("n_docs") > 1)

  // ---- MinHash + LSH --------------------------------------------------

  /** MinHash signature: for each of `numHashes` seeded hash functions,
    * the min over the token set of xxhash64(seed # token). Identical
    * token sets ⇒ identical signatures (recall 1.0 on true duplicates);
    * P(sig_i equal) = Jaccard for distinct sets. */
  def minHashSignature(tokens: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(tokens, t => xxhash64(concat(i.cast("string"), lit("#"), t)))))

  /** MinHash/LSH near-dup pairs with exact-Jaccard verification.
    *
    * Pipeline: signature → band hashes → explode(band) → self-equi-join
    * on (band index, band hash) → distinct candidate pairs → exact
    * Jaccard filter. The band join is the only shuffle that touches
    * pairs, and it only produces pairs that actually collide.
    *
    * For J ≥ 0.9 with 64 hashes / 16 bands (r=4), miss probability per
    * true pair is (1-J⁴)^16 < 4e-8 — and exactly 0 for identical sets.
    */
  def minHashPairs(
      df: DataFrame, id: String, text: String,
      numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.9): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val docs = df.select(col(id).as("_id"), tokenSet(col(text)).as("_toks"))
      .withColumn("_sig", minHashSignature(col("_toks"), numHashes))
    val banded = docs.select(col("_id"), col("_toks"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        g => xxhash64(concat_ws(",", slice(col("_sig"), g * r + 1, lit(r)))))))
      .withColumnRenamed("pos", "_band").withColumnRenamed("col", "_bandhash")
    val a = banded.select(col("_id").as("a_id"), col("_toks").as("_atoks"),
      col("_band"), col("_bandhash"))
    val b = banded.select(col("_id").as("b_id"), col("_toks").as("_btoks"),
      col("_band"), col("_bandhash"))
    a.join(b, Seq("_band", "_bandhash")).filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "_atoks", "_btoks").dropDuplicates("a_id", "b_id")
      .withColumn("jaccard",
        size(array_intersect(col("_atoks"), col("_btoks"))).cast("double") /
          size(array_union(col("_atoks"), col("_btoks"))))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  // ---- SimHash --------------------------------------------------------

  /** 64-bit SimHash over the token set: per bit, sum ±1 weighted by each
    * token hash's bit; the sign becomes the fingerprint bit. Near-dup
    * docs land within small Hamming distance. Bit positions unroll at
    * plan-build time (shift amounts must be literals). */
  def simHash(tokens: Column): Column = {
    val hashes = transform(tokens, t => xxhash64(t))
    val bits: Seq[Column] = (0 until 64).map { j =>
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(vote > 0, 1L).otherwise(0L)
    }
    bits.zipWithIndex.map { case (b, i) => b * lit(1L << (63 - i)) }.reduce(_ + _)
  }

  /** SimHash near-dup candidates: block on each of the four 16-bit
    * chunks (any pair within Hamming ≤ maxHamming of 3 must agree on at
    * least one chunk when differing bits spread — pigeonhole over 4
    * chunks guarantees it for ≤ 3 flipped bits), then verify Hamming. */
  def simHashPairs(
      df: DataFrame, id: String, text: String, maxHamming: Int = 3): DataFrame = {
    val docs = df.select(col(id).as("_id"), simHash(tokenSet(col(text))).as("_sh"))
    val chunked = docs.select(col("_id"), col("_sh"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("_sh"), c * 16).bitwiseAND(0xFFFFL)): _*)))
      .withColumnRenamed("pos", "_chunk").withColumnRenamed("col", "_chunkval")
    val a = chunked.select(col("_id").as("a_id"), col("_sh").as("_asha"), col("_chunk"), col("_chunkval"))
    val b = chunked.select(col("_id").as("b_id"), col("_sh").as("_bsha"), col("_chunk"), col("_chunkval"))
    a.join(b, Seq("_chunk", "_chunkval")).filter(col("a_id") < col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .withColumn("hamming", expr("bit_count(_asha ^ _bsha)").cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("a_id", "b_id", "hamming")
  }

  // ---- n-gram Jaccard with prefix filtering ---------------------------

  /** Distinct contiguous word n-gram shingles. Guarded: Spark's
    * `sequence(1, k)` counts DOWN for k < 1, so short docs get an empty
    * shingle set explicitly. */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + o)): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** n-gram Jaccard near-dup pairs via prefix filtering (PPJoin-style):
    * under a global shingle order, any pair with J ≥ θ must share one of
    * each document's first ⌊(1−θ)·|S|⌋+1 sorted shingles. Candidates are
    * an equi-join on prefix shingles — never O(n²) — then exact Jaccard
    * verifies. */
  def ngramJaccardPairs(
      df: DataFrame, id: String, text: String,
      n: Int = 3, threshold: Double = 0.8): DataFrame = {
    val docs = df.select(col(id).as("_id"),
      array_sort(shingles(col(text), n)).as("_sh"))
    val prefixLen = (floor(size(col("_sh")) * (1 - threshold)) + 1).cast("int")
    val posting = docs.select(col("_id"), col("_sh"),
      explode(slice(col("_sh"), lit(1), prefixLen)).as("_p"))
    val a = posting.select(col("_id").as("a_id"), col("_sh").as("_ash"), col("_p"))
    val b = posting.select(col("_id").as("b_id"), col("_sh").as("_bsh"), col("_p"))
    a.join(b, "_p").filter(col("a_id") < col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .withColumn("jaccard",
        size(array_intersect(col("_ash"), col("_bsh"))).cast("double") /
          size(array_union(col("_ash"), col("_bsh"))))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }
}
