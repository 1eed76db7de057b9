package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions._

/** Mergeable Bloom-filter membership sketch — the set-membership
  * analogue of the HLL (N41) and Misra–Gries (N43) sketches: a fixed
  * m-bit state that answers "might this key be in the corpus?" with
  * ZERO false negatives, ORs together under arbitrary merge trees, and
  * costs one k-probe per row. Classic Bloom (1970) with the
  * Kirsch–Mitzenmacher double-hashing scheme (h_i = h1 + i·h2 — two
  * hashes drive all k probes; public literature).
  *
  * Why it earns a place next to the stored minhash index: an
  * incremental ingest pipeline asks "have I seen this fingerprint?"
  * for EVERY incoming row, but only corpus members answer yes — a
  * 1 MiB filter broadcast to every task prunes the definitely-new rows
  * before the exact anti-join ever shuffles them (dedupAgainstIndex's
  * probe side shrinks to possible-members only). At 100 TB the filter
  * is built once (map-side partial aggregation: each task reduces its
  * partition into one m-bit array; only arrays move) and read forever.
  *
  * Determinism/portability: bit positions derive from md5 of the key
  * string — the SAME 60-bit hex windows the engine's other portable
  * hashes use (PortableHash) — so the JVM build side and the
  * pure-column probe side (codegen'd builtins: conv/substring/pmod/
  * shiftright) set and test identical bits, and a filter built
  * anywhere probes anywhere. Both sides use Java long arithmetic, so
  * even k·h2 overflow wraps identically.
  */
object BloomSketch {

  /** Sketch state: the bit array (m = words.length·64 bits), the
    * (m, k) shape, and how many items were folded in. */
  final case class BF(words: Array[Long], m: Long, k: Int, n: Long)

  /** h1 = md5 hex chars [1,15], h2 = hex chars [16,30] forced odd —
    * mirrored by the column side in [[mightContain]]. */
  private[graft] def hashPair(key: String): (Long, Long) = {
    val d = PortableHash.md5ThreadLocal
      .digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h1 = 0L
    var i = 0
    while (i < 7) { h1 = (h1 << 8) | (d(i) & 0xffL); i += 1 }
    h1 = (h1 << 4) | ((d(7) & 0xffL) >>> 4)
    var h2 = d(7) & 0x0fL
    i = 8
    while (i < 15) { h2 = (h2 << 8) | (d(i) & 0xffL); i += 1 }
    (h1, h2 | 1L)
  }

  private def pmodL(a: Long, m: Long): Long = { val r = a % m; if (r < 0) r + m else r }

  final class BloomAgg(mBits: Int, k: Int) extends Aggregator[String, BF, BF] {
    require(mBits >= 64 && mBits % 64 == 0, s"mBits must be a positive multiple of 64, got $mBits")
    require(k >= 1 && k <= 16, s"k must be in [1,16], got $k")

    override def zero: BF = BF(new Array[Long](mBits / 64), mBits.toLong, k, 0L)

    override def reduce(b: BF, key: String): BF = {
      val (h1, h2) = hashPair(key)
      var i = 0
      while (i < k) {
        val pos = pmodL(h1 + i * h2, b.m)
        b.words((pos >>> 6).toInt) |= 1L << (pos & 63)
        i += 1
      }
      b.copy(n = b.n + 1)
    }

    override def merge(a: BF, b: BF): BF = {
      require(a.m == b.m && a.k == b.k, "cannot merge Bloom filters of different shape")
      var i = 0
      while (i < a.words.length) { a.words(i) |= b.words(i); i += 1 }
      a.copy(n = a.n + b.n)
    }

    override def finish(r: BF): BF = r
    override def bufferEncoder: Encoder[BF] = Encoders.product[BF]
    override def outputEncoder: Encoder[BF] = Encoders.product[BF]
  }

  /** DataFrame aggregate: `df.agg(bloomAgg(mBits, k)(col("key")))` →
    * one struct<words, m, k, n> row. */
  def bloomAgg(mBits: Int, k: Int): UserDefinedFunction =
    udaf(new BloomAgg(mBits, k), Encoders.STRING)

  /** Build a 1-row filter relation (words, m, k, n) over `key`. */
  def bloomFrom(df: DataFrame, key: Column, mBits: Int = 1 << 20, k: Int = 5): DataFrame =
    df.agg(bloomAgg(mBits, k)(key.cast("string")).as("bf"))
      .select(col("bf.words").as("words"), col("bf.m").as("m"),
        col("bf.k").as("k"), col("bf.n").as("n"))

  /** Pure-column membership probe against a filter's `words` array —
    * codegen'd builtins only (md5/conv/substring/pmod/element_at/
    * shiftright), mirroring [[hashPair]] bit for bit. */
  def mightContain(words: Column, key: Column, mBits: Int, k: Int): Column = {
    val hex = md5(key.cast("string").cast("binary"))
    val h1 = conv(substring(hex, 1, 15), 16, 10).cast("long")
    val h2 = conv(substring(hex, 16, 15), 16, 10).cast("long").bitwiseOR(lit(1L))
    (0 until k).map { i =>
      val pos = pmod(h1 + lit(i.toLong) * h2, lit(mBits.toLong))
      val word = element_at(words, (pos / 64).cast("int") + lit(1))
      // functions.shiftright only takes a literal shift; the SQL
      // function accepts a column — same codegen'd ShiftRight node
      (call_function("shiftright", word, (pos % 64).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L))
    }.reduce(_ && _)
  }

  /** Prefilter an incoming batch against a stored/built filter
    * relation: keeps only rows that MIGHT be in the indexed corpus
    * (candidates for the exact check); definitely-new rows — the
    * overwhelming majority in a healthy ingest — are dropped without
    * ever shuffling. The 1-row filter broadcasts. */
  def prefilter(batch: DataFrame, key: Column, bloom: DataFrame): DataFrame = {
    // materialize the filter ONCE (head() executes the aggregation);
    // re-using the `bloom` frame in a join would re-run the whole
    // corpus aggregation a second time, so the probe side is rebuilt
    // as a local 1-row frame from the collected words
    val row = bloom.select(col("words"), col("m"), col("k")).head()
    val words = row.getSeq[Long](0)
    val mBits = row.getLong(1).toInt
    val kk = row.getInt(2)
    import batch.sparkSession.implicits._
    val local = Seq(Tuple1(words)).toDF("_bf_words")
    batch
      .crossJoin(broadcast(local))
      .filter(mightContain(col("_bf_words"), key, mBits, kk))
      .drop("_bf_words")
  }
}
