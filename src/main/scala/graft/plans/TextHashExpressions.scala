package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftops.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass imperative eval for the dedup suite's per-row text
  * projections (SURVEY.md §4 "custom Expression" tier).
  *
  * The composed-HOF forms (`array_distinct(transform(split(...),
  * xxhash64))`, nested `transform`/`aggregate` for shingles, signatures
  * and simhash votes) are semantically right but evaluate an
  * interpreted lambda per ELEMENT — profiled as the dominant cost of
  * every dedup operator at sf0.1 (the shingle projection alone ~10 s of
  * n-gram's ~9-10 s cold runtime). These expressions do the identical
  * computation in one tight JVM loop per ROW.
  *
  * Value parity is exact, not just set-equal: token/shingle hashes use
  * catalyst's XXH64 with the SQL seed (42) and the SQL multi-argument
  * chaining (`hash = hashLong(argᵢ, hash)`), so every value equals what
  * the HOF form computes — asserted per-row against the HOF forms in
  * ExtensionsSpec. Eval-only (CodegenFallback): the per-row virtual
  * call is negligible next to the per-element interpretation it
  * replaces.
  */
object TextHashNative {
  /** Spark SQL's default xxhash64 seed. */
  private val Seed = 42L

  /** `split(text, " ")` (limit −1 — trailing empties kept, exactly like
    * the SQL split) hashed per token. */
  private[plans] def hashTokens(s: UTF8String): Array[Long] = {
    val toks = s.toString.split(" ", -1)
    val out = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) {
      out(i) = XXH64.hashUTF8String(UTF8String.fromString(toks(i)), Seed)
      i += 1
    }
    out
  }

  /** In-place sort + dedup (same SET as array_distinct, in sorted
    * order — the canonical order collapseVerifyExpand wants anyway). */
  private[plans] def sortedDistinct(a: Array[Long]): Array[Long] = {
    if (a.length <= 1) return a
    java.util.Arrays.sort(a)
    var n = 1
    var i = 1
    while (i < a.length) {
      if (a(i) != a(i - 1)) { a(n) = a(i); n += 1 }
      i += 1
    }
    if (n == a.length) a else java.util.Arrays.copyOf(a, n)
  }

  def tokenHashSet(text: Column): Column =
    ColumnBridge.column(TokenHashSetExpr(ColumnBridge.expression(text)))

  def shingleHashSet(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashSetExpr(ColumnBridge.expression(text), n))

  def minHashSig(hashedSet: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSigExpr(
      ColumnBridge.expression(hashedSet.cast("array<bigint>")), numHashes))

  def simHash(text: Column): Column =
    ColumnBridge.column(SimHash60Expr(ColumnBridge.expression(text)))

  def cdcBoundaries(text: Column, window: Int, divisor: Int): Column =
    ColumnBridge.column(
      CdcBoundariesExpr(ColumnBridge.expression(text), window, divisor))

  def deletionHashSet(text: Column): Column =
    ColumnBridge.column(DeletionHashSetExpr(ColumnBridge.expression(text)))

  def hashedCountVec(text: Column, dim: Int): Column =
    ColumnBridge.column(HashedCountVecExpr(ColumnBridge.expression(text), dim))

  def gramDigests(tokens: Column, L: Int): Column =
    ColumnBridge.column(GramDigestsExpr(ColumnBridge.expression(tokens), L))

  def gopherStats(text: Column, topNs: Seq[Int], dupNs: Seq[Int]): Column =
    ColumnBridge.column(
      GopherStatsExpr(ColumnBridge.expression(text), topNs, dupNs))

  def htmlEntityDecode(text: Column): Column =
    ColumnBridge.column(HtmlEntityDecodeExpr(ColumnBridge.expression(text)))

  def fixEncoding(text: Column): Column =
    ColumnBridge.column(FixEncodingExpr(ColumnBridge.expression(text)))

  /** One shared MD5 instance per thread: expression objects are shared
    * across concurrently-running partitions through the codegen
    * references array, so a per-instance digest would race. */
  private[plans] val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  private[plans] val HexDigits = "0123456789abcdef".getBytes

  /** Fail at ANALYSIS time on a non-string input, like the HOF forms
    * these expressions replace would — without this, a mistyped column
    * passes resolution and every task dies in a mid-job
    * ClassCastException. (ExpectsInputTypes is off-limits outside
    * catalyst — AbstractDataType is private[sql] — so the expressions
    * override checkInputDataTypes directly.) */
  private[plans] def requireString(e: Expression, name: String): TypeCheckResult =
    if (e.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name requires a STRING column, got ${e.dataType.catalogString}")
}

/** Sorted distinct xxhash64 token set of a space-separated string. */
case class TokenHashSetExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    TextHashNative.requireString(child, prettyName)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextHashNative.sortedDistinct(
      TextHashNative.hashTokens(input.asInstanceOf[UTF8String])))
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_token_hash_set"
}

/** Sorted distinct hashes of the contiguous word `n`-gram shingles:
  * shingle identity = the SQL `xxhash64(h₁,…,hₙ)` chain over the token
  * hashes. Documents shorter than `n` tokens yield the empty set. */
case class ShingleHashSetExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1)
  override def checkInputDataTypes(): TypeCheckResult =
    TextHashNative.requireString(child, prettyName)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any = {
    val th = TextHashNative.hashTokens(input.asInstanceOf[UTF8String])
    if (th.length < n) return new GenericArrayData(Array.emptyLongArray)
    val m = th.length - n + 1
    val sh = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 42L
      var j = 0
      while (j < n) { h = XXH64.hashLong(th(i + j), h); j += 1 }
      sh(i) = h
      i += 1
    }
    new GenericArrayData(TextHashNative.sortedDistinct(sh))
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_shingle_hash_set"
}

/** MinHash signature over an already-hashed token set — the identical
  * Z_(2³¹−1) affine family as Dedup.minHashHashedSignature
  * (base = pmod(h, p); sigᵢ = min over (base·(2i+1) + i·1013904223) mod
  * p), value-equal per slot. Null on an empty set (array_min of an
  * empty array is null in the HOF form). */
case class MinHashSigExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData].toLongArray()
    if (arr.isEmpty) return null
    val P = 2147483647L
    val base = new Array[Long](arr.length)
    var i = 0
    while (i < arr.length) { base(i) = ((arr(i) % P) + P) % P; i += 1 }
    val sig = new Array[Long](k)
    var s = 0
    while (s < k) {
      val a = s * 2L + 1L
      val b = s * 1013904223L
      var mn = Long.MaxValue
      i = 0
      while (i < base.length) {
        val v = (base(i) * a + b) % P // operands ≤ 2³¹·127 + 2³⁶ — no overflow
        if (v < mn) mn = v
        i += 1
      }
      sig(s) = mn
      s += 1
    }
    new GenericArrayData(sig)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_minhash_sig"
}

/** Content-defined-chunking boundary positions of a string: every
  * 1-based character position `i ∈ [window, len]` whose trailing
  * `window`-codepoint polynomial hash
  * `fold(codes[i-window+1..i], 0, (a, c) -> (a*31 + c) mod 1000003)`
  * is ≡ 0 (mod `divisor`). Value-identical to the composed-HOF form
  * (`filter(sequence(window, len), i -> aggregate(slice(codes, …)))`
  * over `ascii(substring(text, i, 1))` codes) that it replaces — that
  * form re-walked the UTF8String per position (O(len²)) and re-folded
  * the window per position inside three nested interpreted lambdas;
  * this is ONE imperative pass with an incremental update (subtract the
  * outgoing codepoint × 31^(window−1) mod M, multiply, add the incoming
  * — exact because the fold is linear in Z_M). Codepoint iteration, not
  * UTF-16 units, matching both `ascii`'s codePointAt semantics and
  * `length()`/`substring()`'s character counting — for VALID UTF-8
  * (the invariant Spark maintains for parquet/JSON/CSV-sourced
  * strings) the two unit systems agree on every plane, including
  * 4-byte supplementary chars (1 char in both; ExtensionsSpec's CDC
  * parity fixture includes a supplementary-plane row). On MALFORMED
  * UTF-8 bytes (only reachable via hand-built binary→string casts)
  * `String.codePoints` substitutes U+FFFD per invalid byte while
  * UTF8String counts leading bytes, so boundary indices may diverge
  * from `substring()` units — out of contract, matching Spark's own
  * undefined behavior for string functions over invalid bytes.
  * Strings shorter than `window` yield the empty array (one
  * whole-document chunk downstream). */
case class CdcBoundariesExpr(child: Expression, window: Int, divisor: Int)
    extends UnaryExpression with CodegenFallback {
  require(window >= 2 && divisor >= 2)
  override def checkInputDataTypes(): TypeCheckResult =
    TextHashNative.requireString(child, prettyName)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any = {
    val M = 1000003L
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val n = cps.length
    if (n < window) return new GenericArrayData(Array.emptyIntArray)
    var pow = 1L // 31^(window-1) mod M
    var k = 1
    while (k < window) { pow = pow * 31 % M; k += 1 }
    val buf = new scala.collection.mutable.ArrayBuilder.ofInt
    var h = 0L
    var i = 0
    while (i < window) { h = (h * 31 + cps(i)) % M; i += 1 }
    if (h % divisor == 0) buf += window
    while (i < n) {
      h = (((h - cps(i - window) % M * pow % M) % M + M) * 31 + cps(i)) % M
      i += 1
      if (h % divisor == 0) buf += i
    }
    new GenericArrayData(buf.result())
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_cdc_boundaries"
}

/** Sorted distinct xxhash64 set of a string's SymSpell deletion
  * neighborhood of radius 1: the string itself plus every
  * single-codepoint deletion. Two strings within ONE character edit
  * (insert / delete / substitute) always share an element — the
  * substitution case via deleting the differing position from both,
  * the insert/delete case via the shorter string itself — so an
  * equi-join on the exploded set is a complete candidate generator for
  * levenshtein ≤ 1 (the converse is false: sharing a variant only
  * bounds the distance by 2, so candidates are verify-filtered).
  * Codepoint-level deletion matches `levenshtein`'s character
  * semantics on valid UTF-8. One imperative pass per row; a composed
  * `transform(sequence(...))` HOF form re-slices the string per
  * position inside an interpreted lambda (the measured 3× pattern this
  * file exists to avoid). */
case class DeletionHashSetExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    TextHashNative.requireString(child, prettyName)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val cps = s.toString.codePoints().toArray
    val out = new Array[Long](cps.length + 1)
    out(0) = XXH64.hashUTF8String(s, 42L)
    val sb = new java.lang.StringBuilder(cps.length)
    var i = 0
    while (i < cps.length) {
      sb.setLength(0)
      var j = 0
      while (j < cps.length) {
        if (j != i) sb.appendCodePoint(cps(j))
        j += 1
      }
      out(i + 1) = XXH64.hashUTF8String(UTF8String.fromString(sb.toString), 42L)
      i += 1
    }
    new GenericArrayData(TextHashNative.sortedDistinct(out))
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_deletion_hash_set"
}

/** Hashing-trick count vectorizer (Weinberger et al., "Feature Hashing
  * for Large Scale Multitask Learning", ICML'09): token counts folded
  * into a fixed `dim`-length vector by bucket = md5₆₀(token) mod dim —
  * the classic vocabulary-free featurizer whose memory is O(dim)
  * regardless of corpus vocabulary. Buckets use the PORTABLE md5
  * family ([[graft.functions.PortableHash]]), so an ANSI-SQL engine
  * recomputes every vector component bit-identically (the Count-Min
  * discipline applied to per-row features). One imperative pass per
  * row; Σ components = token count by construction. */
case class HashedCountVecExpr(child: Expression, dim: Int)
    extends UnaryExpression with CodegenFallback {
  require(dim >= 2, "need dim ≥ 2")
  override def checkInputDataTypes(): TypeCheckResult =
    TextHashNative.requireString(child, prettyName)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any = {
    val md = graft.functions.PortableHash.md5ThreadLocal
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val vec = new Array[Long](dim)
    var i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty) {
        val b = (graft.functions.PortableHash.md5Hash60(toks(i), md) % dim).toInt
        vec(b) += 1
      }
      i += 1
    }
    new GenericArrayData(vec)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_hashed_count_vec"
}

/** 60-bit SimHash of a space-separated string's distinct token set —
  * same vote/bit layout as Dedup.simHash (bit j of each token hash
  * votes ±1; a positive vote sets output bit j). Token hashes are the
  * PORTABLE md5-based 60-bit family (functions.PortableHash) so the
  * whole fingerprint — and therefore every Hamming distance — is
  * reproducible in ANSI SQL, which is what lets q_dedup_simhash carry a
  * DuckDB hash oracle. Distinctness is by token HASH here vs token
  * STRING in the HOF form — identical modulo ~2⁻⁶⁰ collisions
  * (cross-checked in DedupSpec's collapse-equivalence fixture and
  * ExtensionsSpec). */
case class SimHash60Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    TextHashNative.requireString(child, prettyName)
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any = {
    val md = graft.functions.PortableHash.md5ThreadLocal
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val hs = new Array[Long](toks.length)
    var t = 0
    while (t < toks.length) {
      hs(t) = graft.functions.PortableHash.md5Hash60(toks(t), md)
      t += 1
    }
    val dhs = TextHashNative.sortedDistinct(hs)
    var res = 0L
    var j = 0
    while (j < 60) {
      var vote = 0L
      var i = 0
      while (i < dhs.length) {
        vote += (if (((dhs(i) >>> j) & 1L) == 1L) 1L else -1L)
        i += 1
      }
      if (vote > 0) res += 1L << j
      j += 1
    }
    res
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_simhash60"
}

/** (pos, gram) rows for every L-token window of an ARRAY<STRING>
  * document, gram = md5 hex of the ' '-joined window — value-identical
  * to the HOF form
  * `transform(sequence(0, n-L), p -> struct(p, md5(concat_ws(' ',
  * slice(toks, p+1, L)))))` but computed in ONE pass: the whole
  * document joins into a single byte buffer once, every window is then
  * a CONTIGUOUS region of that buffer (token byte offsets), and MD5
  * runs over each region in place. The HOF form allocates an L-element
  * slice array plus a joined window string per position — O(tokens·L)
  * transient garbage that the g1.0 scaling run showed as GC-bound CPU
  * (round-11 verdict item 4); here the 32-char hex output is the only
  * per-window allocation. Null tokens would break buffer contiguity
  * (concat_ws SKIPS nulls), so arrays containing any null take an
  * exact per-window streaming-update slow path; whitespace tokenizers
  * never produce null tokens. */
case class GramDigestsExpr(child: Expression, L: Int)
    extends UnaryExpression with CodegenFallback {
  require(L >= 1, "window length must be positive")
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<STRING>, got ${t.catalogString}")
    }
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("gram", StringType, nullable = false))),
    containsNull = false)

  private def hex(d: Array[Byte]): UTF8String = {
    val h = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      h(2 * i) = TextHashNative.HexDigits((d(i) >> 4) & 0xf)
      h(2 * i + 1) = TextHashNative.HexDigits(d(i) & 0xf)
      i += 1
    }
    UTF8String.fromBytes(h)
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val m = n - L + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    var hasNull = false
    var i = 0
    while (i < n && !hasNull) { hasNull = arr.isNullAt(i); i += 1 }
    val md = TextHashNative.md5Local.get()
    val out = new Array[Any](m)
    if (!hasNull) {
      // fast path: one joined buffer, windows are contiguous regions.
      // starts(i) = byte offset of token i in the joined buffer
      // (i separators precede it); starts(n) is a virtual token past
      // the end, so window [p, p+L) spans starts(p) .. starts(p+L)-1
      // exclusive (dropping the trailing separator slot).
      val toks = new Array[Array[Byte]](n)
      val starts = new Array[Int](n + 1)
      var total = 0
      i = 0
      while (i < n) {
        toks(i) = arr.getUTF8String(i).getBytes
        starts(i) = total + i
        total += toks(i).length
        i += 1
      }
      starts(n) = total + n
      val buf = new Array[Byte](total + math.max(0, n - 1))
      var off = 0
      i = 0
      while (i < n) {
        if (i > 0) { buf(off) = ' '; off += 1 }
        System.arraycopy(toks(i), 0, buf, off, toks(i).length)
        off += toks(i).length
        i += 1
      }
      var p = 0
      while (p < m) {
        val s = starts(p)
        md.reset()
        md.update(buf, s, starts(p + L) - 1 - s)
        out(p) = new GenericInternalRow(Array[Any](p, hex(md.digest())))
        p += 1
      }
    } else {
      // exact slow path: concat_ws semantics (nulls skipped) via
      // streaming digest updates, no joined string materialized
      val space = Array(' '.toByte)
      var p = 0
      while (p < m) {
        md.reset()
        var first = true
        var j = p
        while (j < p + L) {
          if (!arr.isNullAt(j)) {
            if (!first) md.update(space, 0, 1)
            val b = arr.getUTF8String(j).getBytes
            md.update(b, 0, b.length)
            first = false
          }
          j += 1
        }
        out(p) = new GenericInternalRow(Array[Any](p, hex(md.digest())))
        p += 1
      }
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_gram_digests"
}

/** SINGLE-PASS HTML character-reference decode — the canonically
  * correct algorithm for entity decoding (one left-to-right scan,
  * each `&...;` reference decoded once, output never re-scanned), so
  * `&amp;lt;` yields the literal text `&lt;` exactly as a browser
  * renders it — the semantics [[graft.operators.HtmlText]]'s earlier
  * replace-chain emulated with amp-last ordering, now with NUMERIC
  * references too (`&#8212;`, `&#x2014;`), which no fixed
  * regexp_replace chain can express (per-match codepoint arithmetic).
  *
  * Supported: the named set the text-cleaning stage needs (lt, gt,
  * quot, apos, amp, nbsp — nbsp decodes to U+00A0; the caller's
  * whitespace normalization folds it) + decimal/hex numeric
  * references up to 7 digits. Anything malformed — unknown name,
  * missing `;`, out-of-range or surrogate code point — passes through
  * LITERALLY, the lenient behavior every extractor needs on real web
  * text. */
case class HtmlEntityDecodeExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    TextHashNative.requireString(child, prettyName)
  override def dataType: DataType = StringType

  private val named = Map(
    "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "amp" -> "&", "nbsp" -> "\u00a0")

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (s.indexOf('&') < 0) return input
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '&') { out.append(c); i += 1 }
      else {
        val semi = s.indexOf(';', i + 1)
        // references are short (longest accepted bodies: "#1114111" /
        // "#x10FFFF", 8 chars → semi - i = 9); a farther ';' means a
        // bare '&'
        if (semi < 0 || semi - i > 9) { out.append(c); i += 1 }
        else {
          val body = s.substring(i + 1, semi)
          val decoded: Option[String] =
            if (body.startsWith("#")) {
              val (digits, radix) =
                if (body.length > 1 && (body.charAt(1) == 'x' || body.charAt(1) == 'X'))
                  (body.substring(2), 16)
                else (body.substring(1), 10)
              try {
                val cp = Integer.parseInt(digits, radix)
                if (digits.nonEmpty && Character.isValidCodePoint(cp) &&
                  !(cp >= 0xd800 && cp <= 0xdfff) && cp != 0)
                  Some(new String(Character.toChars(cp)))
                else None
              } catch { case _: NumberFormatException => None }
            } else named.get(body)
          decoded match {
            case Some(d) => out.append(d); i = semi + 1
            case None => out.append(c); i += 1 // malformed: literal '&'
          }
        }
      }
    }
    UTF8String.fromString(out.toString)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_html_entity_decode"
}

/** Mojibake repair — [[graft.operators.EncodingFix]]'s inverse
  * round-trip as a per-row expression: re-encode through the cp1252
  * reverse image and decode as strict UTF-8 when (and only when) that
  * changes the string; up to two layers. Correct text is a fixed
  * point (see the operator doc's safety argument), so this runs
  * corpus-wide as a plain projection. */
case class FixEncodingExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    TextHashNative.requireString(child, prettyName)
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val fixed = graft.operators.EncodingFix.fixString(s)
    if (fixed eq s) input else UTF8String.fromString(fixed)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_fix_encoding"
}

/** All of Gopher repetition's per-doc numerators in ONE pass over the
  * text — for each top window size the char mass `cnt·charlen` of the
  * (count, charlen)-lexicographic-max n-gram, for each dup window size
  * the summed char mass of every n-gram occurring ≥ 2 times
  * ([[graft.operators.GopherRepetition]] turns these into fractions).
  *
  * Value-identical to the distributed form (split → explode grams →
  * groupBy(doc, n, gram) → packed max / conditional sum) that
  * GopherRepetitionSpec keeps as the parity reference — but because
  * every Gopher signal is PER-DOCUMENT, the groupBy shuffled gram
  * strings for nothing: measured 708 MiB shuffle / 153 s CPU at g1.0
  * for what is a per-row fold. Here the gram never leaves the row:
  * `split(text, ' ')` reproduces the input byte-for-byte when
  * re-joined (empty tokens preserve consecutive separators), so the
  * input's OWN byte buffer is the joined buffer — windows are
  * contiguous regions located by one separator scan, each counted via
  * a zero-copy UTF8String region view (hashCode/equals read the
  * region in place; charlen = numChars once per distinct gram).
  */
case class GopherStatsExpr(child: Expression, topNs: Seq[Int], dupNs: Seq[Int])
    extends UnaryExpression with CodegenFallback {
  require(topNs.nonEmpty && dupNs.nonEmpty && (topNs ++ dupNs).forall(_ >= 1),
    "window sizes must be positive")
  override def checkInputDataTypes(): TypeCheckResult =
    TextHashNative.requireString(child, prettyName)
  override def dataType: DataType = StructType(
    topNs.map(n => StructField(s"top$n", LongType, nullable = false)) ++
      dupNs.map(n => StructField(s"dup$n", LongType, nullable = false)))

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val bytes = s.getBytes // one materialization; windows view into it
    // token byte offsets by separator scan: starts(i) = first byte of
    // token i, starts(T) = one past the buffer plus a virtual
    // separator, so window [p, p+n) spans starts(p) .. starts(p+n)-1
    var t = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') t += 1; i += 1 }
    val nToks = t
    val starts = new Array[Int](nToks + 1)
    starts(0) = 0
    var k = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { starts(k) = i + 1; k += 1 }
      i += 1
    }
    starts(nToks) = bytes.length + 1
    val out = new Array[Any](topNs.size + dupNs.size)
    var field = 0
    val allNs = topNs ++ dupNs
    val isTop = topNs.map(_ => true) ++ dupNs.map(_ => false)
    allNs.indices.foreach { ni =>
      val n = allNs(ni)
      val m = nToks - n + 1
      if (m <= 0) { out(field) = 0L; field += 1 }
      else {
        // distinct-gram counts over zero-copy region views
        val counts = new java.util.HashMap[UTF8String, Array[Long]](m * 2)
        var p = 0
        while (p < m) {
          val off = starts(p)
          val view =
            UTF8String.fromBytes(bytes, off, starts(p + n) - 1 - off)
          val slot = counts.get(view)
          if (slot == null) counts.put(view, Array(1L, view.numChars().toLong))
          else slot(0) += 1L
          p += 1
        }
        var acc = 0L // packed (cnt, len) max for top; char-mass sum for dup
        val it = counts.values().iterator()
        if (isTop(ni)) {
          while (it.hasNext) {
            val e = it.next()
            // len clamps to the 20-bit pack width: a single ≥1M-char
            // token (degenerate web text) must not carry into the cnt
            // bits — Java would wrap silently where the oracle's
            // HUGEINT check errors, so engine and oracle could
            // diverge instead of both failing. The clamp is applied
            // identically in reportViaShuffle and oracleCore; for a
            // clamped gram top_chars reads cnt·(2²⁰−1), an
            // under-count on text that is one token of ≥1M chars.
            val packed = e(0) * (1L << 20) + math.min(e(1), (1L << 20) - 1)
            if (packed > acc) acc = packed
          }
          acc = (acc >> 20) * (acc & ((1L << 20) - 1))
        } else {
          while (it.hasNext) {
            val e = it.next()
            if (e(0) >= 2L) acc += e(0) * e(1)
          }
        }
        out(field) = acc
        field += 1
      }
    }
    new GenericInternalRow(out)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_gopher_stats"
}
