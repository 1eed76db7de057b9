package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines — harness north-star
  * (BASELINE.json): tokenization, quality scoring, language-ID
  * heuristics, document fingerprinting. All per-row, codegen-friendly
  * column expressions: embarrassingly parallel at any scale.
  */
object TextAnalysis {

  /** Whitespace tokens (single-space delimited, matching the corpus and
    * the DuckDB oracle's string_split). */
  def wsTokens(text: Column): Column = split(text, " ")

  /** BPE-ish regex tokens: letter runs, digit runs, single punctuation. */
  def regexTokens(text: Column): Column =
    regexp_extract_all(text, lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  /** Hashing-trick count features: `dim`-length token-count vector via
    * portable md5 buckets (vocabulary-free O(dim) featurization — see
    * plans.HashedCountVecExpr). Pure projection: no shuffle, no
    * vocabulary state, every component SQL-recomputable. */
  def hashedFeatures(text: Column, dim: Int): Column =
    graft.plans.TextHashNative.hashedCountVec(text, dim)

  private val stopwords = Seq("the", "a", "of", "to", "and", "in", "is", "it")

  /** Fraction of tokens that are stopwords — a fluency signal. */
  def stopwordRatio(tokens: Column): Column =
    size(filter(tokens, t => t.isin(stopwords: _*))).cast("double") / size(tokens)

  /** Mean token length in characters. */
  def avgTokenLen(tokens: Column): Column =
    aggregate(tokens, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(tokens)

  /** Composite quality score in [0,1]: length band + stopword presence.
    * Deliberately simple/deterministic; thresholds are the tunable part. */
  def qualityScore(text: Column): Column = {
    val toks = wsTokens(text)
    val lenScore = when(size(toks).between(20, 2000), 1.0).otherwise(0.25)
    val stopScore = when(stopwordRatio(toks) > 0.05, 1.0).otherwise(0.5)
    lenScore * 0.5 + stopScore * 0.5
  }

  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "es" -> Seq("el", "la", "de", "los"),
    "de" -> Seq("der", "die", "das", "und"),
    "fr" -> Seq("le", "la", "et", "les"))

  /** Marker-token count for one language. */
  def langScore(tokens: Column, lang: String): Column = {
    val ms = markers.toMap.apply(lang)
    size(filter(tokens, t => t.isin(ms: _*))).cast("long")
  }

  /** n-gram-heuristic language ID: argmax of marker counts with a fixed
    * priority order (en > es > de > fr > unknown on ties/zero). */
  def langId(text: Column): Column = {
    val toks = wsTokens(text)
    val scores = markers.map { case (l, _) => l -> langScore(toks, l) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(when(best === 0, "unknown")) { case (acc, (l, s)) =>
      acc.when(s === best, l)
    }.otherwise("unknown")
  }

  // ---- tokenizer-prep: vocabulary + encoding ---------------------------

  /** Corpus vocabulary: one row per distinct token with total count,
    * document frequency, and a 1-based id assigned by count-descending
    * (token-ascending tiebreak). The ranking is [[Ranks.distributedRowNumber]]
    * — no unpartitioned window, so a web-scale vocabulary (10⁷+ terms)
    * still ranks without a single-task sort. */
  def vocabulary(df: DataFrame, id: String, text: String): DataFrame = {
    val tok = df.select(col(id).as("_doc"), explode(wsTokens(col(text))).as("term"))
    val counts = tok.groupBy("term")
      .agg(count(lit(1)).as("n"), countDistinct(col("_doc")).as("df_docs"))
    Ranks.distributedRowNumber(counts, Seq(col("n").desc, col("term").asc), "rank")
  }

  /** Token-id encoding against the top-`vocabSize` [[vocabulary]] ids;
    * out-of-vocabulary tokens map to 0 — the tokenizer-prep step that
    * turns a text corpus into model-ready id sequences.
    *
    * Scale shape: posexplode to keep token positions, ONE broadcast
    * join against the (small, cutoff) vocabulary, one regroup per doc;
    * order is restored in-row via array_sort over (pos, id) structs.
    * Output ids are a comma-joined string — exact, hashable, and
    * engine-portable (array columns aren't). */
  def encodeTokens(df: DataFrame, id: String, text: String, vocabSize: Int): DataFrame = {
    val vocab = vocabulary(df, id, text)
      .filter(col("rank") <= vocabSize)
      .select(col("term"), col("rank"))
    val tok = df.select(col(id).as(id), posexplode(wsTokens(col(text))))
      .withColumnRenamed("pos", "_pos").withColumnRenamed("col", "term")
    val encoded = tok.join(broadcast(vocab), Seq("term"), "left_outer")
      .groupBy(id)
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("_pos"), coalesce(col("rank"), lit(0L)).as("_id")))),
        s => s.getField("_id").cast("string")), ",").as("ids"))
    // null-text docs have no exploded rows and would silently vanish
    // from the output; re-attach them with NULL ids (= what the SQL
    // form computes: transform over a NULL token list is NULL)
    df.select(col(id).as(id)).join(encoded, Seq(id), "left_outer")
  }

  /** Intra-document repetition metrics — the Gopher-style quality
    * signals (Rae et al. 2021, §A1.1) for filtering boilerplate and
    * degenerate text: duplicate-token ratio, most-frequent-token ratio,
    * duplicate-bigram ratio. Per-token counts aggregate via
    * explode→groupBy (scales to any document length); bigram stats are
    * in-row set arithmetic. */
  def repetitionStats(df: DataFrame, id: String, text: String): DataFrame = {
    val perTerm = df.select(col(id).as(id), explode(wsTokens(col(text))).as("term"))
      .groupBy(id, "term").agg(count(lit(1)).as("_c"))
    val tokStats = perTerm.groupBy(id).agg(
      sum(col("_c")).as("n_tokens"),
      count(lit(1)).as("_n_distinct"),
      max(col("_c")).as("_max_c"))
    val biStats = df.select(col(id).as(id),
      size(Dedup.shingles(col(text), 2)).as("_n_bi_distinct"),
      (size(wsTokens(col(text))) - 1).cast("long").as("_n_bi"))
    tokStats.join(biStats, Seq(id))
      .select(col(id), col("n_tokens"),
        (lit(1.0) - col("_n_distinct").cast("double") / col("n_tokens")).as("dup_token_ratio"),
        (col("_max_c").cast("double") / col("n_tokens")).as("top_token_ratio"),
        when(col("_n_bi") > 0,
          lit(1.0) - col("_n_bi_distinct").cast("double") / col("_n_bi"))
          .otherwise(0.0).as("dup_bigram_ratio"))
  }

  // ---- corpus hygiene: contamination + composition ---------------------

  /** Benchmark-contamination check (the GPT-3-style decontamination
    * step): a corpus document is flagged when it shares at least one
    * distinct word n-gram with any benchmark document. Returns
    * (doc_id, n_shared_ngrams, n_bench_docs) for flagged docs only.
    *
    * Scale shape: shingles are hashed in one pass (no n-gram strings
    * materialized), the benchmark side — an eval set, small by nature —
    * broadcasts, and the only shuffle is the per-doc aggregation of
    * matches. Never compares documents pairwise. */
  def contamination(
      corpus: DataFrame, bench: DataFrame, id: String, text: String, n: Int): DataFrame = {
    val bsh = bench.select(col(id).as("_bid"),
      explode(Dedup.shingleHashSet(col(text), n)).as("_sh"))
    val csh = corpus.select(col(id).as(id),
      explode(Dedup.shingleHashSet(col(text), n)).as("_sh"))
    csh.join(broadcast(bsh), "_sh")
      .groupBy(id)
      .agg(countDistinct(col("_sh")).as("n_shared_ngrams"),
        countDistinct(col("_bid")).as("n_bench_docs"))
  }

  /** Corpus composition: per-group document/token counts and each
    * group's share of all tokens — the numbers a data-mixing policy
    * consumes. Exact integer division into double (deterministic across
    * engines). */
  def corpusMix(df: DataFrame, text: String, keys: Seq[String]): DataFrame = {
    // persisted: the grouped frame feeds both the grand total and the
    // final join — unpersisted, the full corpus scan + tokenize would
    // run twice (same fan-out convention as Dedup.collapseVerify; the
    // frame is group-cardinality small)
    val agg = graft.core.CacheGovernor.persistTracked(df
      .select(keys.map(col) :+ size(wsTokens(col(text))).cast("long").as("_n"): _*)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_docs"), sum(col("_n")).as("total_tokens")))
    val tot = agg.agg(sum(col("total_tokens")).cast("double").as("_tt"))
    agg.crossJoin(broadcast(tot))
      .withColumn("token_share", col("total_tokens").cast("double") / col("_tt"))
      .drop("_tt")
  }

  /** Polynomial rolling-hash fingerprint over token codes, mod 1e9+7.
    * Pure integer arithmetic → portable across engines (unlike
    * xxhash64, this one is oracle-checkable in DuckDB via list_reduce). */
  def rollingFingerprint(tokens: Column): Column =
    aggregate(
      transform(tokens, t => (ascii(substring(t, 1, 1)) * 31 + length(t)).cast("long")),
      lit(0L), (acc, c) => (acc * 131 + c) % 1000000007L)

  /** PII redaction — the scrubbing stage every shipped training corpus
    * runs: emails, IPv4 addresses and international phone numbers are
    * replaced with typed tags. A pure per-row `regexp_replace` chain:
    * codegen'd, shuffle-free, embarrassingly parallel. Patterns stick
    * to RE2-compatible syntax (character classes, bounded repeats, \b
    * — no backtracking constructs), so they match identically under
    * Java regex (Spark) and RE2 (the DuckDB oracle). Order matters:
    * emails first (their local part may embed digit.dot runs an IP
    * pattern would half-eat), then IPs, then +-prefixed phones (which
    * can no longer overlap either). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\+\\d{1,3}[- ]\\d{3}[- ]\\d{4,10}"

  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Mean corpus-frequency of a document's tokens — the rarity/
    * familiarity quality signal (gibberish and OOV-heavy docs score
    * low; boilerplate scores high). Integer arithmetic until ONE final
    * division, so the double is engine-exact: Σ per-token corpus count
    * / n_tokens. Shape: explode → token-count aggregation → hash join
    * of the exploded tokens back to their counts (the vocabulary can be
    * web-scale, so it is NOT broadcast) → per-doc aggregation. */
  def tokenFamiliarity(df: DataFrame, id: String, text: String): DataFrame = {
    val tok = df.select(col(id).as(id), explode(wsTokens(col(text))).as("term"))
    val counts = tok.groupBy("term").agg(count(lit(1)).as("_tf"))
    tok.join(counts, "term")
      .groupBy(id)
      .agg(count(lit(1)).as("n_tokens"), sum(col("_tf")).as("_s"))
      .withColumn("familiarity", col("_s").cast("double") / col("n_tokens"))
      .drop("_s")
  }

  /** Content-defined chunking (CDC): split each document at rolling-hash
    * boundaries — a chunk ends after any position whose trailing
    * `window`-char polynomial hash ≡ 0 (mod `divisor`), so expected
    * chunk length ≈ divisor chars. Unlike fixed-size chunking
    * ([[Multimodal.sampleChunks]]), boundaries depend only on LOCAL
    * content: insert a byte and every chunk past the next boundary is
    * byte-identical again — which is what makes CDC the chunking used
    * for shift-robust dedup of large corpora.
    *
    * Boundary detection is a native single-pass Expression
    * ([[graft.plans.CdcBoundariesExpr]]) — per-row, shuffle-free,
    * O(len) per document via an incremental rolling update. (The
    * original composed-HOF form — transform/filter/aggregate over
    * per-position substring codes — was O(window·len) across three
    * nested interpreted lambdas plus O(len²) substring walks, and alone
    * cost 556 s of the 638 s sf0.1 bench.) The polynomial
    * ((a·31 + code) mod 1000003) is exact integer arithmetic, so the
    * DuckDB oracle reproduces every boundary. Documents shorter than
    * `window` yield one whole-document chunk; null/empty texts yield no
    * rows (chunk consumers key by doc_id).
    *
    * Output: (doc_id, chunk_idx, chunk) — chunk_idx skips a slot in the
    * rare all-boundary-at-end case (trailing empty chunks filter out,
    * same on both engines). */
  def cdcChunks(df: DataFrame, id: String, text: String,
      window: Int = 8, divisor: Int = 64): DataFrame = {
    require(window >= 2 && divisor >= 2)
    df.select(col(id).as("doc_id"), col(text).as("_t"))
      .filter(col("_t").isNotNull && length(col("_t")) > 0)
      .withColumn("_bnds",
        graft.plans.TextHashNative.cdcBoundaries(col("_t"), window, divisor))
      .withColumn("_bb", expr("concat(array(0), _bnds, array(length(_t)))"))
      .select(col("doc_id"), expr(
        """inline(transform(sequence(1, size(_bb) - 1),
          |  i -> struct(CAST(i - 1 AS BIGINT) AS chunk_idx,
          |              substring(_t, element_at(_bb, i) + 1,
          |                        element_at(_bb, i + 1) - element_at(_bb, i)) AS chunk)))"""
          .stripMargin))
      .filter(length(col("chunk")) > 0)
  }
}
