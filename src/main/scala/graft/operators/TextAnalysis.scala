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

  /** Polynomial rolling-hash fingerprint over token codes, mod 1e9+7.
    * Pure integer arithmetic → portable across engines (unlike
    * xxhash64, this one is oracle-checkable in DuckDB via list_reduce). */
  def rollingFingerprint(tokens: Column): Column =
    aggregate(
      transform(tokens, t => (ascii(substring(t, 1, 1)) * 31 + length(t)).cast("long")),
      lit(0L), (acc, c) => (acc * 131 + c) % 1000000007L)
}
