package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.PiiRedact

/** PII scrub surface ([[graft.operators.PiiRedact]]). The fixtures'
  * texts carry no PII, so each query APPENDS a deterministic planted
  * suffix built from doc_id components — five variants covering each
  * detector class, a multi-PII composite, and a boundary NEGATIVE
  * (a version string an over-eager IP rule would eat). The Spark side
  * DETECTS with the operator's regexes; the oracle constructs the
  * expected redacted text and counts independently from the planted
  * components — so a detector bug on either side (missed match, wrong
  * span, false positive on the negative) breaks the hash.
  */
object PiiQueries {

  /** Variant selector decoupled from `source` (= doc_id % 20). */
  private[queries] def variant = pmod(pmod(col("doc_id"), lit(7)), lit(5))
  private val variantSql = "doc_id % 7 % 5"

  /** The planted suffix, Spark side (oracle mirrors it verbatim). */
  private[queries] def suffix = {
    val id = col("doc_id").cast("string")
    when(variant === 0, lit(" rev 1.2.3.4000 build"))
      .when(variant === 1, concat(lit(" contact user"), id,
        lit("@mail.example.com now")))
      .when(variant === 2, concat(lit(" node at 10."),
        (col("doc_id") % 200).cast("string"), lit(".0.1 port 8080")))
      .when(variant === 3, concat(lit(" call 555-"),
        lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" today")))
      .otherwise(concat(lit(" card 4111-1111-1111-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" or ops"), id, lit("@corp.example.org")))
  }

  /** The RAW planted suffix in SQL, with the variant and id
    * expressions supplied by the caller (so it can inline into
    * contexts without the u-CTE aliases — e.g. inside
    * GopherRepetition.oracleCore's textCol slot). MARGIN-SAFE: no
    * continuation line starts with `|`, because the fragment nests
    * inside templates that each run their own stripMargin — a leading
    * `||` would lose one bar per nesting level. */
  private[queries] def suffixSqlFor(v: String, id: String): String =
    s"""CASE $v
      |      WHEN 0 THEN ' rev 1.2.3.4000 build'
      |      WHEN 1 THEN ' contact user' || $id || '@mail.example.com now'
      |      WHEN 2 THEN ' node at 10.' || CAST(doc_id % 200 AS VARCHAR) || '.0.1 port 8080'
      |      WHEN 3 THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') ||
      |                  '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' today'
      |      ELSE ' card 4111-1111-1111-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
      |           ' or ops' || $id || '@corp.example.org'
      |    END""".stripMargin

  private[queries] def redactedSuffixSqlFor(v: String): String =
    s"""CASE $v
      |      WHEN 0 THEN ' rev 1.2.3.4000 build'
      |      WHEN 1 THEN ' contact <EMAIL> now'
      |      WHEN 2 THEN ' node at <IP> port 8080'
      |      WHEN 3 THEN ' call <PHONE> today'
      |      ELSE ' card <CARD> or <EMAIL>'
      |    END""".stripMargin

  /** Per-doc redaction: the operator's regexes must reproduce exactly
    * the planted expectation (full redacted text + per-type counts +
    * the untouched negative). */
  private val piiRedact = QuerySpec(
    "q_pii_redact",
    s"""WITH u AS (
       |  SELECT doc_id, text, $variantSql AS v,
       |         CAST(doc_id AS VARCHAR) AS id FROM documents)
       |SELECT doc_id,
       |  text || ${redactedSuffixSqlFor("v")} AS red_text,
       |  CAST(CASE WHEN v IN (1, 4) THEN 1 ELSE 0 END AS BIGINT) AS n_email,
       |  CAST(CASE WHEN v = 4 THEN 1 ELSE 0 END AS BIGINT) AS n_card,
       |  CAST(CASE WHEN v = 3 THEN 1 ELSE 0 END AS BIGINT) AS n_phone,
       |  CAST(CASE WHEN v = 2 THEN 1 ELSE 0 END AS BIGINT) AS n_ipv4,
       |  CASE WHEN v = 0 THEN 0 ELSE 1 END AS pii_any
       |FROM u ORDER BY doc_id""".stripMargin) { (s, d) =>
    val withPii = Tables.documents(s, d)
      .select(col("doc_id"), concat(col("text"), suffix).as("_t"))
    withPii
      .select(
        Seq(col("doc_id"), PiiRedact.redact(col("_t")).as("red_text")) ++
          PiiRedact.counts(col("_t")) :+
          when(PiiRedact.hasPii(col("_t")), 1).otherwise(0).as("pii_any"): _*)
      .orderBy("doc_id")
  }

  /** Per-source scrub report: corpus-level PII composition — the view
    * that decides whether a slice ships or goes back for cleaning. */
  private val piiScan = QuerySpec(
    "q_pii_scan",
    s"""WITH u AS (
       |  SELECT doc_id, source, $variantSql AS v FROM documents)
       |SELECT source,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN v = 0 THEN 0 ELSE 1 END) AS BIGINT) AS n_docs_pii,
       |  CAST(SUM(CASE WHEN v IN (1, 4) THEN 1 ELSE 0 END) AS BIGINT) AS n_email,
       |  CAST(SUM(CASE WHEN v = 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_card,
       |  CAST(SUM(CASE WHEN v = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_phone,
       |  CAST(SUM(CASE WHEN v = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_ipv4
       |FROM u GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    val withPii = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        concat(col("text"), suffix).as("_t"))
    withPii
      .select(
        Seq(col("source"),
          when(PiiRedact.hasPii(col("_t")), 1).otherwise(0).as("_any")) ++
          PiiRedact.counts(col("_t")): _*)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("_any")).cast("long").as("n_docs_pii"),
        sum(col("n_email")).cast("long").as("n_email"),
        sum(col("n_card")).cast("long").as("n_card"),
        sum(col("n_phone")).cast("long").as("n_phone"),
        sum(col("n_ipv4")).cast("long").as("n_ipv4"))
      .orderBy("source")
  }

  def all: Seq[QuerySpec] = Seq(piiRedact, piiScan)
}
