package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.GopherRepetition

/** Gopher repetition-filter surface ([[graft.operators.GopherRepetition]]
  * — Rae et al. 2021 Table A1 over whitespace tokens). The per-doc
  * report emits every fraction the filter decision uses, so the hash
  * gate certifies the SIGNALS, not just the final keep bit; the
  * summary shows the report composing into the per-language mixing
  * view a curation run actually reads. Oracle SQL is GENERATED from
  * the same threshold tables that drive the engine
  * (GopherRepetition.oracleSql) — a threshold edit that misses either
  * side breaks the hash.
  */
object GopherQueries {

  /** Per-document repetition report: 3 top-gram + 6 dup-gram char
    * fractions and the Gopher keep decision, one row per document. */
  private val gopherRepetition = QuerySpec(
    "q_gopher_repetition",
    GopherRepetition.oracleSql("doc_id", "text")) { (s, d) =>
    GopherRepetition.report(Tables.documents(s, d), "doc_id", "text")
      .orderBy("doc_id")
  }

  /** Per-language curation summary over the report: how many docs each
    * language keeps under the GLOBAL Table-A1 thresholds, how many
    * under the PER-LANGUAGE adjusted thresholds
    * ([[GopherRepetition.langAdjust]] — the CCNet/Dolma discipline),
    * and which filter family rejects the rest — the mixing-decision
    * view. Exact integer counts only (the fractions stay per-doc;
    * averaging them would accumulate float error). Both the adjustment
    * CASE and the adjusted-keep predicate in the oracle are GENERATED
    * from the same tables that drive the engine. */
  private val gopherSummary = QuerySpec(
    "q_gopher_summary",
    s"""WITH rep AS (
       |${GopherRepetition.oracleCore("doc_id", "text")}),
       |j AS (
       |  SELECT d.lang, r.*,
       |         CASE WHEN ${GopherRepetition.topThresholds
                  .map { case (n, t) => s"r.top${n}_frac > $t" }
                  .mkString(" OR ")} THEN 1 ELSE 0 END AS top_fail,
       |         CASE WHEN ${GopherRepetition.dupThresholds
                  .map { case (n, t) => s"r.dup${n}_frac > $t" }
                  .mkString(" OR ")} THEN 1 ELSE 0 END AS dup_fail
       |  FROM rep r JOIN documents d ON d.doc_id = r.doc_id)
       |SELECT lang, COUNT(*) AS n_docs,
       |       CAST(SUM(gopher_keep) AS BIGINT) AS n_kept,
       |       CAST(SUM(CASE WHEN ${GopherRepetition.keepWithAdjustSql("lang")}
       |         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept_lang,
       |       CAST(SUM(top_fail) AS BIGINT) AS n_top_fail,
       |       CAST(SUM(dup_fail) AS BIGINT) AS n_dup_fail
       |FROM j GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val rep = GopherRepetition.report(docs, "doc_id", "text")
    val topFail = GopherRepetition.topThresholds
      .map { case (n, t) => col(s"top${n}_frac") > t }.reduce(_ || _)
    val dupFail = GopherRepetition.dupThresholds
      .map { case (n, t) => col(s"dup${n}_frac") > t }.reduce(_ || _)
    val adj = GopherRepetition.langAdjustCol(col("lang"))
    rep
      .join(docs.select("doc_id", "lang"), "doc_id")
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("gopher_keep")).cast("long").as("n_kept"),
        sum(when(GopherRepetition.keepWithAdjust(adj), 1).otherwise(0))
          .cast("long").as("n_kept_lang"),
        sum(when(topFail, 1).otherwise(0)).cast("long").as("n_top_fail"),
        sum(when(dupFail, 1).otherwise(0)).cast("long").as("n_dup_fail"))
      .orderBy("lang")
  }

  def all: Seq[QuerySpec] = Seq(gopherRepetition, gopherSummary)
}
