package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.EncodingFix

/** Encoding-repair surface ([[graft.operators.EncodingFix]] — the ftfy
  * mojibake heuristic). The fixtures are clean ASCII, so the query
  * APPENDS planted suffixes: UTF-8-as-Latin-1 mojibake (`CafÃ©`),
  * cp1252-special mojibake (`donâ€™t`), DOUBLE mojibake (`CafÃƒÂ©`),
  * correctly-encoded accents (must be a FIXED POINT — the
  * over-correction failure mode), and plain ASCII. The engine runs
  * the real inverse round-trip; the oracle plants the expected fixed
  * text per variant — so both a missed fix and an over-correction
  * break the hash.
  */
object EncodingQueries {

  // suffix variants by doc_id % 5, written as unicode escapes so the
  // source file stays ASCII (values: u00C3='A-tilde', u00A9=copyright,
  // u0192=florin, u00C2='A-circumflex', u00E9=e-acute, u00E2, u20AC,
  // u2122, u2019=right single quote)
  private val moji1 = " cafe Caf\u00C3\u00A9 menu" // -> Caf<e-acute>
  private val fix1 = " cafe Caf\u00E9 menu"
  private val moji2 = " quote don\u00E2\u20AC\u2122t stop" // -> don't
  private val fix2 = " quote don\u2019t stop"
  private val clean3 = " already Caf\u00E9 fine" // fixed point
  private val moji4 = " double Caf\u00C3\u0192\u00C2\u00A9 twice" // double layer
  private val fix4 = " double Caf\u00E9 twice"
  private val ascii0 = " plain ascii tail"

  private def pick(a0: String, a1: String, a2: String, a3: String,
      a4: String): org.apache.spark.sql.Column = {
    val v = col("doc_id") % 5
    when(v === 0, lit(a0)).when(v === 1, lit(a1)).when(v === 2, lit(a2))
      .when(v === 3, lit(a3)).otherwise(lit(a4))
  }

  private def sqlCase(vExpr: String, a0: String, a1: String, a2: String,
      a3: String, a4: String): String =
    s"""CASE $vExpr
       |        WHEN 0 THEN '$a0' WHEN 1 THEN '$a1' WHEN 2 THEN '$a2'
       |        WHEN 3 THEN '$a3' ELSE '$a4' END""".stripMargin

  private val fixEncoding = QuerySpec(
    "q_text_fix_encoding",
    s"""SELECT doc_id,
       |  text || ${sqlCase("doc_id % 5", ascii0, fix1, fix2, clean3, fix4)} AS fixed_text,
       |  CASE doc_id % 5 WHEN 1 THEN 1 WHEN 2 THEN 1 WHEN 4 THEN 1
       |       ELSE 0 END AS was_fixed
       |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    val planted = concat(col("text"),
      pick(ascii0, moji1, moji2, clean3, moji4))
    Tables.documents(s, d)
      .select(col("doc_id"),
        EncodingFix.fixEncoding(planted).as("fixed_text"),
        when(EncodingFix.fixEncoding(planted) =!= planted, 1).otherwise(0)
          .as("was_fixed"))
      .orderBy("doc_id")
  }

  def all: Seq[QuerySpec] = Seq(fixEncoding)
}
