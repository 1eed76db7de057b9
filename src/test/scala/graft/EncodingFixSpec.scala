package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.EncodingFix

class EncodingFixSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def fix(ss: String*): Seq[String] =
    ss.toDF("t").select(EncodingFix.fixEncoding(col("t")))
      .as[String].collect().toSeq

  test("classic UTF-8-as-Latin-1 mojibake repairs") {
    assert(fix("CafÃ©") === Seq("Café")) // Café
    assert(fix("naÃ¯ve rÃ©sumÃ©") ===
      Seq("naïve résumé"))
  }

  test("cp1252-special mojibake repairs (the euro/quote window)") {
    // don’t misdecoded: E2 80 99 -> â € ™
    assert(fix("donâ€™t") === Seq("don’t"))
    // em dash — (E2 80 94): 94 is cp1252 right double quote
    assert(fix("aâ€”b") === Seq("a—b"))
  }

  test("double mojibake repairs through two rounds") {
    assert(fix("CafÃƒÂ©") === Seq("Café"))
  }

  test("correct text is a fixed point — no over-correction") {
    val inputs = Seq(
      "plain ascii only",
      "Café already fine", // é alone: byte E9 invalid UTF-8
      "中文 text", // CJK: outside Latin-1/cp1252 → untouched
      "emoji 😀 stays",
      "")
    assert(fix(inputs: _*) === inputs)
  }

  test("driver helper and expression agree") {
    val s = "mix donâ€™t and CafÃ© ascii"
    assert(fix(s) === Seq(EncodingFix.fixString(s)))
  }
}
