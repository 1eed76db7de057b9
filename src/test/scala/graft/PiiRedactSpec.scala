package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.PiiRedact

class PiiRedactSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def red(texts: String*): Seq[String] =
    texts.toDF("t").select(PiiRedact.redact(col("t")).as("r"))
      .collect().map(_.getString(0)).toSeq

  private def cnt(text: String): Map[String, Long] = {
    val row = Seq(text).toDF("t")
      .select(PiiRedact.counts(col("t")): _*).collect().head
    PiiRedact.patterns.map(_._1).zipWithIndex
      .map { case (n, i) => n -> row.getLong(i) }.toMap
  }

  test("each detector class redacts its canonical form") {
    assert(red(
      "mail a.b+c@sub.example.com now",
      "card 4111 1111 1111 1111 ok",
      "card 4111111111111111 ok",
      "tel 555-123-4567 or 555.123.4567",
      "host 10.0.255.3 up") === Seq(
      "mail <EMAIL> now",
      "card <CARD> ok",
      "card <CARD> ok",
      "tel <PHONE> or <PHONE>",
      "host <IP> up"))
  }

  test("boundary negatives stay untouched") {
    assert(red(
      "rev 1.2.3.4000 build", // 4th octet too long
      "v10.0.255.3.1 tag",    // five dotted groups
      "id 5551234567 raw",    // unseparated 10 digits: not NANP form
      "card 4111-1111 1111-1111 mixed") === Seq( // inconsistent separator
      "rev 1.2.3.4000 build",
      "v10.0.255.3.1 tag",
      "id 5551234567 raw",
      "card 4111-1111 1111-1111 mixed"))
  }

  test("numeric-domain addresses fall through to the IP rule") {
    // not an email (TLD must be alpha) — the IP rule owns the octets
    assert(red("ping a@1.2.3.4 done") === Seq("ping a@<IP> done"))
  }

  test("card is consumed before the phone rule can take its groups") {
    assert(red("pay 4111-1111-1111-1234 by 555-123-4567") ===
      Seq("pay <CARD> by <PHONE>"))
  }

  test("counts are per-type and independent of redaction order") {
    val m = cnt("a@b.co and c@d.io via 10.0.0.1 call 555-123-4567")
    assert(m === Map(
      "email" -> 2L, "card" -> 0L, "phone" -> 1L, "ipv4" -> 1L))
    assert(cnt("plain text")("email") === 0L)
  }

  test("hasPii fires iff any detector matches") {
    val got = Seq("clean words", "x 10.1.1.1 y", "rev 1.2.3.4000")
      .toDF("t").select(PiiRedact.hasPii(col("t")).as("p"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(got === Seq(false, true, false))
  }
}
