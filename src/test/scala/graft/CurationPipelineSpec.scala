package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{GopherRepetition, PiiRedact, WebCuration}

/** The composed curation chain's stage contracts — the per-stage
  * properties q_curation_pipeline's end-to-end hash rests on. */
class CurationPipelineSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private val docs = (0L until 200L).map { i =>
    // clean docs must be long enough that one unique 4-gram stays
    // under the 0.16 top4 threshold (Gopher assumes non-tiny pages)
    (i, if (i % 9 == 0) "spam spam spam spam spam spam"
        else (0 until 70).map(j => s"w${i}x$j").mkString(" "))
  }.toDF("doc_id", "text")
    .withColumn("host", concat(lit("h"), pmod(col("doc_id"), lit(5)),
      lit(".example.com")))

  test("stages only ever shrink the row set, in order") {
    val blocklist = Seq("h0.example.com").toDF("h")
    val s1 = WebCuration.blockHosts(docs, col("host"), blocklist)
    val s2 = WebCuration.domainQuota(s1, col("host"), col("doc_id"), 10)
    val s3 = s2.join(GopherRepetition.report(docs, "doc_id", "text")
      .filter(col("gopher_keep") === 1).select("doc_id"), "doc_id")
    val (n0, n1, n2, n3) = (docs.count(), s1.count(), s2.count(), s3.count())
    assert(n0 > n1 && n1 > n2 && n2 > n3 && n3 > 0,
      s"expected strict shrink with survivors: $n0 -> $n1 -> $n2 -> $n3")
    // blocklist removed exactly host h0's docs
    assert(n0 - n1 === docs.filter(col("host") === "h0.example.com").count())
    // quota capped every surviving host at 10
    assert(s2.groupBy("host").count().filter(col("count") > 10).count() === 0L)
    // gopher dropped exactly the spam docs that survived the quota
    assert(s3.filter(col("text").startsWith("spam")).count() === 0L)
  }

  test("redaction composes with the filter stages deterministically") {
    val quota = WebCuration.domainQuota(docs, col("host"), col("doc_id"), 10)
    val red = quota.withColumn("_r",
      PiiRedact.redact(concat(col("text"), lit(" contact a@b.io"))))
    assert(red.filter(col("_r").contains("@")).count() === 0L)
    val a = red.select("doc_id", "_r").orderBy("doc_id").collect().toSeq
    val b = quota.repartition(7).withColumn("_r",
      PiiRedact.redact(concat(col("text"), lit(" contact a@b.io"))))
      .select("doc_id", "_r").orderBy("doc_id").collect().toSeq
    assert(a === b)
  }
}
