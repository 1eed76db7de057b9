package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.CrawlRevisit

class CrawlRevisitSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  // url, content per snapshot: u1 never changes, u2 changes at snap 1,
  // u3 appears at snap 1 and flips back at snap 2 (A→B→A = 2 changes),
  // u4 appears only at snap 2
  private def snap(i: Int) = (i match {
    case 0 => Seq(("u1", "a"), ("u2", "x"))
    case 1 => Seq(("u1", "a"), ("u2", "y"), ("u3", "p"))
    case _ => Seq(("u1", "a"), ("u2", "y"), ("u3", "q"), ("u4", "n"))
  }).toDF("url", "content")

  private def reportOf(path: String) =
    CrawlRevisit.revisitReport(CrawlRevisit.readVisits(spark, path))
      .select("url", "first_seen", "last_seen", "n_visits", "n_changes")
      .as[(String, Long, Long, Long, Long)].collect().toSet

  test("fold yields first/last/visits/changes per url") {
    val dir = java.nio.file.Files.createTempDirectory("crawl1").toString
    CrawlRevisit.writeLedger(snap(0), col("url"), col("content"), 0L, dir)
    CrawlRevisit.appendSnapshot(snap(1), col("url"), col("content"), 1L, dir)
    CrawlRevisit.appendSnapshot(snap(2), col("url"), col("content"), 2L, dir)
    assert(reportOf(dir) === Set(
      ("u1", 0L, 2L, 3L, 0L),
      ("u2", 0L, 2L, 3L, 1L),
      ("u3", 1L, 2L, 2L, 1L),
      ("u4", 2L, 2L, 1L, 0L)))
    // change-flip-back counts each transition: extend u3 with 'p' again
    CrawlRevisit.appendSnapshot(Seq(("u3", "p")).toDF("url", "content"),
      col("url"), col("content"), 3L, dir)
    assert(reportOf(dir).contains(("u3", 1L, 3L, 3L, 2L)))
  }

  test("append == rebuild and redelivery is a no-op through the fold") {
    val a = java.nio.file.Files.createTempDirectory("crawlA").toString
    CrawlRevisit.writeLedger(snap(0), col("url"), col("content"), 0L, a)
    CrawlRevisit.appendSnapshot(snap(1), col("url"), col("content"), 1L, a)
    CrawlRevisit.appendSnapshot(snap(1), col("url"), col("content"), 1L, a)
    CrawlRevisit.appendSnapshot(snap(2), col("url"), col("content"), 2L, a)
    CrawlRevisit.appendSnapshot(snap(2), col("url"), col("content"), 2L, a)
    val b = java.nio.file.Files.createTempDirectory("crawlB").toString
    val union = (0 to 2).map(i => CrawlRevisit
      .visitEvents(snap(i), col("url"), col("content"), i.toLong))
      .reduce(_ unionByName _)
    union.write.mode("overwrite").parquet(s"$b/visits")
    assert(reportOf(a) === reportOf(b))
  }

  test("freshDocs gates ingestion: new or changed rows only") {
    val dir = java.nio.file.Files.createTempDirectory("crawlF").toString
    CrawlRevisit.writeLedger(snap(0), col("url"), col("content"), 0L, dir)
    CrawlRevisit.appendSnapshot(snap(1), col("url"), col("content"), 1L, dir)
    val state = CrawlRevisit
      .revisitReport(CrawlRevisit.readVisits(spark, dir))
    val fresh = CrawlRevisit
      .freshDocs(snap(2), col("url"), col("content"), state)
      .select("url").as[String].collect().toSet
    // u1 unchanged 'a' → skip; u2 latest 'y' == snap2 'y' → skip;
    // u3 changed p→q → process; u4 brand new → process
    assert(fresh === Set("u3", "u4"))
    // fresh output keeps the snapshot's own columns intact
    val cols = CrawlRevisit
      .freshDocs(snap(2), col("url"), col("content"), state).columns.toSeq
    assert(cols === Seq("url", "content"))
  }

  test("latest_md5 is the most recent visit's hash") {
    val dir = java.nio.file.Files.createTempDirectory("crawlM").toString
    CrawlRevisit.writeLedger(snap(0), col("url"), col("content"), 0L, dir)
    CrawlRevisit.appendSnapshot(snap(1), col("url"), col("content"), 1L, dir)
    val m = CrawlRevisit.revisitReport(CrawlRevisit.readVisits(spark, dir))
      .select("url", "latest_md5").as[(String, String)].collect().toMap
    val md5y = java.security.MessageDigest.getInstance("MD5")
      .digest("y".getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    assert(m("u2") === md5y)
  }
}
