package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SnapshotDiff

class SnapshotDiffSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private val oldDf = Seq(
    (1L, Some("a"), Some(10.0)), // unchanged
    (2L, Some("b"), Some(20.0)), // status update
    (3L, Some("c"), Some(30.0)), // deleted
    (4L, None: Option[String], Some(40.0)), // NULL -> value update
    (5L, Some("e"), None: Option[Double]) // NULL stays NULL: unchanged
  ).toDF("k", "status", "price")

  private val newDf = Seq(
    (1L, Some("a"), Some(10.0)),
    (2L, Some("B"), Some(20.0)),
    (4L, Some("d"), Some(40.0)),
    (5L, Some("e"), None: Option[Double]),
    (6L, Some("f"), Some(60.0)) // inserted
  ).toDF("k", "status", "price")

  private def d =
    SnapshotDiff.diff(oldDf, newDf, Seq("k"), Seq("status", "price"))

  test("classifies insert, delete, update, and same") {
    val byKey = d.collect().map(r => r.getLong(0) -> r.getAs[String]("change")).toMap
    assert(byKey === Map(1L -> "same", 2L -> "update", 3L -> "delete",
      4L -> "update", 5L -> "same", 6L -> "insert"))
  }

  test("null-safe comparison: value->NULL and NULL->value are updates, NULL==NULL is same") {
    val r4 = d.filter(col("k") === 4).collect().head
    assert(r4.getAs[String]("change") === "update")
    assert(r4.getAs[String]("old_status") === null)
    assert(r4.getAs[String]("new_status") === "d")
    assert(d.filter(col("k") === 5).collect().head.getAs[String]("change") === "same")
  }

  test("old and new values travel on the diff row") {
    val r2 = d.filter(col("k") === 2).collect().head
    assert(r2.getAs[String]("old_status") === "b")
    assert(r2.getAs[String]("new_status") === "B")
    assert(r2.getAs[Double]("old_price") === 20.0)
  }

  test("applyChanges round trip reconstructs the new snapshot exactly") {
    val changes = d.filter(col("change") =!= "same")
    val rebuilt = SnapshotDiff.applyChanges(oldDf, changes, Seq("k"), Seq("status", "price"))
    assert(rebuilt.orderBy("k").collect().toSeq ===
      newDf.select("k", "status", "price").orderBy("k").collect().toSeq)
  }

  test("empty changeset leaves the snapshot untouched") {
    val none = d.filter(col("change") === "never")
    val rebuilt = SnapshotDiff.applyChanges(oldDf, none, Seq("k"), Seq("status", "price"))
    assert(rebuilt.orderBy("k").collect().toSeq ===
      oldDf.select("k", "status", "price").orderBy("k").collect().toSeq)
  }

  test("identical snapshots diff to all-same") {
    val same = SnapshotDiff.diff(oldDf, oldDf, Seq("k"), Seq("status", "price"))
    assert(same.filter(col("change") =!= "same").count() === 0)
  }
}
