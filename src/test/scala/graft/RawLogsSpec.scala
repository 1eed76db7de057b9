package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.RawLogs

class RawLogsSpec extends AnyFunSuite {
  import TestSession.spark

  test("text logs: pattern lines parse, garbage survives with null fields") {
    val dir = Files.createTempDirectory("graft_rawlogs")
    Files.writeString(Paths.get(s"$dir/app.log"),
      """2024-01-01T10:00:00 ERROR BGH-29: voltage drop detected
        |2024-01-01T10:05:00 INFO BGH-29: recovered
        |this line is garbage
        |""".stripMargin)
    val parsed = RawLogs.parseTextLogs(spark, dir.toString)
    assert(parsed.count() === 3)
    val err = parsed.filter(col("level") === "ERROR").collect()
    assert(err.length === 1 && err.head.getAs[String]("site") === "BGH-29")
    assert(err.head.getAs[String]("message") === "voltage drop detected")
    // garbage line: null fields but raw preserved (quarantine-able)
    assert(parsed.filter(col("level").isNull).count() === 1)
  }

  test("json-lines with declared schema; corrupt record captured not dropped") {
    val dir = Files.createTempDirectory("graft_jsonlogs")
    Files.writeString(Paths.get(s"$dir/a.jsonl"),
      """{"site": "S1", "v": 1.5}
        |{"site": "S2", "v": 2.5}
        |{not json at all
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("site", StringType), StructField("v", DoubleType)))
    // Spark disallows querying only _corrupt_record straight off raw
    // files — cache the parsed result first (documented limitation)
    val df = RawLogs.readJsonLogs(spark, dir.toString, schema).cache()
    assert(df.filter(col("_corrupt_record").isNull).count() === 2)
    assert(df.filter(col("_corrupt_record").isNotNull).count() === 1)
    assert(df.filter(col("site") === "S2").collect().head.getAs[Double]("v") === 2.5)
  }

  test("csv with declared schema and header") {
    val dir = Files.createTempDirectory("graft_csvlogs")
    Files.writeString(Paths.get(s"$dir/a.csv"),
      "site,v\nS1,1.5\nS2,2.5\n")
    val schema = StructType(Seq(
      StructField("site", StringType), StructField("v", DoubleType)))
    val df = RawLogs.readCsvLogs(spark, dir.toString, schema)
    assert(df.count() === 2)
    assert(df.agg(sum(col("v"))).collect().head.getDouble(0) === 4.0)
  }
}
