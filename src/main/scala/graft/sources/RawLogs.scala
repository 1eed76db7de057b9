package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Raw-log ingestion — S2 in SURVEY.md §2.1 (reference README.md:33
  * "optional object storage (raw logs)"): schema-on-read over text,
  * JSON-lines and CSV. Parsing stays in codegen'd expressions
  * (regexp_extract / from_json), never a UDF, so Catalyst can still
  * prune and push whatever predicates apply to parsed columns'
  * source files.
  */
object RawLogs {

  /** Classic syslog-ish line: `<ISO ts> <LEVEL> <site>: <message>`.
    * Unparseable lines survive with null fields (dead-letter style) —
    * at 100 TB you filter them into a quarantine sink, not drop them. */
  def parseTextLogs(spark: SparkSession, path: String): DataFrame = {
    val line = spark.read.text(path)
    val pat = "^(\\S+) (\\w+) (\\S+): (.*)$"
    line.select(
      regexp_extract(col("value"), pat, 1).cast("timestamp").as("ts"),
      nullif(regexp_extract(col("value"), pat, 2), lit("")).as("level"),
      nullif(regexp_extract(col("value"), pat, 3), lit("")).as("site"),
      nullif(regexp_extract(col("value"), pat, 4), lit("")).as("message"),
      col("value").as("raw"))
  }

  /** JSON-lines with a DECLARED schema — never schema inference in
    * production (a full pre-pass over 100 TB); corrupt records land in
    * `_corrupt_record` (PERMISSIVE mode). */
  def readJsonLogs(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** CSV with declared schema + header. */
  def readCsvLogs(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)
}
