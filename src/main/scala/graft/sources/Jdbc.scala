package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** S1 in its production shape: a JDBC relational source/sink (the
  * reference persists to PostgreSQL — README.md:23; the harness tables
  * are parquet stand-ins, core.Tables documents that mapping).
  *
  * Scale conventions:
  *  - [[readPartitioned]] is the fact-table path: `numPartitions`
  *    concurrent cursors, each range-bounded on `partitionColumn`, so
  *    the scan parallelism is declared up front instead of funneling
  *    the table through one connection. Spark's JDBCRelation is a
  *    PrunedFilteredScan — Catalyst pushes filters and the column list
  *    into each cursor's generated SQL, so a probability-thresholded,
  *    two-column read ships only those columns/rows over the wire.
  *  - [[read]] is the dimension path: one cursor, meant for tables that
  *    will be broadcast anyway.
  *  - Tested against embedded Derby (the JDBC engine available in this
  *    environment — JdbcSpec); the URL/driver are caller-supplied, so
  *    PostgreSQL is the same call with a different URL.
  */
object Jdbc {

  /** Single-cursor read — small dimension tables. */
  def read(
      spark: SparkSession, url: String, table: String,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .options(options)
      .load()

  /** Range-partitioned parallel read — fact tables. One JDBC cursor per
    * partition, each with `partitionColumn BETWEEN lo AND hi` appended
    * by Spark; filters and projection still push into every cursor. */
  def readPartitioned(
      spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .options(options)
      .load()

  /** Append/overwrite a frame into a JDBC table (forecast persistence —
    * reference README.md:95-103 writes `outage_forecasts`). */
  def write(
      df: DataFrame, url: String, table: String,
      mode: SaveMode = SaveMode.Append,
      options: Map[String, String] = Map.empty): Unit =
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .options(options)
      .mode(mode)
      .save()
}
