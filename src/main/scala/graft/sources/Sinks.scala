package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

/** Sinks — S5/S6 in SURVEY.md §2.1 (reference README.md:95-103 forecast
  * persistence; README.md:140 "Backend logs all predictions").
  *
  * Scale conventions baked in:
  *  - output partitioned by prediction date → static AND dynamic
  *    partition pruning for every date-bounded read-back;
  *  - append-only writes (the reference's forecast table is
  *    insert-only);
  *  - audit rows are narrow (query name, ts, row count) so the audit
  *    sink never becomes the bottleneck.
  */
object Sinks {

  /** S5: persist forecasts, partitioned by prediction date. */
  def writeForecasts(df: DataFrame, path: String): Unit =
    df.withColumn("p_date", col("prediction_date"))
      .write.mode(SaveMode.Append)
      .partitionBy("p_date")
      .parquet(path)

  /** S6: append one narrow audit row per served query. The row count is
    * the CALLER's, from the result it already materialized to serve —
    * auditing must never re-execute the served query's DAG (an earlier
    * form took the DataFrame and called `.count()`, silently running the
    * whole query a second time per audit row). */
  def auditLog(spark: org.apache.spark.sql.SparkSession, queryName: String,
      nRows: Long, path: String): Unit = {
    import spark.implicits._
    Seq((queryName, java.time.Instant.now().toEpochMilli, nRows))
      .toDF("query_name", "served_at_ms", "n_rows")
      .coalesce(1)
      .write.mode(SaveMode.Append).parquet(path)
  }

  /** Bucketed table write: pre-shuffles ONCE at write time so every
    * subsequent equi-join/aggregation on `key` is co-located —
    * shuffle-free reads forever after (SURVEY.md §4 "Partitioning &
    * shuffle"; asserted plan-level in BucketedJoinSpec). The number of
    * buckets is the write-time parallelism contract: pick ~2× target
    * cluster cores at production scale. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table) // managed table under spark.sql.warehouse.dir

  /** S5 (streaming): forecast stream → partitioned parquet with
    * checkpointing — exactly-once file sink. */
  def streamForecasts(df: DataFrame, path: String, checkpoint: String): DataStreamWriter[Row] =
    df.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
}
