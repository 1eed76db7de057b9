package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable unit of engine surface: a Spark-first implementation and
  * (when SQL-expressible) an equivalent ANSI SQL oracle the driver runs in
  * DuckDB over the same parquet tables.
  *
  * Conventions for hash-parity (SURVEY.md §7.4.6):
  *  - every output column aliased identically on both sides;
  *  - deterministic ORDER BY on a unique key;
  *  - no raw timestamps in outputs (epoch millis / DATE instead);
  *  - float aggregates via exact decimal sums (core.OracleCompat).
  */
final case class QuerySpec(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object QuerySpec {
  def apply(name: String, oracle: String)(build: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, build, Some(oracle))

  def noOracle(name: String)(build: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, build, None)
}
