package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` are assembled from per-module QuerySpec lists;
  * each spec pairs a Spark-first implementation with the ANSI SQL the
  * driver replays in DuckDB over the same parquet tables.
  */
object SparkEntry {

  /** All registered query specs, by module. */
  def specs: Seq[QuerySpec] =
    RelationalQueries.all ++ TimeSeriesQueries.all ++
      TextVectorQueries.all ++ VocabQueries.all ++ SimilarityQueries.all ++
      RecallReportQueries.all ++
      SemanticDedupQueries.all ++ MultimodalQueries.all ++ DomainQueries.all ++
      AdvancedQueries.all ++ SamplingQueries.all ++ WebQueries.all ++
      GopherQueries.all ++ PiiQueries.all ++ HtmlQueries.all ++
      ProbeQueries.all ++ EncodingQueries.all ++
      CurationPipelineQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * EP1, the reference's canonical interaction (README.md:68-79):
    * "top-3 predicted outages for <date> in <zone>, with root cause,
    * resolution and FME plan" — pushed predicates → broadcast dim joins
    * → TakeOrderedAndProject. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_ep1_chat_top_outages")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    specs.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    specs.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Bench-only sub-timing surfaces (NOT part of the correctness
    * registry — the aggregate query stays the certified unit): Bench
    * prices each solo and emits them under "subqueries" in bench.json,
    * so a regression in an aggregate row (the recall report runs
    * eleven ANN methods in one row) is attributable per method. Keys
    * are "<query>.<part>". */
  def benchSubqueries: Map[String, (SparkSession, String) => DataFrame] =
    RecallReportQueries.benchMethods.map { case (m, fn) =>
      s"q_sim_recall_report.$m" -> fn
    }.toMap
}
