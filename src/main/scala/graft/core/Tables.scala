package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness tables (TESTDATA.md / FIXTURES.md).
  *
  * Stand-ins for the reference's stores (reference README.md:23,33 —
  * PostgreSQL tables + object-storage raw logs): parquet scans here, a
  * JDBC/Kafka source in production shape. All loads are plain
  * `spark.read.parquet` so Catalyst keeps predicate pushdown, column
  * pruning and partition pruning (SURVEY.md §4).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Dimension tables small enough to always broadcast (≤ a few MB even at
    * 100 TB fact scale — region/nation are fixed-cardinality). */
  val broadcastDims: Set[String] = Set("region", "nation", "supplier")

  /** Memoized relation per (session, path): repeated loads of one
    * immutable harness table reuse the SAME resolved plan — one file
    * listing + footer schema read per table per session instead of one
    * per query BUILD (measured ~0.05-0.1 s of driver time on every
    * registry closure; × 180 queries × 3 bench reps that was ~20 s of
    * pure re-listing). Exactly what a catalog table gives in
    * production. Only the static harness tables go through here —
    * mutable artifacts (ledgers, sinks, index dirs) keep their direct
    * spark.read calls so appends are always visible. */
  private val memo =
    scala.collection.concurrent.TrieMap.empty[(Int, String), DataFrame]

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    memo.getOrElseUpdate(
      (System.identityHashCode(spark), s"$dir/$name.parquet"),
      spark.read.parquet(s"$dir/$name.parquet"))

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.ts has shipped in two physical shapes across testdata
    * generations; normalize both to session-TZ TIMESTAMP so every
    * downstream query (unix_millis, window ranges, as-of) sees one type:
    *   - parquet TIMESTAMP(NANOS): with
    *     spark.sql.legacy.parquet.nanosAsLong=true it arrives as LongType
    *     nanos → integer division to µs (ns values are µs-aligned, and
    *     double division would lose precision above 2^53);
    *   - parquet timestamp[us] without timezone → TIMESTAMP_NTZ → cast to
    *     TIMESTAMP. The session TZ is pinned UTC (GraftSession), so the
    *     cast is instant-preserving and matches DuckDB's naive reading. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view (for spark.sql entry points).
    * `events` goes through its normalizing loader so SQL entry points see
    * the same TIMESTAMP type the DataFrame API does. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach { n =>
      val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
