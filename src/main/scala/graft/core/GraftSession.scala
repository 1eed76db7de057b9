package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the graft engine.
  *
  * Settings chosen for oracle parity and scale (SURVEY.md §4):
  *   - UTC session timezone: DuckDB treats parquet timestamps as naive; so
  *     must we, or every date function diverges.
  *   - AQE on (default in 4.x, made explicit): runtime re-planning,
  *     skew-join splitting, dynamic coalescing of shuffle partitions — the
  *     features we rely on at 100 TB instead of hand-tuned partition counts.
  *   - shuffle.partitions defaults to the core count locally; on a real
  *     cluster AQE coalescing makes the initial number mostly irrelevant.
  */
object GraftSession {

  /** The engine's common configuration, applied identically by every
    * entry point (tests, Verify, Bench) so a function registered via
    * extensions or a conf-dependent plan never behaves differently
    * between the test session and the driver-contract mains. */
  def configure(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // runtime bloom-filter semi-join reduction, pinned ON explicitly:
      // for fact↔fact joins (J2 shape) at 100 TB the filtered build
      // side's keys prune the probe side's shuffle BEFORE the exchange —
      // the single biggest shuffle-bytes lever on selective fact joins.
      // Injection respects the size thresholds (application side ≥
      // ~10 GB), so local-SF plans are unchanged; BloomFilterSpec
      // lowers the thresholds to prove the engine wires it correctly.
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // AQE coalescing floor (r20, guide §2.2/§2.5): with the default
      // minPartitionSize=1m, every shuffle under ~2 MB coalesces to ONE
      // task, serializing CPU-heavy downstream stages (measured: the
      // q_w8 window chain ran 1-task/3.3 CPU-s, q_w4 likewise — wall ≈
      // cpu on a 32-core host). parallelismFirst (default on) already
      // targets max(bytes/defaultParallelism, this floor), so lowering
      // the floor is scale-adaptive, not a local[32] tune: large
      // shuffles still size by bytes/parallelism (up to the 64 MB
      // advisory), only small-bytes/high-CPU stages fan back out to the
      // core count. Value chosen by a measured sweep (r20): 64k fanned
      // EVERY tiny shuffle to 32 tasks and multiplied per-task constants
      // across the registry (q_text_tfidf 1.0 → 5.7 CPU-s, q_u4 1.0 →
      // 6.0); 1m serialized the window chains (q_w8 2.7 s). 256k keeps
      // the CPU-heavy stages parallel at near-baseline total CPU.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      // events.parquet carries TIMESTAMP(NANOS); Spark has no ns type, so
      // read as long and convert in Tables.events (µs-aligned data → lossless)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // managed tables (bucketed writes) land outside the repo; override
      // in production
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-warehouse")

  def local(cores: Int = 32, extraConf: Map[String, String] = Map.empty): SparkSession = {
    val b = configure(
      SparkSession.builder().master(s"local[$cores]").appName("graft"), cores)
    extraConf.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
