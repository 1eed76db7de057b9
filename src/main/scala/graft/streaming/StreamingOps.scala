package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Structured Streaming surface — SURVEY.md §2.9 (reference README.md:24,
  * 26: Celery micro-batch pipeline over continuously arriving sensor/
  * alarm feeds; README.md:139-141: real-time alerting).
  *
  * Each op is a DataFrame→DataFrame transform usable on a streaming
  * input (MemoryStream in tests, Kafka/file source in production). The
  * event-time column is `ts`, keyed by `user_id` (stand-in for site).
  */
object StreamingOps {

  /** ST1: tolerate late arrivals up to `delay` before finalizing. */
  def withLateness(df: DataFrame, delay: String = "10 minutes"): DataFrame =
    df.withWatermark("ts", delay)

  /** ST2: tumbling per-window per-key aggregation. */
  def tumblingCounts(df: DataFrame, width: String = "1 hour"): DataFrame =
    withLateness(df)
      .groupBy(window(col("ts"), width), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("val_sum"))
      .select(col("window.start").as("bucket_start"), col("user_id"), col("n"), col("val_sum"))

  /** ST3: sliding-window rolling stats maintained continuously. */
  def slidingStats(df: DataFrame, width: String = "1 hour", slide: String = "15 minutes"): DataFrame =
    withLateness(df)
      .groupBy(window(col("ts"), width, slide), col("user_id"))
      .agg(avg(col("value")).as("val_avg"))
      .select(col("window.start").as("bucket_start"), col("user_id"), col("val_avg"))

  /** ST4: session windows — an alarm burst is one outage episode. */
  def sessions(df: DataFrame, gap: String = "30 minutes"): DataFrame =
    withLateness(df)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("user_id"), col("n"))

  /** ST5: exactly-once handling of redelivered events (Celery retries):
    * state for the dedup key is dropped once the watermark passes. */
  def dedupWithinWatermark(df: DataFrame, delay: String = "10 minutes"): DataFrame =
    df.withWatermark("ts", delay).dropDuplicatesWithinWatermark("event_id")

  /** ST8: enrich the stream with a static dimension (broadcast). */
  def enrichWithDim(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** Streaming corpus dedup (ST5 × the batch fingerprint dedup): drop
    * re-arriving documents whose TOKEN-SET fingerprint was already seen
    * within the watermark — catches reordered/repeated-word near-copies
    * that byte-exact event-id dedup misses, with the same bounded-state
    * guarantee (fingerprint state evicts once the watermark passes).
    * The fingerprint is operators.Dedup's md5 bag-of-words form, so a
    * doc admitted here is exactly one the batch pipeline would keep. */
  def dedupDocsWithinWatermark(
      docs: DataFrame, textCol: String, tsCol: String = "ts",
      delay: String = "10 minutes"): DataFrame =
    graft.operators.Dedup.withFingerprint(docs, textCol)
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Streaming contamination gate: flag arriving docs that share any
    * word n-gram with the static benchmark slice — the ingestion-time
    * form of TextAnalysis.contamination. The benchmark's hashed
    * shingles broadcast (stream-static left-semi, stateless); the only
    * state is the per-doc dedup within the watermark, so a doc is
    * flagged once no matter how many shingles collide. */
  def contaminationFlags(
      docs: DataFrame, bench: DataFrame, id: String, text: String,
      n: Int, tsCol: String = "ts", delay: String = "10 minutes"): DataFrame = {
    val bsh = bench
      .select(explode(graft.operators.Dedup.shingleHashSet(col(text), n)).as("_sh"))
      .distinct()
    docs
      .withWatermark(tsCol, delay)
      .select(col(id), col(tsCol),
        explode(graft.operators.Dedup.shingleHashSet(col(text), n)).as("_sh"))
      .join(broadcast(bsh), Seq("_sh"), "left_semi")
      .drop("_sh")
      .dropDuplicatesWithinWatermark(id)
  }

  /** Streaming FUZZY contamination gate: flag arriving docs that are
    * NEAR-DUPLICATES (exact Jaccard ≥ threshold) of any static benchmark
    * doc — the ingestion-time form of Dedup.minHashPairsBetween, for
    * paraphrased/lightly-edited benchmark leakage the exact-shingle gate
    * ([[contaminationFlags]]) can only see as one shared n-gram.
    *
    * Scale shape: the benchmark's banded minhash rows BROADCAST (the
    * benchmark side is small by definition); each arriving doc computes
    * its token set + signature once, explodes `bands` band rows, and
    * candidates come from the broadcast hash join on (band, bandhash) —
    * stateless, no stream-side shuffle. The skip-earlier-bands primitive
    * keeps one candidate row per (doc, bench) pair before the exact
    * verify, and the only state is the per-doc within-watermark dedup,
    * so a doc is flagged once no matter how many benchmark docs it
    * matches. Recall: identical docs always collide; near dups miss with
    * the (1−J^r)^b bound of the batch operator.
    */
  def fuzzyContaminationFlags(
      docs: DataFrame, bench: DataFrame, id: String, text: String,
      numHashes: Int = 64, bands: Int = 16, threshold: Double = 0.9,
      tsCol: String = "ts", delay: String = "10 minutes"): DataFrame = {
    import graft.operators.Dedup
    import graft.plans.{TextHashNative, VectorNative}
    def sigged(df: DataFrame, setName: String, bhsName: String): DataFrame =
      df.withColumn(setName, TextHashNative.tokenHashSet(col(text)))
        .withColumn("_sig", TextHashNative.minHashSig(col(setName), numHashes))
        .withColumn(bhsName, Dedup.bandHashesOfSig(col("_sig"), numHashes, bands))
        .drop("_sig")
    val bsh = sigged(bench, "_setb", "_bhsb")
      .select(col("_setb"), size(col("_setb")).as("_nb"), col("_bhsb"),
        posexplode(col("_bhsb")))
      .withColumnRenamed("pos", "_band").withColumnRenamed("col", "_bandhash")
    sigged(docs.withWatermark(tsCol, delay), "_seta", "_bhsa")
      .select(col(id), col(tsCol), col("_seta"), size(col("_seta")).as("_na"),
        col("_bhsa"), posexplode(col("_bhsa")))
      .withColumnRenamed("pos", "_band").withColumnRenamed("col", "_bandhash")
      .join(broadcast(bsh), Seq("_band", "_bandhash"))
      // same exact length prefilter + first-matching-band dedup as the
      // batch bipartite generator, then the exact two-pointer verify
      .filter(col("_na") >= col("_nb") * threshold - 1e-9 &&
        col("_nb") >= col("_na") * threshold - 1e-9)
      .filter(col("_band") ===
        VectorNative.firstEqualIndex(col("_bhsa"), col("_bhsb")))
      .withColumn("_i", VectorNative.sortedIntersectSize(col("_seta"), col("_setb")))
      .filter(col("_i").cast("double") /
        (col("_na") + col("_nb") - col("_i")) >= threshold)
      .select(col(id), col(tsCol))
      .dropDuplicatesWithinWatermark(id)
  }

  /** Streaming SEMANTIC decontamination gate: flag arriving docs whose
    * EMBEDDING lies within cosine ≥ threshold of any static benchmark
    * embedding — the ingestion-time form of
    * [[graft.operators.Similarity.nearDupPairsBetween]], for benchmark
    * leakage that survives paraphrase past both the exact-shingle and
    * fuzzy token gates.
    *
    * Scale shape: the benchmark is small by definition, so its
    * normalized vectors BROADCAST, hashed into
    * [[graft.operators.Similarity.blocksFor]] grid cells exactly like
    * the batch block grid; each arriving doc computes its norm once,
    * explodes one row per benchmark block, and candidates come from the
    * broadcast hash join on the block id — stateless, no stream-side
    * shuffle, no nested-loop join. Exact (no LSH): every (doc,
    * benchmark) pair is scored exactly once, so recall is 1.0 by
    * construction. The cosine test is the multiplication form
    * (dot ≥ ‖a‖·‖b‖·θ) — no division, no NaN path. The only state is
    * the per-doc within-watermark dedup, so a doc is flagged once no
    * matter how many benchmark vectors it matches. */
  def semanticContaminationFlags(
      docs: DataFrame, bench: DataFrame, id: String, vec: String,
      threshold: Double, tsCol: String = "ts", delay: String = "10 minutes",
      benchBlocks: Int = 0): DataFrame = {
    import graft.plans.VectorNative.dot
    val bB = if (benchBlocks > 0) benchBlocks
      else graft.operators.Similarity.blocksFor(bench.count())
    val vb = bench.select(col(vec).cast("array<double>").as("_bv"))
      .withColumn("_bn", sqrt(dot(col("_bv"), col("_bv"))))
      .withColumn("_blk", pmod(xxhash64(col("_bv")), lit(bB)).cast("int"))
    docs.withWatermark(tsCol, delay)
      .select(col(id), col(tsCol), col(vec).cast("array<double>").as("_av"))
      .withColumn("_an", sqrt(dot(col("_av"), col("_av"))))
      .withColumn("_blk", explode(sequence(lit(0), lit(bB - 1))))
      .join(broadcast(vb), Seq("_blk"))
      .filter(dot(col("_av"), col("_bv")) >= col("_an") * col("_bn") * threshold)
      .select(col(id), col(tsCol))
      .dropDuplicatesWithinWatermark(id)
  }

  /** Streaming seasonal-deviation gate: flag arriving readings that are
    * abnormal FOR THEIR CYCLE SLOT against a static profile built on
    * the batch side ([[graft.operators.Anomaly.seasonalProfile]]) — the
    * ingestion-time form of withSeasonalDeviation, completing the
    * contamination-gate pattern for the NOC KPI path. Stateless: the
    * keys×slots profile BROADCASTS into a stream-static LEFT join (no
    * stream-side shuffle, no state store), the flag expression is
    * shared verbatim with the batch operator, and every reading passes
    * through exactly once with its flag attached — including readings
    * from keys or slots the profile never saw (a new site mid-stream):
    * those flow through unflagged (s_z NULL, seasonal_anomaly false)
    * rather than being dropped by an inner join. */
  def seasonalDeviationFlags(
      stream: DataFrame, profile: DataFrame, keys: Seq[String],
      slot: org.apache.spark.sql.Column, value: String,
      minN: Int = 30, zThreshold: Double = 3.0): DataFrame =
    graft.operators.Anomaly.applySeasonal(
      stream.withColumn("slot", slot.cast("long")),
      profile, keys, value, minN, zThreshold)

  /** Streaming ingestion into a STORED minhash index: every micro-batch
    * of accepted docs folds into the [[graft.operators.Dedup.writeMinHashRelation]]
    * relation via the delta-only append path — the last piece of the
    * production ingest loop (gate the stream with the contamination
    * filters above, then index what survives, and the nightly batch
    * side reads the same relation).
    *
    * Idempotence: Spark's foreachBatch is AT-LEAST-once — after any
    * restart the last (batchId, rows) re-delivers, and a blind
    * re-append would duplicate member rows and break the index's
    * ≡-full-rebuild invariant. A one-column batch LEDGER
    * (`<path>/_batches`) records each applied batchId, making the
    * ROUTINE redelivery case a no-op. The residual window is a crash
    * BETWEEN the append jobs and the ledger write (or between the
    * sub-relation appends themselves): plain parquet directories have
    * no atomic multi-file commit, so that one-crash-wide window can
    * duplicate a batch — closing it needs a transactional table
    * format, which is exactly what such formats exist for. This is the
    * same guarantee level as rolling your own foreachBatch sink, made
    * explicit. Single-writer (one streaming query per index) — the
    * assumption every file-sink commit log makes.
    *
    * @return the function to pass to `stream.writeStream.foreachBatch`
    *         (exposed directly so batch tests and custom sinks can
    *         drive it without a streaming harness)
    */
  def indexAppendBatch(
      path: String, id: String, text: String,
      numHashes: Int = 64, bands: Int = 16, threshold: Double = 0.9):
      (DataFrame, Long) => Unit = { (batch, batchId) =>
    val spark = batch.sparkSession
    // directory-existence marker via LedgerFiles (staged + renamed):
    // the old flat mode("append") marker could tear mid-crash and
    // break every later ledger read
    val applied =
      graft.operators.LedgerFiles.batchApplied(spark, path, batchId)
    if (!applied && !batch.isEmpty) {
      // assumeNewDocs = false: the _batches marker only covers ROUTINE
      // redelivery; a crash between the verified/members commits and
      // the reps commit (or this marker) redelivers the batch, and only
      // the anti-joined crash-idempotent path converges it without
      // duplicating verified/members rows (r19 advisor fix)
      graft.operators.Dedup.appendToMinHashRelation(
        spark, path, batch, id, text, numHashes, bands, threshold,
        assumeNewDocs = false)
      graft.operators.LedgerFiles.markBatchApplied(spark, path, batchId)
    }
  }

  /** Ingestion-time fold for the semantic-dedup keeper index (N105 at
    * the N8/N39/N93 streaming tier): each micro-batch delta-appends to
    * the [[graft.operators.SemanticDedup]] rows ledger under the FROZEN
    * stored geometry (seed the index with
    * [[graft.operators.SemanticDedup.writeKeeperIndex]] first).
    * Exactly-once EFFECT comes from two independent layers: the
    * `_batches` ledger makes a redelivered micro-batch a fast-path
    * no-op, and the append itself is id-gated (freshness anti-join)
    * AND atomic (staging + one rename), so even a crash BETWEEN the
    * keeper append and the ledger write redelivers into a converged
    * no-op — the redelivery-convergence law the round-15 self-review
    * hardened, spec'd against a real foreachBatch stream in
    * StreamingSpec. Single-writer, like every file-ledger fold here.
    *
    * @return the function to pass to `stream.writeStream.foreachBatch` */
  def semanticIndexAppendBatch(
      path: String, id: String, vec: String,
      eps: Double = 0.4): (DataFrame, Long) => Unit = { (batch, batchId) =>
    val spark = batch.sparkSession
    // directory-existence marker via LedgerFiles (staged + renamed):
    // the old flat mode("append") marker could tear mid-crash and
    // break every later ledger read
    val applied =
      graft.operators.LedgerFiles.batchApplied(spark, path, batchId)
    if (!applied && !batch.isEmpty) {
      graft.operators.SemanticDedup.appendToKeeperIndex(
        spark, path, batch, id, vec, eps)
      graft.operators.LedgerFiles.markBatchApplied(spark, path, batchId)
    }
  }

  /** Ingestion-time fold for the PQ codes index (N109 at the N8/N39/
    * N93 streaming tier): each micro-batch encodes under the FROZEN
    * stored codebooks and delta-appends to the codes ledger (seed with
    * [[graft.operators.ProductQuantization.writePqIndex]] first). The
    * `_batches` ledger is the fast-path redelivery skip; the append
    * itself is id-gated AND atomic (staging + one rename) underneath —
    * the same two-layer exactly-once-effect contract as
    * [[semanticIndexAppendBatch]]. Serving
    * ([[graft.operators.ProductQuantization.adcTopKFrom]]) answers
    * identically however the codes arrived (the q_sim_pq_index
    * append ≡ rebuild law); the streamed form is spec-verified against
    * a real foreachBatch run in StreamingSpec.
    *
    * @return the function to pass to `stream.writeStream.foreachBatch` */
  def pqIndexAppendBatch(
      path: String, id: String, vec: String): (DataFrame, Long) => Unit = {
    (batch, batchId) =>
      val spark = batch.sparkSession
      // directory-existence marker via LedgerFiles (staged + renamed):
      // the old flat mode("append") marker could tear mid-crash and
      // break every later ledger read
      val applied =
        graft.operators.LedgerFiles.batchApplied(spark, path, batchId)
      if (!applied && !batch.isEmpty) {
        graft.operators.ProductQuantization.appendToPqIndex(
          spark, path, batch, id, vec)
        graft.operators.LedgerFiles.markBatchApplied(spark, path, batchId)
      }
  }

  /** Streaming sketch fold for the histogram quantile sketch (N54):
    * each micro-batch writes ITS OWN bin counts (additive — the sketch
    * merges at read time via [[readHistogram]], so append never
    * rewrites existing files), and the `_batches` ledger makes a
    * redelivered micro-batch a no-op — the same exactly-once-effect
    * contract as the minhash index fold above. A long-running ingest
    * keeps whole-corpus quantiles current with O(bins) work per batch
    * and zero historical rescans.
    *
    * Idempotence (stronger than the minhash fold's): the bin counts
    * are ADDITIVE, so a double-apply silently corrupts frequencies
    * rather than just duplicating rows. Each batch therefore writes
    * its increments into a batch-keyed partition directory
    * (`bins/batch_id=<id>`) in OVERWRITE mode — a crash between the
    * counter write and the ledger append makes the retry overwrite
    * the same directory instead of appending a second copy, closing
    * the non-atomic two-write window; the `_batches` ledger remains
    * the fast-path skip for routine redelivery. */
  /** Fail fast when `dir` holds the pre-r10 FLAT layout (parquet files
    * directly under it): mixing flat files with `batch_id=` partition
    * directories breaks Spark's partition discovery for every reader,
    * so a legacy relation must be migrated (one compactCountMin/
    * compactHistogram into a fresh directory — the compacted form IS
    * the new layout) before new batches land in it. */
  private def requireBatchDirLayout(
      spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    // resolve through the Hadoop FileSystem, NOT java.io.File: sketch
    // relations live on hdfs:// or s3a:// in production, and a local-File
    // probe silently never fires there — exactly the deployments where a
    // flat/partitioned mix breaks partition discovery for every reader
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val isDir = try fs.getFileStatus(p).isDirectory
      catch { case _: java.io.FileNotFoundException => false }
    if (isDir) {
      val flat = fs.listStatus(p)
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      require(flat.isEmpty,
        s"$dir holds a legacy flat sketch layout; compact it into a fresh " +
          "versioned directory (compactCountMin/compactHistogram) before appending")
    }
  }

  def histogramAppendBatch(
      path: String, value: String,
      lo: Double, hi: Double, bins: Int,
      keys: Seq[String] = Nil): (DataFrame, Long) => Unit = { (batch, batchId) =>
    val spark = batch.sparkSession
    // directory-existence marker via LedgerFiles (staged + renamed):
    // the old flat mode("append") marker could tear mid-crash and
    // break every later ledger read
    val applied =
      graft.operators.LedgerFiles.batchApplied(spark, path, batchId)
    if (!applied && !batch.isEmpty) {
      requireBatchDirLayout(spark, s"$path/bins")
      graft.operators.HistogramSketch
        .build(batch, col(value), lo, hi, bins, keys)
        .write.mode("overwrite").parquet(s"$path/bins/batch_id=$batchId")
      graft.operators.LedgerFiles.markBatchApplied(spark, path, batchId)
    }
  }

  /** Merged view of a [[histogramAppendBatch]] relation — feed straight
    * into HistogramSketch.quantiles. */
  def readHistogram(
      spark: org.apache.spark.sql.SparkSession, path: String,
      keys: Seq[String] = Nil): DataFrame =
    graft.operators.HistogramSketch.merge(spark.read.parquet(s"$path/bins"), keys)

  /** Streaming sketch fold for the Count–Min frequency sketch (N60) —
    * the same additive append-at-write / merge-at-read / `_batches`
    * ledger contract as [[histogramAppendBatch]]: each micro-batch
    * writes its own (depth, bucket, cnt) increments (≤ d·w rows per
    * batch), a redelivered micro-batch is a no-op, and whole-corpus
    * point-frequency estimates stay current with no historical
    * rescan. Counter increments land in a batch-keyed partition
    * directory in OVERWRITE mode (see [[histogramAppendBatch]]) so a
    * crash between the counter write and the ledger append cannot
    * double-count on retry. */
  def countMinAppendBatch(
      path: String, key: String, depth: Int, width: Int):
      (DataFrame, Long) => Unit = { (batch, batchId) =>
    val spark = batch.sparkSession
    // directory-existence marker via LedgerFiles (staged + renamed):
    // the old flat mode("append") marker could tear mid-crash and
    // break every later ledger read
    val applied =
      graft.operators.LedgerFiles.batchApplied(spark, path, batchId)
    if (!applied && !batch.isEmpty) {
      requireBatchDirLayout(spark, s"$path/counters")
      graft.operators.CountMin
        .build(batch, col(key), depth, width)
        .write.mode("overwrite").parquet(s"$path/counters/batch_id=$batchId")
      graft.operators.LedgerFiles.markBatchApplied(spark, path, batchId)
    }
  }

  /** Merged view of a [[countMinAppendBatch]] relation — feed straight
    * into CountMin.estimate. */
  def readCountMin(
      spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    graft.operators.CountMin.merge(spark.read.parquet(s"$path/counters"))

  /** Streaming fold for INCREMENTAL substring dedup (the N86 family's
    * ledger path): each micro-batch appends its exact L-token-window
    * gram counts (SubstringDedup.gramCounts — additive, so the merged
    * read-out is the whole-history count table), under the same
    * `_batches` redelivery ledger + batch-keyed overwrite contract as
    * the histogram/CMS folds. A new crawl batch then marks its
    * duplicated spans against everything ever ingested
    * (SubstringDedup.spansAgainstCounts) with NO rescan of history —
    * and with state = all batches the result provably equals the batch
    * computation restricted to the new docs (q_st_substring_ledger
    * hash-certifies exactly that identity). */
  def gramCountAppendBatch(
      path: String, id: String, text: String, minTokens: Int):
      (DataFrame, Long) => Unit = { (batch, batchId) =>
    val spark = batch.sparkSession
    // directory-existence marker via LedgerFiles (staged + renamed):
    // the old flat mode("append") marker could tear mid-crash and
    // break every later ledger read
    val applied =
      graft.operators.LedgerFiles.batchApplied(spark, path, batchId)
    if (!applied && !batch.isEmpty) {
      requireBatchDirLayout(spark, s"$path/grams")
      graft.operators.SubstringDedup
        .gramCounts(batch, col(id),
          graft.operators.TextAnalysis.wsTokens(col(text)), minTokens)
        .write.mode("overwrite").parquet(s"$path/grams/batch_id=$batchId")
      graft.operators.LedgerFiles.markBatchApplied(spark, path, batchId)
    }
  }

  /** Merged whole-history gram counts of a [[gramCountAppendBatch]]
    * relation — feed straight into SubstringDedup.spansAgainstCounts. */
  def readGramCounts(
      spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/grams")
      .groupBy("gram").agg(sum(col("cnt")).as("cnt"))

  /** Streaming ingestion-time form of the CURATION PIPELINE (the N90
    * batch chain, re-shaped for foreachBatch): the stateless stages —
    * host blocklist, Gopher repetition filter, PII redaction — apply
    * per micro-batch as pure projections/filters, and each batch's
    * SURVIVORS land in a stored relation (`docs/batch_id=<id>`,
    * OVERWRITE, under the `_batches` redelivery ledger — the
    * histogram/CMS fold contract). The one STATEFUL stage, the
    * per-host quota, becomes a ledger-backed RUNNING top-k: survivors
    * store their static md5-of-id priority, and [[readCuration]]
    * applies the skew-safe exact top-k over everything ingested so
    * far — because priorities never change, the kept set after any
    * number of batches equals the batch pipeline over the union of
    * those batches, regardless of arrival order or redelivery
    * (spec-pinned; q_st_curation_ledger hash-certifies the full
    * append/redeliver/compact/read loop against the batch replay).
    *
    * `blockedHosts` is host-cardinality (a blocklist), so it ships in
    * the closure and compiles to an InSet filter — no join, no state. */
  def curationAppendBatch(
      path: String, id: String, text: String, host: String,
      blockedHosts: Seq[String]): (DataFrame, Long) => Unit = { (batch, batchId) =>
    val spark = batch.sparkSession
    // directory-existence marker via LedgerFiles (staged + renamed):
    // the old flat mode("append") marker could tear mid-crash and
    // break every later ledger read
    val applied =
      graft.operators.LedgerFiles.batchApplied(spark, path, batchId)
    if (!applied && !batch.isEmpty) {
      requireBatchDirLayout(spark, s"$path/docs")
      val unblocked =
        if (blockedHosts.isEmpty) batch
        else batch.filter(!col(host).isin(blockedHosts: _*))
      val kept = unblocked.join(
        graft.operators.GopherRepetition.report(unblocked, id, text)
          .filter(col("gopher_keep") === 1).select(id), id)
      kept
        .select(col(host).as("host"), col(id),
          md5(col(id).cast("string")).as("priority"),
          graft.operators.PiiRedact.redact(col(text)).as("red_text"))
        .write.mode("overwrite").parquet(s"$path/docs/batch_id=$batchId")
      graft.operators.LedgerFiles.markBatchApplied(spark, path, batchId)
    }
  }

  /** Quota view of a [[curationAppendBatch]] relation: the per-host
    * top-`quota` survivors by stored priority (adds `keep_rank`) —
    * exactly [[graft.operators.WebCuration.domainQuota]]'s selection
    * over the whole ingested history. */
  def readCuration(
      spark: org.apache.spark.sql.SparkSession, path: String,
      id: String, quota: Int): DataFrame =
    graft.operators.WebCuration.topKPerGroup(
      spark.read.parquet(s"$path/docs"),
      col("host"), col("priority"), col(id), quota)

  /** Compact a [[curationAppendBatch]] relation into a fresh versioned
    * directory, PRUNED to the current per-host top-`quota`. Pruning is
    * safe under the running-top-k contract: priorities are static and
    * new rows can only push existing ranks DOWN, so a row outside
    * today's top-quota can never re-enter it — the compacted relation
    * answers every future [[readCuration]] identically while holding
    * ≤ quota·hosts rows. The ledger carries over (redelivered
    * pre-compaction batches stay no-ops). */
  /** Carry a compacted relation's applied-batch markers to `dest`, so
    * a redelivered pre-compaction batch id stays a no-op against the
    * compacted relation (markers are b<k> directories since r18; a
    * legacy flat-marker relation fails loudly in appliedBatchIds
    * instead of silently dropping every marker — r19 advisor fix). */
  private def carryLedger(
      spark: org.apache.spark.sql.SparkSession,
      path: String, dest: String): Unit =
    graft.operators.LedgerFiles.appliedBatchIds(spark, path).foreach { id =>
      graft.operators.LedgerFiles.markBatchApplied(spark, dest, id)
    }

  def compactCuration(
      spark: org.apache.spark.sql.SparkSession, path: String, dest: String,
      id: String, quota: Int): Unit = {
    require(path != dest, "compaction writes a NEW versioned directory")
    // drop the partition-inferred batch_id before writing INTO a
    // batch_id= directory — leaving it in the data files makes every
    // later read warn COLUMN_ALREADY_EXISTS (partition column vs data
    // column collision)
    readCuration(spark, path, id, quota).drop("keep_rank", "batch_id")
      .coalesce(1).write.mode("overwrite").parquet(s"$dest/docs/batch_id=0")
    carryLedger(spark, path, dest)
  }

  /** Compact an appended sketch relation into a fresh versioned
    * directory (the Dedup.compactMinHashRelation convention: never
    * overwrite the live relation) — after many appended micro-batches
    * the per-batch directories tax scan PLANNING (file/partition
    * listing), not data volume; compaction collapses them to the
    * merged sketch in one directory and CARRIES THE LEDGER OVER, so a
    * redelivered pre-compaction batch id is still a no-op against the
    * compacted relation. */
  def compactCountMin(
      spark: org.apache.spark.sql.SparkSession, path: String, dest: String): Unit = {
    require(path != dest, "compaction writes a NEW versioned directory")
    readCountMin(spark, path).drop("batch_id").coalesce(1)
      .write.mode("overwrite").parquet(s"$dest/counters/batch_id=0")
    carryLedger(spark, path, dest)
  }

  /** [[compactCountMin]] for a [[histogramAppendBatch]] relation. */
  def compactHistogram(
      spark: org.apache.spark.sql.SparkSession, path: String, dest: String,
      keys: Seq[String] = Nil): Unit = {
    require(path != dest, "compaction writes a NEW versioned directory")
    readHistogram(spark, path, keys).drop("batch_id").coalesce(1)
      .write.mode("overwrite").parquet(s"$dest/bins/batch_id=0")
    carryLedger(spark, path, dest)
  }

  // ---- ST6 ledgered: threshold alerting under the hash gate (r18) -----

  private val WhatAlert = "threshold alert ledger"

  /** Seed a threshold-alert ledger: persist the THRESHOLD with the
    * relation (a later fold at a different threshold would silently
    * mix state machines — the minhash-meta fail-fast discipline) and
    * publish the manifest. */
  def writeAlertLedger(
      spark: org.apache.spark.sql.SparkSession, path: String,
      threshold: Double): Unit = {
    import graft.operators.LedgerFiles
    val (fs, root) = LedgerFiles.fsOf(spark, path)
    fs.delete(new org.apache.hadoop.fs.Path(root, LedgerFiles.ManifestName), false)
    Seq("meta", "state", "buf", "wm", "final").foreach(t =>
      fs.delete(new org.apache.hadoop.fs.Path(root, t), true))
    spark.range(1).select(lit(threshold).as("threshold"))
      .write.mode("overwrite").parquet(s"$path/meta/b0")
    LedgerFiles.publishManifest(fs, root, WhatAlert)
  }

  /** Ingestion-time fold for ST6 threshold alerting — N70's ledger
    * discipline applied to the breach/recover state machine (the LAST
    * spec-only state-store row moved under the oracle): the state is
    * one boolean per key (in breach after the last FINALIZED reading),
    * transitions are order-sensitive, so a reading alerts exactly
    * once, when no earlier reading can still arrive — the watermark
    * (max ts − latenessMs) finalizes buffered readings in (ts, id)
    * order, emits BREACH on upward and RECOVER on downward crossings
    * append-exactly-once, and buffers the rest. Batch-id-keyed atomic
    * renames with `final` LAST as the batch-complete marker; prior
    * state reads the last COMPLETE batch — redelivered and
    * half-crashed batches recompute identical rows and converge
    * ([[graft.operators.Anomaly.cusumLedgerBatch]]'s contract).
    * A finalized reading's predecessor is also finalized (earlier
    * event time), so fold-then-finalize ≡ the one-shot LAG-crossing
    * computation restricted to ts < final watermark — which is
    * exactly what the DuckDB oracle replays. */
  def alertLedgerBatch(
      path: String, keys: Seq[String], tsCol: String, idCol: String,
      value: String, latenessMs: Long): (DataFrame, Long) => Unit = {
    (batch, batchId) =>
      import graft.operators.LedgerFiles
      val spark = batch.sparkSession
      val (fs, root) = LedgerFiles.fsOf(spark, path)
      LedgerFiles.requireManifest(fs, root, path, WhatAlert)
      val done =
        fs.exists(new org.apache.hadoop.fs.Path(root, s"final/b$batchId"))
      if (!done && !batch.isEmpty) {
        val threshold =
          spark.read.parquet(s"$path/meta/b0").head.getDouble(0)
        val kcols = keys.map(col)
        val prior = (LedgerFiles.batchDirs(fs, root, "final")
          .map(p => new org.apache.hadoop.fs.Path(p).getName.drop(1).toLong)
          .filter(_ < batchId)) match {
          case Seq() => None
          case ids => Some(ids.max)
        }
        val incoming = batch.select(
          kcols ++ Seq(col(idCol).cast("long").as("_eid"),
            col(tsCol).cast("long").as("_ts"),
            col(value).cast("double").as("_x")): _*)
        val (buf0, state0, wm0) = prior match {
          case Some(j) => (
            spark.read.parquet(s"$path/buf/b$j"),
            spark.read.parquet(s"$path/state/b$j"),
            spark.read.parquet(s"$path/wm/b$j").head.getLong(0))
          case None => (
            incoming.limit(0),
            incoming.select(kcols: _*).limit(0)
              .withColumn("_br", lit(null).cast("boolean")),
            Long.MinValue)
        }
        val maxTs = incoming.agg(max(col("_ts"))).head.getLong(0)
        val wm = math.max(wm0, maxTs - latenessMs)
        val all = graft.core.CacheGovernor.persistTracked(
          buf0.unionByName(incoming))
        val wRun = org.apache.spark.sql.expressions.Window.partitionBy(kcols: _*)
          .orderBy(col("_ts"), col("_eid"))
        val scored = graft.core.CacheGovernor.persistTracked(all
          .filter(col("_ts") < wm)
          .join(state0, keys, "left")
          .withColumn("_now", col("_x") >= lit(threshold))
          .withColumn("_prev", coalesce(
            lag(col("_now"), 1).over(wRun), col("_br"), lit(false))))
        val alerts = scored
          .filter(col("_now") =!= col("_prev"))
          .select(kcols ++ Seq(col("_eid"), col("_ts"), col("_x"),
            when(col("_now"), lit("BREACH")).otherwise(lit("RECOVER"))
              .as("kind")): _*)
        val wLast = org.apache.spark.sql.expressions.Window.partitionBy(kcols: _*)
          .orderBy(col("_ts").desc, col("_eid").desc)
        val folded = scored
          .withColumn("_rn", row_number().over(wLast))
          .filter(col("_rn") === 1)
          .select(kcols :+ col("_now").as("_br"): _*)
        val carried = state0.join(folded.select(kcols: _*), keys, "left_anti")
          .unionByName(folded)
        import spark.implicits._
        LedgerFiles.atomicAppendAt(spark, path, "buf",
          all.filter(col("_ts") >= wm), batchId)
        LedgerFiles.atomicAppendAt(spark, path, "state", carried, batchId)
        LedgerFiles.atomicAppendAt(spark, path, "wm",
          Seq(wm).toDF("wm"), batchId)
        LedgerFiles.atomicAppendAt(spark, path, "final", alerts, batchId)
      }
  }

  /** Every finalized breach/recover alert the monitor ever emitted. */
  def alertLedgerAlerts(
      spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    import graft.operators.LedgerFiles
    val (fs, root) = LedgerFiles.fsOf(spark, path)
    LedgerFiles.requireManifest(fs, root, path, WhatAlert)
    spark.read.option("recursiveFileLookup", "true").parquet(s"$path/final")
  }

  // ---- ST6: stateful threshold alerting -------------------------------

  final case class Reading(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class Alert(user_id: Long, ts: java.sql.Timestamp, kind: String, value: Double)
  final case class BreachState(inBreach: Boolean)

  /** Per-key state machine (reference README.md:141 "Alerts for …
    * threshold breaches"): emit BREACH on upward crossing, RECOVER on
    * downward crossing; state is one boolean per key. Late events within
    * the watermark re-enter their key group ordered by micro-batch, which
    * matches the at-least-once alerting contract. */
  /** ST6 on the Spark 4 `transformWithState` API: same breach/recover
    * semantics as [[thresholdAlerts]], state as a typed ValueState in
    * the RocksDB state store (required by this API — the session must
    * set the RocksDBStateStoreProvider). New code should prefer this
    * form: TTL, timers and multiple typed state variables come for
    * free; [[thresholdAlerts]] remains for pre-4.x-style deployments. */
  class BreachProcessor(threshold: Double)
      extends StatefulProcessor[Long, Reading, Alert] {
    @transient protected var inBreach: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      inBreach = getHandle.getValueState[Boolean](
        "inBreach", Encoders.scalaBoolean, TTLConfig.NONE)

    /** The breach/recover fold over one batch's event-time-sorted rows —
      * shared verbatim with [[EvictingBreachProcessor]] so the two can
      * never diverge semantically. */
    protected final def foldAlerts(rs: Seq[Reading]): Seq[Alert] = {
      var breached = inBreach.exists() && inBreach.get()
      val alerts = rs.flatMap { r =>
        val now = r.value >= threshold
        val out =
          if (now && !breached) Some(Alert(r.user_id, r.ts, "BREACH", r.value))
          else if (!now && breached) Some(Alert(r.user_id, r.ts, "RECOVER", r.value))
          else None
        breached = now
        out
      }
      inBreach.update(breached)
      alerts
    }

    override def handleInputRows(
        key: Long, rows: Iterator[Reading], tv: TimerValues): Iterator[Alert] =
      foldAlerts(rows.toSeq.sortBy(_.ts.getTime)).iterator
  }

  def thresholdAlertsTWS(
      readings: Dataset[Reading],
      threshold: Double): Dataset[Alert] = {
    import readings.sparkSession.implicits._
    readings
      .groupByKey(_.user_id)
      .transformWithState(new BreachProcessor(threshold),
        TimeMode.None(), OutputMode.Append())
  }

  /** [[BreachProcessor]] + EVENT-TIME STATE EVICTION: each batch slides
    * a per-key timer to `lastEventTime + ttlMs`; when the watermark
    * passes it, [[handleExpiredTimer]] drops the key's state. Without
    * this, a site that goes silent (decommissioned, renamed) holds its
    * boolean forever — at 100 TB × months of sites, unbounded state is
    * an operational leak. A key that reappears after eviction starts
    * fresh (a high reading re-alerts BREACH even if it was in breach
    * when evicted — the at-least-once alerting contract). */
  class EvictingBreachProcessor(threshold: Double, ttlMs: Long)
      extends BreachProcessor(threshold) {

    override def handleInputRows(
        key: Long, rows: Iterator[Reading], tv: TimerValues): Iterator[Alert] = {
      val rs = rows.toSeq.sortBy(_.ts.getTime)
      val alerts = foldAlerts(rs)
      // slide the eviction timer FORWARD only: a batch of late-but-valid
      // rows (older than the key's previous max event time) must not pull
      // the timer back and evict earlier than last-seen + TTL
      val existing = getHandle.listTimers().toList
      val target = math.max(rs.map(_.ts.getTime).max + ttlMs,
        if (existing.isEmpty) Long.MinValue else existing.max)
      existing.filter(_ != target).foreach(getHandle.deleteTimer)
      if (!existing.contains(target)) getHandle.registerTimer(target)
      alerts.iterator
    }

    override def handleExpiredTimer(
        key: Long, tv: TimerValues,
        expired: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[Alert] = {
      inBreach.clear()
      Iterator.empty
    }
  }

  /** ST6 with bounded state: requires a watermark (event-time timers
    * fire as it advances). `lateness` is the watermark delay; `ttlMs`
    * the silent-key state lifetime in event time. */
  def thresholdAlertsEvicting(
      readings: Dataset[Reading],
      threshold: Double,
      lateness: String = "10 minutes",
      ttlMs: Long = 3600000L): Dataset[Alert] = {
    import readings.sparkSession.implicits._
    readings
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .transformWithState(new EvictingBreachProcessor(threshold, ttlMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  def thresholdAlerts(
      readings: Dataset[Reading],
      threshold: Double): Dataset[Alert] = {
    import readings.sparkSession.implicits._
    readings
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[BreachState, Alert](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[Reading], state: GroupState[BreachState]) =>
          var s = state.getOption.getOrElse(BreachState(inBreach = false))
          val alerts = rows.toSeq.sortBy(_.ts.getTime).flatMap { r =>
            val breach = r.value >= threshold
            val out =
              if (breach && !s.inBreach) Some(Alert(r.user_id, r.ts, "BREACH", r.value))
              else if (!breach && s.inBreach) Some(Alert(r.user_id, r.ts, "RECOVER", r.value))
              else None
            s = BreachState(breach)
            out
          }
          state.update(s)
          alerts.iterator
      }
  }

  final case class Alarm(site_id: Long, ts: java.sql.Timestamp, dur_ms: Long)
  final case class Win(s: Long, e: Long, n: Long)
  final case class OutageWindow(site_id: Long, w_start_ms: Long, w_end_ms: Long, n_merged: Long)

  /** Coalesce overlapping-or-touching windows — the streaming twin of
    * operators.Intervals.mergeIntervals' islands rule, as a pure fold
    * so both sides can never diverge on merge semantics. */
  private[graft] def mergeWins(ws: Seq[Win]): Seq[Win] =
    ws.sortBy(w => (w.s, w.e)).foldLeft(Vector.empty[Win]) { (acc, w) =>
      acc.lastOption match {
        case Some(last) if w.s <= last.e =>
          acc.init :+ Win(last.s, math.max(last.e, w.e), last.n + w.n)
        case _ => acc :+ w
      }
    }

  /** Streaming outage-window tracker (the ingestion-time form of N45):
    * each alarm opens [ts, ts + dur_ms]; per-site state holds the
    * coalesced still-open windows, and a window is emitted exactly when
    * the watermark passes its end — at that point no alarm that could
    * still extend it (start ≤ end < watermark) can arrive, so every
    * emission is FINAL (append-mode clean). Late-but-valid alarms
    * within the watermark merge into open state like any other.
    *
    * State is O(open windows per site) — alarms collapse into islands
    * as they arrive, never accumulate; the event-time timer sits at the
    * earliest open end, so silent sites close out as the watermark
    * advances and hold no state afterwards. */
  class OutageWindowProcessor extends StatefulProcessor[Long, Alarm, OutageWindow] {
    @transient private var wins: ValueState[Seq[Win]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      wins = getHandle.getValueState[Seq[Win]]("wins",
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Win]](),
        TTLConfig.NONE)

    private def emitAndRetain(key: Long, merged: Seq[Win], wm: Long): Iterator[OutageWindow] = {
      val (closed, open) = merged.partition(_.e < wm)
      if (open.isEmpty) wins.clear() else wins.update(open)
      // slide the single timer to the earliest open end (timers fire
      // when the watermark passes, finalizing that window next batch)
      val existing = getHandle.listTimers().toList
      existing.foreach(getHandle.deleteTimer)
      open.map(_.e).minOption.foreach(getHandle.registerTimer)
      closed.sortBy(_.s).map(w => OutageWindow(key, w.s, w.e, w.n)).iterator
    }

    override def handleInputRows(
        key: Long, rows: Iterator[Alarm], tv: TimerValues): Iterator[OutageWindow] = {
      val incoming = rows.map(a => Win(a.ts.getTime, a.ts.getTime + a.dur_ms, 1L)).toSeq
      val prior = if (wins.exists()) wins.get() else Seq.empty[Win]
      emitAndRetain(key, mergeWins(prior ++ incoming), tv.getCurrentWatermarkInMs())
    }

    override def handleExpiredTimer(
        key: Long, tv: TimerValues,
        expired: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[OutageWindow] = {
      val prior = if (wins.exists()) wins.get() else Seq.empty[Win]
      emitAndRetain(key, prior, tv.getCurrentWatermarkInMs())
    }
  }

  /** Streaming outage windows: coalesced per-site downtime spans,
    * emitted once final. Requires the RocksDB state store (the
    * transformWithState API's backing requirement). */
  def outageWindows(
      alarms: Dataset[Alarm], lateness: String = "10 minutes"): Dataset[OutageWindow] = {
    import alarms.sparkSession.implicits._
    alarms
      .withWatermark("ts", lateness)
      .groupByKey(_.site_id)
      .transformWithState(new OutageWindowProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** One finalized CUSUM point: the statistic AFTER folding the reading
    * at ts_ms, plus its threshold flag. */
  final case class CusumPoint(
      key: Long, ts_ms: Long, value: Double, cusum: Double, alert: Boolean)

  private[graft] final case class CusumState(s: Double, buf: Seq[(Long, Double)])

  /** Streaming CUSUM change-point detector — the ingestion-time form of
    * operators.Anomaly.withCusum. CUSUM is ORDER-SENSITIVE (each
    * statistic folds the previous one), so unlike the stateless gates
    * a reading can only be scored once no earlier reading can still
    * arrive: readings buffer in state until the watermark passes their
    * event time, then fold IN EVENT-TIME ORDER into the running
    * statistic and emit exactly once (append-mode final, the N53
    * discipline). μ is the known in-control target — the textbook
    * streaming-CUSUM setup, where the target comes from historical
    * batch profiling, not from the unknowable future mean.
    *
    * State per key: ONE double (the running statistic — CUSUM's whole
    * memory of the unbounded past) plus the in-flight buffer, bounded
    * by readings inside the watermark delay. The event-time timer sits
    * at the earliest buffered ts, so quiet keys finalize their tail
    * without new input. Ties at one timestamp fold in (ts, value)
    * order on both sides of the parity spec. */
  class CusumProcessor(mu: Double, slack: Double, threshold: Double)
      extends StatefulProcessor[Long, Reading, CusumPoint] {
    @transient private var st: ValueState[CusumState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[CusumState]("cusum",
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[CusumState](),
        TTLConfig.NONE)

    private def drain(key: Long, state: CusumState, wm: Long): Iterator[CusumPoint] = {
      val (ready, pending) = state.buf.sorted.partition(_._1 < wm)
      var s = state.s
      val out = ready.map { case (t, v) =>
        s = math.max(0.0, s + v - mu - slack)
        CusumPoint(key, t, v, s, s > threshold)
      }
      st.update(CusumState(s, pending))
      getHandle.listTimers().toList.foreach(getHandle.deleteTimer)
      pending.map(_._1).minOption.foreach(getHandle.registerTimer)
      out.iterator
    }

    override def handleInputRows(
        key: Long, rows: Iterator[Reading], tv: TimerValues): Iterator[CusumPoint] = {
      val prior = if (st.exists()) st.get() else CusumState(0.0, Seq.empty)
      val buf = prior.buf ++ rows.map(r => (r.ts.getTime, r.value))
      drain(key, CusumState(prior.s, buf), tv.getCurrentWatermarkInMs())
    }

    override def handleExpiredTimer(
        key: Long, tv: TimerValues,
        expired: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[CusumPoint] = {
      val prior = if (st.exists()) st.get() else CusumState(0.0, Seq.empty)
      drain(key, prior, tv.getCurrentWatermarkInMs())
    }
  }

  /** Streaming per-key CUSUM against a known target; requires the
    * RocksDB state store like every transformWithState operator. */
  def cusumAlerts(
      readings: Dataset[Reading], mu: Double, slack: Double, threshold: Double,
      lateness: String = "10 minutes"): Dataset[CusumPoint] = {
    import readings.sparkSession.implicits._
    readings
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .transformWithState(new CusumProcessor(mu, slack, threshold),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
