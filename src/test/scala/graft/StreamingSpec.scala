package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.{Alert, Reading}

/** ST1-ST8 driven through MemoryStream with manual event-time
  * advancement (SURVEY.md §5.2.5). */
class StreamingSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
      mode: String = "append"): Unit = {
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable(); q.stop()
  }

  test("ST1+ST2: watermark finalizes tumbling buckets; late row within watermark counted") {
    val in = MemoryStream[(Long, Timestamp, Double, Long)](spark)
    val df = in.toDF().toDF("event_id", "ts", "value", "user_id")
    val agg = StreamingOps.tumblingCounts(df, "1 hour")
    val q = agg.writeStream.format("memory").queryName("st2").outputMode("append").start()
    in.addData((1L, ts("2024-01-01 10:05:00"), 1.0, 7L),
      (2L, ts("2024-01-01 10:50:00"), 2.0, 7L))
    q.processAllAvailable()
    // late-but-within-watermark event for the 10:00 bucket, then advance
    // event time far enough (11:00 bucket end + 10 min) to close 10:00
    in.addData((3L, ts("2024-01-01 10:59:00"), 4.0, 7L))
    in.addData((4L, ts("2024-01-01 12:30:00"), 8.0, 7L))
    q.processAllAvailable()
    // ST7 drop semantics: watermark is now 12:20; an hours-late event
    // for the closed 10:00 bucket must be DROPPED, not re-emitted
    in.addData((5L, ts("2024-01-01 10:01:00"), 100.0, 7L))
    in.addData((6L, ts("2024-01-01 14:00:00"), 1.0, 7L))
    q.processAllAvailable(); q.stop()
    val out = spark.table("st2").collect()
    val b10 = out.filter(_.getAs[Timestamp]("bucket_start") == ts("2024-01-01 10:00:00"))
    assert(b10.length === 1, "closed bucket must not re-emit for too-late data")
    assert(b10.head.getAs[Long]("n") === 3)
    assert(b10.head.getAs[Double]("val_sum") === 7.0)
  }

  test("ST4: streaming session window merges a burst and splits on quiet gap") {
    val in = MemoryStream[(Long, Timestamp, Double, Long)](spark)
    val df = in.toDF().toDF("event_id", "ts", "value", "user_id")
    val q = StreamingOps.sessions(df, "30 minutes")
      .writeStream.format("memory").queryName("st4").outputMode("append").start()
    in.addData(
      (1L, ts("2024-01-01 10:00:00"), 1.0, 5L),
      (2L, ts("2024-01-01 10:10:00"), 1.0, 5L), // same burst
      (3L, ts("2024-01-01 12:00:00"), 1.0, 5L)) // new burst
    in.addData((4L, ts("2024-01-01 15:00:00"), 1.0, 5L)) // advance watermark
    q.processAllAvailable(); q.stop()
    val sessions = spark.table("st4").filter(col("n") > 0).collect()
    val first = sessions.find(_.getAs[Timestamp]("session_start") == ts("2024-01-01 10:00:00"))
    assert(first.exists(_.getAs[Long]("n") === 2))
    assert(sessions.exists(_.getAs[Timestamp]("session_start") == ts("2024-01-01 12:00:00")))
  }

  test("ST4: an out-of-order bridge event MERGES two provisional sessions; " +
      "finalized sessions drop too-late data") {
    val in = MemoryStream[(Long, Timestamp, Double, Long)](spark)
    val df = in.toDF().toDF("event_id", "ts", "value", "user_id")
    val q = StreamingOps.sessions(df, "30 minutes")
      .writeStream.format("memory").queryName("st4_merge").outputMode("append").start()
    // 35 min apart: provisionally TWO sessions ([10:00,10:30) and
    // [10:35,11:05) at gap 30); the 10-min lateness keeps the watermark
    // at 10:25 — BELOW the first session's end, so neither finalizes yet
    in.addData(
      (1L, ts("2024-01-01 10:00:00"), 1.0, 5L),
      (2L, ts("2024-01-01 10:35:00"), 1.0, 5L))
    q.processAllAvailable()
    // the bridge arrives out of order (10:28 ≥ watermark 10:25): its
    // window [10:28,10:58) overlaps BOTH open sessions — the
    // state-store three-way merge the native session_window operator
    // exists for
    in.addData((3L, ts("2024-01-01 10:28:00"), 1.0, 5L))
    // advance the watermark past session end + gap to finalize (append
    // mode emits only closed sessions)
    in.addData((4L, ts("2024-01-01 15:00:00"), 1.0, 5L))
    q.processAllAvailable()
    val closed = spark.table("st4_merge")
      .filter(col("session_start") < ts("2024-01-01 12:00:00")).collect()
    assert(closed.length === 1, s"bridge must merge to ONE session, got ${closed.toSeq}")
    assert(closed.head.getAs[Long]("n") === 3)
    assert(closed.head.getAs[Timestamp]("session_start") === ts("2024-01-01 10:00:00"))
    // end = last event + gap
    assert(closed.head.getAs[Timestamp]("session_end") === ts("2024-01-01 11:05:00"))
    // an hours-late event inside the CLOSED session: dropped — no
    // re-emit, no new fragment session
    in.addData((5L, ts("2024-01-01 10:05:00"), 1.0, 5L))
    in.addData((6L, ts("2024-01-01 18:00:00"), 1.0, 5L))
    q.processAllAvailable(); q.stop()
    val after = spark.table("st4_merge")
      .filter(col("session_start") < ts("2024-01-01 12:00:00")).collect()
    assert(after.length === 1 && after.head.getAs[Long]("n") === 3,
      "closed session must not re-emit or fragment on too-late data")
  }

  test("ST5: duplicate event_id within watermark is dropped exactly once") {
    val in = MemoryStream[(Long, Timestamp, Double, Long)](spark)
    val df = in.toDF().toDF("event_id", "ts", "value", "user_id")
    val q = StreamingOps.dedupWithinWatermark(df)
      .writeStream.format("memory").queryName("st5").outputMode("append").start()
    in.addData((1L, ts("2024-01-01 10:00:00"), 1.0, 5L))
    q.processAllAvailable()
    in.addData((1L, ts("2024-01-01 10:00:00"), 1.0, 5L), // redelivery
      (2L, ts("2024-01-01 10:01:00"), 2.0, 5L))
    q.processAllAvailable(); q.stop()
    assert(spark.table("st5").count() === 2)
  }

  test("ST6: breach/recover state machine emits one alert per crossing") {
    val in = MemoryStream[Reading](spark)
    val q = StreamingOps.thresholdAlerts(in.toDS(), threshold = 50.0)
      .writeStream.format("memory").queryName("st6").outputMode("append").start()
    in.addData(
      Reading(1L, ts("2024-01-01 10:00:00"), 10.0),
      Reading(1L, ts("2024-01-01 10:01:00"), 60.0), // BREACH
      Reading(1L, ts("2024-01-01 10:02:00"), 70.0)) // still in breach: no alert
    q.processAllAvailable()
    in.addData(Reading(1L, ts("2024-01-01 10:03:00"), 20.0)) // RECOVER (state persists across batches)
    q.processAllAvailable(); q.stop()
    val alerts = spark.table("st6").as[Alert].collect().sortBy(_.ts.getTime)
    assert(alerts.map(_.kind).toSeq === Seq("BREACH", "RECOVER"))
  }

  test("ST6 via transformWithState: same alerts on the new stateful API") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[Reading](spark)
      val q = StreamingOps.thresholdAlertsTWS(in.toDS(), threshold = 50.0)
        .writeStream.format("memory").queryName("st6tws").outputMode("append").start()
      in.addData(
        Reading(2L, ts("2024-01-01 10:00:00"), 10.0),
        Reading(2L, ts("2024-01-01 10:01:00"), 60.0))
      q.processAllAvailable()
      in.addData(Reading(2L, ts("2024-01-01 10:03:00"), 20.0))
      q.processAllAvailable(); q.stop()
      val alerts = spark.table("st6tws").as[Alert].collect().sortBy(_.ts.getTime)
      assert(alerts.map(_.kind).toSeq === Seq("BREACH", "RECOVER"))
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("ST6 eviction: silent key's state drops past watermark+TTL; reappearance starts fresh") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[Reading](spark)
      // TTL 30 min of event time, watermark delay 10 min
      val q = StreamingOps.thresholdAlertsEvicting(in.toDS(), threshold = 50.0,
        lateness = "10 minutes", ttlMs = 30L * 60 * 1000)
        .writeStream.format("memory").queryName("st6evict").outputMode("append").start()
      // key 3 breaches, then goes silent; key 4 keeps the stream alive
      in.addData(Reading(3L, ts("2024-01-01 10:00:00"), 60.0),
        Reading(4L, ts("2024-01-01 10:00:00"), 1.0))
      q.processAllAvailable()
      // advance event time so the watermark (12:00-10min=11:50) passes
      // key 3's timer (10:00+30min=10:30)...
      in.addData(Reading(4L, ts("2024-01-01 12:00:00"), 1.0))
      q.processAllAvailable()
      // ...and one more batch under the advanced watermark so the timer fires
      in.addData(Reading(4L, ts("2024-01-01 12:05:00"), 1.0))
      q.processAllAvailable()
      // key 3 reappears still above threshold: evicted state means a FRESH
      // BREACH (un-evicted state would say "already in breach" → no alert)
      in.addData(Reading(3L, ts("2024-01-01 12:30:00"), 70.0))
      q.processAllAvailable(); q.stop()
      val alerts = spark.table("st6evict").as[Alert].collect()
        .filter(_.user_id == 3L).sortBy(_.ts.getTime)
      assert(alerts.map(_.kind).toSeq === Seq("BREACH", "BREACH"),
        s"expected re-BREACH after eviction, got ${alerts.toSeq}")
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming corpus dedup: re-arriving token-set duplicate is dropped") {
    val in = MemoryStream[(Long, Timestamp, String)](spark)
    val df = in.toDF().toDF("doc_id", "ts", "text")
    val q = StreamingOps.dedupDocsWithinWatermark(df, "text")
      .writeStream.format("memory").queryName("stdocs").outputMode("append").start()
    in.addData((1L, ts("2024-01-01 10:00:00"), "alpha beta gamma"))
    q.processAllAvailable()
    in.addData(
      (2L, ts("2024-01-01 10:01:00"), "beta gamma alpha alpha"), // same token SET
      (3L, ts("2024-01-01 10:02:00"), "entirely new content"))
    q.processAllAvailable(); q.stop()
    val kept = spark.table("stdocs").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 3L), s"reordered/repeated-word duplicate must drop: $kept")
  }

  test("streaming contamination gate: benchmark-overlapping doc flagged exactly once") {
    val in = MemoryStream[(Long, Timestamp, String)](spark)
    val df = in.toDF().toDF("doc_id", "ts", "text")
    val bench = Seq((100L, "one two three four five six")).toDF("doc_id", "text")
    val q = StreamingOps.contaminationFlags(df, bench, "doc_id", "text", n = 5)
      .writeStream.format("memory").queryName("stcontam").outputMode("append").start()
    in.addData(
      // shares the 5-gram "two three four five six" -> flagged, once,
      // despite two colliding shingles
      (1L, ts("2024-01-01 10:00:00"), "zero one two three four five six"),
      // no shared 5-gram -> clean
      (2L, ts("2024-01-01 10:00:30"), "seven eight nine ten eleven twelve"))
    q.processAllAvailable(); q.stop()
    val flagged = spark.table("stcontam").select("doc_id").collect().map(_.getLong(0))
    assert(flagged.toSeq === Seq(1L), s"expected exactly one flag for doc 1: ${flagged.toSeq}")
  }

  test("streaming fuzzy contamination gate: near-duplicate of a benchmark doc flagged once") {
    val in = MemoryStream[(Long, Timestamp, String)](spark)
    val df = in.toDF().toDF("doc_id", "ts", "text")
    // 10-token benchmark doc; J ≥ 0.9 needs ≥ 10/11 overlap ratio
    val bench = Seq((100L, "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10")).toDF("doc_id", "text")
    val q = StreamingOps.fuzzyContaminationFlags(
      df, bench, "doc_id", "text", threshold = 0.9)
      .writeStream.format("memory").queryName("stfuzzy").outputMode("append").start()
    in.addData(
      // identical token set, reordered + repeated word → J = 1, flagged
      (1L, ts("2024-01-01 10:00:00"), "a10 a9 a8 a7 a6 a5 a4 a3 a2 a1 a1"),
      // 9 of 10 tokens + 1 new → J = 9/11 < 0.9, clean
      (2L, ts("2024-01-01 10:00:30"), "a1 a2 a3 a4 a5 a6 a7 a8 a9 zz"),
      // no overlap at all → clean
      (3L, ts("2024-01-01 10:01:00"), "entirely different words here"))
    q.processAllAvailable()
    // redelivery of doc 1 within the watermark → no second flag
    in.addData((1L, ts("2024-01-01 10:02:00"), "a10 a9 a8 a7 a6 a5 a4 a3 a2 a1 a1"))
    q.processAllAvailable(); q.stop()
    val flagged = spark.table("stfuzzy").select("doc_id").collect().map(_.getLong(0))
    assert(flagged.toSeq === Seq(1L),
      s"expected exactly one flag for the near-duplicate doc: ${flagged.toSeq}")
  }

  test("streaming semantic gate: embedding near a benchmark vector flagged once") {
    val in = MemoryStream[(Long, Timestamp, Seq[Double])](spark)
    val df = in.toDF().toDF("doc_id", "ts", "emb")
    // two benchmark vectors in R^4 — forces the block grid + broadcast
    // join to route every (doc, bench) pair exactly once
    val bench = Seq(
      (100L, Seq(1.0, 0.0, 0.0, 0.0)),
      (101L, Seq(0.0, 1.0, 0.0, 0.0))).toDF("vec_id", "emb")
    val q = StreamingOps.semanticContaminationFlags(
      df, bench, "doc_id", "emb", threshold = 0.95)
      .writeStream.format("memory").queryName("stsem").outputMode("append").start()
    in.addData(
      // scaled copy of bench 100 → cos exactly 1, flagged once (and
      // only once, though it meets every benchmark block)
      (1L, ts("2024-01-01 10:00:00"), Seq(7.0, 0.0, 0.0, 0.0)),
      // close to bench 101 (cos ≈ 0.995 ≥ 0.95) → flagged
      (2L, ts("2024-01-01 10:00:30"), Seq(0.1, 1.0, 0.0, 0.0)),
      // equidistant from both (cos ≈ 0.707 < 0.95) → clean
      (3L, ts("2024-01-01 10:01:00"), Seq(1.0, 1.0, 0.0, 0.0)))
    q.processAllAvailable()
    // out-of-order redelivery of doc 1 within the watermark → no re-flag
    in.addData((1L, ts("2024-01-01 10:00:10"), Seq(7.0, 0.0, 0.0, 0.0)))
    q.processAllAvailable(); q.stop()
    val flagged = spark.table("stsem").select("doc_id").collect().map(_.getLong(0))
    assert(flagged.sorted.toSeq === Seq(1L, 2L),
      s"expected docs 1 and 2 flagged exactly once: ${flagged.toSeq}")
  }

  test("streaming index append: micro-batches fold into the stored minhash index, redelivery is a no-op") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-stream-index").toString
    try {
      val docs = graft.core.Tables.documents(spark, TestSession.sfDir)
      // seed the index with the first half of the corpus (batch side)
      graft.operators.Dedup.writeMinHashRelation(
        docs.filter(col("doc_id") < 250), "doc_id", "text", path)
      val appendFn = StreamingOps.indexAppendBatch(path, "doc_id", "text")
      // stream the second half in two micro-batches via foreachBatch
      val in = MemoryStream[(Long, Timestamp, String)](spark)
      val df = in.toDF().toDF("doc_id", "ts", "text")
      val half2 = docs.filter(col("doc_id") >= 250)
        .select("doc_id", "text").collect()
      val parts = half2.splitAt(half2.length / 2)
      val b1 = parts._1
      val b2 = parts._2
      val q = df.select("doc_id", "text").writeStream
        .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) => appendFn(b.toDF(), id))
        .start()
      in.addData(b1.map(r => (r.getLong(0), ts("2024-01-01 10:00:00"), r.getString(1))).toSeq)
      q.processAllAvailable()
      in.addData(b2.map(r => (r.getLong(0), ts("2024-01-01 10:01:00"), r.getString(1))).toSeq)
      q.processAllAvailable(); q.stop()
      // the streamed index answers exactly like a full batch rebuild
      import spark.implicits._
      val pathFull = java.nio.file.Files
        .createTempDirectory("graft-stream-index-full").toString
      try {
        graft.operators.Dedup.writeMinHashRelation(docs, "doc_id", "text", pathFull)
        def pairsOf(p: String) = graft.operators.Dedup.minHashPairsFrom(spark, p)
          .select("a_id", "b_id").as[(Long, Long)].collect().toSet
        val streamed = pairsOf(path)
        assert(streamed.nonEmpty)
        assert(streamed === pairsOf(pathFull))
        // at-least-once redelivery: re-applying an already-ledgered
        // batch must not touch the index
        val membersBefore = spark.read.option("recursiveFileLookup", "true").parquet(s"$path/members").count()
        appendFn(docs.filter(col("doc_id") >= 250).select("doc_id", "text"), 1L)
        assert(spark.read.option("recursiveFileLookup", "true").parquet(s"$path/members").count() === membersBefore,
          "redelivered batchId must be a no-op")
      } finally {
        new scala.reflect.io.Directory(new java.io.File(pathFull)).deleteRecursively()
      }
    } finally {
      new scala.reflect.io.Directory(new java.io.File(path)).deleteRecursively()
    }
  }

  test("streaming semantic keeper fold: streamed verdicts match the plant; redelivery no-op at BOTH layers") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-semidx").toString
    try {
      def vec(xs: Double*) = xs.toSeq
      val base = Seq(
        (0L, vec(1.0, 0.0, 0.0, 0.0)),
        (1L, vec(0.0, 1.0, 0.0, 0.0)),
        (2L, vec(0.0, 0.0, 1.0, 0.0))).toDF("doc_id", "embedding")
      graft.operators.SemanticDedup.writeKeeperIndex(
        base, "doc_id", "embedding", dir, nCells = 1, iters = 1, eps = 0.95)
      val fold = StreamingOps.semanticIndexAppendBatch(
        dir, "doc_id", "embedding", eps = 0.95)
      val in = MemoryStream[(Long, Seq[Double])](spark)
      val df = in.toDF().toDF("doc_id", "embedding")
      val q = df.writeStream
        .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          id: Long) => fold(b.toDF(), id))
        .start()
      // batch 0: a copy of stored keeper 0 (drops) + a novel direction (keeps)
      in.addData((10L, vec(1.0, 0.0, 0.0, 0.0)), (11L, vec(0.6, -0.8, 0.0, 0.0)))
      q.processAllAvailable()
      // batch 1: a copy of batch 0's keeper — shadowed by the ledgered history
      in.addData((12L, vec(0.6, -0.8, 0.0, 0.0)))
      q.processAllAvailable(); q.stop()
      val kept = graft.operators.SemanticDedup.keepers(spark, dir)
        .select("doc_id").as[Long].collect().toSet
      assert(kept == Set(0L, 1L, 2L, 11L),
        s"streamed verdicts must match the plant, got $kept")
      assert(graft.operators.SemanticDedup.ledger(spark, dir).count() == 6)
      // layer 1 — the _batches fast path: an already-ledgered batch id
      // is skipped wholesale, even with an unseen doc inside
      fold(Seq((99L, vec(0.0, 0.6, -0.8, 0.0))).toDF("doc_id", "embedding"), 0L)
      assert(graft.operators.SemanticDedup.ledger(spark, dir).count() == 6,
        "redelivered batch id must be a fast-path no-op")
      // layer 2 — the id-gated freshness anti-join: a NEW batch id
      // carrying only already-ledgered docs appends nothing
      fold(Seq((12L, vec(0.6, -0.8, 0.0, 0.0))).toDF("doc_id", "embedding"), 99L)
      assert(graft.operators.SemanticDedup.ledger(spark, dir).count() == 6,
        "already-ledgered docs under a fresh batch id must be a no-op")
    } finally {
      new scala.reflect.io.Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("streaming PQ codes fold: streamed codes equal the batch rebuild; redelivery no-op at BOTH layers") {
    import spark.implicits._
    val dirS = java.nio.file.Files.createTempDirectory("graft-stream-pq").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft-stream-pqb").toString
    try {
      def vec(xs: Double*) = xs.toSeq
      // 6 base vectors in R^4 (kSub=4 seeds need >= 4 rows), m=2 subspaces
      val base = Seq(
        (0L, vec(1.0, 0.1, 0.0, 0.0)), (1L, vec(0.0, 1.0, 0.2, 0.0)),
        (2L, vec(0.0, 0.1, 1.0, 0.0)), (3L, vec(0.3, 0.0, 0.0, 1.0)),
        (4L, vec(0.7, 0.7, 0.0, 0.1)), (5L, vec(0.0, 0.6, 0.8, 0.0))
      ).toDF("doc_id", "embedding")
      val b1 = Seq((10L, vec(0.9, 0.2, 0.1, 0.0)), (11L, vec(0.1, 0.9, 0.1, 0.3)))
      val b2 = Seq((12L, vec(0.2, 0.1, 0.9, 0.4)))
      graft.operators.ProductQuantization.writePqIndex(
        base, "doc_id", "embedding", dirS, m = 2, kSub = 4, iters = 2)
      val fold = StreamingOps.pqIndexAppendBatch(dirS, "doc_id", "embedding")
      val in = MemoryStream[(Long, Seq[Double])](spark)
      val df = in.toDF().toDF("doc_id", "embedding")
      val q = df.writeStream
        .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          id: Long) => fold(b.toDF(), id))
        .start()
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable(); q.stop()
      // batch rebuild on the SAME seed + one append of everything new
      graft.operators.ProductQuantization.writePqIndex(
        base, "doc_id", "embedding", dirB, m = 2, kSub = 4, iters = 2)
      graft.operators.ProductQuantization.appendToPqIndex(
        spark, dirB, (b1 ++ b2).toDF("doc_id", "embedding"), "doc_id", "embedding")
      def codes(p: String) = graft.operators.ProductQuantization.pqCodes(spark, p)
        .as[(Long, Int, Long)].collect().toSet
      assert(codes(dirS) == codes(dirB),
        "streamed codes must equal the batch rebuild under the frozen codebooks")
      val n = codes(dirS).size
      // layer 1 — _batches fast path: an already-ledgered batch id skips
      // wholesale, even with an unseen doc inside
      fold(Seq((99L, vec(0.5, 0.5, 0.5, 0.5))).toDF("doc_id", "embedding"), 0L)
      assert(codes(dirS).size == n)
      // layer 2 — id-gated freshness: a NEW batch id with ledgered docs
      fold(b2.toDF("doc_id", "embedding"), 99L)
      assert(codes(dirS).size == n)
    } finally {
      new scala.reflect.io.Directory(new java.io.File(dirS)).deleteRecursively()
      new scala.reflect.io.Directory(new java.io.File(dirB)).deleteRecursively()
    }
  }

  test("streaming curation fold: streamed quota view equals the batch pipeline; redelivery no-op; compaction identity") {
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft-stream-curation").toString
    val dest = java.nio.file.Files
      .createTempDirectory("graft-stream-curation-v2").toString + "/v2"
    try {
      val docs = graft.core.Tables.documents(spark, TestSession.sfDir)
        .withColumn("host", concat(col("source"), lit(".example.com")))
        .select("doc_id", "text", "host")
      val blocked = Seq("src0.example.com", "src7.example.com")
      val quota = 4
      val fold = StreamingOps.curationAppendBatch(
        path, "doc_id", "text", "host", blocked)
      // three arrival-order-scrambled micro-batches driven through a
      // real foreachBatch stream
      val in = MemoryStream[(Long, String, String)](spark)
      val q = in.toDF().toDF("doc_id", "text", "host").writeStream
        .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) => fold(b.toDF(), id))
        .start()
      val rows = docs.as[(Long, String, String)].collect()
      Seq(2, 0, 1).foreach { i =>
        in.addData(rows.filter(_._1 % 3 == i).toSeq)
        q.processAllAvailable()
      }
      q.stop()
      // batch replay of the same stages over the whole corpus
      val unblocked = docs.filter(!col("host").isin(blocked: _*))
      val keep = graft.operators.GopherRepetition
        .report(unblocked, "doc_id", "text")
        .filter(col("gopher_keep") === 1).select("doc_id")
      val batchKept = graft.operators.WebCuration
        .domainQuota(unblocked.join(keep, "doc_id"), col("host"),
          col("doc_id"), quota)
        .select("host", "doc_id", "keep_rank")
        .as[(String, Long, Int)].collect().toSet
      def streamedSet(p: String) =
        StreamingOps.readCuration(spark, p, "doc_id", quota)
          .select("host", "doc_id", "keep_rank")
          .as[(String, Long, Int)].collect().toSet
      assert(batchKept.nonEmpty && streamedSet(path) === batchKept)
      // redelivery of an applied batch id is a no-op
      val before = spark.read.parquet(s"$path/docs").count()
      fold(docs.limit(10), 1L)
      assert(spark.read.parquet(s"$path/docs").count() === before)
      // compaction prunes to <= quota rows per host and answers the
      // same quota view
      StreamingOps.compactCuration(spark, path, dest, "doc_id", quota)
      assert(streamedSet(dest) === batchKept)
      val perHost = spark.read.parquet(s"$dest/docs")
        .groupBy("host").count().as[(String, Long)].collect()
      assert(perHost.forall(_._2 <= quota))
      // the stored text is the REDACTED text (the PII stage ran)
      assert(spark.read.parquet(s"$dest/docs").columns.contains("red_text"))
    } finally {
      new scala.reflect.io.Directory(new java.io.File(path)).deleteRecursively()
      new scala.reflect.io.Directory(
        new java.io.File(dest).getParentFile).deleteRecursively()
    }
  }

  test("ST8: stream-static broadcast enrichment") {
    val in = MemoryStream[(Long, Timestamp, Double, Long)](spark)
    val df = in.toDF().toDF("event_id", "ts", "value", "user_id")
    val dim = Seq((5L, "north"), (6L, "south")).toDF("user_id", "zone")
    val q = StreamingOps.enrichWithDim(df, dim, "user_id")
      .writeStream.format("memory").queryName("st8").outputMode("append").start()
    in.addData((1L, ts("2024-01-01 10:00:00"), 1.0, 5L),
      (2L, ts("2024-01-01 10:00:00"), 1.0, 9L))
    q.processAllAvailable(); q.stop()
    val out = spark.table("st8").collect()
    assert(out.find(_.getAs[Long]("event_id") == 1L).get.getAs[String]("zone") === "north")
    assert(out.find(_.getAs[Long]("event_id") == 2L).get.isNullAt(out.head.fieldIndex("zone")))
  }

  test("ST3+ST7: sliding windows in update mode emit refreshed aggregates") {
    val in = MemoryStream[(Long, Timestamp, Double, Long)](spark)
    val df = in.toDF().toDF("event_id", "ts", "value", "user_id")
    val q = StreamingOps.slidingStats(df, "1 hour", "15 minutes")
      .writeStream.format("memory").queryName("st3").outputMode("update").start()
    in.addData((1L, ts("2024-01-01 10:20:00"), 10.0, 5L))
    q.processAllAvailable(); q.stop()
    // a single event at 10:20 belongs to 4 sliding windows (09:30..10:15 starts)
    assert(spark.table("st3").count() === 4)
  }

  test("streaming outage windows: overlaps coalesce, emission waits for the watermark") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[StreamingOps.Alarm](spark)
      val q = StreamingOps.outageWindows(in.toDS(), lateness = "10 minutes")
        .writeStream.format("memory").queryName("st_outage").outputMode("append").start()
      // site 1: two overlapping 1h alarms -> one 10:00-11:30 window;
      // site 2: a disjoint alarm far later keeps the stream's clock moving
      in.addData(
        StreamingOps.Alarm(1L, ts("2024-01-01 10:00:00"), 3600000L),
        StreamingOps.Alarm(1L, ts("2024-01-01 10:30:00"), 3600000L))
      q.processAllAvailable()
      assert(spark.table("st_outage").count() === 0) // watermark still behind
      // advance event time well past 11:30 + 10 min lateness...
      in.addData(StreamingOps.Alarm(2L, ts("2024-01-01 15:00:00"), 60000L))
      q.processAllAvailable()
      // ...and one more batch so the registered timer fires under the new watermark
      in.addData(StreamingOps.Alarm(2L, ts("2024-01-01 15:01:00"), 60000L))
      q.processAllAvailable(); q.stop()
      val wins = spark.table("st_outage").as[StreamingOps.OutageWindow].collect()
        .filter(_.site_id == 1L)
      assert(wins.toSeq === Seq(StreamingOps.OutageWindow(
        1L, ts("2024-01-01 10:00:00").getTime, ts("2024-01-01 11:30:00").getTime, 2L)))
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming outage windows: late-but-valid alarm merges before the close") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[StreamingOps.Alarm](spark)
      val q = StreamingOps.outageWindows(in.toDS(), lateness = "30 minutes")
        .writeStream.format("memory").queryName("st_outage2").outputMode("append").start()
      in.addData(StreamingOps.Alarm(1L, ts("2024-01-01 10:00:00"), 3600000L))
      q.processAllAvailable()
      // an OLDER alarm arrives next batch (reordered), still within the
      // 30 min watermark: it must extend the same island backwards
      in.addData(StreamingOps.Alarm(1L, ts("2024-01-01 09:45:00"), 3600000L))
      q.processAllAvailable()
      in.addData(StreamingOps.Alarm(2L, ts("2024-01-01 16:00:00"), 60000L))
      q.processAllAvailable()
      in.addData(StreamingOps.Alarm(2L, ts("2024-01-01 16:05:00"), 60000L))
      q.processAllAvailable(); q.stop()
      val wins = spark.table("st_outage2").as[StreamingOps.OutageWindow].collect()
        .filter(_.site_id == 1L)
      assert(wins.toSeq === Seq(StreamingOps.OutageWindow(
        1L, ts("2024-01-01 09:45:00").getTime, ts("2024-01-01 11:00:00").getTime, 2L)))
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming outage windows match the batch islands operator on the same alarms") {
    import graft.operators.Intervals
    val alarms = Seq(
      (1L, "2024-01-01 10:00:00", 3600000L), (1L, "2024-01-01 10:30:00", 3600000L),
      (1L, "2024-01-01 13:00:00", 1800000L), (3L, "2024-01-01 10:10:00", 600000L))
    val batch = alarms.toDF("site_id", "t", "dur")
      .select(col("site_id"),
        unix_millis(col("t").cast("timestamp")).as("s"),
        (unix_millis(col("t").cast("timestamp")) + col("dur")).as("e"))
    val expected = Intervals.mergeIntervals(batch, Seq("site_id"), "s", "e")
      .orderBy("site_id", "w_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // streamed: same alarms, then advance the clock far enough to close all
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[StreamingOps.Alarm](spark)
      val q = StreamingOps.outageWindows(in.toDS(), lateness = "10 minutes")
        .writeStream.format("memory").queryName("st_outage3").outputMode("append").start()
      alarms.foreach { case (k, t, d) => in.addData(StreamingOps.Alarm(k, ts(t), d)) }
      q.processAllAvailable()
      in.addData(StreamingOps.Alarm(9L, ts("2024-01-02 10:00:00"), 1000L))
      q.processAllAvailable()
      in.addData(StreamingOps.Alarm(9L, ts("2024-01-02 10:01:00"), 1000L))
      q.processAllAvailable(); q.stop()
      val streamed = spark.table("st_outage3").as[StreamingOps.OutageWindow].collect()
        .filter(w => w.site_id == 1L || w.site_id == 3L)
        .sortBy(w => (w.site_id, w.w_start_ms))
        .map(w => (w.site_id, w.w_start_ms, w.w_end_ms, w.n_merged))
      assert(streamed.toSeq === expected.toSeq)
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming histogram fold: micro-batches merge to the single-pass sketch; redelivery no-op") {
    import graft.operators.HistogramSketch
    val dir = java.nio.file.Files.createTempDirectory("graft-hist-stream").toString
    try {
      val in = MemoryStream[(Long, Double)](spark)
      val df = in.toDF().toDF("id", "v")
      val q = df.writeStream
        .foreachBatch(StreamingOps.histogramAppendBatch(dir, "v", 0.0, 100.0, 50))
        .option("checkpointLocation", s"$dir/_chk")
        .start()
      val batch1 = (1 to 300).map(i => (i.toLong, (i % 90) + 0.5))
      val batch2 = (301 to 500).map(i => (i.toLong, (i % 70) + 0.25))
      in.addData(batch1: _*); q.processAllAvailable()
      in.addData(batch2: _*); q.processAllAvailable(); q.stop()
      val streamed = StreamingOps.readHistogram(spark, dir)
        .orderBy("bin").collect().map(r => (r.getLong(0), r.getLong(1)))
      val single = HistogramSketch.build(
        (batch1 ++ batch2).toDF("id", "v"), col("v"), 0.0, 100.0, 50)
        .orderBy("bin").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(streamed.toSeq === single.toSeq)
      // manual redelivery of an applied batch id must change nothing
      StreamingOps.histogramAppendBatch(dir, "v", 0.0, 100.0, 50)(
        batch1.toDF("id", "v"), 0L)
      val after = StreamingOps.readHistogram(spark, dir)
        .orderBy("bin").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(after.toSeq === single.toSeq, "ledgered redelivery mutated the sketch")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("streaming cusum: out-of-order readings fold in event-time order, emitted once final") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[StreamingOps.Reading](spark)
      val q = StreamingOps.cusumAlerts(in.toDS(), mu = 10.0, slack = 0.5, threshold = 5.0,
        lateness = "10 minutes")
        .writeStream.format("memory").queryName("st_cusum").outputMode("append").start()
      // deliver OUT of event-time order (14.0@:02 before 16.0@:01)
      in.addData(
        StreamingOps.Reading(1L, ts("2024-01-01 10:02:00"), 14.0),
        StreamingOps.Reading(1L, ts("2024-01-01 10:01:00"), 16.0),
        StreamingOps.Reading(1L, ts("2024-01-01 10:03:00"), 2.0))
      q.processAllAvailable()
      // advance the watermark far past the buffered tail to finalize it
      in.addData(StreamingOps.Reading(2L, ts("2024-01-01 12:00:00"), 10.0))
      q.processAllAvailable(); q.stop()
      val got = spark.table("st_cusum").as[StreamingOps.CusumPoint].collect()
        .filter(_.key == 1L).sortBy(_.ts_ms)
        .map(p => (p.value, p.cusum, p.alert))
      // event-time fold: s1 = 16−10.5 = 5.5 (alert), s2 = 5.5+14−10.5 = 9.0
      // (alert), s3 = max(0, 9+2−10.5) = 0.5
      assert(got.toSeq === Seq((16.0, 5.5, true), (14.0, 9.0, true), (2.0, 0.5, false)))
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming cusum: the statistic survives across batches (unbounded horizon)") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[StreamingOps.Reading](spark)
      val q = StreamingOps.cusumAlerts(in.toDS(), mu = 0.0, slack = 0.0, threshold = 100.0,
        lateness = "1 minutes")
        .writeStream.format("memory").queryName("st_cusum2").outputMode("append").start()
      in.addData(StreamingOps.Reading(1L, ts("2024-01-01 10:00:00"), 3.0))
      q.processAllAvailable()
      in.addData(StreamingOps.Reading(1L, ts("2024-01-01 11:00:00"), 4.0))
      q.processAllAvailable()
      in.addData(StreamingOps.Reading(1L, ts("2024-01-01 12:00:00"), 5.0))
      q.processAllAvailable()
      in.addData(StreamingOps.Reading(9L, ts("2024-01-01 14:00:00"), 0.0))
      q.processAllAvailable(); q.stop()
      val got = spark.table("st_cusum2").as[StreamingOps.CusumPoint].collect()
        .filter(_.key == 1L).sortBy(_.ts_ms).map(_.cusum)
      assert(got.toSeq === Seq(3.0, 7.0, 12.0), "running statistic must accumulate across batches")
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming seasonal gate: per-slot flags match the batch operator, stateless append") {
    import graft.operators.Anomaly
    // training: slot 2 runs ~100, slot 14 runs ~10
    val training = (1 to 40).flatMap(i => Seq(
      ("k", 2L, 100.0 + (i % 3)), ("k", 14L, 10.0 + (i % 3))))
      .toDF("key", "hr", "value")
    val profile = Anomaly.seasonalProfile(training, Seq("key"), col("hr"), "value")
    val in = MemoryStream[(String, Long, Double)](spark)
    val gated = StreamingOps.seasonalDeviationFlags(
      in.toDF().toDF("key", "hr", "value"), profile, Seq("key"), col("hr"), "value",
      minN = 30, zThreshold = 3.0)
    val q = gated.writeStream.format("memory").queryName("st_seasonal")
      .outputMode("append").start()
    // 100 at slot 2 is NORMAL; 100 at slot 14 is anomalous; 11 at 14 normal;
    // a NEVER-TRAINED key and a never-observed slot must flow through
    // UNFLAGGED (left join), not be silently dropped
    in.addData(("k", 2L, 100.0), ("k", 14L, 100.0), ("k", 14L, 11.0),
      ("new-site", 2L, 9999.0), ("k", 7L, 9999.0))
    q.processAllAvailable(); q.stop()
    val got = spark.table("st_seasonal")
      .select("key", "hr", "value", "seasonal_anomaly")
      .as[(String, Long, Double, Boolean)].collect().toSet
    assert(got === Set(
      ("k", 2L, 100.0, false), ("k", 14L, 100.0, true), ("k", 14L, 11.0, false),
      ("new-site", 2L, 9999.0, false), ("k", 7L, 9999.0, false)))
    // and their z-scores are NULL (no baseline), not a number
    val unseen = spark.table("st_seasonal")
      .filter(col("key") === "new-site" || col("hr") === 7L)
    assert(unseen.count() === 2L && unseen.filter(col("s_z").isNotNull).count() === 0L)
  }

  test("streaming drift monitoring: PSI over two stream-folded histograms") {
    import graft.operators.HistogramSketch
    // the composition the sketch family exists for: two ingest streams
    // fold their own additive histograms (N57); PSI (N66) reads the
    // merged sketches — whole-corpus drift scoring with zero rescans
    val dirA = java.nio.file.Files.createTempDirectory("graft-psi-a").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft-psi-b").toString
    try {
      def ingest(dir: String, name: String, batches: Seq[Seq[(Long, Double)]]): Unit = {
        val in = MemoryStream[(Long, Double)](spark)
        val q = in.toDF().toDF("id", "v").writeStream
          .foreachBatch(StreamingOps.histogramAppendBatch(dir, "v", 0.0, 100.0, 20))
          .option("checkpointLocation", s"$dir/_chk").queryName(name).start()
        batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
        q.stop()
      }
      // corpus A centered low, corpus B shifted high — each in 2 batches
      ingest(dirA, "psi_a", Seq(
        (1 to 150).map(i => (i.toLong, (i % 40) + 0.5)),
        (151 to 300).map(i => (i.toLong, (i % 40) + 0.5))))
      ingest(dirB, "psi_b", Seq(
        (1 to 150).map(i => (i.toLong, 55.0 + (i % 40))),
        (151 to 300).map(i => (i.toLong, 55.0 + (i % 40)))))
      val drifted = HistogramSketch.psi(
        StreamingOps.readHistogram(spark, dirA),
        StreamingOps.readHistogram(spark, dirB), 20).collect().head
      assert(drifted.getAs[Long]("n_a") === 300L && drifted.getAs[Long]("n_b") === 300L)
      assert(drifted.getAs[Double]("psi") > 0.25, "disjoint streams must read as drifted")
      // a stream against its own fold is exactly zero drift
      val self = HistogramSketch.psi(
        StreamingOps.readHistogram(spark, dirA),
        StreamingOps.readHistogram(spark, dirA), 20).collect().head
      assert(self.getAs[Double]("psi") === 0.0)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dirA)).deleteRecursively()
      new Directory(new java.io.File(dirB)).deleteRecursively()
    }
  }

  test("streaming count-min fold: micro-batches merge to the single-pass sketch; redelivery no-op") {
    import graft.operators.CountMin
    val (depth, width) = (4, 32)
    val dir = java.nio.file.Files.createTempDirectory("graft-cms-stream").toString
    try {
      val in = MemoryStream[(Long, String)](spark)
      val df = in.toDF().toDF("id", "k")
      val q = df.writeStream
        .foreachBatch(StreamingOps.countMinAppendBatch(dir, "k", depth, width))
        .option("checkpointLocation", s"$dir/_chk")
        .start()
      val batch1 = (1 to 200).map(i => (i.toLong, s"k${i % 17}"))
      val batch2 = (201 to 350).map(i => (i.toLong, s"k${i % 11}"))
      in.addData(batch1: _*); q.processAllAvailable()
      in.addData(batch2: _*); q.processAllAvailable(); q.stop()
      def rows(d: org.apache.spark.sql.DataFrame) =
        d.select("depth", "bucket", "cnt").as[(Long, Long, Long)].collect().toSet
      val streamed = rows(StreamingOps.readCountMin(spark, dir))
      val single = rows(CountMin.build(
        (batch1 ++ batch2).toDF("id", "k"), col("k"), depth, width))
      assert(streamed === single)
      // estimates off the streamed sketch still never under-count
      val truth = (batch1 ++ batch2).toDF("id", "k")
        .groupBy("k").agg(count(lit(1)).as("true_cnt"))
      val est = CountMin.estimate(
        StreamingOps.readCountMin(spark, dir), truth, col("k"), depth, width)
        .select("true_cnt", "est").as[(Long, Long)].collect()
      est.foreach { case (t, e) => assert(e >= t) }
      // manual redelivery of an applied batch id must change nothing
      StreamingOps.countMinAppendBatch(dir, "k", depth, width)(
        batch1.toDF("id", "k"), 0L)
      assert(rows(StreamingOps.readCountMin(spark, dir)) === single,
        "ledgered redelivery mutated the sketch")
      // crash-window redelivery: wipe the ledger, simulating a crash
      // BETWEEN the counter write and the ledger append — the retry must
      // OVERWRITE its batch-keyed directory, not append a double-count
      import scala.reflect.io.Directory
      new Directory(new java.io.File(s"$dir/_batches")).deleteRecursively()
      StreamingOps.countMinAppendBatch(dir, "k", depth, width)(
        batch1.toDF("id", "k"), 0L)
      assert(rows(StreamingOps.readCountMin(spark, dir)) === single,
        "unledgered redelivery double-counted the additive sketch")
      // restore batch 1's ledger entry the same way a real retry would:
      // redelivery overwrites its batch-keyed dir with identical content
      StreamingOps.countMinAppendBatch(dir, "k", depth, width)(
        batch2.toDF("id", "k"), 1L)
      assert(rows(StreamingOps.readCountMin(spark, dir)) === single)
      // compaction: merged counters identical in a fresh versioned dir,
      // ledger carried over so pre-compaction batch ids stay no-ops
      val dir2 = s"$dir-v2"
      StreamingOps.compactCountMin(spark, dir, dir2)
      assert(rows(StreamingOps.readCountMin(spark, dir2)) === single,
        "compaction changed the merged sketch")
      StreamingOps.countMinAppendBatch(dir2, "k", depth, width)(
        batch2.toDF("id", "k"), 1L)
      assert(rows(StreamingOps.readCountMin(spark, dir2)) === single,
        "compacted relation re-applied an already-ledgered batch id")
      new Directory(new java.io.File(dir2)).deleteRecursively()
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }
}
