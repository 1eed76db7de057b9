package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-stream interval join with watermarks — the streaming analogue
  * of the as-of alignment (J5): each purchase joins errors of the same
  * user within the preceding hour. State on both sides is bounded by
  * the watermark + interval. */
class StreamStreamJoinSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("purchases join prior errors of same user within 1h, watermark-bounded") {
    val errIn = MemoryStream[(Long, Timestamp, Long)](spark)
    val buyIn = MemoryStream[(Long, Timestamp, Long)](spark)
    val errors = errIn.toDF().toDF("err_id", "err_ts", "user_id")
      .withWatermark("err_ts", "10 minutes")
    val buys = buyIn.toDF().toDF("buy_id", "buy_ts", "user_id")
      .withWatermark("buy_ts", "10 minutes")
    val j2 = buys.as("b").join(errors.as("e"),
      col("b.user_id") === col("e.user_id") &&
        col("e.err_ts") <= col("b.buy_ts") &&
        col("e.err_ts") >= col("b.buy_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("buy_id"), col("err_id"))
    val q = j2.writeStream.format("memory").queryName("ssj").outputMode("append").start()
    errIn.addData((1L, ts("2024-01-01 10:00:00"), 7L), (2L, ts("2024-01-01 08:00:00"), 7L))
    buyIn.addData((10L, ts("2024-01-01 10:30:00"), 7L), (11L, ts("2024-01-01 10:30:00"), 8L))
    q.processAllAvailable(); q.stop()
    val out = spark.table("ssj").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // buy 10 matches err 1 (30 min prior); err 2 is 2.5h earlier → out of
    // interval; buy 11 is another user → no match
    assert(out === Set((10L, 1L)))
  }
}
