package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udaf

/** Mergeable heavy-hitters summary (Misra–Gries), the frequency analogue
  * of the HLL cardinality sketch (SURVEY §2.11 N41): a fixed-size state
  * that answers "which tokens/URLs/hosts are frequent, and how frequent"
  * with theorem-backed error bounds, and MERGES — per-partition partial
  * aggregation map-side, per-batch summaries folded across days without
  * rescanning history.
  *
  * Guarantees (Misra–Gries 1982; merge rule from Agarwal et al.,
  * "Mergeable Summaries", PODS 2012 — both public literature):
  *   - est(x) ≤ true(x)                           (never over-counts)
  *   - true(x) − est(x) ≤ N/(k+1)                 (N = total items seen)
  *   - every x with true(x) > N/(k+1) is present  (no heavy item missed)
  * and all three survive ARBITRARY merge trees, which is exactly what
  * Spark's partial-aggregation plan produces. At 100 TB the token stream
  * never shuffles: each task reduces its partition into a k-entry map,
  * and only those k-entry summaries move.
  *
  * Implemented as a typed [[Aggregator]] registered via `udaf` — Spark
  * plans it as a TypedImperativeAggregate (object buffer, serialized
  * only at partial/final boundaries), so per-row cost is one immutable
  * map update.
  */
object HeavyHitters {

  /** Summary state: surviving counters + total items folded in. */
  final case class MG(counts: Map[String, Long], processed: Long)

  /** One reported heavy hitter: token and its (under-)estimate. */
  final case class TokenEst(token: String, est: Long)

  final class MisraGries(k: Int) extends Aggregator[String, MG, Array[TokenEst]] {
    require(k >= 1, s"capacity must be >= 1, got $k")

    override def zero: MG = MG(Map.empty, 0L)

    override def reduce(b: MG, tok: String): MG = {
      val c = b.counts
      if (c.contains(tok)) MG(c.updated(tok, c(tok) + 1), b.processed + 1)
      else if (c.size < k) MG(c.updated(tok, 1L), b.processed + 1)
      else {
        // full and unseen: decrement every counter (the classic MG step);
        // amortized O(1) — each decrement cancels a previous increment
        val dec = c.collect { case (t, n) if n > 1 => t -> (n - 1) }
        MG(dec, b.processed + 1)
      }
    }

    override def merge(a: MG, b: MG): MG = {
      val summed = b.counts.foldLeft(a.counts) { case (acc, (t, n)) =>
        acc.updated(t, acc.getOrElse(t, 0L) + n)
      }
      val trimmed =
        if (summed.size <= k) summed
        else {
          // subtract the (k+1)-th largest count from everyone and keep
          // the strictly-positive survivors (Agarwal et al. merge) —
          // a pure threshold, so independent of map iteration order
          val kth = summed.toSeq.map(_._2).sorted(Ordering[Long].reverse)(k)
          summed.collect { case (t, n) if n - kth > 0 => t -> (n - kth) }
        }
      MG(trimmed, a.processed + b.processed)
    }

    override def finish(r: MG): Array[TokenEst] =
      r.counts.toArray
        .sortBy { case (t, n) => (-n, t) }
        .map { case (t, n) => TokenEst(t, n) }

    override def bufferEncoder: Encoder[MG] = Encoders.product[MG]
    override def outputEncoder: Encoder[Array[TokenEst]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[TokenEst]]()
  }

  /** DataFrame-side aggregate: `df.agg(heavyHitters(32)(col("tok")))` →
    * array<struct<token,est>> sorted by (est desc, token). */
  def heavyHitters(k: Int): UserDefinedFunction = udaf(new MisraGries(k))
}
