package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.PageRank

class PageRankSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  /** Reference single-threaded iteration with the same integer
    * nano-unit contribution quantization. */
  private def ref(
      edges: Seq[(String, String)], iters: Int, d: Double): Map[String, Double] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val out = e.groupBy(_._1).map { case (s, xs) => s -> xs.size }
    var rank = nodes.map(_ -> 1.0).toMap
    (1 to iters).foreach { _ =>
      val in = e.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _) =>
          math.floor(rank(s) * 1e9 / out(s)).toLong
        }.sum.toDouble / 1e9
      }
      rank = nodes.map(n => n -> ((1.0 - d) + d * in.getOrElse(n, 0.0))).toMap
    }
    rank
  }

  private def run(edges: Seq[(String, String)], iters: Int, parts: Int = 1) =
    PageRank.ranks(edges.toDF("src", "dst").repartition(parts),
      "src", "dst", iters)
      .as[(String, Double)].collect().toMap

  test("a cycle stays uniform at rank 1; a hub out-ranks its spokes") {
    val cycle = Seq(("a", "b"), ("b", "c"), ("c", "a"))
    run(cycle, 5).values.foreach(r => assert(math.abs(r - 1.0) < 1e-9))
    // spokes all point at the hub, hub points back at one spoke
    val star = Seq(("s1", "h"), ("s2", "h"), ("s3", "h"), ("h", "s1"))
    val got = run(star, 10)
    assert(got("h") > got("s2") && got("h") > got("s3"), got.toString)
  }

  test("matches the reference fold, including dangling leak accounting") {
    val g = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "a")) // d is a source; add sink: ("c","e")
    val g2 = g :+ ("c", "e") // e is dangling (no out-edges): mass leaks
    val got = run(g2, 8)
    val want = ref(g2, 8, 0.85)
    assert(got.keySet === want.keySet)
    got.foreach { case (n, r) => assert(math.abs(r - want(n)) < 1e-9, s"node $n") }
    // leak convention: with a dangling node, total rank < N
    assert(got.values.sum < got.size.toDouble - 1e-9)
    // without dangling nodes, total rank ≈ N (conservation)
    val closed = run(Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("c", "b")), 8)
    assert(math.abs(closed.values.sum - closed.size) < 1e-6)
  }

  test("co-partitioned escape hatch is bit-identical to the broadcast path") {
    // broadcastNodeLimit = 0 forces the shuffled-hash fallback (the
    // >10⁸-node regime) on the same graphs the broadcast path runs; the
    // nano-unit quantization makes both paths exact, so equality is ===,
    // not a tolerance band
    def shuffled(edges: Seq[(String, String)], iters: Int) =
      PageRank.ranks(edges.toDF("src", "dst").repartition(3),
        "src", "dst", iters, broadcastNodeLimit = 0L)
        .as[(String, Double)].collect().toMap
    val star = Seq(("s1", "h"), ("s2", "h"), ("s3", "h"), ("h", "s1"))
    assert(shuffled(star, 10) === run(star, 10))
    val g = (1 to 80).map(i => (s"n${i % 13}", s"n${(i * 5) % 13}"))
      .filter { case (a, b) => a != b }
    assert(shuffled(g, 7) === run(g, 7))
    // dangling + disconnected components exercise the left-join side
    val dangle = Seq(("a", "b"), ("b", "c"), ("x", "y"))
    assert(shuffled(dangle, 6) === run(dangle, 6))
  }

  test("partition-insensitive and parallel-edge-collapsing") {
    val g = (1 to 50).map(i => (s"n${i % 10}", s"n${(i * 3) % 10}"))
      .filter { case (a, b) => a != b }
    assert(run(g, 6, parts = 1) === run(g, 6, parts = 7))
    // duplicated edge list gives identical ranks (edges collapse first)
    assert(run(g ++ g, 6) === run(g, 6))
  }

  test("empty edge set yields an empty result, not an NPE") {
    // the max-in-degree skew measurement reads max() over the edges;
    // on zero edges that row is NULL — the guard must skip it
    assert(run(Seq.empty, 3).isEmpty)
  }
}
