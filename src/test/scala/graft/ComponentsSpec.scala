package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Components

class ComponentsSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  /** Driver-side union-find — the O(n α(n)) sequential answer the
    * distributed algorithm must reproduce. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("mixed fixture: clique, pair, chain — labels are component minima") {
    val edges = Seq[(Long, Long)](
      (1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), // component {1,2,3,4}
      (10L, 11L),                             // component {10,11}
      (20L, 21L), (21L, 22L), (22L, 23L), (23L, 24L)) // chain {20..24}
    assert(run(edges) === unionFind(edges))
  }

  test("long path with the minimum in the middle needs multiple rounds") {
    // ids zig-zag so no single local-min hop resolves it: 50 sits mid-path
    val ids = (0 until 64).map(i => if (i % 2 == 0) (100 + i).toLong else (64 - i).toLong)
      .updated(32, 1L)
    val edges = ids.sliding(2).map(p => (p(0), p(1))).toSeq
    val got = run(edges)
    assert(got === unionFind(edges))
    assert(got.values.toSet === Set(1L))
  }

  test("duplicate, reversed and self-loop edges are tolerated") {
    val edges = Seq[(Long, Long)]((5L, 6L), (6L, 5L), (5L, 6L), (7L, 7L), (6L, 8L))
    val got = run(edges)
    // 7's only edge is a self-loop => isolated => absent by contract
    assert(got === Map(5L -> 5L, 6L -> 5L, 8L -> 5L))
  }

  test("maxIter too small to converge fails loudly, never silently wrong") {
    val edges = (0L until 32L).map(i => (i, i + 1L))
    intercept[IllegalStateException] {
      Components.connectedComponents(edges.toDF("a", "b"), "a", "b", maxIter = 1).collect()
    }
  }

  test("pseudo-random graph matches union-find") {
    // LCG-generated, fully deterministic: 300 edges over ~200 nodes
    var s = 12345L
    def next(mod: Int): Long = { s = (s * 1103515245L + 12345L) % 2147483647L; s % mod }
    val edges = Seq.fill(300)((next(200), next(200))).filter(e => e._1 != e._2)
    assert(run(edges) === unionFind(edges))
  }
}
