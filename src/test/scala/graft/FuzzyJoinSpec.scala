package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.FuzzyJoin

class FuzzyJoinSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  /** Reference DP levenshtein (codepoint-level, like the engine's). */
  private def lev(a: String, b: String): Int = {
    val x = a.codePoints().toArray
    val y = b.codePoints().toArray
    val d = Array.tabulate(x.length + 1, y.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to x.length; j <- 1 to y.length)
      d(i)(j) = math.min(
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1))
    d(x.length)(y.length)
  }

  private val names = Seq(
    "alpha", "alpha",      // identical pair (distance 0)
    "alphb",               // one substitution from alpha
    "alph",                // one deletion from alpha
    "alphas",              // one insertion into alpha
    "alpXY",               // distance 2 from alpha — must NOT pair
    "beta", "betas", "bet",
    "gamma", "delta",
    "",                    // empty string edge
    "a"                    // pairs with "" (one insert)
  ).zipWithIndex.map { case (s, i) => (i.toLong, s) }

  private def df = names.toDF("id", "name")

  private def brute =
    (for {
      (ia, sa) <- names; (ib, sb) <- names
      if ia < ib && lev(sa, sb) <= 1
    } yield (ia, ib, lev(sa, sb).toLong)).sorted

  test("self-join matches brute-force levenshtein ≤ 1, each pair exactly once") {
    val got = FuzzyJoin.editDistancePairs(df, col("id"), col("name"))
      .select("id_a", "id_b", "dist").as[(Long, Long, Long)]
      .collect().toSeq
    assert(got.size === got.distinct.size, "pair emitted more than once")
    assert(got.sorted === brute)
  }

  test("distance-2 strings share a deletion variant but are verify-filtered") {
    // alpXY is candidate-paired with alpha via the shared variant "alp?"
    // family only if a variant collides; either way it must not survive
    val got = FuzzyJoin.editDistancePairs(df, col("id"), col("name"))
      .filter(col("name_a") === "alpXY" || col("name_b") === "alpXY")
      .count()
    assert(got === 0L)
  }

  test("bipartite form returns exactly the cross-side qualifying pairs") {
    val left = names.filter(_._1 % 2 == 0).toDF("id", "name")
    val right = names.filter(_._1 % 2 == 1).toDF("id", "name")
    val want = (for {
      (ia, sa) <- names if ia % 2 == 0
      (ib, sb) <- names if ib % 2 == 1
      if lev(sa, sb) <= 1
    } yield (ia, ib, lev(sa, sb).toLong)).sorted
    val got = FuzzyJoin.editDistancePairsBetween(
      left, col("id"), col("name"), right, col("id"), col("name"))
      .select("id_a", "id_b", "dist").as[(Long, Long, Long)]
      .collect().toSeq
    assert(got.size === got.distinct.size)
    assert(got.sorted === want)
  }

  test("entity clusters link transitively and keep isolated keys as singletons") {
    // chain: aaaa–aaab–aabb (a↔c are TWO edits apart but share b);
    // "zzzz" has no neighbor
    val df = Seq((1L, "aaaa"), (2L, "aaab"), (3L, "aabb"), (9L, "zzzz"))
      .toDF("id", "name")
    val got = FuzzyJoin.entityClusters(df, col("id"), col("name"))
      .select("id", "entity_rep", "entity_size").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(got.toSeq === Seq((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L), (9L, 9L, 1L)))
  }

  test("entity clusters collapse duplicate keys before pairing, labels intact") {
    // 6 rows over 3 distinct names; "aaaa" dups + "aaab" link into one
    // entity of 5 rows labeled by the global min id
    val df = Seq((7L, "aaaa"), (3L, "aaaa"), (5L, "aaaa"),
      (10L, "aaab"), (11L, "aaab"), (9L, "zzzz")).toDF("id", "name")
    val got = FuzzyJoin.entityClusters(df, col("id"), col("name"))
      .select("id", "entity_rep", "entity_size").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(got.toSeq === Seq((3L, 3L, 5L), (5L, 3L, 5L), (7L, 3L, 5L),
      (9L, 9L, 1L), (10L, 3L, 5L), (11L, 3L, 5L)))
  }

  test("multibyte codepoints delete as single characters") {
    val uni = Seq((0L, "café"), (1L, "cafe"), (2L, "caf"),
      (3L, "😀ok"), (4L, "ok")).toDF("id", "name")
    val got = FuzzyJoin.editDistancePairs(uni, col("id"), col("name"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // café↔cafe (sub), café↔caf (del), cafe↔caf (del), 😀ok↔ok (del)
    assert(got === Set((0L, 1L), (0L, 2L), (1L, 2L), (3L, 4L)))
  }
}
