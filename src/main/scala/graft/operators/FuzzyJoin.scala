package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy entity-resolution join — pairs of rows whose string keys are
  * within ONE character edit (insert / delete / substitute), found
  * WITHOUT a cross product (the reference's entity surface: README.md:10
  * "correlates alarms, tickets and inventory" — correlating records
  * whose identifiers differ by a typo is the classic record-linkage
  * step; the training-data twin is near-identical metadata collapse).
  *
  * Algorithm: SymSpell-style deletion-neighborhood blocking. Each
  * string projects to the hash set of {itself} ∪ {every single-char
  * deletion} (a native single-pass Expression,
  * [[graft.plans.TextHashNative.deletionHashSet]]); two strings within
  * edit distance 1 ALWAYS share an element, so candidate generation is
  * an equi-join on the exploded set — then `levenshtein ≤ 1` verifies
  * (sharing a variant only bounds the distance by 2, and 64-bit hash
  * collisions are verify-killed too).
  *
  * Scale shape (the reason this beats a similarity cross join at
  * 100 TB): a deletion variant of length L is shared by at most
  * |Σ|·(L+1)+1 DISTINCT strings (every one-char insertion into it plus
  * itself), so per-bucket join fan-out is bounded by alphabet × key
  * length — a constant in corpus size. The shuffle carries
  * (hash, id, key, variant set) — O(L) longs per exploded row, no
  * document bodies. Duplicate-heavy key columns should be collapsed
  * first (N1/N34) like every other dedup entry point; identical keys
  * still pair here (distance 0) via the shared identity variant.
  *
  * Candidate dedup is shuffle-free: a pair sharing k variants would
  * surface k times, so rows survive only where the joined hash equals
  * the codegen'd smallest COMMON element of the two sorted variant
  * sets ([[graft.plans.VectorNative.minCommonSorted]]) — the
  * skip-earlier-bands trick that deleted the minhash build's
  * dropDuplicates exchange (BASELINE.md r8), reused verbatim.
  */
object FuzzyJoin {

  private def prep(df: DataFrame, id: Column, str: Column, side: String): DataFrame =
    // small dims arrive as a handful of parquet splits; without the
    // spread the variant projection + verify runs 4-wide (profiled
    // 6.7 s CPU on 4 tasks at sf0.1). Scan-shaped frames only — the
    // same guard as every dedup entry point (Dedup.spreadIfNarrow)
    Dedup.spreadIfNarrow(df.select(id.cast("long").as(s"id_$side"), str.as(s"name_$side")))
      .withColumn(s"_v$side",
        graft.plans.TextHashNative.deletionHashSet(col(s"name_$side")))

  private def explodeSide(p: DataFrame, side: String): DataFrame =
    p.select(col(s"id_$side"), col(s"name_$side"), col(s"_v$side"),
      explode(col(s"_v$side")).as("_h"))

  private def verified(cands: DataFrame): DataFrame =
    cands
      .filter(graft.plans.VectorNative.minCommonSorted(col("_va"), col("_vb")) === col("_h"))
      // thresholded levenshtein runs the BANDED O(len·k) DP (−1 when
      // the distance exceeds 1) instead of the full O(len²) table —
      // the verify is the hot loop, and candidates are distance ≤ 2
      // by construction so most of the full table is wasted work
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), 1).cast("long"))
      .filter(col("dist") >= 0)
      .select("id_a", "id_b", "name_a", "name_b", "dist")

  /** Unordered pairs (id_a < id_b) within one edit among `df`'s keys. */
  def editDistancePairs(df: DataFrame, id: Column, str: Column): DataFrame = {
    val a = explodeSide(prep(df, id, str, "a"), "a")
    val b = explodeSide(prep(df, id, str, "b"), "b")
    verified(a.join(b, Seq("_h")).filter(col("id_a") < col("id_b")))
  }

  /** Entity groups from the ≤1-edit pair graph — the record-linkage
    * "golden record" step: transitively link keys through typo chains
    * (A↔B and B↔C group A,B,C even when A and C are two edits apart)
    * with the engine's alternating-star connected components
    * ([[Components.connectedComponents]], the same machinery behind
    * minhash clusters). Keys with no fuzzy neighbor are their own
    * entity. Output: (id, entity_rep, entity_size) where entity_rep is
    * the smallest id in the group.
    *
    * Scale shape: pairs come from the blocked generator above (never a
    * cross product); CC iterates on the id-only edge list; the
    * size/label attach is one keyed window + one left join — all
    * shuffles carry ids, never payloads. */
  def entityClusters(df: DataFrame, id: Column, str: Column): DataFrame = {
    // COLLAPSE identical keys first (the minhash-relation discipline):
    // duplicate-heavy key columns make the raw pair graph quadratic in
    // duplicate counts — the sf0.1 part table is 20k rows over 64
    // distinct names, a 3.9M-edge graph whose CC burned 46-65 s CPU;
    // collapsed, the fuzzy graph has ≤ distinct-count nodes and members
    // rejoin by ONE string-keyed equi-join. The labels are unchanged:
    // comp = min linked rep = min linked member id, because each rep is
    // already its name group's min id.
    val base = df.select(id.cast("long").as("id"), str.as("_s"))
    val reps = base.groupBy("_s").agg(min(col("id")).as("_rep"))
    val repPairs = editDistancePairs(reps, col("_rep"), col("_s"))
      .select("id_a", "id_b")
    val comps = Components.connectedComponents(repPairs, "id_a", "id_b")
      .withColumnRenamed("node", "_rep")
    base
      .join(reps, "_s")
      .join(comps, Seq("_rep"), "left")
      .withColumn("entity_rep", coalesce(col("comp"), col("_rep")))
      .select(col("id"), col("entity_rep"))
      .withColumn("entity_size",
        count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("entity_rep"))))
  }

  /** Bipartite record linkage: every (left, right) pair within one edit
    * — cross-side candidates ONLY, no self-join work on either side
    * (the N37/N38 decontamination shape). */
  def editDistancePairsBetween(
      left: DataFrame, leftId: Column, leftStr: Column,
      right: DataFrame, rightId: Column, rightStr: Column): DataFrame = {
    val a = explodeSide(prep(left, leftId, leftStr, "a"), "a")
    val b = explodeSide(prep(right, rightId, rightStr, "b"), "b")
    verified(a.join(b, Seq("_h")))
  }
}
