package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style repetition filters (Rae et al. 2021, "Scaling Language
  * Models: ... Gopher", Table A1 — public knowledge; also the
  * MassiveText / Dolma / RefinedWeb cleaning stacks): per-document
  * n-gram repetition signals used to drop boilerplate- and
  * spam-shaped pages from web corpora (reference README.md:102
  * "training data preparation").
  *
  * Two signal families over whitespace tokens:
  *  - TOP n-gram char fraction (n = 2,3,4): characters covered by all
  *    occurrences of the single most frequent n-gram, over total text
  *    chars — `cnt(top) · charlen(top) / length(text)`. The "most
  *    frequent" gram is chosen by (count, charlen) descending; the
  *    gram's identity never reaches the output, so any gram achieving
  *    the maximal pair yields the same fraction and the choice is
  *    deterministic BY VALUE (and replayable in ANSI SQL as a packed
  *    MAX — see oracleSql).
  *  - DUPLICATE n-gram char fraction (n = 5..10): characters covered
  *    by ALL occurrences of every n-gram that occurs ≥ 2 times —
  *    `Σ_{cnt(g)≥2} cnt(g)·charlen(g) / length(text)`. Occurrences
  *    may overlap, so the fraction can exceed 1 on degenerate text;
  *    Gopher's thresholds apply to the raw (uncapped) value and so do
  *    we.
  *
  * A document is KEPT when every fraction is at or under its Gopher
  * Table-A1 threshold (top: 0.20/0.18/0.16; dup: 0.15 down to 0.10).
  * Documents shorter than n tokens have no n-grams → fraction 0 →
  * that filter passes.
  *
  * Relation to [[TextAnalysis.repetitionStats]] (q_text_repetition):
  * that row carries the token-RATIO subset of §A1.1 (duplicate-token,
  * most-frequent-token, distinct-bigram ratios — occurrence counts
  * over token counts). This operator is the char-FRACTION n-gram
  * family those ratios approximate: char mass of the top 2/3/4-gram
  * and of duplicated 5..10-grams over text chars, plus the published
  * thresholds and the keep decision — the form Gopher actually
  * filters with (a 40-char boilerplate block repeated twice weighs
  * its chars, not its one extra occurrence).
  *
  * Scale shape: one explode of (tokens × 9 window sizes) feeding a
  * map-side-combining groupBy on (doc, n, gram) — the same linear
  * O(tokens·Σn) gram discipline as [[SubstringDedup]]; everything
  * after the first aggregation is per-(doc,n)-sized (≤ 9 rows per doc
  * reach the final per-doc fold). No windows over corpus-sized rows,
  * no driver-side state; exact integer char counts shuffle, the only
  * float is one final division of two exact BIGINTs (IEEE-identical
  * in any engine — the oracle-parity discipline).
  */
object GopherRepetition {

  /** Gopher Table A1: top n-gram char-fraction thresholds. */
  val topThresholds: Seq[(Int, Double)] =
    Seq(2 -> 0.20, 3 -> 0.18, 4 -> 0.16)

  /** Gopher Table A1: duplicate n-gram char-fraction thresholds. */
  val dupThresholds: Seq[(Int, Double)] =
    Seq(5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12, 9 -> 0.11, 10 -> 0.10)

  /** Per-language ABSOLUTE threshold adjustment (added to every
    * top/dup threshold). Gopher's Table A1 was tuned on English;
    * multilingual curation stacks threshold per language (public
    * practice: CCNet buckets per language, Dolma's per-language
    * configs) because whitespace tokenization runs hotter on
    * non-space-delimited scripts — zh/ja text segments into long
    * pseudo-tokens whose repetition fractions sit structurally higher
    * for the same content quality. The values here are a small
    * explicit table demonstrating the MECHANISM (the real per-language
    * values are corpus-tuned); unlisted languages get 0.0 = the
    * published English thresholds. */
  val langAdjust: Map[String, Double] =
    Map("zh" -> 0.05, "ja" -> 0.05, "ko" -> 0.03)

  /** The adjustment for a language column (0.0 when unlisted). */
  def langAdjustCol(lang: Column): Column =
    coalesce(element_at(typedLit(langAdjust), lang), lit(0.0))

  /** Keep decision over a [[report]] row with every threshold shifted
    * by `adj` (IEEE double add of the same two constants on both
    * engine and oracle sides — the parity discipline). */
  def keepWithAdjust(adj: Column): Column =
    (topThresholds.map { case (n, t) =>
      col(s"top${n}_frac") <= lit(t) + adj
    } ++ dupThresholds.map { case (n, t) =>
      col(s"dup${n}_frac") <= lit(t) + adj
    }).reduce(_ && _)

  /** SQL for one language-adjusted threshold. The `t + adj` sum is
    * computed HERE, in Scala, as the same IEEE double add the engine
    * performs (`lit(t) + adj`), and printed as its shortest
    * round-trip decimal (Double.toString) — e.g. t=0.18, adj=0.05
    * emits 0.22999999999999998, NOT `0.18 + adj`. Emitting the sum as
    * a SQL `+` would let DuckDB add exact DECIMALs, which lands one
    * ulp away from the IEEE sum for several (t, adj) pairs and flips
    * the keep verdict on boundary fractions (the oracle-parity rule:
    * build SQL thresholds from the same IEEE ops). */
  private def adjustedThresholdSql(t: Double, langExpr: String): String =
    if (langAdjust.isEmpty) t.toString
    else "CASE " + langAdjust.toSeq.sorted.map { case (l, a) =>
      s"WHEN $langExpr = '$l' THEN ${t + a}"
    }.mkString(" ") + s" ELSE $t END"

  /** DuckDB replay of [[keepWithAdjust]] over columns named like the
    * report's, generated from the same threshold tables. Takes the
    * LANGUAGE expression (not a precomputed `adj` column) so every
    * per-language threshold can be emitted as a precomputed IEEE
    * double literal — see [[adjustedThresholdSql]]. */
  def keepWithAdjustSql(langExpr: String): String =
    (topThresholds.map { case (n, t) =>
      s"top${n}_frac <= ${adjustedThresholdSql(t, langExpr)}"
    } ++ dupThresholds.map { case (n, t) =>
      s"dup${n}_frac <= ${adjustedThresholdSql(t, langExpr)}"
    }).mkString(" AND ")

  private def fracCol(chars: Column, total: Column): Column =
    when(total > 0, chars.cast("double") / total.cast("double"))
      .otherwise(lit(0.0))

  /** Per-document repetition report. Output: the id column, one
    * `top<n>_frac` per top window size, one `dup<n>_frac` per dup
    * window size, and `gopher_keep` (1 when every fraction is at or
    * under its threshold). One row per input document, including
    * documents too short to form any gram (all-zero fractions).
    *
    * Every Gopher signal is PER-DOCUMENT, so the whole report is one
    * zero-shuffle projection: [[graft.plans.GopherStatsExpr]] computes
    * all nine numerators in a single pass over each text (the plan is
    * scan → project, nothing else — the distributed groupBy form this
    * replaced shuffled 708 MiB of gram strings at g1.0 for identical
    * per-doc answers; it survives as [[reportViaShuffle]], the parity
    * reference GopherRepetitionSpec checks value-for-value). */
  def report(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val topNs = topThresholds.map(_._1)
    val dupNs = dupThresholds.map(_._1)
    val base = docs.select(
      col(idCol),
      length(col(textCol)).as("_total"),
      graft.plans.TextHashNative
        .gopherStats(col(textCol), topNs, dupNs).as("_s"))
    val fracs =
      topNs.map { n =>
        fracCol(coalesce(col(s"_s.top$n"), lit(0L)), col("_total"))
          .as(s"top${n}_frac")
      } ++ dupNs.map { n =>
        fracCol(coalesce(col(s"_s.dup$n"), lit(0L)), col("_total"))
          .as(s"dup${n}_frac")
      }
    val keep = (topThresholds.map { case (n, t) =>
      col(s"top${n}_frac") <= t
    } ++ dupThresholds.map { case (n, t) =>
      col(s"dup${n}_frac") <= t
    }).reduce(_ && _)
    base
      .select(col(idCol) +: fracs: _*)
      .withColumn("gopher_keep", when(keep, 1).otherwise(0))
  }

  /** The distributed groupBy form of [[report]] — value-identical, kept
    * as the parity reference for GopherRepetitionSpec (and as the shape
    * a version of this operator would take if per-doc texts ever
    * exceeded executor memory, which whole-document rows already
    * preclude elsewhere). */
  private[graft] def reportViaShuffle(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ns = topThresholds.map(_._1) ++ dupThresholds.map(_._1)
    val base = docs.select(
      col(idCol).as("_id"),
      split(col(textCol), " ").as("_toks"),
      length(col(textCol)).as("_total"))
    // (doc, n, gram) occurrences — the single corpus-sized explode.
    // sequence() is guarded (size ≥ n) because Spark's sequence(1, k)
    // DESCENDS for k < 1 instead of returning empty.
    val grams = base
      .select(col("_id"), col("_toks"),
        explode(lit(ns.toArray)).as("_n"))
      .select(col("_id"), col("_n"),
        explode(when(size(col("_toks")) >= col("_n"),
          transform(
            sequence(lit(1), size(col("_toks")) - col("_n") + 1),
            i => array_join(slice(col("_toks"), i, col("_n")), " ")))
          .otherwise(array().cast("array<string>"))).as("_gram"))
    // exact integer char mass per distinct gram (map-side combined)
    val gramCounts = grams
      .groupBy(col("_id"), col("_n"), col("_gram"))
      .agg(count(lit(1)).as("_cnt"))
      .withColumn("_len", length(col("_gram")).cast("long"))
    // per (doc, n): the top gram's char mass by the (cnt, len) order,
    // and the duplicated-gram char mass. The pair packs into ONE
    // BIGNIT-comparable long (cnt·2²⁰ + len) so the fold stays a
    // codegen'd HashAggregate — max(struct(...)) would fall to a
    // SortAggregate over the largest intermediate. Sound because the
    // output never names the gram (only cnt·len of the chosen one),
    // so any gram achieving the maximal (cnt, len) yields the same
    // fraction; bounds: cnt < 2⁴³ occurrences per (doc, gram) is
    // doc-local and safe, while len CLAMPS to the 20-bit width so a
    // single ≥1M-char token cannot carry into the cnt bits (same
    // clamp in GopherStatsExpr and oracleCore).
    val packedTop =
      max(col("_cnt") * lit(1L << 20) + least(col("_len"), lit((1L << 20) - 1L)))
    val perN = gramCounts
      .groupBy(col("_id"), col("_n"))
      .agg(
        packedTop.as("_topkey"),
        sum(when(col("_cnt") >= 2, col("_cnt") * col("_len"))
          .otherwise(lit(0L))).as("_dup_chars"))
      .select(col("_id"), col("_n"),
        (shiftright(col("_topkey"), 20) *
          (col("_topkey") % lit(1L << 20))).as("_top_chars"),
        col("_dup_chars"))
    // ≤ 9 rows per doc reach this fold; missing n (short doc) → 0
    val perDocAggs = topThresholds.map { case (n, _) =>
      sum(when(col("_n") === n, col("_top_chars")).otherwise(lit(0L)))
        .as(s"_top${n}_chars")
    } ++ dupThresholds.map { case (n, _) =>
      sum(when(col("_n") === n, col("_dup_chars")).otherwise(lit(0L)))
        .as(s"_dup${n}_chars")
    }
    val perDoc = perN.groupBy(col("_id"))
      .agg(perDocAggs.head, perDocAggs.tail: _*)
    val joined = base.select(col("_id"), col("_total"))
      .join(perDoc, Seq("_id"), "left")
    val fracs =
      topThresholds.map { case (n, _) =>
        fracCol(coalesce(col(s"_top${n}_chars"), lit(0L)), col("_total"))
          .as(s"top${n}_frac")
      } ++ dupThresholds.map { case (n, _) =>
        fracCol(coalesce(col(s"_dup${n}_chars"), lit(0L)), col("_total"))
          .as(s"dup${n}_frac")
      }
    val keep = (topThresholds.map { case (n, t) =>
      col(s"top${n}_frac") <= t
    } ++ dupThresholds.map { case (n, t) =>
      col(s"dup${n}_frac") <= t
    }).reduce(_ && _)
    joined
      .select(col("_id").as(idCol) +: fracs: _*)
      .withColumn("gopher_keep", when(keep, 1).otherwise(0))
  }

  /** The unrolled ANSI SQL equivalent of [[report]], generated from
    * the same threshold tables that drive the engine (the
    * generate-oracles-from-the-loop-code discipline): a DuckDB-
    * runnable replay over a `documents` view with (idCol, textCol).
    * Kept adjacent to the implementation so a threshold change cannot
    * drift between the two. */
  def oracleSql(idCol: String, textCol: String): String =
    s"${oracleCore(idCol, textCol)}\nORDER BY $idCol"

  /** [[oracleSql]] without the final ORDER BY — embeddable as a CTE
    * body by downstream report queries. */
  def oracleCore(idCol: String, textCol: String): String = {
    val ns = (topThresholds.map(_._1) ++ dupThresholds.map(_._1))
      .map(n => s"($n)").mkString(",")
    val topCols = topThresholds.map { case (n, _) =>
      s"COALESCE(MAX(CASE WHEN p.n = $n THEN p.top_chars END), 0) AS top${n}_chars"
    }
    val dupCols = dupThresholds.map { case (n, _) =>
      s"COALESCE(MAX(CASE WHEN p.n = $n THEN p.dup_chars END), 0) AS dup${n}_chars"
    }
    val fracCols = topThresholds.map { case (n, _) =>
      s"CASE WHEN total_chars > 0 THEN CAST(top${n}_chars AS DOUBLE) / total_chars ELSE 0.0 END AS top${n}_frac"
    } ++ dupThresholds.map { case (n, _) =>
      s"CASE WHEN total_chars > 0 THEN CAST(dup${n}_chars AS DOUBLE) / total_chars ELSE 0.0 END AS dup${n}_frac"
    }
    val keepPred = (topThresholds.map { case (n, t) =>
      s"top${n}_frac <= $t"
    } ++ dupThresholds.map { case (n, t) =>
      s"dup${n}_frac <= $t"
    }).mkString(" AND ")
    s"""WITH toks AS (
       |  SELECT $idCol AS id, string_split($textCol, ' ') AS ts,
       |         length($textCol) AS total_chars
       |  FROM documents),
       |grams AS (
       |  -- the lateral references only t (positions 1..len); the
       |  -- window sizes attach with a WHERE guard — DuckDB's binder
       |  -- rejects a lateral range() expression over two tables
       |  SELECT t.id, w.n,
       |         array_to_string(list_slice(t.ts, i.i, i.i + w.n - 1), ' ') AS gram
       |  FROM toks t
       |  CROSS JOIN LATERAL (
       |    SELECT unnest(range(1, len(t.ts) + 1)) AS i) AS i(i)
       |  CROSS JOIN (VALUES $ns) AS w(n)
       |  WHERE i.i + w.n - 1 <= len(t.ts)),
       |gc AS (
       |  SELECT id, n, gram, COUNT(*) AS cnt,
       |         CAST(length(gram) AS BIGINT) AS glen
       |  FROM grams GROUP BY id, n, gram),
       |per_n AS (
       |  -- the engine's packed (cnt, len) lexicographic max: the top
       |  -- fraction only uses cnt*len of the maximal pair, never the
       |  -- gram itself; len clamps to the 20-bit pack width exactly
       |  -- as GopherStatsExpr / reportViaShuffle do
       |  SELECT id, n,
       |         (MAX(cnt * 1048576 + LEAST(glen, 1048575)) // 1048576)
       |           * (MAX(cnt * 1048576 + LEAST(glen, 1048575)) % 1048576) AS top_chars,
       |         COALESCE(SUM(CASE WHEN cnt >= 2 THEN cnt * glen ELSE 0 END), 0) AS dup_chars
       |  FROM gc GROUP BY id, n),
       |per_doc AS (
       |  SELECT t.id, t.total_chars,
       |         ${(topCols ++ dupCols).mkString(",\n         ")}
       |  FROM toks t LEFT JOIN per_n p ON p.id = t.id
       |  GROUP BY t.id, t.total_chars),
       |fracs AS (
       |  SELECT id,
       |         ${fracCols.mkString(",\n         ")}
       |  FROM per_doc)
       |SELECT id AS $idCol,
       |       ${(topThresholds.map(t => s"top${t._1}_frac") ++
                  dupThresholds.map(t => s"dup${t._1}_frac")).mkString(", ")},
       |       CASE WHEN $keepPred THEN 1 ELSE 0 END AS gopher_keep
       |FROM fracs""".stripMargin
  }
}
