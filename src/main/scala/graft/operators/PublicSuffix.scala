package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Registrable-domain ("eTLD+1") extraction against the FULL Mozilla
  * Public Suffix List (publicsuffix.org — public knowledge; the list
  * is MPL-2.0 and the ALGORITHM is spec'd on the site): the public
  * suffix of a host is its LONGEST matching rule, an exception rule
  * (`!www.ck`) beats every other match, a wildcard label (`*.ck`)
  * matches exactly one host label, and a host whose last label matches
  * no rule falls back to the implicit default rule `*` (one label).
  * The registrable domain is the public suffix plus one label; a host
  * that IS a public suffix (`co.uk`, `localhost`) passes through
  * unchanged — callers treat it as its own site.
  *
  * Why this exists (reference README.md:33 raw-log curation analogue):
  * the last-two-labels heuristic this replaces folded every
  * ccTLD-registered site into one "domain" (`a.b.co.uk` → `co.uk`),
  * which made per-domain corpus-mix reports actively misleading on a
  * real crawl. With the PSL match, `a.b.co.uk` → `b.co.uk` and each
  * `github.io` / `blogspot.com` tenant is its own site — the
  * granularity corpus mixing decisions actually need.
  *
  * RULE SOURCE: the complete published snapshot, bundled verbatim as
  * the classpath resource `graft/public_suffix_list.dat` (the Debian
  * `publicsuffix` package's copy of publicsuffix.org's list; its
  * MPL-2.0 header travels with the file) and parsed once at class
  * load: ~9.5k rules — every multi-label exact rule (2–5 labels,
  * ICANN + private sections), every wildcard (`*.` base of 1–4
  * labels) and all 8 exception rules. Single-label exact rules (com,
  * net, io, …) are provably answer-neutral — the default rule already
  * yields one label — and are dropped at parse time. Internationalized
  * rules are carried in BOTH the list's unicode form and the
  * punycode (`xn--`) form hosts actually arrive in (java.net.IDN —
  * public JDK API), so either host encoding matches.
  *
  * Scale shape: a PURE PROJECTION — the rule sets compile into
  * Catalyst `InSet` membership tests over the host's last 1–5 labels
  * (O(1) hash probes in codegen), no join, no shuffle, no UDF. A
  * broadcast-join variant would only pay off for a runtime-supplied
  * list too large to inline; at PSL scale (~10k strings) InSet wins.
  * The oracle SQL is GENERATED from the same parsed rule sets
  * (generate-the-oracle-from-the-engine-tables discipline), so list
  * and replay cannot drift.
  */
object PublicSuffix {

  /** Unicode + punycode forms of a rule (leading `!`/`*.` stripped by
    * the caller). IDN conversion is total on the published list; a
    * label the JDK cannot map keeps its unicode form only. */
  private def idnForms(rule: String): Seq[String] = {
    val ascii =
      try java.net.IDN.toASCII(rule, java.net.IDN.ALLOW_UNASSIGNED)
        .toLowerCase
      catch { case _: IllegalArgumentException => rule }
    if (ascii == rule) Seq(rule) else Seq(rule, ascii)
  }

  private def labelCount(s: String): Int = s.count(_ == '.') + 1

  /** The parsed snapshot: (exact rules with ≥2 labels, wildcard rule
    * BASES — the part after `*.` — and exception rules WITHOUT the
    * `!`), each deduped across unicode/punycode forms. */
  private val (exactRules, wildcardBases, exceptionRules):
      (Seq[String], Seq[String], Seq[String]) = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_list.dat")
    require(in != null, "bundled public_suffix_list.dat missing")
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
      finally in.close()
    // spec: ignore blank lines and comments; a rule is the token up
    // to the first whitespace, matched case-insensitively
    val rules = lines.iterator.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("//"))
      .map(_.split("\\s+")(0).toLowerCase).toVector
    val (exc, rest) = rules.partition(_.startsWith("!"))
    val (wild, exact) = rest.partition(_.startsWith("*."))
    def forms(rs: Seq[String]): Seq[String] =
      rs.flatMap(idnForms).distinct
    (forms(exact).filter(_.contains(".")), // 1-label = default-rule-equivalent
      forms(wild.map(_.drop(2))),
      forms(exc.map(_.tail)))
  }

  /** Exact rules grouped by label count, longest first (2..5). */
  val exactByLen: Seq[(Int, Seq[String])] =
    exactRules.groupBy(labelCount).toSeq.sortBy(-_._1)

  /** Wildcard bases grouped by label count (base of `*.X`; effective
    * rule length = base length + 1). */
  val wildcardByLen: Seq[(Int, Seq[String])] =
    wildcardBases.groupBy(labelCount).toSeq.sortBy(-_._1)

  /** Exception rules grouped by label count; a matching exception's
    * public suffix is the rule minus its leftmost label. */
  val exceptionsByLen: Seq[(Int, Seq[String])] =
    exceptionRules.groupBy(labelCount).toSeq.sortBy(-_._1)

  /** Deepest suffix the matcher ever inspects. */
  val maxRuleLabels: Int =
    (exactByLen.map(_._1) ++ wildcardByLen.map(_._1 + 1) ++
      exceptionsByLen.map(_._1)).max

  /** Number of labels in the host's public suffix, per the PSL
    * algorithm (exception > longest rule > default). The CASE chain
    * checks exceptions first, then every effective rule length from
    * [[maxRuleLabels]] down to 2 (exact rules of length m alongside
    * wildcards with base length m-1 — both yield m, so intra-length
    * order is immaterial). */
  def publicSuffixLabels(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    // short arrays: Spark's slice past the front returns empty →
    // "" / a dotless string, which no multi-label rule can match
    def suf(k: Int): Column =
      if (k == 1) element_at(labels, -1)
      else array_join(slice(labels, -k, k), ".")
    val excBranches = exceptionsByLen.map { case (e, rs) =>
      (suf(e).isin(rs: _*), lit(e - 1))
    }
    val lenBranches = (maxRuleLabels to 2 by -1).flatMap { m =>
      exactByLen.collect { case (`m`, rs) =>
        (suf(m).isin(rs: _*), lit(m))
      } ++ wildcardByLen.collect { case (w, rs) if w == m - 1 =>
        (suf(w).isin(rs: _*) && n >= m, lit(m))
      }
    }
    (excBranches ++ lenBranches)
      .foldRight(lit(1): Column) { case ((cond, v), rest) =>
        when(cond, v).otherwise(rest)
      }
  }

  /** Registrable domain (public suffix + one label); hosts that are
    * themselves public suffixes pass through unchanged. Input is
    * expected pre-lowercased (WebCuration.hostOf's contract). */
  def registrableDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val plen = publicSuffixLabels(host)
    when(n <= plen, host)
      .otherwise(array_join(slice(labels, (plen + 1) * -1, plen + 1), "."))
  }

  private def inList(xs: Seq[String]): String =
    xs.sorted.map(s => s"'$s'").mkString(", ")

  /** DuckDB replay of [[publicSuffixLabels]], generated from the SAME
    * parsed rule sets (list and oracle cannot drift). `suf(k)` is the
    * caller's SQL expression for the host's last-k-labels string and
    * `len` its label count. The IN-lists carry the full ~10k-rule
    * snapshot — DuckDB compiles them to hash probes just like InSet. */
  def publicSuffixLabelsSql(suf: Int => String, len: String): String = {
    val exc = exceptionsByLen.map { case (e, rs) =>
      s"WHEN ${suf(e)} IN (${inList(rs)}) THEN ${e - 1}"
    }
    val byLen = (maxRuleLabels to 2 by -1).flatMap { m =>
      exactByLen.collect { case (`m`, rs) =>
        s"WHEN ${suf(m)} IN (${inList(rs)}) THEN $m"
      } ++ wildcardByLen.collect { case (w, rs) if w == m - 1 =>
        s"WHEN ${suf(w)} IN (${inList(rs)}) AND $len >= $m THEN $m"
      }
    }
    (Seq("CASE") ++ exc ++ byLen ++ Seq("ELSE 1 END")).mkString("\n")
  }

  /** A SELECT over `src` (a CTE name / subquery alias) that adds a
    * `domain` column — the full DuckDB replay of
    * [[registrableDomain]] applied to `hostCol`. DuckDB's list_slice
    * clamps out-of-range negative starts, so short hosts yield
    * dotless suffix strings no multi-label rule matches — same net
    * behavior as the Spark side's empty-slice guard. */
  def domainSqlSelect(src: String, hostCol: String): String = {
    val plen = publicSuffixLabelsSql(
      k => s"array_to_string(list_slice(_ls, -$k, -1), '.')", "len(_ls)")
    s"""SELECT * EXCLUDE (_ls, _plen),
       |       CASE WHEN len(_ls) <= _plen THEN $hostCol
       |            ELSE array_to_string(list_slice(_ls, -(_plen + 1), -1), '.')
       |       END AS domain
       |FROM (SELECT *, $plen AS _plen
       |      FROM (SELECT *, string_split($hostCol, '.') AS _ls FROM $src))""".stripMargin
  }
}
