package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Registrable-domain ("eTLD+1") extraction against a bundled snapshot
  * of the Mozilla Public Suffix List (publicsuffix.org — public
  * knowledge; the list itself is MPL-2.0 and the ALGORITHM is spec'd on
  * the site): the public suffix of a host is its LONGEST matching
  * rule, an exception rule (`!www.ck`) beats a wildcard (`*.ck`), and
  * an unlisted last label falls back to the implicit default rule `*`
  * (one label). The registrable domain is the public suffix plus one
  * label; a host that IS a public suffix (`co.uk`, `localhost`) passes
  * through unchanged — callers treat it as its own site.
  *
  * Why this exists (reference README.md:33 raw-log curation analogue):
  * the last-two-labels heuristic this replaces folded every
  * ccTLD-registered site into one "domain" (`a.b.co.uk` → `co.uk`),
  * which made per-domain corpus-mix reports actively misleading on a
  * real crawl. With the PSL match, `a.b.co.uk` → `b.co.uk` and each
  * `github.io` / `blogspot.com` tenant is its own site — the
  * granularity corpus mixing decisions actually need.
  *
  * SNAPSHOT SCOPE (documented approximation, swap-in friendly): the
  * full PSL is ~9k rules; this snapshot carries the rules that change
  * the answer vs the default-rule fallback — the common ICANN
  * second-level registrations (co.uk, com.au, …), the TLD-level
  * wildcards (`*.bd`, `*.ck`, …) with their one exception (`!www.ck`),
  * one exemplary 3-label rule (s3.amazonaws.com) and the high-traffic
  * private-section hosters (github.io, blogspot.com, …). Single-label
  * public suffixes (com, net, io, …) need no listing: the default rule
  * already yields one label for them. To swap in a fuller snapshot,
  * extend these Seqs — the Column logic and the generated oracle SQL
  * both derive from them (the generate-the-oracle-from-the-engine-
  * tables discipline, so list and replay cannot drift).
  *
  * Scale shape: a PURE PROJECTION — the rule sets compile into
  * Catalyst `InSet` membership tests over the host's last 1–3 labels
  * (O(1) hash probes in codegen), no join, no shuffle, no UDF. A
  * broadcast-join variant would only pay off for a runtime-supplied
  * list too large to inline; at PSL scale (~9k strings) InSet still
  * wins.
  */
object PublicSuffix {

  /** Two-label rules: ICANN second-level registrations + notable
    * private-section hosters (each tenant is its own site). */
  val rules2: Seq[String] = Seq(
    // ICANN: United Kingdom
    "co.uk", "org.uk", "me.uk", "ltd.uk", "plc.uk", "net.uk", "sch.uk",
    "ac.uk", "gov.uk", "nhs.uk", "police.uk",
    // Australia
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    // New Zealand
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    "gen.nz", "geek.nz", "maori.nz",
    // Japan
    "co.jp", "ne.jp", "or.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp",
    "gr.jp", "lg.jp",
    // Brazil
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    // China
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    // India
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    // Mexico
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    // South Africa
    "co.za", "net.za", "org.za", "gov.za", "web.za", "ac.za",
    // Singapore
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg",
    // Türkiye
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr",
    // South Korea
    "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr", "ac.kr",
    // Taiwan
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw",
    // Hong Kong
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk",
    // Malaysia
    "com.my", "net.my", "org.my", "gov.my", "edu.my",
    // Argentina
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar",
    // Colombia / Peru / Venezuela
    "com.co", "net.co", "org.co", "com.pe", "net.pe", "org.pe", "com.ve",
    // Egypt / Saudi Arabia / Pakistan / Philippines / Vietnam
    "com.eg", "com.sa", "com.pk", "com.ph", "com.vn",
    // Ukraine
    "com.ua", "in.ua",
    // Israel
    "co.il", "org.il", "net.il", "ac.il", "gov.il",
    // Thailand
    "co.th", "ac.th", "go.th", "or.th", "net.th",
    // Indonesia
    "co.id", "or.id", "ac.id", "go.id", "web.id",
    // Kenya / Nigeria / Ghana / Tanzania
    "co.ke", "or.ke", "com.ng", "org.ng", "com.gh", "co.tz",
    // Nepal / Sri Lanka
    "com.np", "com.lk",
    // private section (hosting platforms — every tenant its own site)
    "github.io", "gitlab.io", "blogspot.com", "appspot.com",
    "herokuapp.com", "netlify.app", "vercel.app", "web.app",
    "firebaseapp.com", "azurewebsites.net", "cloudfront.net",
    "wixsite.com", "pages.dev", "workers.dev", "readthedocs.io",
    "onrender.com", "surge.sh", "neocities.org")

  /** Three-label rules (private section exemplar). */
  val rules3: Seq[String] = Seq("s3.amazonaws.com")

  /** TLD-level wildcard rules `*.tld`: EVERY direct child of the TLD
    * is a public suffix. */
  val wildcardTlds: Seq[String] = Seq("bd", "ck", "er", "fk", "jm", "kh", "mm")

  /** Exception rules `!host` (all two-label in the snapshot): the
    * named host is NOT a public suffix despite a matching wildcard —
    * its public suffix is the rule minus its leftmost label. */
  val exceptions2: Seq[String] = Seq("www.ck")

  /** Number of labels in the host's public suffix, per the PSL
    * algorithm (exception > longest rule > wildcard > default). */
  def publicSuffixLabels(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    // short arrays: Spark's slice past the front returns empty →
    // "" / a dotless string, which no multi-label rule can match
    val suf2 = array_join(slice(labels, -2, 2), ".")
    val suf3 = array_join(slice(labels, -3, 3), ".")
    val last1 = element_at(labels, -1)
    when(suf2.isin(exceptions2: _*), lit(1))
      .when(suf3.isin(rules3: _*), lit(3))
      .when(last1.isin(wildcardTlds: _*) && n >= 2, lit(2))
      .when(suf2.isin(rules2: _*), lit(2))
      .otherwise(lit(1))
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
    xs.map(s => s"'$s'").mkString(", ")

  /** DuckDB replay of [[publicSuffixLabels]], generated from the SAME
    * rule Seqs (list and oracle cannot drift). `suf2`/`suf3`/`last1`/
    * `len` are SQL expressions the caller provides. */
  def publicSuffixLabelsSql(
      suf2: String, suf3: String, last1: String, len: String): String =
    s"""CASE WHEN $suf2 IN (${inList(exceptions2)}) THEN 1
       |     WHEN $suf3 IN (${inList(rules3)}) THEN 3
       |     WHEN $last1 IN (${inList(wildcardTlds)}) AND $len >= 2 THEN 2
       |     WHEN $suf2 IN (${inList(rules2)}) THEN 2
       |     ELSE 1 END""".stripMargin

  /** A SELECT over `src` (a CTE name / subquery alias) that adds a
    * `domain` column — the full DuckDB replay of
    * [[registrableDomain]] applied to `hostCol`. DuckDB's list_slice
    * clamps out-of-range negative starts, so short hosts yield
    * dotless suffix strings no multi-label rule matches — same net
    * behavior as the Spark side's empty-slice guard. */
  def domainSqlSelect(src: String, hostCol: String): String = {
    val plen = publicSuffixLabelsSql(
      s"array_to_string(list_slice(_ls, -2, -1), '.')",
      s"array_to_string(list_slice(_ls, -3, -1), '.')",
      "_ls[-1]", "len(_ls)")
    s"""SELECT * EXCLUDE (_ls, _plen),
       |       CASE WHEN len(_ls) <= _plen THEN $hostCol
       |            ELSE array_to_string(list_slice(_ls, -(_plen + 1), -1), '.')
       |       END AS domain
       |FROM (SELECT *, $plen AS _plen
       |      FROM (SELECT *, string_split($hostCol, '.') AS _ls FROM $src))""".stripMargin
  }
}
