package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Host/domain-level web-corpus curation — the C4/RefinedWeb-style
  * cleaning steps a 100 TB crawl pipeline runs before any text-level
  * dedup (reference README.md:102 "training data preparation"; the
  * steps themselves are public knowledge from Raffel et al. 2020 (C4)
  * and Penedo et al. 2023 (RefinedWeb)): URL canonicalization, host /
  * registrable-domain extraction, per-domain quota capping (so no
  * single site dominates the corpus), host blocklist removal, and the
  * per-domain composition report that drives mixing decisions.
  *
  * Scale shape: normalization/extraction are PURE PROJECTIONS built
  * from codegen'd builtins (regexp + array HOFs — no UDF, no shuffle).
  * The quota cap is a salted exact top-k per host — two bounded
  * windows instead of one per-host sort, so a hot host (billions of
  * pages on one domain is the NORM in web crawls) spreads over
  * `salts` tasks in the first pass and the second pass sees ≤
  * quota·salts rows per host. Blocklists broadcast (they are
  * host-cardinality, not page-cardinality). The composition report is
  * one map-side-combining groupBy.
  *
  * URL grammar handled: scheme://host[:port][/path][?query][#fragment]
  * (the crawl-relevant subset — no userinfo, no relative refs).
  * Canonical form: lowercase scheme + host, `www.` prefix dropped,
  * default ports (http:80, https:443) dropped, fragment dropped,
  * tracking params (utm_*, gclid, fbclid, ref) dropped, remaining
  * query params sorted bytewise, trailing slashes stripped from the
  * path (so `https://h/` ≡ `https://h`). Deterministic, so the full
  * normalized column hash-oracles.
  */
object WebCuration {

  private val schemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val hostRe   = "^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)"
  private val portRe   = "^[A-Za-z][A-Za-z0-9+.-]*://[^/:?#]+:([0-9]+)"
  private val pathRe   = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
  private val queryRe  = "\\?([^#]*)"

  /** Lowercased scheme ("" when the value is not URL-shaped). */
  def schemeOf(url: Column): Column = lower(regexp_extract(url, schemeRe, 1))

  /** Lowercased host with any leading `www.` stripped. */
  def hostOf(url: Column): Column =
    regexp_replace(lower(regexp_extract(url, hostRe, 1)), "^www\\.", "")

  /** Registrable domain ("eTLD+1") against the bundled FULL
    * public-suffix list: `a.b.co.uk` → `b.co.uk`, each `github.io`
    * tenant its own site, hosts that ARE public suffixes (and
    * `localhost`) pass through unchanged. One native probe against
    * static shared rule sets ([[graft.plans.RegistrableDomainExpr]] —
    * the full-list InSet literals cost ~1.1 s of plan build per query;
    * [[PublicSuffix.registrableDomain]] stays as the spec-pinned
    * Column parity form). No join, no shuffle. (Replaces the
    * last-two-labels heuristic that folded every ccTLD-registered
    * site into one "domain".) */
  def domainOf(host: Column): Column =
    graft.plans.RegistrableDomainExpr.domain(host)

  /** Canonical URL string (see class doc for the exact rules). Rows
    * that do not parse as scheme://host... normalize to NULL — the
    * caller decides whether unparseable means drop or keep-raw. */
  def normalizeUrl(url: Column): Column = {
    val scheme = schemeOf(url)
    val host = hostOf(url)
    val port = regexp_extract(url, portRe, 1)
    val path = regexp_extract(url, pathRe, 1)
    val query = regexp_extract(url, queryRe, 1)
    val keepPort = port =!= "" &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    val cleanPath = regexp_replace(path, "/+$", "")
    val keptParams = array_sort(filter(split(query, "&"),
      p => p =!= "" && !p.rlike("^(utm_[^=]*|gclid|fbclid|ref)(=|$)")))
    val cleanQuery = array_join(keptParams, "&")
    when(scheme === "" || host === "", lit(null).cast("string"))
      .otherwise(concat(
        scheme, lit("://"), host,
        when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
        cleanPath,
        when(cleanQuery =!= "", concat(lit("?"), cleanQuery))
          .otherwise(lit(""))))
  }

  /** Exact top-`k` rows per group by ascending `priority` (ties broken
    * by `tiebreak`, which must be unique within a group for a
    * deterministic result) — computed SKEW-SAFE: a first ROW_NUMBER
    * over (group, salt) keeps ≤ k per salt (the global top-k of a
    * group is a subset of the union of its per-salt top-k's), so the
    * second, exact window sees ≤ k·salts rows per group no matter how
    * many billions of rows the hottest group has. */
  def topKPerGroup(df: DataFrame, group: Column, priority: Column,
      tiebreak: Column, k: Int, salts: Int = 16): DataFrame = {
    require(k > 0 && salts > 0, "k and salts must be positive")
    val salted = df
      .withColumn("_grp", group).withColumn("_prio", priority)
      .withColumn("_tie", tiebreak)
      .withColumn("_salt", pmod(xxhash64(lit("quota"), tiebreak), lit(salts)))
    val pre = salted
      .withColumn("_rn1", row_number().over(Window
        .partitionBy(col("_grp"), col("_salt"))
        .orderBy(col("_prio"), col("_tie"))))
      .filter(col("_rn1") <= k).drop("_rn1", "_salt")
    pre
      .withColumn("keep_rank", row_number().over(Window
        .partitionBy(col("_grp")).orderBy(col("_prio"), col("_tie"))))
      .filter(col("keep_rank") <= k)
      .drop("_grp", "_prio", "_tie")
  }

  /** Per-domain quota cap: keep at most `quota` rows per `host`,
    * chosen by the engine-portable md5 priority over `key` (so the
    * kept set is a deterministic pseudo-random sample, identical on
    * any cluster at any partition count, and replayable in ANSI SQL:
    * ORDER BY md5(CAST(key AS VARCHAR)), key). Adds `keep_rank`
    * (1-based position within the host's kept set). */
  def domainQuota(df: DataFrame, host: Column, key: Column,
      quota: Int): DataFrame =
    topKPerGroup(df, host, md5(key.cast("string")), key, quota)

  /** Remove rows whose `host` appears in `blocklist` (a one-column
    * DataFrame of hosts). Blocklists are host-cardinality — always
    * broadcast, one equi left-anti join, no shuffle of the corpus. */
  def blockHosts(df: DataFrame, host: Column, blocklist: DataFrame): DataFrame = {
    val b = blocklist.toDF("_blocked_host")
    df.join(broadcast(b), host === col("_blocked_host"), "left_anti")
  }

  /** License-marker class detected from page markup/text — the
    * C4/LAION-class licensing heuristic, reduced to its public core:
    * Creative-Commons license URLs (the machine-readable marker
    * rel="license" links point at) classify as `cc-<variant>` /
    * `cc0`; a plain-text "all rights reserved" marks the page
    * explicitly non-permissive (`arr`); anything else is `unknown`
    * (most of the web declares nothing). CC URLs beat text markers —
    * a CC-licensed page may still carry a site-chrome "all rights
    * reserved" footer. Pure codegen projection, case-insensitive. */
  def licenseOf(text: Column): Column = {
    val t = lower(text)
    when(t.rlike("creativecommons\\.org/publicdomain"), lit("cc0"))
      .when(t.rlike("creativecommons\\.org/licenses/"),
        concat(lit("cc-"),
          regexp_extract(t, "creativecommons\\.org/licenses/([a-z-]+)/", 1)))
      .when(t.rlike("all rights reserved"), lit("arr"))
      .otherwise(lit("unknown"))
  }

  /** TRUE when a robots.txt body disallows the WHOLE site for all
    * agents: some `User-agent: *` group contains a bare `Disallow: /`.
    * (The robots-exclusion subset a corpus-level host-policy gate
    * needs — path-level rules are a fetch-time concern.) Implemented
    * as a single-pass line fold with `functions.aggregate` (codegen,
    * no UDF): state = (currently inside a `*` group, full-site
    * disallow seen). Group semantics are honored — a `Disallow: /`
    * under `User-agent: badbot` does NOT disallow the site for
    * everyone else. */
  def robotsDisallowAll(robots: Column): Column = {
    val lines = split(robots, "\n")
    val folded = aggregate(
      lines,
      struct(lit(false).as("star"), lit(false).as("deny")),
      (st, raw) => {
        val l = lower(trim(raw))
        val isAgent = substring(l, 1, 11) === "user-agent:"
        val agentStar = trim(substring(l, 12, Int.MaxValue)) === "*"
        val isDenyAll = l.rlike("^disallow:\\s*/$")
        struct(
          when(isAgent, agentStar).otherwise(st.getField("star")).as("star"),
          (st.getField("deny") ||
            (st.getField("star") && isDenyAll)).as("deny"))
      })
    folded.getField("deny")
  }

  /** Remove rows whose `host`'s robots.txt disallows the whole site:
    * evaluate [[robotsDisallowAll]] over the (host, robots_txt) policy
    * table — host-cardinality, never corpus-cardinality — and
    * broadcast anti-join the denied hosts. */
  def allowedByRobots(df: DataFrame, host: Column,
      robotsTable: DataFrame, robotsHost: Column,
      robotsTxt: Column): DataFrame = {
    val denied = robotsTable
      .filter(robotsDisallowAll(robotsTxt))
      .select(robotsHost.as("_denied_host"))
    df.join(broadcast(denied), host === col("_denied_host"), "left_anti")
  }

  /** Per-domain composition report: doc count, total chars, distinct
    * languages, and share of docs in `langValue` — one
    * map-side-combining groupBy over the registrable domain. */
  def domainComposition(df: DataFrame, host: Column, chars: Column,
      lang: Column, langValue: String): DataFrame =
    df.groupBy(domainOf(host).as("domain"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(chars).cast("long").as("total_chars"),
        countDistinct(lang).as("n_langs"),
        (sum(when(lang === langValue, 1).otherwise(0)).cast("double") /
          count(lit(1)).cast("double")).as(s"${langValue}_share"))
}
