package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.WebCuration

/** Host/domain-level web-curation surface ([[graft.operators.WebCuration]]
  * — the C4/RefinedWeb cleaning steps). The fixtures carry no URL
  * column, so each query SYNTHESIZES a deterministic messy URL from
  * (source, doc_id) — six variants exercising www-prefix, case, default
  * and non-default ports, trailing slash, fragments, tracking params
  * and unsorted params — then the Spark side PARSES and normalizes
  * while the oracle derives the expected canonical form independently
  * from the components it planted. The two derivations meeting at the
  * hash gate is a stronger check than replaying one parser twice.
  */
object WebQueries {

  /** The messy-URL synthesis, Spark side. Variant = doc_id % 8 —
    * variants 6 and 7 plant ccTLD second-level hosts so the PSL
    * registrable-domain match (not the old last-two-labels heuristic)
    * is what the oracles certify. Shared with the end-to-end curation
    * pipeline query. */
  private[queries] def messyUrl = {
    val id = col("doc_id").cast("string")
    val v = col("doc_id") % 8
    when(v === 0, concat(lit("https://www."), col("source"),
        lit(".example.com/docs/"), id))
      .when(v === 1, concat(lit("HTTPS://"), col("source"),
        lit(".Example.COM:443/docs/"), id, lit("/")))
      .when(v === 2, concat(lit("https://"), col("source"),
        lit(".example.com/docs/"), id, lit("?utm_source=feed&id="), id))
      .when(v === 3, concat(lit("http://docs."), col("source"),
        lit(".net:8080/d/"), id, lit("#frag")))
      .when(v === 4, concat(lit("https://"), col("source"),
        lit(".example.com/docs/"), id, lit("?b=2&a=1&ref=tw")))
      .when(v === 5, concat(lit("https://cdn."), col("source"),
        lit(".example.com/")))
      .when(v === 6, concat(lit("https://shop."), col("source"),
        lit(".co.uk/p/"), id))
      .otherwise(concat(lit("HTTP://"), col("source"),
        lit(".COM.AU/"), id, lit("/")))
  }

  /** URL canonicalization + host/domain extraction (pure projection —
    * the plan is scan → project, nothing else). The oracle constructs
    * the canonical string per variant rather than re-parsing, so a
    * parser bug on EITHER side breaks the hash. */
  private val urlNormalize = QuerySpec(
    "q_url_normalize",
    """WITH u AS (
      |  SELECT doc_id, source, doc_id % 8 AS v,
      |         CAST(doc_id AS VARCHAR) AS id FROM documents)
      |SELECT doc_id,
      |  CASE v
      |    WHEN 2 THEN 'https://' || source || '.example.com/docs/' || id || '?id=' || id
      |    WHEN 3 THEN 'http://docs.' || source || '.net:8080/d/' || id
      |    WHEN 4 THEN 'https://' || source || '.example.com/docs/' || id || '?a=1&b=2'
      |    WHEN 5 THEN 'https://cdn.' || source || '.example.com'
      |    WHEN 6 THEN 'https://shop.' || source || '.co.uk/p/' || id
      |    WHEN 7 THEN 'http://' || source || '.com.au/' || id
      |    ELSE 'https://' || source || '.example.com/docs/' || id
      |  END AS url_norm,
      |  CASE v
      |    WHEN 3 THEN 'docs.' || source || '.net'
      |    WHEN 5 THEN 'cdn.' || source || '.example.com'
      |    WHEN 6 THEN 'shop.' || source || '.co.uk'
      |    WHEN 7 THEN source || '.com.au'
      |    ELSE source || '.example.com'
      |  END AS host,
      |  CASE v
      |    WHEN 3 THEN source || '.net'
      |    WHEN 6 THEN source || '.co.uk'
      |    WHEN 7 THEN source || '.com.au'
      |    ELSE 'example.com'
      |  END AS domain
      |FROM u ORDER BY doc_id""".stripMargin) { (s, d) =>
    val url = messyUrl
    Tables.documents(s, d)
      .select(col("doc_id"),
        WebCuration.normalizeUrl(url).as("url_norm"),
        WebCuration.hostOf(url).as("host"),
        WebCuration.domainOf(WebCuration.hostOf(url)).as("domain"))
      .orderBy("doc_id")
  }

  /** Per-domain quota cap: ≤ 5 docs per host, selected by the
    * engine-portable md5(doc_id) priority — the skew-safe salted
    * top-k ([[WebCuration.topKPerGroup]]); the oracle is one plain
    * ROW_NUMBER, which must pick the identical set. */
  private val domainQuota = QuerySpec(
    "q_domain_quota",
    """WITH h AS (SELECT doc_id, source || '.example.com' AS host FROM documents),
      |r AS (SELECT host, doc_id,
      |        ROW_NUMBER() OVER (PARTITION BY host
      |          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS keep_rank
      |      FROM h)
      |SELECT host, doc_id, CAST(keep_rank AS BIGINT) AS keep_rank
      |FROM r WHERE keep_rank <= 5 ORDER BY host, keep_rank""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
      .withColumn("host", concat(col("source"), lit(".example.com")))
    WebCuration.domainQuota(docs, col("host"), col("doc_id"), quota = 5)
      .select(col("host"), col("doc_id"), col("keep_rank").cast("long"))
      .orderBy("host", "keep_rank")
  }

  /** Cross-snapshot crawl revisit ledger
    * ([[graft.operators.CrawlRevisit]]): three synthesized crawl
    * snapshots of the same URL universe — each doc visits 2 of the 3
    * snapshots, a planted quarter of the docs changes content at snap
    * 1 and/or snap 2 — are written/appended to the append-only visit
    * ledger, snapshot 1 is REDELIVERED (the fold must collapse it),
    * and the folded per-URL state (first/last seen, visit count,
    * latest content hash, observed change transitions) must hash-match
    * the oracle's from-scratch replay of the same planted arithmetic —
    * proving append ≡ rebuild and redelivery ≡ no-op through the gate.
    * Built once per (corpus, JVM) as a durable artifact
    * (q_st_minhash_ledger's cost model). */
  private val crawlRevisit = QuerySpec(
    "q_crawl_revisit",
    """WITH s AS (SELECT unnest(range(0, 3)) AS snap),
      |v AS (
      |  SELECT 'https://' || d.source || '.example.com/p/' ||
      |           CAST(d.doc_id AS VARCHAR) AS url,
      |         md5(d.text || '#' || CAST(
      |             (CASE WHEN s.snap >= 1 AND d.doc_id % 4 IN (1, 3)
      |                   THEN 1 ELSE 0 END)
      |           + (CASE WHEN s.snap >= 2 AND d.doc_id % 4 IN (2, 3)
      |                   THEN 1 ELSE 0 END) AS VARCHAR)) AS content_md5,
      |         s.snap AS snap
      |  FROM documents d CROSS JOIN s
      |  WHERE (d.doc_id + s.snap) % 3 <> 0),
      |w AS (SELECT *, lag(content_md5) OVER
      |        (PARTITION BY url ORDER BY snap) AS prev FROM v)
      |SELECT url,
      |       CAST(MIN(snap) AS BIGINT) AS first_seen,
      |       CAST(MAX(snap) AS BIGINT) AS last_seen,
      |       CAST(COUNT(*) AS BIGINT) AS n_visits,
      |       max_by(content_md5, snap) AS latest_md5,
      |       CAST(SUM(CASE WHEN prev IS NOT NULL AND prev <> content_md5
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_changes
      |FROM w GROUP BY url ORDER BY url""".stripMargin) { (s, d) =>
    import graft.operators.CrawlRevisit
    val docs = Tables.documents(s, d)
    def snapDf(i: Int) = {
      val m = pmod(col("doc_id"), lit(4))
      val rev =
        when(lit(i >= 1) && (m === 1 || m === 3), 1).otherwise(0) +
          when(lit(i >= 2) && (m === 2 || m === 3), 1).otherwise(0)
      docs.filter(pmod(col("doc_id") + i, lit(3)) =!= 0)
        .select(
          concat(lit("https://"), col("source"), lit(".example.com/p/"),
            col("doc_id").cast("string")).as("url"),
          concat(col("text"), lit("#"), rev.cast("string")).as("content"))
    }
    val root = graft.core.CacheGovernor.durableDir(s"crawl_revisit:$d") { dir =>
      val path = s"$dir/v1"
      CrawlRevisit.writeLedger(snapDf(0), col("url"), col("content"), 0L, path)
      CrawlRevisit.appendSnapshot(snapDf(1), col("url"), col("content"), 1L, path)
      CrawlRevisit.appendSnapshot(snapDf(2), col("url"), col("content"), 2L, path)
      // redelivered batch — the fold must make it a no-op
      CrawlRevisit.appendSnapshot(snapDf(1), col("url"), col("content"), 1L, path)
    }
    CrawlRevisit.revisitReport(CrawlRevisit.readVisits(s, s"$root/v1"))
      .orderBy("url")
  }

  /** Blocklist anti-join + per-domain composition report: drop two
    * blocked hosts (broadcast anti join), then group the survivors by
    * registrable domain — docs, chars, language spread, en share. */
  private val domainMix = QuerySpec(
    "q_domain_mix",
    """WITH h AS (
      |  SELECT doc_id, n_chars, lang,
      |         CASE doc_id % 8
      |           WHEN 3 THEN 'docs.' || source || '.net'
      |           WHEN 5 THEN 'cdn.' || source || '.example.com'
      |           WHEN 6 THEN 'shop.' || source || '.co.uk'
      |           WHEN 7 THEN source || '.com.au'
      |           ELSE source || '.example.com'
      |         END AS host,
      |         -- expected registrable domain planted INDEPENDENTLY of
      |         -- the engine's PSL matcher: co.uk/com.au are public
      |         -- suffixes, so one more label is the domain
      |         CASE doc_id % 8
      |           WHEN 3 THEN source || '.net'
      |           WHEN 6 THEN source || '.co.uk'
      |           WHEN 7 THEN source || '.com.au'
      |           ELSE 'example.com'
      |         END AS domain
      |  FROM documents),
      |f AS (SELECT * FROM h
      |      WHERE host NOT IN ('src0.example.com', 'docs.src3.net'))
      |SELECT domain, COUNT(*) AS n_docs,
      |       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
      |       CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE)
      |         / COUNT(*) AS en_share
      |FROM f GROUP BY domain ORDER BY domain""".stripMargin) { (s, d) =>
    import s.implicits._
    val withHost = Tables.documents(s, d)
      .withColumn("host", WebCuration.hostOf(messyUrl))
    val blocklist = Seq("src0.example.com", "docs.src3.net").toDF("host")
    val kept = WebCuration.blockHosts(withHost, col("host"), blocklist)
    WebCuration.domainComposition(kept, col("host"), col("n_chars"),
        col("lang"), "en")
      .orderBy("domain")
  }

  /** Planted page-footer license marker, Spark side (doc_id % 6):
    * rel="license" CC link, CC URL alongside a decoy "all rights
    * reserved" (the URL must win), CC0 public-domain URL, a bare
    * all-rights-reserved page, no marker at all, and an UPPERCASE CC
    * URL (case test). Shared with the curation pipeline. */
  private[queries] def licenseFooter = {
    val v = col("doc_id") % 6
    when(v === 0, lit("Licensed under <a rel=\"license\" " +
        "href=\"https://creativecommons.org/licenses/by/4.0/\">CC BY 4.0</a>."))
      .when(v === 1, lit("See https://creativecommons.org/licenses/by-sa/3.0/" +
        " for terms. All rights reserved."))
      .when(v === 2,
        lit("Released under https://creativecommons.org/publicdomain/zero/1.0/"))
      .when(v === 3, lit("(c) 2024 Site. All Rights Reserved."))
      .when(v === 4, lit("Contact webmaster for reuse."))
      .otherwise(
        lit("Mirror of HTTPS://CREATIVECOMMONS.ORG/LICENSES/BY-NC-ND/4.0/deed.en"))
  }

  /** Planted robots.txt body per host class, Spark side: shop hosts
    * disallow the whole site; docs hosts carry a DECOY full disallow
    * under `User-agent: badbot` before an innocuous `*` group (group
    * semantics must be honored); everything else allows. Shared with
    * the curation pipeline. */
  private[queries] def robotsBodyFor(host: org.apache.spark.sql.Column) =
    when(host.startsWith("shop."),
        lit("# robots\nUser-agent: *\nDisallow: /"))
      .when(host.startsWith("docs."),
        lit("User-agent: badbot\nDisallow: /\n\nUser-agent: *\nDisallow: /private/"))
      .otherwise(lit("User-agent: *\nDisallow:"))

  /** License-marker + robots host-policy curation stage
    * ([[WebCuration.licenseOf]]/[[WebCuration.robotsDisallowAll]]):
    * the engine classifies each page's planted footer FROM THE TEXT
    * (regex heuristics) and folds each host's planted robots.txt FROM
    * THE BYTES (group-aware line fold), drops robots-denied hosts
    * (broadcast anti-join) and explicit all-rights-reserved pages;
    * the oracle replays the expected classes and keep-set from the
    * plant arithmetic alone — a classifier or fold bug on any variant
    * (incl. the badbot decoy group and the uppercase CC URL) breaks
    * the hash. */
  private val licenseFilter = QuerySpec(
    "q_license_filter",
    """WITH u AS (SELECT doc_id, source, doc_id % 8 AS v8, doc_id % 6 AS v6
      |           FROM documents),
      |h AS (SELECT doc_id, v6, v8,
      |        CASE v8 WHEN 3 THEN 'docs.' || source || '.net'
      |                WHEN 5 THEN 'cdn.' || source || '.example.com'
      |                WHEN 6 THEN 'shop.' || source || '.co.uk'
      |                WHEN 7 THEN source || '.com.au'
      |                ELSE source || '.example.com' END AS host
      |      FROM u)
      |SELECT doc_id, host,
      |       CASE v6 WHEN 0 THEN 'cc-by' WHEN 1 THEN 'cc-by-sa'
      |               WHEN 2 THEN 'cc0' WHEN 4 THEN 'unknown'
      |               ELSE 'cc-by-nc-nd' END AS license
      |FROM h WHERE v8 != 6 AND v6 != 3
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val withHost = Tables.documents(s, d)
      .withColumn("host", WebCuration.hostOf(messyUrl))
      .withColumn("_footer", licenseFooter)
    // host-policy table: one robots.txt per DISTINCT host
    // (host-cardinality, never corpus-cardinality)
    val robots = withHost.select("host").distinct()
      .withColumn("robots_txt", robotsBodyFor(col("host")))
    WebCuration
      .allowedByRobots(withHost, col("host"),
        robots, col("host"), col("robots_txt"))
      .withColumn("license", WebCuration.licenseOf(col("_footer")))
      .filter(col("license") =!= "arr")
      .select("doc_id", "host", "license")
      .orderBy("doc_id")
  }

  def all: Seq[QuerySpec] =
    Seq(urlNormalize, domainQuota, domainMix, crawlRevisit, licenseFilter)
}
