package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{GopherRepetition, HtmlText, PiiRedact, WebCuration}

/** The end-to-end corpus-curation pipeline, certified as ONE query:
  * HTML→text extraction + C4 page filter → URL canonicalization →
  * host blocklist → robots host policy → license-marker filter →
  * per-host quota → Gopher repetition filter → PII redaction →
  * per-domain (PSL registrable) shipping report.
  * Each stage is an operator already hash-certified in isolation;
  * this row certifies they COMPOSE — every stage's row set feeds the
  * next, so a subtle contract mismatch between any two stages (a
  * column renamed, a filter applied to the wrong side, a quota
  * computed before the blocklist instead of after) breaks the hash
  * even though every piece passes alone. This is the shape a real
  * 100 TB curation run has: the whole chain is projections, one
  * broadcast anti join, the salted quota windows, and one final
  * map-side-combining groupBy — no corpus-sized shuffle anywhere
  * except the quota's id-priority windows.
  */
object CurationPipelineQueries {

  private val quota = 8

  private val pipeline = QuerySpec(
    "q_curation_pipeline",
    s"""WITH u0 AS (
       |  SELECT doc_id, text, source, doc_id % 8 AS v8,
       |         doc_id % 7 % 5 AS v5, CAST(doc_id AS VARCHAR) AS id
       |  FROM documents),
       |-- stage 0: HTML extraction + C4 page verdict on the planted
       |-- markup; the expected keep-set derives off the PLANT
       |-- (doc-text line present, no lorem-ipsum line, no curly line
       |-- — HtmlQueries' a/b/c/d selectors), never off the parser
       |u AS (
       |  SELECT * FROM u0
       |  WHERE doc_id % 5 != 2 AND doc_id % 11 != 0 AND doc_id % 13 != 5),
       |h0 AS (
       |  SELECT *,
       |    CASE v8 WHEN 3 THEN 'docs.' || source || '.net'
       |            WHEN 5 THEN 'cdn.' || source || '.example.com'
       |            WHEN 6 THEN 'shop.' || source || '.co.uk'
       |            WHEN 7 THEN source || '.com.au'
       |            ELSE source || '.example.com' END AS host
       |  FROM u),
       |-- registrable domain via the GENERATED public-suffix replay
       |-- (PublicSuffix.domainSqlSelect — same rule tables as the
       |-- engine, so this row certifies the PSL match cross-engine)
       |h AS (
       |${graft.operators.PublicSuffix.domainSqlSelect("h0", "host")}),
       |-- robots host policy (v8=6 shop hosts disallow-all) + license
       |-- markers (doc_id%6=3 pages are explicit all-rights-reserved):
       |-- the r15 head stages, keep-set replayed off the plant
       |f AS (SELECT * FROM h
       |      WHERE host NOT IN ('src0.example.com', 'docs.src3.net')
       |        AND v8 != 6 AND doc_id % 6 != 3),
       |q AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY host
       |        ORDER BY md5(id), doc_id) AS rn FROM f),
       |qk AS (SELECT * FROM q WHERE rn <= $quota),
       |rep AS (
       |${GopherRepetition.oracleCore("doc_id", "text")}),
       |g AS (SELECT qk.* FROM qk
       |      JOIN rep ON rep.doc_id = qk.doc_id AND rep.gopher_keep = 1),
       |p AS (
       |  SELECT doc_id, domain,
       |         length(text || ${PiiQueries.redactedSuffixSqlFor("v5")}) AS out_chars,
       |         CASE WHEN v5 = 0 THEN 0 ELSE 1 END AS redacted
       |  FROM g)
       |SELECT domain, COUNT(*) AS n_docs,
       |       CAST(SUM(redacted) AS BIGINT) AS n_redacted,
       |       CAST(SUM(out_chars) AS BIGINT) AS out_chars
       |FROM p GROUP BY domain ORDER BY domain""".stripMargin) { (s, d) =>
    import s.implicits._
    // the whole chain is per-row projections over a corpus that scans
    // as ONE parquet split locally — without a spread the HTML parse +
    // C4 + PSL + gopher + PII chain runs as a single 5-CPU-s task
    // (r20 measured; the spread is a no-op once the corpus scans as
    // many splits — Dedup.spreadIfNarrow doc)
    val docs = graft.operators.Dedup.spreadIfNarrow(Tables.documents(s, d))
    // stage 0: HTML→text extraction + C4 page filter on the planted
    // markup — only pages passing the C4 page rules enter the chain
    val extracted = docs
      .withColumn("_html_text", HtmlText.extractText(HtmlQueries.plantedHtml))
    val c4Kept = HtmlText.c4Filter(extracted, "_html_text")
      .filter(col("c4_keep") === 1)
      .drop("_html_text", "c4_text", "n_lines_kept", "n_sentences", "c4_keep")
    // stage 1: canonical host/domain from the synthesized messy URL
    val url = WebQueries.messyUrl
    val withHost = c4Kept
      .withColumn("host", WebCuration.hostOf(url))
      .withColumn("domain", WebCuration.domainOf(col("host")))
    // stage 2: host blocklist (broadcast anti join)
    val blocklist = Seq("src0.example.com", "docs.src3.net").toDF("h")
    val unblocked = WebCuration.blockHosts(withHost, col("host"), blocklist)
    // stage 2b (r15): robots host policy — fold each DISTINCT host's
    // robots.txt, broadcast anti-join the disallow-all hosts
    val robots = unblocked.select("host").distinct()
      .withColumn("robots_txt", WebQueries.robotsBodyFor(col("host")))
    val robotsAllowed = WebCuration.allowedByRobots(unblocked, col("host"),
      robots, col("host"), col("robots_txt"))
    // stage 2c (r15): license markers — classify the planted footer
    // FROM THE TEXT, drop explicit all-rights-reserved pages
    val licensed = robotsAllowed
      .withColumn("_lic", WebCuration.licenseOf(WebQueries.licenseFooter))
      .filter(col("_lic") =!= "arr")
      .drop("_lic")
    // stage 3: per-host quota (salted exact top-k by md5 priority)
    val underQuota = WebCuration
      .domainQuota(licensed, col("host"), col("doc_id"), quota)
    // stage 4: Gopher repetition filter on the ORIGINAL text. The
    // verdict is per-row, so it is computed over the QUOTA SURVIVORS
    // only — scoring the full corpus and joining was both wasted work
    // and, worse, column pruning sank that branch's gopherStats below
    // the spread exchange into the single-split scan task (r20
    // measured: a serial 4.7-CPU-s stage); restricted to underQuota
    // the projection sits above the quota windows' exchange and
    // parallelizes. Verdicts are identical per doc either way.
    val kept = underQuota
      .join(GopherRepetition.report(
          underQuota.select("doc_id", "text"), "doc_id", "text")
        .filter(col("gopher_keep") === 1).select("doc_id"), "doc_id")
    // stage 5: PII scrub of the shipped text
    val scrubbed = kept
      .withColumn("_t", concat(col("text"), PiiQueries.suffix))
      .withColumn("_red", PiiRedact.redact(col("_t")))
    // stage 6: per-domain shipping report
    scrubbed.groupBy("domain")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(PiiRedact.hasPii(col("_t")), 1).otherwise(0))
          .cast("long").as("n_redacted"),
        sum(length(col("_red"))).cast("long").as("out_chars"))
      .orderBy("domain")
  }

  /** The STREAMING form of the pipeline under the driver's hash gate
    * (the N39 ledger discipline applied to curation): documents slice
    * %3 into three micro-batches driven through
    * [[graft.streaming.StreamingOps.curationAppendBatch]] (blocklist →
    * Gopher filter → PII redaction → survivor store), batch 1
    * REDELIVERS (ledger no-op), the relation compacts into a fresh
    * pruned layout, and the compacted read's per-host quota view must
    * hash-match the oracle's one-shot batch replay of the same stages
    * over the whole corpus — certifying streamed ≡ batch, redelivery ≡
    * no-op and compaction ≡ identity for the curation chain in one
    * row. */
  private val stQuota = 5

  private val streamingLedger = QuerySpec(
    "q_st_curation_ledger",
    s"""WITH u AS (
       |  SELECT doc_id, text, source, doc_id % 8 AS v8,
       |         doc_id % 7 % 5 AS v5, CAST(doc_id AS VARCHAR) AS id
       |  FROM documents),
       |h AS (
       |  SELECT *,
       |    CASE v8 WHEN 3 THEN 'docs.' || source || '.net'
       |            WHEN 5 THEN 'cdn.' || source || '.example.com'
       |            WHEN 6 THEN 'shop.' || source || '.co.uk'
       |            WHEN 7 THEN source || '.com.au'
       |            ELSE source || '.example.com' END AS host
       |  FROM u),
       |f AS (SELECT * FROM h
       |      WHERE host NOT IN ('src0.example.com', 'docs.src3.net')),
       |-- the fold gophers the text it INGESTS — i.e. with the planted
       |-- PII suffix already appended — so the replay must too
       |rep AS (
       |${GopherRepetition.oracleCore("doc_id",
          s"(text || ${PiiQueries.suffixSqlFor(
            "doc_id % 7 % 5", "CAST(doc_id AS VARCHAR)")})")}),
       |g AS (SELECT f.* FROM f
       |      JOIN rep ON rep.doc_id = f.doc_id AND rep.gopher_keep = 1),
       |q AS (SELECT host, doc_id,
       |        ROW_NUMBER() OVER (PARTITION BY host
       |          ORDER BY md5(id), doc_id) AS keep_rank,
       |        length(text || ${PiiQueries.redactedSuffixSqlFor("v5")}) AS red_len
       |      FROM g)
       |SELECT host, doc_id, CAST(keep_rank AS BIGINT) AS keep_rank,
       |       CAST(red_len AS BIGINT) AS red_len
       |FROM q WHERE keep_rank <= $stQuota
       |ORDER BY host, keep_rank""".stripMargin) { (s, d) =>
    import graft.streaming.StreamingOps
    val docs = Tables.documents(s, d)
      .withColumn("host", WebCuration.hostOf(WebQueries.messyUrl))
      .withColumn("text", concat(col("text"), PiiQueries.suffix))
      .select("doc_id", "text", "host")
    def slice(i: Int) = docs.filter(pmod(col("doc_id"), lit(3)) === i)
    // durable build-once store, the q_st_minhash_ledger contract:
    // Verify drives the full append/redeliver/compact chain once per
    // JVM; bench reps 2+ price the quota read path
    val root = graft.core.CacheGovernor.durableDir(s"curation_ledger:$d") { dir =>
      val path = s"$dir/v1"
      val fold = StreamingOps.curationAppendBatch(path, "doc_id", "text",
        "host", Seq("src0.example.com", "docs.src3.net"))
      fold(slice(0), 0L)
      fold(slice(1), 1L)
      fold(slice(2), 2L)
      fold(slice(1), 1L) // redelivered micro-batch — ledger no-op
      StreamingOps.compactCuration(s, path, s"$dir/v2", "doc_id", stQuota)
    }
    StreamingOps.readCuration(s, s"$root/v2", "doc_id", stQuota)
      .select(col("host"), col("doc_id"), col("keep_rank").cast("long"),
        length(col("red_text")).cast("long").as("red_len"))
      .orderBy("host", "keep_rank")
  }

  /** Incremental-crawl curation ([[graft.operators.CrawlRevisit]]
    * composed with the curation tail — the N99 promise made good):
    * the revisit ledger holds a prior snapshot (docs with
    * doc_id % 3 ≠ 0 at their original content), the incoming snapshot
    * re-fetches EVERY url (a planted fifth changed content), and
    * [[CrawlRevisit.freshDocs]] gates the pipeline head — only new
    * urls and changed pages reach the Gopher filter and the
    * per-domain report, and the in-band `docs_skipped` column counts
    * the unchanged revisits whose downstream compute the ledger
    * saved. The oracle replays the fresh-set predicate, the Gopher
    * verdicts over the INGESTED text and the domain arithmetic from
    * the plant alone. */
  private val crawlCuration = QuerySpec(
    "q_crawl_curation",
    s"""WITH inc AS (
       |  SELECT doc_id, source,
       |         text || CASE WHEN doc_id % 5 = 0 THEN '!rev' ELSE '' END AS text2,
       |         doc_id % 8 AS v8
       |  FROM documents),
       |fresh AS (SELECT * FROM inc WHERE doc_id % 3 = 0 OR doc_id % 5 = 0),
       |skipped AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS docs_skipped FROM inc
       |  WHERE NOT (doc_id % 3 = 0 OR doc_id % 5 = 0)),
       |rep AS (
       |${GopherRepetition.oracleCore("doc_id",
            "(text || CASE WHEN doc_id % 5 = 0 THEN '!rev' ELSE '' END)")}),
       |g AS (SELECT fresh.* FROM fresh
       |      JOIN rep ON rep.doc_id = fresh.doc_id AND rep.gopher_keep = 1),
       |h AS (SELECT *,
       |        CASE v8 WHEN 3 THEN source || '.net'
       |                WHEN 6 THEN source || '.co.uk'
       |                WHEN 7 THEN source || '.com.au'
       |                ELSE 'example.com' END AS domain
       |      FROM g)
       |SELECT domain, COUNT(*) AS n_docs,
       |       CAST(SUM(length(text2)) AS BIGINT) AS out_chars,
       |       (SELECT docs_skipped FROM skipped) AS docs_skipped
       |FROM h GROUP BY domain ORDER BY domain""".stripMargin) { (s, d) =>
    import graft.operators.CrawlRevisit
    val docs = Tables.documents(s, d)
    val host = {
      val v = col("doc_id") % 8
      when(v === 3, concat(lit("docs."), col("source"), lit(".net")))
        .when(v === 5, concat(lit("cdn."), col("source"), lit(".example.com")))
        .when(v === 6, concat(lit("shop."), col("source"), lit(".co.uk")))
        .when(v === 7, concat(col("source"), lit(".com.au")))
        .otherwise(concat(col("source"), lit(".example.com")))
    }
    val url = concat(lit("https://"), host, lit("/p/"),
      col("doc_id").cast("string"))
    // incoming snapshot: every url re-fetched, a planted fifth changed
    val incoming = docs
      .withColumn("text2", concat(col("text"),
        when(pmod(col("doc_id"), lit(5)) === 0, "!rev").otherwise("")))
      .withColumn("url", url)
      .withColumn("host", host)
    // ledger state: the prior snapshot, built once per (corpus, JVM)
    val root = graft.core.CacheGovernor.durableDir(s"crawl_curation:$d") { dir =>
      CrawlRevisit.writeLedger(
        docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
          .select(url.as("url"), col("text").as("content")),
        col("url"), col("content"), 0L, s"$dir/v1")
    }
    val state = CrawlRevisit.revisitReport(
      CrawlRevisit.readVisits(s, s"$root/v1"))
    // the gate: unchanged revisits never reach the curation tail
    val fresh = graft.core.CacheGovernor.persistTracked(
      CrawlRevisit.freshDocs(incoming, col("url"), col("text2"), state))
    val skipped = incoming
      .join(fresh.select("doc_id"), Seq("doc_id"), "left_anti")
      .agg(count(lit(1)).cast("long").as("docs_skipped"))
    val kept = fresh.join(
      GopherRepetition.report(fresh, "doc_id", "text2")
        .filter(col("gopher_keep") === 1).select("doc_id"), "doc_id")
    kept
      .groupBy(WebCuration.domainOf(col("host")).as("domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text2"))).cast("long").as("out_chars"))
      .crossJoin(broadcast(skipped))
      .orderBy("domain")
  }

  /** Corpus datasheet — the per-source governance report a training-data
    * release ships with (the "datasheets for datasets" practice, Gebru
    * et al. 2021, arXiv:1803.09010): volume (docs/chars/tokens),
    * language spread (distinct langs + modal language), exact-duplicate
    * pressure (distinct text hashes vs rows) and the corpus quality
    * mass (exact-decimal sum of the engine's composite quality score —
    * order-independent, so it hash-certifies). Shape at 100 TB: ONE
    * map-side-combining scan for every stat (count/sum/countDistinct
    * all partial-aggregate; the modal language is a second agg over the
    * (source, lang) pairs — cardinality ≤ sources × langs, tiny), then
    * a broadcast join of the two source-keyed reports. No corpus-sized
    * shuffle; no window over the corpus. */
  private val datasheet = QuerySpec(
    "q_corpus_datasheet",
    """WITH t AS (SELECT doc_id, text, lang, source,
      |            string_split(text, ' ') AS toks, md5(text) AS fp
      |          FROM documents),
      |base AS (SELECT source,
      |           CAST(COUNT(*) AS BIGINT) AS n_docs,
      |           CAST(SUM(length(text)) AS BIGINT) AS n_chars,
      |           CAST(SUM(len(toks)) AS BIGINT) AS n_tokens,
      |           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
      |           CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_uniq_texts,
      |           CAST(SUM(CAST(
      |             (CASE WHEN len(toks) BETWEEN 20 AND 2000 THEN 1.0 ELSE 0.25 END) * 0.5 +
      |             (CASE WHEN CAST(len(list_filter(toks, x -> list_contains(['the','a','of','to','and','in','is','it'], x))) AS DOUBLE) / len(toks) > 0.05 THEN 1.0 ELSE 0.5 END) * 0.5
      |             AS DECIMAL(27,3))) AS DOUBLE) AS quality_sum
      |         FROM t GROUP BY source),
      |lm AS (SELECT source, lang AS top_lang FROM (
      |         SELECT source, lang,
      |                ROW_NUMBER() OVER (PARTITION BY source
      |                  ORDER BY COUNT(*) DESC, lang) AS rn
      |         FROM t GROUP BY source, lang) z WHERE rn = 1)
      |SELECT b.source, b.n_docs, b.n_chars, b.n_tokens, b.n_langs,
      |       b.n_uniq_texts, b.n_docs - b.n_uniq_texts AS dup_docs,
      |       b.quality_sum, lm.top_lang
      |FROM base b JOIN lm ON lm.source = b.source
      |ORDER BY b.source""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    import graft.operators.TextAnalysis
    val docs = Tables.documents(s, d)
    val toks = TextAnalysis.wsTokens(col("text"))
    val base = docs.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(length(col("text"))).cast("long").as("n_chars"),
      sum(size(toks)).cast("long").as("n_tokens"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(md5(col("text"))).as("n_uniq_texts"),
      graft.core.OracleCompat.dsum(
        TextAnalysis.qualityScore(col("text")), 3).as("quality_sum"))
    val lm = docs.groupBy("source", "lang").agg(count(lit(1)).as("_c"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("source").orderBy(col("_c").desc, col("lang"))))
      .filter(col("rn") === 1)
      .select(col("source"), col("lang").as("top_lang"))
    base.join(lm, "source")
      .select(col("source"), col("n_docs"), col("n_chars"), col("n_tokens"),
        col("n_langs"), col("n_uniq_texts"),
        (col("n_docs") - col("n_uniq_texts")).as("dup_docs"),
        col("quality_sum"), col("top_lang"))
      .orderBy("source")
  }

  /** Datasheet → mixing weights (r16 verdict item 8, the governance
    * loop's closing step): a DECLARED target mix over six sources
    * (30/20/20/15/10/5) plus the datasheet's per-source token counts
    * yield the largest exact-share downsampling plan
    * ([[graft.operators.Sampling.mixRates]]): C = min ⌊tokens/w⌋,
    * planned = w·C (realized shares = w/Σw EXACTLY by construction),
    * rate_micro = ⌊planned·10⁶/tokens⌋ — all integer arithmetic, so
    * the whole plan hash-replays in SQL. Undeclared sources are
    * excluded: the mix is the corpus recipe. Realized-share assertions
    * on an applied sample live in SamplingSpec. */
  private val reweight = QuerySpec(
    "q_corpus_reweight",
    """WITH tok AS (SELECT source,
      |               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      |             FROM documents GROUP BY source),
      |w(source, target_w) AS (VALUES
      |  ('src0', CAST(30 AS BIGINT)), ('src1', CAST(20 AS BIGINT)),
      |  ('src2', CAST(20 AS BIGINT)), ('src3', CAST(15 AS BIGINT)),
      |  ('src4', CAST(10 AS BIGINT)), ('src5', CAST(5 AS BIGINT))),
      |j AS (SELECT tok.source, tok.n_tokens, w.target_w
      |      FROM tok JOIN w ON w.source = tok.source),
      |c AS (SELECT MIN(n_tokens // target_w) AS c FROM j)
      |SELECT j.source, j.n_tokens, j.target_w,
      |       CAST(j.target_w * c.c AS BIGINT) AS planned_tokens,
      |       CAST((j.target_w * c.c * 1000000) // j.n_tokens AS BIGINT) AS rate_micro
      |FROM j, c ORDER BY source""".stripMargin) { (s, d) =>
    import graft.operators.{Sampling, TextAnalysis}
    Sampling.mixRates(Tables.documents(s, d), col("source"),
      size(TextAnalysis.wsTokens(col("text"))), ReweightTargets)
      .orderBy("source")
  }

  /** Datasheet → EPOCH mixing weights (r18, N113 — the r17 verdict's
    * item 6): real LLM recipes UPSAMPLE high-quality sources past one
    * pass, which [[graft.operators.Sampling.mixRates]] clamps away
    * (rate ≤ 1 by construction). [[Sampling.mixRatesEpochs]] instead
    * binds on C = max ⌊tokens/w⌋ — the binding source runs EXACTLY one
    * full pass and every other declared source rises to the exact
    * shares via epochs = ⌊planned/tokens⌋ deterministic full passes
    * plus an integer-remainder fractional rate. With the 30/20/20/15/
    * 10/5 declared mix the src0 plan runs ≥ 2 epochs at every SF
    * (weight span 6× over near-uniform sources). All integer
    * arithmetic — epoch counts, planned tokens and residual rates
    * replay bit-for-bit in SQL; applied-sample laws (exact full
    * passes, residual tracking, partition immunity) live in
    * SamplingSpec. */
  private val reweightEpochs = QuerySpec(
    "q_corpus_reweight_epochs",
    """WITH tok AS (SELECT source,
      |               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      |             FROM documents GROUP BY source),
      |w(source, target_w) AS (VALUES
      |  ('src0', CAST(30 AS BIGINT)), ('src1', CAST(20 AS BIGINT)),
      |  ('src2', CAST(20 AS BIGINT)), ('src3', CAST(15 AS BIGINT)),
      |  ('src4', CAST(10 AS BIGINT)), ('src5', CAST(5 AS BIGINT))),
      |j AS (SELECT tok.source, tok.n_tokens, w.target_w
      |      FROM tok JOIN w ON w.source = tok.source),
      |c AS (SELECT MAX(n_tokens // target_w) AS c FROM j)
      |SELECT j.source, j.n_tokens, j.target_w,
      |       CAST(j.target_w * c.c AS BIGINT) AS planned_tokens,
      |       CAST((j.target_w * c.c) // j.n_tokens AS BIGINT) AS epochs,
      |       CAST(((j.target_w * c.c - ((j.target_w * c.c) // j.n_tokens) * j.n_tokens)
      |             * 1000000) // j.n_tokens AS BIGINT) AS rate_micro
      |FROM j, c ORDER BY source""".stripMargin) { (s, d) =>
    import graft.operators.{Sampling, TextAnalysis}
    Sampling.mixRatesEpochs(Tables.documents(s, d), col("source"),
      size(TextAnalysis.wsTokens(col("text"))), ReweightTargets)
      .orderBy("source")
  }

  /** The APPLIED epoch mix under the hash gate (r18, N113's second
    * half): q_corpus_reweight_epochs certifies the PLAN; this row
    * certifies the realized sample — per (source, epoch) doc and token
    * tallies of [[graft.operators.Sampling.mixSampleEpochs]] over the
    * documents corpus. Full epochs are exact deterministic copies; the
    * residual epoch keeps a row iff its portable md5 bucket falls
    * under ⌊rate_micro·10⁴/10⁶⌋ — the house keep rule, replayed
    * verbatim in SQL, so realized counts hash-match exactly (no
    * tolerance band needed: the sampler is deterministic, not
    * random). */
  private val reweightApplied = QuerySpec(
    "q_corpus_reweight_applied",
    """WITH tok AS (SELECT doc_id, source,
      |               CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
      |             FROM documents),
      |agg AS (SELECT source, CAST(SUM(ntok) AS BIGINT) AS n_tokens
      |        FROM tok GROUP BY source),
      |w(source, target_w) AS (VALUES
      |  ('src0', CAST(30 AS BIGINT)), ('src1', CAST(20 AS BIGINT)),
      |  ('src2', CAST(20 AS BIGINT)), ('src3', CAST(15 AS BIGINT)),
      |  ('src4', CAST(10 AS BIGINT)), ('src5', CAST(5 AS BIGINT))),
      |j AS (SELECT agg.source, agg.n_tokens, w.target_w
      |      FROM agg JOIN w ON w.source = agg.source),
      |c AS (SELECT MAX(n_tokens // target_w) AS c FROM j),
      |plan AS (SELECT j.source,
      |           (j.target_w * c.c) // j.n_tokens AS epochs,
      |           ((j.target_w * c.c - ((j.target_w * c.c) // j.n_tokens) * j.n_tokens)
      |            * 1000000) // j.n_tokens AS rate_micro
      |         FROM j, c),
      |kept AS (SELECT t.source, e.e AS epoch, t.doc_id, t.ntok
      |         FROM tok t JOIN plan p ON p.source = t.source
      |         CROSS JOIN generate_series(0, 64) e(e)
      |         WHERE e.e < p.epochs
      |            OR (e.e = p.epochs AND
      |                (CAST(('0x' || substring(md5(CAST(t.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000)
      |                  < (p.rate_micro * 10000) // 1000000))
      |SELECT source, CAST(epoch AS BIGINT) AS epoch,
      |       COUNT(*) AS n_docs, CAST(SUM(ntok) AS BIGINT) AS n_tokens
      |FROM kept GROUP BY source, epoch ORDER BY source, epoch""".stripMargin) { (s, d) =>
    import graft.operators.{Sampling, TextAnalysis}
    Sampling.mixSampleEpochs(Tables.documents(s, d), col("doc_id"),
      col("source"), size(TextAnalysis.wsTokens(col("text"))), ReweightTargets)
      .groupBy(col("source"), col("epoch"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextAnalysis.wsTokens(col("text")))).cast("long").as("n_tokens"))
      .orderBy("source", "epoch")
  }

  /** The declared mix q_corpus_reweight certifies and SamplingSpec
    * applies. */
  private[graft] val ReweightTargets: Seq[(String, Long)] = Seq(
    "src0" -> 30L, "src1" -> 20L, "src2" -> 20L,
    "src3" -> 15L, "src4" -> 10L, "src5" -> 5L)

  def all: Seq[QuerySpec] =
    Seq(pipeline, streamingLedger, crawlCuration, datasheet, reweight,
      reweightEpochs, reweightApplied)
}
