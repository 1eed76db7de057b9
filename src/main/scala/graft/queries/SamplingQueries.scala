package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.core.OracleCompat._
import graft.operators.Sampling

/** Deterministic split / stratified-sample queries (training-pipeline
  * reproducibility primitives — operators.Sampling). The md5-derived
  * bucket is byte-identical across engines, so unlike RNG sampling
  * these are fully hash-oracle-checkable: DuckDB reproduces the exact
  * row assignment, not just approximate counts.
  */
object SamplingQueries {

  private val bucketSqlDoc =
    "CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000"
  private val bucketSqlEvent =
    "CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000"

  /** 80/10/10 train/val/test split of the document corpus, summarized
    * per (split, language). */
  private val splitQ = QuerySpec(
    "q_sample_split",
    s"""WITH b AS (SELECT lang, text, $bucketSqlDoc AS bkt FROM documents),
       |s AS (SELECT lang, text,
       |        CASE WHEN bkt < 8000 THEN 'train'
       |             WHEN bkt < 9000 THEN 'val' ELSE 'test' END AS split
       |      FROM b)
       |SELECT split, lang, COUNT(*) AS n_docs,
       |       CAST(SUM(length(text)) AS BIGINT) AS total_chars
       |FROM s GROUP BY split, lang ORDER BY split, lang""".stripMargin) { (s, d) =>
    Sampling.withSplit(Tables.documents(s, d), col("doc_id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).cast("long").as("total_chars"))
      .orderBy("split", "lang")
  }

  /** LEAKAGE-SAFE split (operators.Splits): the coin flip lands on the
    * exact-dup fingerprint group, not the row, so duplicate families
    * can never straddle train/val/test — and the oracle replays every
    * group hash, every threshold, and the straddle-count invariant
    * (exactly 0) in SQL. Thresholds are spelled as summed DOUBLE casts
    * on both sides so the cumulative boundary is the identical IEEE
    * double. */
  private val splitGroupAware = QuerySpec(
    "q_split_group_aware",
    """WITH g AS (SELECT doc_id, md5(text) AS grp FROM documents),
      |u AS (SELECT doc_id, grp,
      |        ('0x' || substr(md5('split:0:' || grp), 1, 15))::BIGINT
      |          / 1152921504606846976.0 AS u
      |      FROM g),
      |s AS (SELECT doc_id, grp,
      |        CASE WHEN u < CAST(0.8 AS DOUBLE) THEN 'train'
      |             WHEN u < CAST(0.8 AS DOUBLE) + CAST(0.1 AS DOUBLE) THEN 'val'
      |             ELSE 'test' END AS split
      |      FROM u),
      |st AS (SELECT CAST(COALESCE(SUM(CASE WHEN ns > 1 THEN 1 ELSE 0 END), 0) AS BIGINT)
      |               AS straddling_groups
      |       FROM (SELECT grp, COUNT(DISTINCT split) AS ns FROM s GROUP BY grp) t)
      |SELECT s.split, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       CAST(COUNT(DISTINCT s.grp) AS BIGINT) AS n_groups,
      |       st.straddling_groups
      |FROM s, st GROUP BY s.split, st.straddling_groups
      |ORDER BY split""".stripMargin) { (s, d) =>
    import graft.operators.Splits
    val docs = Tables.documents(s, d)
      .withColumn("grp", md5(col("text").cast("binary")))
    Splits.splitStats(
      Splits.groupAwareSplit(docs, col("grp"), 0.8, 0.1), col("grp"))
      .orderBy("split")
  }

  /** HARD-CAP sequence packing (operators.Packing): next-fit per hash
    * shard with no document straddling a bin boundary — the complement
    * of q_sample_pack's soft running-sum packs. The oracle walks each
    * shard's docs in id order with a linear-recursion CTE and replays
    * EVERY (doc, shard, bin) assignment exactly. */
  private val packHardcap = QuerySpec(
    "q_pack_hardcap",
    """WITH RECURSIVE d0 AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
      |  FROM documents),
      |sh AS (SELECT doc_id, toks,
      |         ('0x' || substr(md5('pack:0:' || doc_id::VARCHAR), 1, 15))::BIGINT % 8 AS shard
      |       FROM d0),
      |t AS (SELECT doc_id, toks, shard,
      |        ROW_NUMBER() OVER (PARTITION BY shard ORDER BY doc_id) AS pos
      |      FROM sh),
      |rec(shard, pos, doc_id, toks, bin, s) AS (
      |  SELECT shard, pos, doc_id, toks, 0, toks FROM t WHERE pos = 1
      |  UNION ALL
      |  SELECT t.shard, t.pos, t.doc_id, t.toks,
      |         CASE WHEN r.s > 0 AND r.s + t.toks > 512 THEN r.bin + 1 ELSE r.bin END,
      |         CASE WHEN r.s > 0 AND r.s + t.toks > 512 THEN t.toks ELSE r.s + t.toks END
      |  FROM rec r JOIN t ON t.shard = r.shard AND t.pos = r.pos + 1)
      |SELECT doc_id, toks AS doc_tokens, CAST(shard AS BIGINT) AS shard,
      |       CAST(bin AS INTEGER) AS bin
      |FROM rec ORDER BY doc_id""".stripMargin) { (s, d) =>
    import graft.operators.Packing
    val docs = Tables.documents(s, d).select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("toks"))
    Packing.packBins(docs, col("doc_id"), col("toks"), capacity = 512L, nShards = 8)
      .orderBy("doc_id")
  }

  /** Per-event-type stratified sample (rebalancing a skewed corpus:
    * keep all rare error rows, downsample the common types). */
  private val stratified = QuerySpec(
    "q_sample_stratified",
    s"""WITH b AS (SELECT event_type, value, $bucketSqlEvent AS bkt FROM events),
       |k AS (SELECT * FROM b WHERE bkt <
       |        CASE event_type WHEN 'error' THEN 10000 WHEN 'click' THEN 5000
       |                        WHEN 'purchase' THEN 2500 ELSE 1000 END)
       |SELECT event_type, COUNT(*) AS n,
       |       CAST(SUM(CAST(value AS DECIMAL(27,2))) AS DOUBLE) AS val_sum
       |FROM k GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
    Sampling.stratifiedSample(Tables.events(s, d),
      col("event_id"), col("event_type"),
      Map("error" -> 1.0, "click" -> 0.5, "purchase" -> 0.25),
      defaultFraction = 0.1)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("val_sum"))
      .orderBy("event_type")
  }

  /** Token-budget sequence packing over 8 hash shards: per-document
    * (shard, pack, offset) assignment — the training-batch assembly
    * step, exactly reproduced by the oracle's windowed running sum. */
  private val pack = QuerySpec(
    "q_sample_pack",
    s"""WITH t AS (SELECT doc_id, $bucketSqlDoc % 8 AS shard,
       |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |      FROM documents),
       |p AS (SELECT doc_id, shard, n_tokens,
       |        CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS pack_offset
       |      FROM t)
       |SELECT doc_id, shard, n_tokens, pack_offset,
       |       CAST(FLOOR(pack_offset / 2048.0) AS BIGINT) AS pack
       |FROM p ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d).select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    Sampling.packBudgeted(docs, col("doc_id"), col("n_tokens"),
      budget = 2048L, shards = 8)
      .select("doc_id", "shard", "n_tokens", "pack_offset", "pack")
      .orderBy("doc_id")
  }

  /** Length-decile curriculum assignment: NTILE semantics over doc
    * token counts without a single-task global sort (distributed
    * row-number + the exact floor formula). */
  private val curriculum = QuerySpec(
    "q_curriculum_deciles",
    """WITH t AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |           FROM documents),
      |r AS (SELECT doc_id, n_tokens,
      |        NTILE(10) OVER (ORDER BY n_tokens, doc_id) AS decile FROM t)
      |SELECT CAST(decile AS BIGINT) AS decile, COUNT(*) AS n_docs,
      |       MIN(n_tokens) AS min_tokens, MAX(n_tokens) AS max_tokens
      |FROM r GROUP BY decile ORDER BY decile""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d).select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    Sampling.frequencyBuckets(docs, col("n_tokens"), col("doc_id"), 10, "decile")
      .groupBy("decile")
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_tokens")).as("min_tokens"), max(col("n_tokens")).as("max_tokens"))
      .orderBy("decile")
  }

  /** Temperature-flattened language rebalance (alpha = 0.75): power-law
    * per-group quotas selected by hash-bucket threshold — exact row-level
    * reproduction in the oracle, no per-group rank window anywhere. */
  private val temperature = QuerySpec(
    "q_corpus_temperature",
    s"""WITH n AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
       |q AS (SELECT lang, n,
       |        LEAST(n, GREATEST(1, CAST(ROUND(POW(n, 0.75)) AS BIGINT))) AS quota
       |      FROM n),
       |t AS (SELECT lang, quota * 10000 // n AS thresh FROM q)
       |SELECT d.doc_id, d.lang FROM documents d JOIN t USING (lang)
       |WHERE $bucketSqlDoc < t.thresh
       |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    Sampling.temperatureSample(
      Tables.documents(s, d), col("doc_id"), col("lang"), alpha = 0.75)
      .select("doc_id", "lang")
      .orderBy("doc_id")
  }

  /** Deterministic global training-order shuffle: reproducible
    * pseudo-random position per doc (md5 order, distributed rank — no
    * single-task sort). The oracle recomputes the ENTIRE order. */
  private val shuffleQ = QuerySpec(
    "q_sample_shuffle",
    """SELECT doc_id,
      |       CAST(ROW_NUMBER() OVER (
      |         ORDER BY md5('42:' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
      |         AS shuffle_pos
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
    Sampling.deterministicShuffle(Tables.documents(s, d), col("doc_id"), seed = 42L)
      .select("doc_id", "shuffle_pos")
      .orderBy("doc_id")
  }

  /** Weighted sampling without replacement (Efraimidis–Spirtakis):
    * quality-weighted corpus selection with n_chars as the weight.
    * Priority ln(u)/w is rounded to 9 dp on BOTH sides before ranking
    * (libm-ulp immunity), ties break on doc_id. */
  private val weighted = QuerySpec(
    "q_sample_weighted",
    """WITH p AS (
      |  SELECT doc_id, source, n_chars,
      |         round(ln(CAST(('0x' || substr(md5('42:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT + 1 AS DOUBLE)
      |                  / 1152921504606846976.0) / n_chars, 9) AS priority
      |  FROM documents WHERE n_chars > 0
      |)
      |SELECT doc_id, source, n_chars, priority
      |FROM p ORDER BY priority DESC, doc_id LIMIT 100""".stripMargin) { (s, d) =>
    Sampling.weightedSample(
      Tables.documents(s, d).select("doc_id", "source", "n_chars"),
      col("doc_id"), col("n_chars"), k = 100, seed = 42L)
      .select("doc_id", "source", "n_chars", "priority")
  }

  /** Deterministic shard assignment + balance audit (operators.
    * Sampling.withShard/shardStats): portable-md5 sharding of the
    * training corpus into 8 shards; the oracle recomputes every
    * assignment and the per-shard counts/ratios. */
  private val shards = QuerySpec(
    "q_sample_shards",
    """WITH s AS (
      |  SELECT ('0x' || substr(md5('shard:7:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 8 AS shard
      |  FROM documents
      |), c AS (SELECT shard, COUNT(*) AS n FROM s GROUP BY shard),
      |t AS (SELECT SUM(n) AS tot FROM c)
      |SELECT c.shard, CAST(c.n AS BIGINT) AS n,
      |       CAST(c.n * 8 AS DOUBLE) / t.tot AS balance_ratio
      |FROM c CROSS JOIN t ORDER BY shard""".stripMargin) { (s, d) =>
    Sampling.shardStats(
      Sampling.withShard(Tables.documents(s, d), col("doc_id"), nShards = 8, seed = 7L),
      nShards = 8)
      .orderBy("shard")
  }

  /** DSIR importance resampling ([[graft.operators.Dsir]] — Xie et
    * al. 2023): select raw docs matching a target domain (here the
    * 'en' slice) by the hashed-bigram likelihood ratio. Buckets via
    * the portable md5-60 hash, every ln 6-dp-decimal before the exact
    * per-doc sum, rank without a single-task global sort — the whole
    * score table and the top-25% selection replay bit-identically. */
  private val dsir = QuerySpec(
    "q_sample_dsir",
    graft.operators.Dsir.oracleSql("doc_id", "text", "lang = 'en'",
      dim = 256, keepFrac = 0.25)) { (s, d) =>
    graft.operators.Dsir.importanceSelect(
      Tables.documents(s, d), col("doc_id"), col("text"),
      col("lang") === "en", dim = 256, keepFrac = 0.25)
      .orderBy("doc_id")
  }

  /** Train→test leakage audit — the measurement that JUSTIFIES
    * group-aware splitting: under the iid row-level split, count the
    * test documents that leak from train EXACTLY (same md5(text)) and
    * NEARLY (token-set Jaccard ≥ 0.9 via the banded MinHash bipartite
    * join — never an all-pairs product), then the same two counts
    * under the fingerprint-group-aware split, whose exact leak is 0 BY
    * CONSTRUCTION — and the audit certifies the 0 rather than assert
    * it (the near count stays > 0: md5-exact groups don't capture
    * near-dup families — the residual that motivates cluster-rep
    * grouping). Scale shape: splits are pure projections; exact leak
    * collapses to distinct (fingerprint, split) pairs before the
    * semi-join; the near counts for BOTH policies derive from the ONE
    * session-shared corpus pair relation (Dedup.minHashPairs over the
    * same input plan q_dedup_minhash snapshots — built once, reused
    * here) via ids-only split-label joins, so the audit adds no second
    * LSH pass; the final assembly cross-joins five broadcast one-row
    * aggregates. A train↔test pair in the corpus-wide J ≥ 0.9 relation
    * is exactly a bipartite-LSH hit between the split slices, so the
    * banded counts equal the two-sided form. Against the oracle's
    * EXHAUSTIVE all-pairs Jaccard audit, though, the identity is
    * probabilistic, not exact (q_dedup_minhash's documented exposure):
    * a true J ≥ 0.9 pair misses all b=16 bands of r=4 rows with
    * probability (1 − J⁴)¹⁶ < 4e-8 — negligible here and at every
    * certified scale, but nonzero, so at corpora orders of magnitude
    * larger the banded near-leak counts can undercount the exhaustive
    * audit by the same false-negative margin the MinHash tier itself
    * carries. */
  private val splitLeakage = QuerySpec(
    "q_split_leakage_audit",
    s"""WITH rs AS (SELECT doc_id, text,
       |        CASE WHEN $bucketSqlDoc < 8000 THEN 'train'
       |             WHEN $bucketSqlDoc < 9000 THEN 'val' ELSE 'test' END AS split
       |      FROM documents),
       |gu AS (SELECT doc_id, text,
       |         ('0x' || substr(md5('split:0:' || md5(text)), 1, 15))::BIGINT
       |           / 1152921504606846976.0 AS u
       |       FROM documents),
       |gs AS (SELECT doc_id, text,
       |         CASE WHEN u < CAST(0.8 AS DOUBLE) THEN 'train'
       |              WHEN u < CAST(0.8 AS DOUBLE) + CAST(0.1 AS DOUBLE) THEN 'val'
       |              ELSE 'test' END AS split
       |       FROM gu),
       |cnts AS (SELECT
       |           CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
       |           CAST(SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
       |           CAST(SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test
       |         FROM rs),
       |el AS (SELECT CAST(COUNT(DISTINCT t.doc_id) AS BIGINT) AS exact_leak_test
       |       FROM rs t WHERE t.split = 'test'
       |         AND md5(t.text) IN (SELECT md5(text) FROM rs WHERE split = 'train')),
       |rtr AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
       |        FROM rs WHERE split = 'train'),
       |rte AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
       |        FROM rs WHERE split = 'test'),
       |nl AS (SELECT CAST(COUNT(DISTINCT rte.doc_id) AS BIGINT) AS near_leak_test
       |       FROM rte JOIN rtr ON len(list_intersect(rtr.toks, rte.toks))::DOUBLE
       |              / len(list_distinct(list_concat(rtr.toks, rte.toks))) >= 0.9),
       |gel AS (SELECT CAST(COUNT(DISTINCT t.doc_id) AS BIGINT) AS ga_exact_leak_test
       |        FROM gs t WHERE t.split = 'test'
       |          AND md5(t.text) IN (SELECT md5(text) FROM gs WHERE split = 'train')),
       |gtr AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
       |        FROM gs WHERE split = 'train'),
       |gte AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
       |        FROM gs WHERE split = 'test'),
       |gnl AS (SELECT CAST(COUNT(DISTINCT gte.doc_id) AS BIGINT) AS ga_near_leak_test
       |        FROM gte JOIN gtr ON len(list_intersect(gtr.toks, gte.toks))::DOUBLE
       |               / len(list_distinct(list_concat(gtr.toks, gte.toks))) >= 0.9)
       |SELECT cnts.n_train, cnts.n_val, cnts.n_test,
       |       el.exact_leak_test, nl.near_leak_test,
       |       gel.ga_exact_leak_test, gnl.ga_near_leak_test
       |FROM cnts, el, nl, gel, gnl""".stripMargin) { (s, d) =>
    import graft.operators.{Dedup, Splits}
    val docs = Tables.documents(s, d)
    val rowSplit = graft.core.CacheGovernor.persistTracked(
      Sampling.withSplit(docs, col("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
    val gaSplit = graft.core.CacheGovernor.persistTracked(
      Splits.groupAwareSplit(docs.withColumn("grp",
        md5(col("text").cast("binary"))), col("grp"), 0.8, 0.1))
    val pairs = graft.core.CacheGovernor.persistTracked(
      Dedup.minHashPairs(docs, "doc_id", "text",
        numHashes = 64, bands = 16, threshold = 0.9)
        .select("a_id", "b_id"))
    def leaks(split: org.apache.spark.sql.DataFrame, prefix: String)
        : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
      val train = split.filter(col("split") === "train")
      val test = split.filter(col("split") === "test")
      val exact = test
        .select(md5(col("text").cast("binary")).as("_fp"), col("doc_id"))
        .join(train.select(md5(col("text").cast("binary")).as("_fp")).distinct(),
          Seq("_fp"), "left_semi")
        .agg(countDistinct(col("doc_id")).as(s"${prefix}exact_leak_test"))
      val lab = split.select(col("doc_id"), col("split"))
      val near = pairs
        .join(lab.select(col("doc_id").as("a_id"), col("split").as("_sa")), "a_id")
        .join(lab.select(col("doc_id").as("b_id"), col("split").as("_sb")), "b_id")
        .filter((col("_sa") === "train" && col("_sb") === "test") ||
          (col("_sa") === "test" && col("_sb") === "train"))
        .select(when(col("_sa") === "test", col("a_id"))
          .otherwise(col("b_id")).as("_t"))
        .agg(countDistinct(col("_t")).as(s"${prefix}near_leak_test"))
      (exact, near)
    }
    val cnts = rowSplit.agg(
      sum(when(col("split") === "train", 1).otherwise(0)).cast("long").as("n_train"),
      sum(when(col("split") === "val", 1).otherwise(0)).cast("long").as("n_val"),
      sum(when(col("split") === "test", 1).otherwise(0)).cast("long").as("n_test"))
    val (el, nl) = leaks(rowSplit, "")
    val (gel, gnl) = leaks(gaSplit, "ga_")
    cnts.crossJoin(broadcast(el)).crossJoin(broadcast(nl))
      .crossJoin(broadcast(gel)).crossJoin(broadcast(gnl))
  }

  val all: Seq[QuerySpec] =
    Seq(splitQ, splitGroupAware, stratified, pack, packHardcap, curriculum,
      temperature, shuffleQ, weighted, shards, dsir, splitLeakage)
}
