package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** DSIR-style importance resampling (Xie et al. 2023, "Data Selection
  * for Language Models via Importance Resampling" — public): select
  * raw-corpus documents that look like a TARGET domain by the
  * likelihood ratio of two hashed-n-gram bag models. The standard
  * modern alternative to hand-tuned quality filters: fit p_target and
  * p_raw over hashed bigram buckets, weight every raw doc by
  * log w(d) = Σ_{g∈d} [ln p_tgt(b(g)) − ln p_raw(b(g))], keep the top
  * fraction.
  *
  * Scale shape: ONE explode of corpus bigrams into (doc, bucket) rows
  * (map-side, the gram discipline), two map-side-combining groupBys
  * over `dim` buckets (the models are dim-sized — they BROADCAST back
  * to the per-doc scoring join), one per-doc aggregate, and the final
  * rank via [[Ranks.distributedRowNumber]] (range shuffle + one
  * broadcast of per-partition offsets — NO single-task global sort).
  * Nothing corpus-sized shuffles except the (doc, bucket) id pairs.
  *
  * Oracle parity (the q_text_perplexity discipline): buckets come
  * from the engine-portable md5-60 hash, every ln() rounds to 6 dp
  * into DECIMAL(18,6) BEFORE the per-doc sum (exact decimal — order-
  * independent at any partition count; the two models' lns are
  * subtracted as decimals, also exact), the selection rank orders on
  * the rounded sum with doc id as tiebreak, and add-1 smoothing uses
  * integer counts — every number replays bit-identically in ANSI SQL.
  */
object Dsir {

  /** (doc, bucket) occurrences of the doc's word bigrams, bucketed by
    * the portable md5-60 hash mod `dim`. */
  def docBuckets(docs: DataFrame, id: Column, text: Column, dim: Int): DataFrame = {
    require(dim >= 2, "need at least 2 feature buckets")
    val toks = split(text, " ")
    val n = size(toks)
    val grams = zip_with(slice(toks, lit(1), n - 1), slice(toks, lit(2), n - 1),
      (a, b) => concat(a, lit(" "), b))
    docs
      .select(id.as("doc_id"), explode(grams).as("_g"))
      .select(col("doc_id"),
        pmod(graft.functions.PortableHash.md5Hash60(col("_g")), lit(dim))
          .as("bucket"))
  }

  /** ln of the add-1-smoothed bucket probability, 6-dp decimal — the
    * bucket table broadcast-sized (≤ dim rows). */
  /** Same IEEE ops as before the totals became broadcast columns:
    * (long + long) cast double, divide, ln, 6-dp round. */
  private def lnSmoothed(cnt: Column, total: Column, dim: Int): Column =
    round(log((cnt + lit(1L)).cast("double") /
      (total + lit(dim.toLong)).cast("double")), 6)
      .cast(DecimalType(18, 6))

  /** Per-doc importance weights + top-`keepFrac` selection.
    * `isTarget` marks the docs defining the target domain (they are
    * scored too — the ratio is what separates). Output: doc_id,
    * n_feats, logw (double), sel_rank, selected. */
  def importanceSelect(
      docs: DataFrame, id: Column, text: Column, isTarget: Column,
      dim: Int, keepFrac: Double): DataFrame = {
    require(keepFrac > 0 && keepFrac < 1, "keepFrac must be in (0, 1)")
    val spark = docs.sparkSession
    val feats = graft.core.CacheGovernor.persistTracked(
      docBuckets(docs, id, text, dim))
    val tgtIds = docs.filter(isTarget).select(id.as("doc_id"))
    // one flagged view feeds the per-bucket target counts AND the
    // scalar totals — and the totals/doc-count scalars ride along as
    // broadcast 1-row aggregates instead of driver count() actions
    // (zero extra jobs over the persisted feats relation; previously
    // three separate passes)
    val flagged = feats
      .join(tgtIds.withColumn("_t", lit(1L)), Seq("doc_id"), "left")
    val rawTotals = feats.groupBy("bucket").agg(count(lit(1)).as("c_raw"))
    val tgtTotals = flagged.filter(col("_t") === 1)
      .groupBy("bucket").agg(count(lit(1)).as("c_tgt"))
    val totals = flagged.agg(
      count(lit(1)).as("_n_raw"),
      coalesce(sum(col("_t")), lit(0L)).as("_n_tgt"))
    // dim-sized model table: every bucket 0..dim-1 present (missing
    // buckets still carry smoothed mass on both sides)
    val buckets = spark.range(dim).select(col("id").as("bucket"))
    val model = buckets
      .join(rawTotals, Seq("bucket"), "left")
      .join(tgtTotals, Seq("bucket"), "left")
      .crossJoin(broadcast(totals))
      .select(col("bucket"),
        (lnSmoothed(coalesce(col("c_tgt"), lit(0L)), col("_n_tgt"), dim) -
          lnSmoothed(coalesce(col("c_raw"), lit(0L)), col("_n_raw"), dim))
          .as("lr"))
    val scored = feats
      .join(broadcast(model), "bucket")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"),
        sum(col("lr")).as("_logw_dec"))
      .withColumn("logw", col("_logw_dec").cast("double"))
      .drop("_logw_dec")
    val nDocs = broadcast(scored.agg(count(lit(1)).as("_n_docs")))
    val k = greatest(lit(1L),
      ceil(lit(keepFrac) * col("_n_docs")).cast("long"))
    Ranks.distributedRowNumber(scored,
        Seq(col("logw").desc, col("doc_id").asc), "sel_rank")
      .crossJoin(nDocs)
      .withColumn("selected", when(col("sel_rank") <= k, 1).otherwise(0))
      .drop("_n_docs")
  }

  /** The DuckDB replay of [[importanceSelect]], generated with the
    * same constants and fold shapes. `isTargetSql` is a boolean SQL
    * expression over the documents columns. */
  def oracleSql(idCol: String, textCol: String, isTargetSql: String,
      dim: Int, keepFrac: Double): String = {
    val h = graft.functions.PortableHash.md5Hash60Sql("g")
    s"""WITH toks AS (
       |  SELECT $idCol AS doc_id, string_split($textCol, ' ') AS tk,
       |         CASE WHEN $isTargetSql THEN 1 ELSE 0 END AS is_tgt
       |  FROM documents),
       |feats AS (
       |  SELECT doc_id, is_tgt,
       |         ($h) % $dim AS bucket
       |  FROM (SELECT doc_id, is_tgt, tk[i] || ' ' || tk[i + 1] AS g
       |        FROM toks, UNNEST(range(1, len(tk))) AS t(i))),
       |raw_t AS (SELECT bucket, COUNT(*) AS c_raw FROM feats GROUP BY bucket),
       |tgt_t AS (SELECT bucket, COUNT(*) AS c_tgt FROM feats
       |          WHERE is_tgt = 1 GROUP BY bucket),
       |tot AS (SELECT COUNT(*) AS n_raw,
       |               COUNT(*) FILTER (is_tgt = 1) AS n_tgt FROM feats),
       |model AS (
       |  SELECT b.bucket,
       |    CAST(ROUND(LN(CAST(COALESCE(t.c_tgt, 0) + 1 AS DOUBLE)
       |                  / CAST(tot.n_tgt + $dim AS DOUBLE)), 6) AS DECIMAL(18,6))
       |    - CAST(ROUND(LN(CAST(COALESCE(r.c_raw, 0) + 1 AS DOUBLE)
       |                  / CAST(tot.n_raw + $dim AS DOUBLE)), 6) AS DECIMAL(18,6)) AS lr
       |  FROM (SELECT unnest(range(0, $dim)) AS bucket) b
       |  LEFT JOIN raw_t r USING (bucket)
       |  LEFT JOIN tgt_t t USING (bucket)
       |  CROSS JOIN tot),
       |scored AS (
       |  SELECT f.doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats,
       |         CAST(SUM(m.lr) AS DOUBLE) AS logw
       |  FROM feats f JOIN model m USING (bucket)
       |  GROUP BY f.doc_id),
       |ranked AS (
       |  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY logw DESC, doc_id)
       |              AS BIGINT) AS sel_rank,
       |         COUNT(*) OVER () AS n_docs
       |  FROM scored)
       |SELECT doc_id, n_feats, logw, sel_rank,
       |       CASE WHEN sel_rank <= GREATEST(1, CAST(CEIL($keepFrac * n_docs) AS BIGINT))
       |            THEN 1 ELSE 0 END AS selected
       |FROM ranked ORDER BY doc_id""".stripMargin
  }
}
