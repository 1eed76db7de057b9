package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** BM25 ranked retrieval — keyword search over the corpus (the
  * reference's knowledge-base lookup surface, README.md:11 "suggests
  * resolutions from a growing knowledge base"; the training-data twin
  * is query-driven corpus curation).
  *
  * Okapi BM25 with the standard (k1, b) shape and the +1 idf variant
  * (Robertson/Sparck Jones; the Lucene default):
  *
  *   idf(t)    = ln(1 + (N - df + 0.5) / (df + 0.5))
  *   score(d)  = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
  *
  * Scale shape: the tokenizer explodes once; document length is one
  * groupBy(doc); the tf/df aggregates run on the QUERY-FILTERED token
  * stream (the `isin` filter lands before the shuffle, so the heavy
  * aggregation moves only rows whose term is in the query — O(query
  * matches), not O(corpus tokens)). Corpus-level constants (N, avgdl)
  * and the per-term df ride a single-row / |Q|-row broadcast. The final
  * ranking is a global top-k → TakeOrderedAndProject, no full sort.
  *
  * Oracle parity: per-(doc, term) partials are rounded to 6 dp and
  * summed as exact DECIMAL(18,6) — addition order can't matter, and the
  * one libm ln() sits behind the rounding (the TF-IDF trick).
  */
object Retrieval {

  /** Top-k documents for a bag-of-words query. Output: (id, score, rank)
    * with `score` the 6-dp-rounded BM25 sum. */
  def bm25TopK(
      docs: DataFrame,
      id: String,
      text: Column,
      query: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "query must have at least one term")
    require(k > 0, "k must be positive")
    val tok = docs.select(col(id), explode(TextAnalysis.wsTokens(text)).as("term"))
    val dl = tok.groupBy(col(id)).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(
      sum(col("dl")).cast("double").as("_sumdl"),
      count(lit(1)).cast("double").as("_n"))
    val qtok = tok.filter(col("term").isin(query: _*))
    val tf = qtok.groupBy(col(id), col("term")).agg(count(lit(1)).as("tf"))
    val dfc = qtok.groupBy(col("term")).agg(countDistinct(col(id)).as("df"))
    val idf = log(lit(1.0) + (col("_n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val part = tf
      .join(broadcast(dfc), "term")
      .join(dl, Seq(id))
      .crossJoin(broadcast(stats))
      .withColumn("_avgdl", col("_sumdl") / col("_n"))
      .withColumn("_part",
        round(idf * ((col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("_avgdl")))), 6)
          .cast(DecimalType(18, 6)))
    part
      .groupBy(col(id))
      .agg(sum(col("_part")).cast("double").as("score"))
      .orderBy(col("score").desc, col(id).asc)
      .limit(k)
  }

  /** Reciprocal-rank fusion (Cormack et al.) of two rankings — the
    * standard hybrid-retrieval combiner (lexical BM25 ⊕ semantic ANN):
    * score(d) = Σ_r 1/(c + rank_r(d)), ids absent from a ranking
    * contribute nothing from it. Rank-based, so the two score scales
    * never need calibrating.
    *
    * Inputs are (id, rank) frames already bounded to their own top-k —
    * the fuse is a full-outer join over ≤ 2k rows and a global top-k
    * (TakeOrderedAndProject); nothing here touches corpus-sized data.
    * The score is the explicit two-term sum written left-to-right, so
    * an external SQL engine evaluating the same expression produces
    * bit-identical doubles. Output: (id, rank_a, rank_b, rrf). */
  def rrfFuse(a: DataFrame, b: DataFrame, id: String, c: Int, k: Int): DataFrame = {
    require(c >= 1 && k >= 1, "need c ≥ 1 and k ≥ 1")
    val l = a.select(col(id), col("rank").cast("long").as("rank_a"))
    val r = b.select(col(id), col("rank").cast("long").as("rank_b"))
    l.join(r, Seq(id), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(c.toLong) + col("rank_a")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c.toLong) + col("rank_b")), lit(0.0)))
      .orderBy(col("rrf").desc, col(id).asc)
      .limit(k)
  }
}
