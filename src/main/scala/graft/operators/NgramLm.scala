package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** N-gram language-model perplexity scoring — the canonical corpus
  * quality filter (CCNet and its descendants score every document
  * against a reference LM and drop the high-perplexity tail; reference
  * README.md:102 "training data preparation"). This is the bigram
  * add-k form: big enough to catch word-salad and boilerplate, small
  * enough that the model is a COUNT TABLE the engine itself builds —
  * no external artifacts.
  *
  *   P(r | l) = (C(l,r) + k) / (C(l·) + k·V)
  *   xent(doc) = −mean over the doc's bigrams of ln P(r | l)
  *
  * (perplexity = exp(xent); the monotone xent is emitted — one exp
  * per row adds float risk and no ranking information.)
  *
  * Scale shape: the model is one corpus pass (explode bigrams →
  * map-side-combinable groupBy; the left-context totals ride a window
  * over the bigram GRID, never over data; V is a 1-row broadcast).
  * Scoring shuffles O(doc bigrams) through two equi-joins against the
  * count tables. Unseen bigrams under a FOREIGN model degrade smoothly:
  * C(l,r) and C(l·) coalesce to 0, giving P = 1/V.
  *
  * Oracle parity: each ln rounds to 6 dp before the exact-decimal
  * per-doc sum (the BM25/TF-IDF discipline), then ONE double division
  * by the bigram count — the whole score table hash-matches DuckDB. */
object NgramLm {

  /** The bigram count model of a corpus: one row per distinct (l, r)
    * with C(l,r), the left-context total C(l·), and the corpus vocab
    * size V attached (broadcast 1-row). */
  def bigramModel(docs: DataFrame, text: Column): DataFrame = {
    val toks = docs.select(split(text, " ").as("_tk"))
    val pairs = toks.select(explode(bigramsOf(col("_tk"))).as("_p"))
      .groupBy(col("_p.l").as("l"), col("_p.r").as("r"))
      .agg(count(lit(1)).as("c_lr"))
    val v = toks.select(explode(col("_tk")).as("_w"))
      .agg(countDistinct(col("_w")).as("v"))
    pairs
      .withColumn("c_l", sum(col("c_lr")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("l")))
      .crossJoin(broadcast(v))
  }

  /** Adjacent-token (l, r) structs of a token array (the shared
    * Bpe.pairsOf expression — symbols and tokens pair identically). */
  private def bigramsOf(tk: Column): Column = Bpe.pairsOf(tk)

  /** Score `docs` against `model` (a [[bigramModel]] frame): one row
    * per doc with ≥ 1 bigram — (doc_id, n_bigrams, xent). Lower xent =
    * more in-distribution; filter the high tail. */
  def crossEntropy(
      docs: DataFrame, id: Column, text: Column,
      model: DataFrame, k: Double = 0.5): DataFrame = {
    require(k > 0, "add-k smoothing needs k > 0")
    val big = docs
      .select(id.as("doc_id"), split(text, " ").as("_tk"))
      .select(col("doc_id"), explode(bigramsOf(col("_tk"))).as("_p"))
      .select(col("doc_id"), col("_p.l").as("l"), col("_p.r").as("r"))
    val lr = model.select("l", "r", "c_lr")
    val lc = model.select(col("l"), col("c_l")).distinct()
    // V is a corpus constant: broadcast the 1-row value so a foreign-
    // model miss (NULL c_lr/c_l) still prices at 1/V — never a global
    // window over the scored bigrams
    val v1 = model.select(col("v")).limit(1)
    big
      .join(lr, Seq("l", "r"), "left")
      .join(lc, Seq("l"), "left")
      .crossJoin(broadcast(v1)).withColumnRenamed("v", "_v")
      .withColumn("_logp",
        round(log(
          (coalesce(col("c_lr"), lit(0L)) + lit(k)) /
            (coalesce(col("c_l"), lit(0L)) + lit(k) * col("_v"))), 6)
          .cast(DecimalType(18, 6)))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        (-(sum(col("_logp")).cast("double")) / count(lit(1))).as("xent"))
  }

  /** [[crossEntropy]] of a corpus against its OWN bigram model — the
    * standard self-scored quality pass (every bigram is in-model). */
  def selfCrossEntropy(
      docs: DataFrame, id: Column, text: Column, k: Double = 0.5): DataFrame =
    crossEntropy(docs, id, text, bigramModel(docs, text), k)
}
