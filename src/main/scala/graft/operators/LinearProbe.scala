package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Trainable LINEAR QUALITY PROBE — the learning-side companion of the
  * engine's fixed quality heuristics (N9 quality scores, N83 bigram-LM
  * perplexity): curation pipelines routinely fit a small linear model
  * over cheap per-doc features to approximate an expensive quality
  * judgment, then score the whole corpus with it (public practice:
  * fastText/linear quality classifiers in CCNet, Dolma, RefinedWeb).
  * This operator trains that probe DISTRIBUTED and bit-reproducibly:
  * batch gradient descent on squared loss, k fixed iterations.
  *
  * Scale shape (the KMeans/PageRank iterative-driver contract): the
  * corpus maps once per iteration through a PROJECTION that embeds the
  * current weight vector as literals, one map-side-combining aggregate
  * produces the m gradient components (m+2 numbers total cross the
  * wire), and the driver updates m doubles — no per-row state, no
  * corpus-sized shuffle, k·1 jobs. 100 TB enters only through the
  * per-iteration scan.
  *
  * Bit-reproducibility (the PageRank oracle-parity discipline): every
  * per-row float product floor-quantizes to integer nano-units before
  * the distributed sum (floor is tie-free on identical IEEE inputs,
  * where 9-dp ROUND half-up ties broke cross-engine), sums run as
  * DECIMAL(28,0) (a BIGINT sum would wrap silently past 9.2e18 at
  * 100 TB row counts), and the weight-update arithmetic is the same
  * left-fold expression tree on both engines — the ORACLE IS GENERATED
  * FROM THE SAME feature fragments, constants and fold order that
  * drive the Spark loop ([[oracleSql]]), so engine and oracle cannot
  * drift. All features are exact ratios of integers (IEEE-identical in
  * any engine); no transcendentals anywhere (sigmoid would hit libm
  * last-ulp divergence cross-engine — squared loss keeps the whole
  * trainer inside +,·,/,floor).
  */
object LinearProbe {

  /** (name, Spark column, DuckDB SQL) per feature — ONE source of
    * truth for both engines. f0 is the intercept; the rest are exact
    * integer ratios in [0, ~1]. */
  def featureDefs(text: Column, textSql: String): Seq[(String, Column, String)] = {
    val toks = split(text, " ")
    val nToks = size(toks)
    val chars = length(text)
    Seq(
      ("intercept", lit(1.0), "1.0"),
      ("len_capped",
        least(chars, lit(2000)).cast("double") / 2000.0,
        s"CAST(LEAST(length($textSql), 2000) AS DOUBLE) / 2000.0"),
      ("tokens_capped",
        least(nToks, lit(100)).cast("double") / 100.0,
        s"CAST(LEAST(len(string_split($textSql, ' ')), 100) AS DOUBLE) / 100.0"),
      ("distinct_ratio",
        size(array_distinct(toks)).cast("double") / nToks.cast("double"),
        s"CAST(len(list_distinct(string_split($textSql, ' '))) AS DOUBLE)" +
          s" / CAST(len(string_split($textSql, ' ')) AS DOUBLE)"),
      ("mean_tok_len",
        (chars - nToks + 1).cast("double") / nToks.cast("double") / 10.0,
        s"CAST(length($textSql) - len(string_split($textSql, ' ')) + 1 AS DOUBLE)" +
          s" / CAST(len(string_split($textSql, ' ')) AS DOUBLE) / 10.0"),
      ("short_ratio",
        size(filter(toks, t => length(t) <= 2)).cast("double") /
          nToks.cast("double"),
        s"CAST(len(list_filter(string_split($textSql, ' '), t -> len(t) <= 2)) AS DOUBLE)" +
          s" / CAST(len(string_split($textSql, ' ')) AS DOUBLE)"))
  }

  /** Planted regression target: a fixed linear combination of the
    * features (so the probe has real signal to descend on), computed
    * with ONE fold order on both engines. */
  val targetWeights: Seq[(Int, Double)] = Seq(1 -> 0.3, 3 -> 0.5, 5 -> -0.2)
  val targetBias: Double = 0.1

  def targetCol(feats: Seq[Column]): Column =
    targetWeights.foldLeft(lit(targetBias): Column) { case (acc, (j, w)) =>
      acc + lit(w) * feats(j)
    }

  def targetSql(featSqls: Seq[String]): String =
    targetWeights.foldLeft(targetBias.toString) { case (acc, (j, w)) =>
      s"($acc + $w * ${featSqls(j)})"
    }

  private def predCol(w: Seq[Double], feats: Seq[Column]): Column =
    w.zip(feats).map { case (wi, fi) => lit(wi) * fi }
      .reduceLeft(_ + _)

  private def predSql(wSqls: Seq[String], featSqls: Seq[String]): String =
    wSqls.zip(featSqls).map { case (wi, fi) => s"$wi * $fi" }
      .reduceLeft((a, b) => s"($a + $b)")

  /** Train k iterations at learning rate `lr` on the docs' text
    * column; returns the weight trajectory's endpoints —
    * (featureIdx, name, final weight, first/last iteration training
    * MSE) — with every emitted float floor-quantized to nano-units.
    * One aggregate job per iteration (+1 for the final MSE). */
  def train(docs: DataFrame, text: Column, iters: Int, lr: Double): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    val spark = docs.sparkSession
    val defs = featureDefs(text, "text")
    val feats = defs.map(_._2)
    val y = targetCol(feats)
    val m = defs.size

    def quantSum(c: Column): Column =
      sum(floor(c * lit(1.0e9)).cast("decimal(28,0)"))
    def toG(sumRow: Row, i: Int, n: Long): Double =
      sumRow.getDecimal(i).doubleValue() / n.toDouble / 1.0e9

    var w = Seq.fill(m)(0.0)
    var mseFirst = 0.0
    var mseLast = 0.0
    (1 to iters).foreach { it =>
      val resid = predCol(w, feats) - y
      val aggs = defs.indices.map(j => quantSum(resid * feats(j)).as(s"g$j")) :+
        quantSum(resid * resid).as("sq") :+ count(lit(1)).as("n")
      val row = docs.agg(aggs.head, aggs.tail: _*).head()
      val n = row.getLong(m + 1)
      val mse = toG(row, m, n)
      if (it == 1) mseFirst = mse
      mseLast = mse // MSE *entering* the last update, matching the oracle
      w = w.zipWithIndex.map { case (wj, j) => wj - lr * toG(row, j, n) }
    }
    import spark.implicits._
    defs.zipWithIndex.map { case ((name, _, _), j) =>
      (j.toLong, name, math.floor(w(j) * 1.0e9).toLong,
        math.floor(mseFirst * 1.0e9).toLong, math.floor(mseLast * 1.0e9).toLong)
    }.toDF("feature_idx", "feature", "weight_q", "mse_first_q", "mse_last_q")
  }

  /** The unrolled DuckDB replay of [[train]], generated from the SAME
    * feature fragments, target fold, fold orders and constants. */
  def oracleSql(textSql: String, iters: Int, lr: Double): String = {
    val defs = featureDefs(lit(""), textSql) // columns unused here
    val featSqls = defs.map(_._3)
    val m = defs.size
    val featCols = featSqls.zipWithIndex
      .map { case (f, j) => s"$f AS f$j" }.mkString(",\n         ")
    val y = targetSql((0 until m).map(j => s"f$j"))
    def gradCte(it: Int): String = {
      val wRefs = (0 until m).map(j => s"w.w$j")
      val pred = predSql(wRefs, (0 until m).map(j => s"d.f$j"))
      val sums = (0 until m).map(j =>
        s"SUM(CAST(FLOOR((($pred - d.y) * d.f$j) * 1.0E9) AS DECIMAL(28,0))) AS s$j")
        .mkString(",\n           ")
      s"""g$it AS (
         |  SELECT $sums,
         |           SUM(CAST(FLOOR((($pred - d.y) * ($pred - d.y)) * 1.0E9) AS DECIMAL(28,0))) AS sq,
         |           COUNT(*) AS n
         |  FROM feats d CROSS JOIN w${it - 1} w)""".stripMargin
    }
    def stepCte(it: Int): String = {
      val ws = (0 until m).map(j =>
        s"w.w$j - $lr * (CAST(g.s$j AS DOUBLE) / CAST(g.n AS DOUBLE) / 1.0E9) AS w$j")
        .mkString(",\n         ")
      s"""w$it AS (
         |  SELECT $ws
         |  FROM w${it - 1} w CROSS JOIN g$it g)""".stripMargin
    }
    val names = defs.map(_._1)
    val nameCase = names.zipWithIndex
      .map { case (n, j) => s"WHEN $j THEN '$n'" }.mkString(" ")
    val weightCase = (0 until m)
      .map(j => s"WHEN $j THEN w.w$j").mkString(" ")
    s"""WITH feats AS (
       |  SELECT $featCols,
       |         ${targetSql(featSqls)} AS y
       |  FROM documents),
       |w0 AS (SELECT ${(0 until m).map(j => s"0.0 AS w$j").mkString(", ")}),
       |${(1 to iters).map(it => gradCte(it) + ",\n" + stepCte(it)).mkString(",\n")},
       |idx AS (SELECT unnest(range(0, $m)) AS feature_idx)
       |SELECT i.feature_idx,
       |       CASE i.feature_idx $nameCase END AS feature,
       |       CAST(FLOOR((CASE i.feature_idx $weightCase END) * 1.0E9) AS BIGINT) AS weight_q,
       |       CAST(FLOOR((CAST(g1.sq AS DOUBLE) / CAST(g1.n AS DOUBLE) / 1.0E9) * 1.0E9) AS BIGINT) AS mse_first_q,
       |       CAST(FLOOR((CAST(gl.sq AS DOUBLE) / CAST(gl.n AS DOUBLE) / 1.0E9) * 1.0E9) AS BIGINT) AS mse_last_q
       |FROM idx i CROSS JOIN w$iters w CROSS JOIN g1 CROSS JOIN g$iters gl
       |ORDER BY feature_idx""".stripMargin
  }

  /** Score a corpus under a trained weight vector: one projection. */
  def score(docs: DataFrame, text: Column, w: Seq[Double]): Column =
    predCol(w, featureDefs(text, "text").map(_._2))
}
