package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Physical plan-SHAPE signatures for the whole query registry — the
  * regression gate the hash oracle cannot be: a change that swaps a
  * broadcast join for a shuffle join (or doubles the exchange count)
  * usually still returns identical rows, so it sails through the
  * correctness sweep and only surfaces as a bench drift two artifacts
  * later. The signature pins each query's operator MULTISET plus its
  * exchange counts at plan time; PlanSignatureSpec diffs every query
  * against the checked-in `plan_signatures.json` and fails the build on
  * any unreviewed shape change.
  *
  * A signature is environment-stable by construction: it keeps node
  * NAMES only (no locations, sizes, partition counts, or codegen ids),
  * sorted into a canonical `op=count` multiset string. Plans are taken
  * PRE-execution (AQE initial plan) — deterministic for fixed data and
  * conf, unlike the runtime-adapted final plan.
  *
  * Regenerate deliberately after a reviewed plan change:
  *   runMain graft.tools.PlanSignature   (rewrites plan_signatures.json)
  */
object PlanSignature {

  /** Canonical shape signature of a DataFrame's physical plan. */
  def of(df: DataFrame): String = {
    val formatted =
      df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    // Tree lines in formatted mode: "   +- * HashAggregate (12)" /
    // "Scan parquet  (1)". Keep the node name, drop the numbering —
    // ids shift whenever any subtree grows, names are the shape.
    val node = """^[\s:+\-]*\*?\s*([A-Za-z][A-Za-z0-9 #.$]*?)\s+\((\d+)\)\s*$""".r
    val names = formatted.linesIterator.collect {
      case node(name, _) => name.trim
    }.toSeq
    names.groupBy(identity).toSeq.sortBy(_._1)
      .map { case (n, xs) => s"$n=${xs.size}" }.mkString("; ")
  }

  /** Signatures for every registry query at the given sf dir, with the
    * Verify isolation contract (CacheGovernor.reset between builds) so
    * shared-relation caching cannot make a signature depend on build
    * order. */
  def registrySignatures(
      spark: org.apache.spark.sql.SparkSession,
      sfDir: String): Seq[(String, String)] =
    graft.SparkEntry.specs.sortBy(_.name).map { q =>
      val sig =
        try of(q.build(spark, sfDir))
        catch { case e: Throwable => s"BUILD_FAILED: ${e.getClass.getSimpleName}" }
      graft.core.CacheGovernor.reset(spark)
      q.name -> sig
    }

  val defaultPath = "plan_signatures.json"
  val defaultSf = "/root/testdata/sf0.001"

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(defaultSf)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.core.GraftSession.local(cpus.toInt)
    val sigs = registrySignatures(spark, sfDir)
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val json = sigs
      .map { case (k, v) => s"""  "${esc(k)}": "${esc(v)}"""" }
      .mkString("{\n", ",\n", "\n}\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(defaultPath), json)
    println(s"PLAN_SIGNATURES: ${sigs.size} queries -> $defaultPath")
    spark.stop()
  }
}
