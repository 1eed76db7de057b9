package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftops.ColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass language-ID scorer ([[graft.operators.LangId]]'s hot
  * path): one eval normalizes the head, walks its trigrams ONCE, and
  * probes real java HashMaps for all nine language profiles — output
  * is `[n_grams, s_lang1, …, s_lang9]` as doubles.
  *
  * Why this exists (a bench find, not a guess): the HOF composition
  * (`aggregate` over a gram array with `element_at` on a 300-entry map
  * LITERAL, times nine languages) does not participate in codegen, and
  * interpreted `GetMapValue` on a literal map is a LINEAR KEY SCAN —
  * ~300 string compares × ~254 grams × 9 languages per document
  * (~3.4G compares at a 5k-doc bench scale, minutes of wall). The
  * native eval is one trigram walk with O(1) hash probes; the HOF form
  * survives in LangId as the value-parity reference (LangIdSpec pins
  * native ≡ HOF).
  *
  * Value parity contract with the generated DuckDB oracle (and the HOF
  * form): code-point semantics everywhere — `substringSQL` for the
  * head bound (Spark `substring`), `UTF8String.toLowerCase` (Spark
  * `lower`), the same java.util.regex pattern RegExpReplace compiles,
  * and code-point trigram windows (DuckDB `substr`); contributions
  * accumulate left-to-right in gram order with `+` — the identical
  * IEEE fold. */
case class LangScoresExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    TextHashNative.requireString(child, prettyName)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    import LangScoresExpr._
    val s = input.asInstanceOf[UTF8String]
    val lowered = s.substringSQL(1, graft.operators.LangId.headChars)
      .toLowerCase.toString
    val norm = "_" + pattern.matcher(lowered).replaceAll("_") + "_"
    val cps = norm.codePoints.toArray
    val ng = math.max(cps.length - 2, 0)
    val out = new Array[Double](1 + maps.length)
    out(0) = ng.toDouble
    var i = 0
    while (i < ng) {
      val gram = new String(cps, i, 3)
      var l = 0
      while (l < maps.length) {
        val v = maps(l).get(gram)
        out(l + 1) += (if (v == null) floors(l) else v.doubleValue())
        l += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LangScoresExpr {
  private val pattern = java.util.regex.Pattern.compile("[^\\p{L}]+")

  /** Static per-language profile maps, built once from the SAME
    * class-load profiles the HOF form and the generated oracle use. */
  private val (maps, floors): (Array[java.util.HashMap[String, java.lang.Double]], Array[Double]) = {
    val ps = graft.operators.LangId.profiles
    val ms = ps.map { case (_, probs, _) =>
      val m = new java.util.HashMap[String, java.lang.Double](probs.size * 2)
      probs.foreach { case (g, v) => m.put(g, v) }
      m
    }.toArray
    (ms, ps.map(_._3).toArray)
  }

  def scores(text: Column): Column =
    ColumnBridge.column(LangScoresExpr(ColumnBridge.expression(text)))
}
