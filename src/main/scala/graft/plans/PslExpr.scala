package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftops.ColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Registrable-domain extraction as one native probe
  * ([[graft.operators.PublicSuffix]]'s hot path): split the host once,
  * walk the PSL match order (exceptions, then effective rule lengths
  * longest-first) against STATIC shared HashSets of the full parsed
  * rule snapshot, return the domain.
  *
  * Why this exists (a bench find): the Column form compiles the ~9.5k
  * parsed rules into `In`/`InSet` literal lists — ~8k Literal nodes
  * per query plan, a ~1.3 MB task binary, and ~1.1 s of added
  * plan-build/codegen time on EVERY query that touches domains (pure
  * fixed cost, paid per query, not per row). The native form keeps
  * the rule sets as class-state shared across all tasks: the plan
  * carries one expression node, and each row costs ≤ 5 suffix builds
  * + O(1) set probes. The Column form survives as
  * [[graft.operators.PublicSuffix.registrableDomain]] — the parity
  * reference WebCurationSpec pins this expression against — and the
  * generated DuckDB oracle derives from the same parsed rule sets as
  * both.
  *
  * Value parity: labels split on literal '.' with Spark `split`'s
  * keep-trailing-empties semantics (java regex split, limit -1);
  * suffixes past the front of the host never match (the Column form's
  * empty-slice guard). */
case class RegistrableDomainExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    TextHashNative.requireString(child, prettyName)

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any = {
    import RegistrableDomainExpr._
    val host = input.asInstanceOf[UTF8String].toString
    val labels = host.split("\\.", -1)
    val n = labels.length
    def suf(k: Int): String =
      labels.slice(n - k, n).mkString(".")
    var plen = 0
    // exceptions beat every other match
    var i = 0
    while (plen == 0 && i < excByLen.length) {
      val (e, set) = excByLen(i)
      if (e <= n && set.contains(suf(e))) plen = e - 1
      i += 1
    }
    // then longest effective rule length wins; within a length the
    // exact/wildcard order is immaterial (both yield the length)
    var m = maxLen
    while (plen == 0 && m >= 2) {
      val ex = exactByLen.get(m)
      if (ex != null && m <= n && ex.contains(suf(m))) plen = m
      else {
        val w = wildByLen.get(m - 1)
        if (w != null && m - 1 <= n && n >= m && w.contains(suf(m - 1)))
          plen = m
      }
      m -= 1
    }
    if (plen == 0) plen = 1 // the implicit default rule
    val out = if (n <= plen) host
    else labels.slice(n - plen - 1, n).mkString(".")
    UTF8String.fromString(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RegistrableDomainExpr {
  private def toSet(rs: Seq[String]): java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](rs.size * 2)
    rs.foreach(s.add)
    s
  }

  /** Static shared views of the SAME parsed rule snapshot the Column
    * form and the generated oracle SQL use. */
  private val excByLen: Array[(Int, java.util.HashSet[String])] =
    graft.operators.PublicSuffix.exceptionsByLen
      .map { case (e, rs) => (e, toSet(rs)) }.toArray
  private val exactByLen: java.util.HashMap[Int, java.util.HashSet[String]] = {
    val m = new java.util.HashMap[Int, java.util.HashSet[String]]()
    graft.operators.PublicSuffix.exactByLen.foreach { case (k, rs) =>
      m.put(k, toSet(rs))
    }
    m
  }
  private val wildByLen: java.util.HashMap[Int, java.util.HashSet[String]] = {
    val m = new java.util.HashMap[Int, java.util.HashSet[String]]()
    graft.operators.PublicSuffix.wildcardByLen.foreach { case (k, rs) =>
      m.put(k, toSet(rs))
    }
    m
  }
  private val maxLen: Int = graft.operators.PublicSuffix.maxRuleLabels

  def domain(host: Column): Column =
    ColumnBridge.column(RegistrableDomainExpr(ColumnBridge.expression(host)))
}
