package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** SparkSessionExtensions entry point (SURVEY.md §2.10/X1): registers
  * the engine's native functions with the SQL surface, so e.g.
  * `SELECT graft_dot(a, b)` or `SELECT graft_simhash60(text)` work in
  * spark.sql exactly as through the Column API. Inject via
  * `SparkSession.builder().withExtensions(new GraftExtensions)` — done
  * by core.GraftSession.
  *
  * Parameterized functions (shingle n, minhash k, CDC window/divisor)
  * take their parameters as foldable integer literals — they become
  * compile-time constants of the generated code, same as the Column
  * API's Int arguments.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Evaluate a foldable argument to Int (SQL-literal parameters). */
  private def litInt(e: Expression, fn: String, pos: Int): Int = {
    require(e.foldable, s"$fn: argument ${pos + 1} must be an integer literal")
    e.eval(null) match {
      case i: Int => i
      case l: Long => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other =>
        throw new IllegalArgumentException(
          s"$fn: argument ${pos + 1} must be an integer literal, got $other")
    }
  }

  /** The array-reading expressions access ArrayData with fixed-width
    * getLong/getDouble, which silently reads garbage on an int- or
    * float-backed array (e.g. the SQL literal `array(1,3,5)` is
    * array<int>). The Column API wrappers cast at their entry; the SQL
    * surface inserts the same cast here, so mismatched-but-coercible
    * inputs are fixed up and incoercible ones fail analysis (the
    * expressions' own checkInputDataTypes is the backstop). */
  private def asArrayOf(elem: DataType)(child: Expression): Expression =
    Cast(child, ArrayType(elem))

  private val asLongs = asArrayOf(LongType) _
  private val asDoubles = asArrayOf(DoubleType) _

  private def reg(
      e: SparkSessionExtensions, name: String, clazz: Class[_])(
      builder: Seq[Expression] => Expression): Unit =
    e.injectFunction((
      FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, name),
      builder))

  override def apply(e: SparkSessionExtensions): Unit = {
    reg(e, "graft_dot", classOf[DotProduct]) {
      exprs => DotProduct(asDoubles(exprs.head), asDoubles(exprs(1)))
    }
    reg(e, "graft_sorted_intersect_size", classOf[SortedIntersectSize]) {
      exprs => SortedIntersectSize(asLongs(exprs.head), asLongs(exprs(1)))
    }
    reg(e, "graft_first_equal_index", classOf[FirstEqualIndex]) {
      exprs => FirstEqualIndex(asLongs(exprs.head), asLongs(exprs(1)))
    }
    reg(e, "graft_min_common_sorted", classOf[MinCommonSorted]) {
      exprs => MinCommonSorted(asLongs(exprs.head), asLongs(exprs(1)))
    }
    reg(e, "graft_token_hash_set", classOf[TokenHashSetExpr]) {
      exprs => TokenHashSetExpr(exprs.head)
    }
    reg(e, "graft_shingle_hash_set", classOf[ShingleHashSetExpr]) {
      exprs => ShingleHashSetExpr(exprs.head,
        litInt(exprs(1), "graft_shingle_hash_set", 1))
    }
    reg(e, "graft_minhash_sig", classOf[MinHashSigExpr]) {
      exprs => MinHashSigExpr(asLongs(exprs.head),
        litInt(exprs(1), "graft_minhash_sig", 1))
    }
    reg(e, "graft_simhash60", classOf[SimHash60Expr]) {
      exprs => SimHash60Expr(exprs.head)
    }
    reg(e, "graft_cdc_boundaries", classOf[CdcBoundariesExpr]) {
      exprs => CdcBoundariesExpr(exprs.head,
        litInt(exprs(1), "graft_cdc_boundaries", 1),
        litInt(exprs(2), "graft_cdc_boundaries", 2))
    }
    reg(e, "graft_deletion_hash_set", classOf[DeletionHashSetExpr]) {
      exprs => DeletionHashSetExpr(exprs.head)
    }
    reg(e, "graft_hashed_count_vec", classOf[HashedCountVecExpr]) {
      exprs => HashedCountVecExpr(exprs.head,
        litInt(exprs(1), "graft_hashed_count_vec", 1))
    }
  }
}
