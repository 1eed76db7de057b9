package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftops.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native dot product over two array<double> columns — the SURVEY.md §4
  * candidate custom Expression for the similarity hot path (J8/X1).
  *
  * Semantics are EXACTLY the HOF composition
  * `aggregate(zip_with(a,b,(x,y)->x*y), 0d, (s,x)->s+x)`: a sequential
  * left-to-right fold, so results stay bit-identical to both the HOF
  * form and DuckDB's list_dot_product (the oracle). The difference is
  * execution: whole-stage codegen emits a primitive double loop over
  * ArrayData, vs. interpreted per-element lambda evaluation — ~10-40×
  * on 64-dim vectors.
  *
  * Nulls: null input array → null (BinaryExpression contract); element
  * nulls are not expected (embeddings are containsNull=false).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // getDouble on an int/float-backed ArrayData silently reads garbage,
  // so reject anything but array<double> at analysis (ExpectsInputTypes
  // is private[sql]; the Column API and GraftExtensions insert casts)
  override def checkInputDataTypes(): TypeCheckResult =
    VectorNative.requireElementType(Seq(left, right), DoubleType, prettyName)

  override def dataType: DataType = DoubleType

  // NULL on length mismatch, matching the HOF composition exactly
  // (zip_with null-pads the shorter side and the null poisons the fold)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val n = x.numElements()
      var s = 0.0
      var i = 0
      while (i < n) {
        s += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

/** Intersection cardinality of two SORTED long arrays — the dedup
  * verify hot path (millions of candidate pairs × ~70-element sets).
  * Two-pointer merge in generated code: O(n+m), zero allocation, vs
  * the hash-set build array_intersect does per call. Same integer
  * result as size(array_intersect(a,b)) for duplicate-free sorted
  * inputs (asserted in ExtensionsSpec). PRECONDITION: callers must
  * array_sort the inputs — Dedup.collapseVerifyExpand does so at its
  * entry; unsorted inputs silently undercount.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  // getLong on an int-backed ArrayData silently reads garbage, so
  // reject anything but array<bigint> at analysis (casts are inserted
  // by the Column API wrappers and the GraftExtensions SQL builders)
  override def checkInputDataTypes(): TypeCheckResult =
    VectorNative.requireElementType(Seq(left, right), LongType, prettyName)

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (n, m) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n = $a.numElements(); int $m = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $n && $j < $m) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_sorted_intersect_size"
}

/** First index where two long arrays agree (`-1` if none) — the
  * skip-earlier-bands primitive of the MinHash candidate join: a band
  * collision row survives iff its band index IS the pair's first
  * matching band, so each candidate pair exits the join exactly once
  * and no dedup shuffle is needed. This predicate runs on EVERY band
  * collision row (19M+ at sf0.1 against 16-element arrays), which is
  * why it is a generated primitive loop: the equivalent
  * exists(zip_with(slice…)) HOF chain is interpreted per row with three
  * array allocations, and profiling it at sf0.1 showed it TRIPLING the
  * whole minhash build's CPU instead of shrinking it. */
case class FirstEqualIndex(left: Expression, right: Expression)
    extends BinaryExpression {

  // getLong on an int-backed ArrayData silently reads garbage, so
  // reject anything but array<bigint> at analysis (casts are inserted
  // by the Column API wrappers and the GraftExtensions SQL builders)
  override def checkInputDataTypes(): TypeCheckResult =
    VectorNative.requireElementType(Seq(left, right), LongType, prettyName)

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) return i
      i += 1
    }
    -1
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val res = ctx.freshName("res")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $res = -1;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) { $res = $i; break; }
         |}
         |${ev.value} = $res;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_first_equal_index"
}

/** Smallest element present in BOTH sorted long arrays (null when the
  * intersection is empty) — the skip-earlier-prefixes primitive of the
  * n-gram PPJoin candidate join, the exact analogue of
  * [[FirstEqualIndex]] for the minhash band join: a prefix collision
  * row survives iff its shingle IS the pair's minimum shared prefix
  * shingle, so each candidate pair exits the self-join on exactly one
  * row and the downstream dropDuplicates shuffle over collision rows
  * disappears. Near-dup pairs share MOST of their ~⌊(1−θ)|S|⌋+1
  * prefix shingles, so collision rows per pair run 10-30× the pair
  * count — this predicate runs on every one of them, which is why it
  * is a generated two-pointer loop (O(|a|+|b|), zero allocation), not
  * an interpreted HOF chain (the minhash measurement showed HOFs 3×
  * worse than the shuffle they replace). PRECONDITION: both arrays
  * sorted ascending; unsorted inputs return an arbitrary common
  * element or miss one entirely. */
case class MinCommonSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    VectorNative.requireElementType(Seq(left, right), LongType, prettyName)

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (n, m) = (x.numElements(), y.numElements())
    var i = 0; var j = 0
    while (i < n && j < m) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) return xv
      else if (xv < yv) i += 1
      else j += 1
    }
    null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val found = ctx.freshName("found")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n = $a.numElements(); int $m = $b.numElements();
         |int $i = 0; int $j = 0; boolean $found = false;
         |while ($i < $n && $j < $m && !$found) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $found = true; ${ev.value} = $xv; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |if (!$found) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_min_common_sorted"
}

object VectorNative {

  /** Analysis-time element-type check shared by the vector family: the
    * generated loops read ArrayData with a fixed-width accessor, so a
    * mismatched element type must fail resolution, not corrupt data. */
  private[plans] def requireElementType(
      es: Seq[Expression], elem: DataType, name: String): TypeCheckResult = {
    val bad = es.find(_.dataType match {
      case ArrayType(et, _) => et != elem
      case _ => true
    })
    bad match {
      case None => TypeCheckResult.TypeCheckSuccess
      case Some(b) => TypeCheckResult.TypeCheckFailure(
        s"$name requires array<${elem.catalogString}> inputs, " +
          s"got ${b.dataType.catalogString}")
    }
  }

  /** Codegen'd |A ∩ B| for sorted, duplicate-free array<long> Columns.
    * The cast guards against int-typed arrays reaching getLong. */
  def sortedIntersectSize(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectSize(
      ColumnBridge.expression(a.cast("array<bigint>")),
      ColumnBridge.expression(b.cast("array<bigint>"))))
  /** Codegen'd dot product of two Columns castable to array<double>. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a.cast("array<double>")),
      ColumnBridge.expression(b.cast("array<double>"))))
  /** Codegen'd first index where two array<long> Columns agree (-1 if
    * none) — the skip-earlier-bands primitive. */
  def firstEqualIndex(a: Column, b: Column): Column =
    ColumnBridge.column(FirstEqualIndex(
      ColumnBridge.expression(a.cast("array<bigint>")),
      ColumnBridge.expression(b.cast("array<bigint>"))))
  /** Codegen'd smallest common element of two SORTED array<long>
    * Columns (null if disjoint) — the skip-earlier-prefixes primitive. */
  def minCommonSorted(a: Column, b: Column): Column =
    ColumnBridge.column(MinCommonSorted(
      ColumnBridge.expression(a.cast("array<bigint>")),
      ColumnBridge.expression(b.cast("array<bigint>"))))
}
