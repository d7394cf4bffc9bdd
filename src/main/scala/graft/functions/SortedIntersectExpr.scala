package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: |A ∩ B| for two SORTED `array<bigint>`
  * columns in one fused, codegen'd merge loop.
  *
  * Spark's built-in `array_intersect` builds a hash set per ROW and
  * materializes the intersection array — for a candidate-pair rescoring
  * join that evaluates hundreds of thousands of ~1e3-element pairs, the
  * per-row allocation dominates. When both inputs are sorted (sort once
  * per DOCUMENT, upstream of the pair join), the count needs only a
  * two-pointer merge: O(n+m) primitive comparisons, zero allocation,
  * and the result array — which the caller never wanted — is never
  * built. Duplicate elements are counted once per distinct match (both
  * sides advance past equal runs), so on distinct-element inputs this
  * equals `size(array_intersect(a, b))` exactly.
  *
  * SORTEDNESS IS A PRECONDITION, not checked (a check would cost the
  * same pass the merge does): unsorted input gives an undercount. Null
  * arrays → null; null ELEMENTS are not expected (hash arrays) and sort
  * first in Spark's array_sort — they'd compare as a run like any
  * value. */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements(); val m = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < n && j < m) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else {
        c += 1
        val v = x
        while (i < n && a.getLong(i) == v) i += 1
        while (j < m && b.getLong(j) == v) j += 1
      }
    }
    c
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val c = ctx.freshName("c"); val x = ctx.freshName("x")
      val y = ctx.freshName("y"); val v = ctx.freshName("v")
      s"""
         |final int $n = $a.numElements();
         |final int $m = $b.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $n && $j < $m) {
         |  final long $x = $a.getLong($i);
         |  final long $y = $b.getLong($j);
         |  if ($x < $y) { $i++; }
         |  else if ($x > $y) { $j++; }
         |  else {
         |    $c++;
         |    final long $v = $x;
         |    while ($i < $n && $a.getLong($i) == $v) { $i++; }
         |    while ($j < $m && $b.getLong($j) == $v) { $j++; }
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object SortedIntersectCountExpr {
  /** Column API entry point — inputs MUST be sorted `array<bigint>`
    * (undercounts silently otherwise). `private[graft]` on purpose: the
    * precondition is upheld by construction inside this library
    * (`array_sort` upstream in every caller, parity-pinned by
    * ScalableDedupSpec) but is unchecked at runtime, so the trap is
    * compile-fenced from external callers rather than exported. */
  private[graft] def sorted_intersect_count(a: Column, b: Column): Column =
    GraftBridge.column(SortedIntersectCountExpr(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
