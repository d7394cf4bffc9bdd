package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleaving for the multi-dimensional layout lever
  * ([[graft.sources.Layout.saveZOrdered]]).
  *
  * A range-sort clusters files on ONE dimension: a scan filtering the
  * second column still touches every file because each file spans that
  * column's full range. Interleaving the bits of two keys makes
  * consecutive z-values trace a space-filling curve, so a contiguous
  * z-range (= one output file of a range-partitioned write) covers a
  * COMPACT rectangle in (a, b) space and parquet footer min/max stats
  * become selective on BOTH columns at once. The bit-spreading uses the
  * standard parallel-prefix mask sequence (public bit-twiddling folklore,
  * e.g. "Interleave bits by Binary Magic Numbers" from Stanford's Bit
  * Twiddling Hacks page).
  */
object ZOrder {

  /** Spread the low 31 bits of `x` to even positions 0,2,4,…,60. */
  def spread(x: Long): Long = {
    var v = x & 0x7FFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** 62-bit Morton code of the low 31 bits of each input (negatives clamp
    * to 0, larger values to 2³¹−1 — ordering keys, not values, so clamping
    * only costs resolution at the extreme ends). Always non-negative, so
    * plain signed-long ordering IS z-curve ordering. */
  def interleave(a: Long, b: Long): Long = {
    val ca = math.min(math.max(a, 0L), 0x7FFFFFFFL)
    val cb = math.min(math.max(b, 0L), 0x7FFFFFFFL)
    (spread(ca) << 1) | spread(cb)
  }
}

/** Codegen'd `z_value(a, b)`: the Morton code of two long keys, for
  * write-path clustering. Null-intolerant like every layout key. */
case class ZValueExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two bigint arguments, " +
          s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "z_value"

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrder$$.MODULE$$.interleave($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object ZValueExpr {
  /** Column API entry point; casts both keys to long (date dimensions:
    * pass `unix_date(c)` — days since epoch). */
  def z_value(a: Column, b: Column): Column =
    GraftBridge.column(ZValueExpr(
      GraftBridge.expression(a.cast("long")),
      GraftBridge.expression(b.cast("long"))))
}
