package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{MaxBy, MinBy}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite the "latest row per key" window pattern
  *
  * {{{ Filter(rn = 1, Window(row_number() OVER (PARTITION BY k ORDER BY t [DESC]) AS rn, child)) }}}
  *
  * into a plain aggregate
  *
  * {{{ Aggregate(k, [k, max_by(c, t) forall other c, 1 AS rn], child) }}}
  *
  * The window form shuffles every row on k and then fully sorts each
  * partition; the aggregate form is map-side combinable — each task keeps
  * one running winner per key before the exchange, which at 100 TB is the
  * difference between shuffling the table and shuffling one row per key.
  * (SURVEY.md §4 names exactly this rewrite as the justified custom
  * Catalyst work; the as-of join operator uses the max_by form directly —
  * this rule gives user-written window queries the same plan.)
  *
  * Semantics: row_number over duplicate ordering keys is tie-ambiguous,
  * and so is max_by — the rewrite preserves the determinism contract the
  * query already had. Applied only to the narrow, provably-safe shape:
  * single row_number window expression, non-empty attribute-only partition
  * keys (a global window differs on empty input), a single NON-NULLABLE
  * ordering key (max_by/min_by skip null ordering keys, which diverges
  * from row_number under custom null ordering or all-null groups), rn
  * compared to 1.
  */
object LatestPerKeyRule extends Rule[LogicalPlan] {

  /** Install on a running session (appends to user-provided optimizations;
    * idempotent; synchronized so concurrent installs can't drop each
    * other's write). */
  def install(spark: SparkSession): Unit = spark.experimental.synchronized {
    if (!spark.experimental.extraOptimizations.contains(this)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
    }
  }

  private def isRnFilter(cond: Expression, rnId: ExprId): Boolean = cond match {
    case EqualTo(a: AttributeReference, Literal(1, IntegerType)) => a.exprId == rnId
    case EqualTo(Literal(1, IntegerType), a: AttributeReference) => a.exprId == rnId
    case LessThanOrEqual(a: AttributeReference, Literal(1, IntegerType)) => a.exprId == rnId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case Filter(cond,
        w @ Window(Seq(Alias(WindowExpression(_: RowNumber, spec), rnName)), partitionSpec, Seq(order), child, _))
        if isRnFilter(cond, w.windowExpressions.head.exprId)
          // non-empty attribute partition keys: a GLOBAL latest-row window
          // returns 0 rows on empty input, but an ungrouped aggregate
          // returns 1 phantom row — never rewrite the global form
          && partitionSpec.nonEmpty
          && partitionSpec.forall(_.isInstanceOf[AttributeReference])
          && spec.frameSpecification.isInstanceOf[SpecifiedWindowFrame]
          // non-nullable ordering key: max_by/min_by skip null ordering
          // keys, so a nullable key can pick a different row (custom null
          // ordering) or fabricate an all-null row (all-null group) —
          // both directions are gated
          && !order.child.nullable =>
      val rnAttr = w.windowExpressions.head
      val keyIds = partitionSpec.map(_.asInstanceOf[AttributeReference].exprId).toSet
      val picker: Expression => Expression = order.direction match {
        case Descending => v => MaxBy(v, order.child).toAggregateExpression()
        case Ascending  => v => MinBy(v, order.child).toAggregateExpression()
      }
      val aggExprs: Seq[NamedExpression] = child.output.map { a =>
        if (keyIds.contains(a.exprId)) a
        else Alias(picker(a), a.name)(exprId = a.exprId, qualifier = a.qualifier)
      } :+ Alias(Literal(1, IntegerType), rnName)(exprId = rnAttr.exprId)
      Aggregate(partitionSpec, aggExprs, child)
  }
}
