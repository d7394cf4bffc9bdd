package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Flatten a physical plan into ALL of its nodes for typed assertions.
  * The adaptive wrappers are leaf-like (their real plans hang off fields,
  * not `children`), so plain `collect` stops at them — this descends
  * through both. A reused stage's plan is a leaf `ReusedExchangeExec`,
  * so a shared subtree is counted ONCE, where it physically lives —
  * exactly the property the evaluate-once assertions need. */
object PlanNodes {
  def all(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    p +: kids.flatMap(all)
  }

  /** [[all]] plus descent THROUGH `ReusedExchangeExec` into the shared
    * subtree it references — for assertions about what a consumer's
    * INPUT contains (a reused exchange still feeds it those nodes), as
    * opposed to the evaluate-once counting [[all]] serves. Nodes of a
    * shared subtree can therefore appear more than once. */
  def allThroughReuse(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        Seq(r.child)
      case other => other.children
    }
    p +: kids.flatMap(allThroughReuse)
  }
}
