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
}
