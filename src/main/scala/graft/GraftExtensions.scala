package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.plans.{AsofJoinStrategy, LatestPerKeyRule}

/** Session-extension wiring for cluster deployments where the session is
  * built by the platform, not by application code:
  *
  * {{{ spark-submit --conf spark.sql.extensions=graft.GraftExtensions ... }}}
  *
  * injects the engine's optimizer rules at session build time. (UDAF
  * registration needs a live session — GraftSession.enrich covers it for
  * programmatic use.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => LatestPerKeyRule)
    e.injectPlannerStrategy(_ => AsofJoinStrategy)
  }
}
