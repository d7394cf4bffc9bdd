package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.classic.ExpressionUtils

/** Access bridge into `private[sql]` Spark internals for the engine's
  * custom Catalyst expressions — the standard pattern for Spark extension
  * libraries (a tiny object inside the org.apache.spark.sql namespace).
  * Keep this file minimal: Column ↔ Expression wrapping plus the test
  * hook for inspecting what a SparkSessionExtensions instance registered.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The analyzed logical plan backing a DataFrame — the resolved tree a
    * custom logical operator composes over. */
  def analyzed(df: org.apache.spark.sql.DataFrame): LogicalPlan =
    df.queryExecution.analyzed

  /** Wrap a (resolved) logical plan back into a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The optimizer rules an extensions instance would inject — lets tests
    * verify extension wiring without a fresh JVM (session extensions are
    * applied only at first session creation). */
  def registeredOptimizerRules(ext: SparkSessionExtensions,
      spark: SparkSession): Seq[Rule[LogicalPlan]] =
    ext.buildOptimizerRules(spark)

  /** The planner strategies an extensions instance would inject (same
    * test-hook rationale as [[registeredOptimizerRules]]). */
  def registeredPlannerStrategies(ext: SparkSessionExtensions,
      spark: SparkSession): Seq[org.apache.spark.sql.execution.SparkStrategy] =
    ext.buildPlannerStrategies(spark)
}
