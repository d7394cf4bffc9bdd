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

  /** The optimizer rules an extensions instance would inject — lets tests
    * verify extension wiring without a fresh JVM (session extensions are
    * applied only at first session creation). */
  def registeredOptimizerRules(ext: SparkSessionExtensions,
      spark: SparkSession): Seq[Rule[LogicalPlan]] =
    ext.buildOptimizerRules(spark)
}
