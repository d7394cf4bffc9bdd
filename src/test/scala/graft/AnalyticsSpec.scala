package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Analytics

/** Product-analytics operators (SURVEY.md §2 round-9 additions #79-#83):
  * each judged query is cross-checked against an independent formulation
  * or an algebraic invariant, and the scale-critical plan shapes (single
  * reused user_id exchange for the funnel, early-reduction for islands)
  * are pinned so a refactor cannot silently revert them. */
class AnalyticsSpec extends SparkSpecBase {
  import spark.implicits._

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString
  private def exchanges(p: String): Int =
    "(?i)exchange hashpartitioning".r.findAllIn(p).size

  test("ts_funnel matches the agg-join cascade formulation") {
    val got = Analytics.tsFunnel(spark, sf())
    // independent formulation: three aggregate/join passes over events
    val e = Tables.events(spark, sf()).select($"user_id", $"event_type", $"ts")
    val v = e.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("t_view"))
    val c = e.filter($"event_type" === "click").join(v, "user_id")
      .filter($"ts" > $"t_view")
      .groupBy($"user_id").agg(min($"ts").as("t_click"))
    val p = e.filter($"event_type" === "purchase").join(c, "user_id")
      .filter($"ts" > $"t_click")
      .groupBy($"user_id").agg(min($"ts").as("t_purchase"))
    val want = v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .select($"user_id", $"t_view".cast("timestamp_ntz"),
        $"t_click".cast("timestamp_ntz"), $"t_purchase".cast("timestamp_ntz"))
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("ts_funnel: one user_id exchange feeds windows and the final agg") {
    val p = plan(Analytics.tsFunnel(spark, sf()))
    assert(exchanges(p) == 1, s"funnel must reuse ONE user_id exchange:\n$p")
    assert(!p.contains("Join"), s"window form must not self-join events:\n$p")
  }

  test("win_gaps_islands: islands tile the active days exactly") {
    val islands = Analytics.winGapsIslands(spark, sf()).cache()
    try {
      // every island spans exactly its day count (consecutive by def)
      val bad = islands
        .filter(datediff($"island_end", $"island_start") + 1 =!= $"n_days")
      assert(bad.isEmpty, "island span != n_days")
      // islands are separated by a gap of at least one inactive day
      val w = Window.partitionBy($"user_id").orderBy($"island_start")
      val touching = islands
        .withColumn("prev_end", lag($"island_end", 1).over(w))
        .filter($"prev_end".isNotNull &&
          datediff($"island_start", $"prev_end") <= 1)
      assert(touching.isEmpty, "adjacent islands must not touch")
      // island days sum to the distinct active-day count
      val total = islands.agg(sum($"n_days")).as[Long].head
      val activeDays = Tables.events(spark, sf())
        .select($"user_id", $"ts".cast("date")).distinct().count()
      assert(total == activeDays)
    } finally islands.unpersist()
  }

  test("win_gaps_islands: distinct reduces BEFORE the user_id shuffle") {
    // two exchanges by design: the (user_id, day) partial-distinct first
    // (the 100 TB reducer — map-side combine sees raw events), THEN the
    // tiny user-day set re-keys to user_id for the window + final agg
    // (subset rule: hashpartitioning(user_id) serves groupBy(user_id, grp))
    val p = plan(Analytics.winGapsIslands(spark, sf()))
    assert(exchanges(p) == 2, s"expected partial-distinct then window key:\n$p")
  }

  test("ts_retention_cohort: week-0 row covers every user, offsets bounded") {
    val r = Analytics.tsRetentionCohort(spark, sf()).cache()
    try {
      val users = Tables.events(spark, sf()).select($"user_id").distinct().count()
      val week0 = r.filter($"week_n" === 0).agg(sum($"n_users")).as[Long].head
      assert(week0 == users, "every user is active in their own first week")
      assert(r.filter($"week_n" < 0).isEmpty, "activity precedes cohort")
      // retention never exceeds cohort size
      val w0 = r.filter($"week_n" === 0)
        .select($"cohort", $"n_users".as("cohort_size"))
      val over = r.join(w0, "cohort").filter($"n_users" > $"cohort_size")
      assert(over.isEmpty, "retention above cohort size")
    } finally r.unpersist()
  }

  test("agg_histogram: one partial+final aggregate, counts conserve") {
    val h = Analytics.aggHistogram(spark, sf())
    assert(exchanges(plan(h)) == 1, s"histogram is one exchange:\n${plan(h)}")
    val total = h.agg(sum($"c")).as[Long].head
    assert(total == Tables.events(spark, sf()).count())
  }

  test("agg_mode matches the rank-window formulation incl. tie-break") {
    val got = Analytics.aggMode(spark, sf())
    val counts = Tables.events(spark, sf())
      .groupBy($"user_id", $"event_type").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy($"user_id").orderBy($"c".desc, $"event_type")
    val want = counts.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_type".as("mode_type"), $"c".as("n"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }
}
