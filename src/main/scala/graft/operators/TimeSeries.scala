package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Time-series / streaming semantics in batch-checkable form
  * (SURVEY.md §2.9): tumbling and sliding windows, sessionization,
  * dedup, and watermark-style late-row filtering. Each query here has a
  * Structured Streaming twin (graft.streaming) using `window()` /
  * `session_window()` / `dropDuplicatesWithinWatermark` — the batch forms
  * below compute identical answers over a bounded input and are what the
  * oracle judges.
  */
object TimeSeries {

  /** #44 1-hour tumbling window per event_type (batch form of
    * groupBy(window(ts, "1 hour"))). One partial+final aggregate. */
  def streamTumbling(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("wstart"),
        col("event_type"))
      .agg(count(lit(1)).as("c"), round(sum(col("value")), 2).as("s"))
      .orderBy(col("wstart"), col("event_type"))

  /** #45 60-minute windows sliding every 30 minutes. Instead of a
    * range-join of events against the window grid (O(|grid|·|events|)
    * nested-loop), each event is exploded into exactly the two 30-min-
    * aligned window starts that can contain it, then equi-joined against
    * the (broadcast, tiny) grid of valid starts — turning a theta join
    * into a shuffle-free broadcast hash join. This is the same trick
    * `window(ts, "60 minutes", "30 minutes")` uses internally and it is
    * the form that survives 100 TB.
    */
  def streamSliding(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    // Window-start grid as the oracle defines it: every distinct event
    // hour H contributes starts {H, H-30min}. Explode before the single
    // distinct — one shuffle instead of the naive distinct-union-distinct.
    val h = date_trunc("hour", col("ts"))
    val grid = e
      .select(explode(array(h, h - expr("interval 30 minutes"))).as("ws"))
      .distinct()
    // Candidate starts per event: trunc-to-30min(ts) and that minus 30min.
    val t30 = expr("timestamp_micros(unix_micros(ts) div 1800000000 * 1800000000)")
    val cand = e.select(t30.as("t30"))
      .select(explode(array(col("t30"), col("t30") - expr("interval 30 minutes"))).as("ws"))
    cand.join(broadcast(grid), "ws")
      .groupBy(col("ws"))
      .agg(count(lit(1)).as("c"))
      .select(col("ws").cast("timestamp_ntz").as("wstart"), col("c"))
      .orderBy(col("wstart"))
  }

  /** #46 30-minute-gap sessionization per user: gap flag via lag, session
    * id via running sum (graft.operators.Sessionize — shared with the
    * feature-table block), then per-session aggregates. All steps are
    * partitioned by user_id — a single shuffle, then purely local work,
    * exactly the batch shape of `session_window(ts, "30 minutes")`. */
  def streamSession(s: SparkSession, d: String): DataFrame =
    Sessionize.withSessionIds(
        Tables.events(s, d).select(col("user_id"), col("ts"), col("event_id")),
        col("user_id"), col("ts"), col("event_id"), gapSeconds = 1800)
      .withColumnRenamed("session_id", "sid")
      .groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n"),
        min(col("ts")).cast("timestamp_ntz").as("st"),
        max(col("ts")).cast("timestamp_ntz").as("en"))
      .orderBy(col("user_id"), col("sid"))

  /** #46b the SAME sessionization through Spark's native
    * `session_window(ts, "30 minutes")` operator — the batch form of the
    * streaming session aggregation, judged against the identical lag-gap
    * oracle as [[streamSession]] (same rows, same hash), so the native
    * operator's gap semantics are pinned: Spark closes a session when
    * the next event is ≥ start+gap past the last one, the oracle when
    * the gap is strictly > 30 min — equivalent on any input without an
    * exact-30:00.000000 gap (none exist in this data at any SF, checked
    * at µs precision; the [[streamSession]] form is the one to use if
    * that knife-edge matters). The session ordinal the oracle carries is
    * recovered with a per-user row_number over session starts — a window
    * over SESSION rows (≤ sessions-per-user each), not events, and still
    * partitioned by user_id: one shuffle, then local work, at any scale. */
  def streamSessionNative(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"),
        min(col("ts")).cast("timestamp_ntz").as("st"),
        max(col("ts")).cast("timestamp_ntz").as("en"))
      .withColumn("sid", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("w.start"))).cast("long"))
      .select(col("user_id"), col("sid"), col("n"), col("st"), col("en"))
      .orderBy(col("user_id"), col("sid"))

  /** #47 distinct (user, event_type) — batch form of streaming dedup. */
  def streamDedup(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"))
      .distinct()
      .agg(count(lit(1)).as("c"))

  /** #48 watermark semantics: rows older than max(ts) − 1 day. The global
    * max is a one-row aggregate broadcast into the filter — no per-row
    * subquery re-execution. */
  def streamLateFilter(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val mx = e.agg(max(col("ts")).as("mx"))
    e.crossJoin(broadcast(mx))
      .filter(col("ts") < col("mx") - expr("interval 1 day"))
      .agg(count(lit(1)).as("c"))
  }
}
