package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming twins of the batch time-series operators
  * (graft.operators.TimeSeries / SURVEY.md §2.9). Each takes a *streaming*
  * events DataFrame (schema: event_id, ts timestamp, user_id, event_type,
  * value) and returns a streaming result with identical semantics over a
  * bounded input — the batch forms are what the oracle judges; these are
  * the `readStream` deployment path.
  *
  * Watermarks bound state: an aggregation over 1-hour windows with a
  * 1-day watermark keeps ≤ ~25 open windows per key on the store, however
  * large the throughput — the property that makes these run indefinitely
  * on a cluster.
  */
object StreamingOps {

  /** Live file-source wiring for the events table: `readStream` over the
    * parquet directory with the same ns→µs timestamp handling as the batch
    * loader (streaming sources require an explicit schema, so `ts` is
    * declared as raw nanos and converted). New files appearing under the
    * path become micro-batches — the deployment path for the ingestor. */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", LongType), // TIMESTAMP(NANOS) read as raw nanos
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Twin of TimeSeries.streamTumbling: 1-hour tumbling count+sum per
    * event_type. */
  def tumbling(events: DataFrame, watermark: String = "1 day"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("c"), round(sum(col("value")), 2).as("s"))
      .select(col("w.start").as("wstart"), col("event_type"), col("c"), col("s"))

  /** Twin of TimeSeries.streamSliding: 60-minute windows sliding every 30
    * minutes — window() assigns each event to both overlapping windows,
    * which is exactly the explode-candidates plan the batch form uses. */
  def sliding(events: DataFrame, watermark: String = "1 day"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "60 minutes", "30 minutes").as("w"))
      .agg(count(lit(1)).as("c"))
      .select(col("w.start").as("wstart"), col("c"))

  /** Twin of TimeSeries.streamSession: 30-minute-gap sessions per user via
    * the native session_window state store. */
  def sessions(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 day"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start").as("st"), col("w.end").as("en"), col("n"))

  /** Open-session state carried between micro-batches (epoch millis). */
  case class SessionState(start: Long, end: Long, n: Long)

  /** A closed session emitted once its gap has passed the watermark. */
  case class ClosedSession(user_id: Long, st: Timestamp, en: Timestamp, n: Long)

  /** Custom stateful sessionization via flatMapGroupsWithState: unlike
    * `session_window` (which owns its state format), this keeps an
    * explicit per-key open-session state, extends it with each batch,
    * emits a session only when the inactivity gap elapses (event-time
    * timeout against the watermark), and demonstrates the escape hatch
    * for session semantics Spark's built-ins can't express (custom merge
    * rules, per-session derived features, caps). State per key is O(1). */
  def statefulSessions(events: DataFrame, gapSeconds: Long = 1800,
      watermark: String = "1 day"): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapSeconds * 1000L
    events.select(col("user_id").cast("long").as("user_id"), col("ts"))
      .withWatermark("ts", watermark)
      .as[(Long, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, Timestamp)], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // gap elapsed past the watermark: close and emit
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(user,
              new Timestamp(s.start), new Timestamp(s.end), s.n))
          } else {
            // fold this batch's rows (event-time order) into the state,
            // closing a session whenever a gap appears inside the batch
            val ts = rows.map(_._2.getTime).toArray.sorted
            var closed = List.empty[ClosedSession]
            var cur = state.getOption
            ts.foreach { t =>
              cur match {
                case Some(s) if t - s.end <= gapMs =>
                  cur = Some(SessionState(s.start, t, s.n + 1))
                case Some(s) =>
                  closed ::= ClosedSession(user,
                    new Timestamp(s.start), new Timestamp(s.end), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** Twin of TimeSeries.streamDedup: streaming-safe distinct on
    * (user_id, event_type). State for a key can be dropped once the
    * watermark passes — unbounded-state-free dedup. */
  def dedup(events: DataFrame, watermark: String = "1 day"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Twin of TimeSeries.streamLateFilter: the watermark itself — rows
    * older than watermark behind the max event time are dropped by any
    * downstream stateful operator. Exposed as the watermarked stream. */
  def withLateness(events: DataFrame, watermark: String = "1 day"): DataFrame =
    events.withWatermark("ts", watermark)
}
