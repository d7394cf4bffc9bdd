package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Sliding-window feature creation over keyed event streams — the
  * reference's "features creator" surface as a reusable API: one call
  * appends a block of rolling statistics (count/mean/std/min/max, RMS of
  * successive differences, deltas) per key, over either a row-count frame
  * or a trailing time frame.
  *
  * Everything is window functions partitioned by the series key: a single
  * shuffle on the key, then per-partition sorted evaluation — at 100 TB
  * the work scales with the number of keys, and all features in a block
  * share one WindowExec pass because they share the frame.
  */
object Features {

  /** Ordering tiebreaker so feature values are deterministic when
    * timestamps collide (FIXTURES.md: ties are the #1 mismatch source). */
  private def ordered(w: WindowSpec, ts: Column, tiebreak: Column): WindowSpec =
    w.orderBy(ts, tiebreak)

  /** Rolling features over the last `n` rows (inclusive) per key:
    * <prefix>_cnt/mean/std/min/max plus the successive difference
    * <prefix>_delta and rolling RMSSD (the HRV signature feature). */
  def rollingByRows(df: DataFrame, key: Column, ts: Column, tiebreak: Column,
      value: Column, n: Int, prefix: String = "f"): DataFrame = {
    val base = ordered(Window.partitionBy(key), ts, tiebreak)
    val frame = base.rowsBetween(-(n - 1), 0)
    val delta = value - lag(value, 1).over(base)
    df.withColumn(s"${prefix}_delta", delta)
      .withColumn(s"${prefix}_cnt", count(value).over(frame))
      .withColumn(s"${prefix}_mean", avg(value).over(frame))
      .withColumn(s"${prefix}_std", stddev_samp(value).over(frame))
      .withColumn(s"${prefix}_min", min(value).over(frame))
      .withColumn(s"${prefix}_max", max(value).over(frame))
      // rolling RMSSD over the deltas inside the same frame
      .withColumn(s"${prefix}_rmssd",
        sqrt(avg(col(s"${prefix}_delta") * col(s"${prefix}_delta")).over(frame)))
  }

  /** Rolling features over a trailing time window (`seconds` back from the
    * current row, inclusive) per key. Range frames need a numeric ordering
    * key: epoch MICROseconds, so the window boundary is exact at the
    * timestamp precision both engines carry (SURVEY §4). */
  def rollingByTime(df: DataFrame, key: Column, ts: Column,
      value: Column, seconds: Long, prefix: String = "t"): DataFrame = {
    val frame = Window.partitionBy(key).orderBy(unix_micros(ts))
      .rangeBetween(-seconds * 1000000L, 0)
    df.withColumn(s"${prefix}_cnt", count(value).over(frame))
      .withColumn(s"${prefix}_mean", avg(value).over(frame))
      .withColumn(s"${prefix}_std", stddev_samp(value).over(frame))
      .withColumn(s"${prefix}_min", min(value).over(frame))
      .withColumn(s"${prefix}_max", max(value).over(frame))
  }

  /** Rolling z-score anomaly flag: |value − rolling mean| > k · rolling
    * stddev over the previous `n` rows (the current row is EXCLUDED from
    * the reference window so an extreme sample can't mask itself). Adds
    * `<prefix>_z` and boolean `<prefix>_anomaly`. */
  def anomalyByZScore(df: DataFrame, key: Column, ts: Column, tiebreak: Column,
      value: Column, n: Int, k: Double = 3.0, prefix: String = "a"): DataFrame = {
    val frame = ordered(Window.partitionBy(key), ts, tiebreak).rowsBetween(-n, -1)
    val mu = avg(value).over(frame)
    val sd = stddev_samp(value).over(frame)
    // zero-variance window → undefined z (ANSI division would throw)
    val z = when(sd.isNotNull && sd =!= 0.0, (value - mu) / sd)
    df.withColumn(s"${prefix}_z", z)
      .withColumn(s"${prefix}_anomaly",
        coalesce(abs(z) > k, lit(false))) // first rows / zero-variance → false
  }

  /** Per-session feature block: sessionize on an inactivity gap, then
    * aggregate per (key, session) — the session-level twin of `bucketed`.
    * Same shape as the judged stream_session query with feature columns. */
  def sessionized(df: DataFrame, key: Column, ts: Column, tiebreak: Column,
      value: Column, gapSeconds: Long): DataFrame = {
    val base = df.select(key.as("series_key"), ts.as("_ts"), tiebreak.as("_tb"),
      value.as("_v"))
    Sessionize.withSessionIds(base, col("series_key"), col("_ts"), col("_tb"),
        gapSeconds)
      .groupBy(col("series_key"), col("session_id"))
      .agg(
        count(lit(1)).as("n"),
        min(col("_ts")).cast("timestamp_ntz").as("session_start"),
        max(col("_ts")).cast("timestamp_ntz").as("session_end"),
        avg(col("_v")).as("mean"),
        stddev_samp(col("_v")).as("std"))
  }

  /** Per-(key, fixed time bucket) feature table: the batch form of a
    * tumbling-window feature job, one partial+final aggregate. `bucket`
    * is a date_trunc unit ("hour", "day", ...). */
  def bucketed(df: DataFrame, key: Column, ts: Column, value: Column,
      bucket: String): DataFrame =
    df.groupBy(key.as("series_key"),
        date_trunc(bucket, ts).cast("timestamp_ntz").as("bucket_start"))
      .agg(
        count(value).as("cnt"),
        avg(value).as("mean"),
        stddev_samp(value).as("std"),
        min(value).as("min"),
        max(value).as("max"))
}
