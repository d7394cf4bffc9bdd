package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Interval-overlap joins WITHOUT an equi key — the one join shape the
  * relational core (SURVEY.md §2.3) could not express scalably until now.
  *
  * A naive theta join (`a.st <= b.en && b.st <= a.en`) has no equi clause,
  * so Spark plans a BroadcastNestedLoopJoin / cartesian product: O(n²)
  * comparisons and a single build side that must fit in memory — dead at
  * 100 TB. The standard scale path (Flink's interval join, DuckDB's IEJoin
  * literature) is TEMPORAL BUCKETING:
  *
  *   1. quantize time into fixed buckets of `bucketSeconds`;
  *   2. replicate each interval into every bucket it touches
  *      (⌈len/bucket⌉+1 copies — choose the bucket about as long as a
  *      typical interval so the factor stays ≤2);
  *   3. equi-join on the bucket id — two intervals can only overlap if
  *      they share at least one bucket, so no pair is missed;
  *   4. keep a pair only in the bucket containing the overlap START
  *      (`max(a.st, b.st)`), so a pair sharing several buckets is emitted
  *      exactly once — deduplication by construction, no `distinct()`.
  *
  * The equi-join on bucket id hash-partitions both sides, which is exactly
  * how the operator parallelizes on a cluster: each bucket's worth of
  * intervals meets in one task, and AQE's skew handling applies to hot
  * buckets the same way it does to any other equi-join key.
  */
object IntervalJoin {

  /** All overlapping pairs (`a_id` < `b_id`) among the intervals of `df`
    * — self-join form. `df` must carry `idCol` (orderable, unique),
    * `startCol`/`endCol` (timestamps, inclusive bounds, start ≤ end).
    * Output columns: `a_id`, `b_id`, typed as `idCol`.
    *
    * Overlap is closed-interval: `a.st <= b.en && b.st <= a.en`.
    */
  def overlapSelfJoin(df: DataFrame, idCol: String, startCol: String,
      endCol: String, bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive: $bucketSeconds")
    val bucketMicros = bucketSeconds * 1000000L
    // `div` (integer division) keeps the bucket id exact for any epoch
    // magnitude — no float rounding at the bucket boundary
    def bkt(cName: String): Column = expr(s"unix_micros($cName) div $bucketMicros")

    val exploded = df.withColumn("gbkt",
      explode(sequence(bkt(startCol), bkt(endCol))))
    val a = exploded.select(col(idCol).as("a_id"), col(startCol).as("a_st"),
      col(endCol).as("a_en"), col("gbkt"))
    val b = exploded.select(col(idCol).as("b_id"), col(startCol).as("b_st"),
      col(endCol).as("b_en"), col("gbkt").as("b_gbkt"))
    a.join(b,
        col("gbkt") === col("b_gbkt")
          && col("a_id") < col("b_id")
          && col("a_st") <= col("b_en") && col("b_st") <= col("a_en")
          // emit only in the overlap-start bucket: exactly-once without distinct
          && col("gbkt") === expr(s"unix_micros(greatest(a_st, b_st)) div $bucketMicros"))
      .select(col("a_id"), col("b_id"))
  }

  /** #10b judged query: all pairs of events (any user — deliberately NO
    * equi key) whose 60-minute activity windows overlap, among users
    * 0-2. The oracle is the naive theta join — the bucketing must be
    * semantically INVISIBLE (the `join_skew_salted` pattern). Bucket =
    * window length, so each interval lands in at most 2 buckets. */
  def joinIntervalBucketed(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .filter(col("user_id") < 3)
      .select(col("event_id"), col("ts").as("st"),
        (col("ts") + expr("interval 60 minutes")).as("en"))
    overlapSelfJoin(e, "event_id", "st", "en", bucketSeconds = 3600L)
      .orderBy(col("a_id"), col("b_id"))
  }
}
