package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Window functions (SURVEY.md §2.5) — the heart of the reference's
  * feature-creation semantics: rolling statistics over per-key time order.
  *
  * All windows partition by the natural key (user/customer), so every
  * partition's state fits one task and the computation scales horizontally
  * with the number of keys. The two globally-ordered windows (#23, #29)
  * are deliberate single-partition exercises over small dimension tables —
  * at 100 TB one would replace a global rank with a top-k-per-partition +
  * merge or a range-partitioned sort.
  *
  * Ordering is always (ts, event_id) / (key, tiebreak): FIXTURES.md calls
  * out order ties as the #1 source of oracle mismatches.
  */
object Windows {

  /** #22 top-3 orders per customer via row_number. row_number is cast to
    * long to match the oracle's BIGINT. */
  def winRankTopkPerGroup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** #23 global rank + dense_rank (two distinct orderings). */
  def winRankDense(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(col("c_custkey"), col("c_acctbal"))
      .withColumn("r",
        rank().over(Window.orderBy(col("c_acctbal").desc, col("c_custkey"))).cast("long"))
      .withColumn("dr",
        dense_rank().over(Window.orderBy(round(col("c_acctbal"), 0).desc)).cast("long"))
      .orderBy(col("r"))
      .limit(100)

  /** #24 successive differences per key (RR-interval delta analogue). */
  def winLagLead(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        round(col("value") - lag(col("value"), 1).over(w), 2).as("dv"),
        lead(col("event_type"), 1).over(w).as("nxt"))
      .orderBy(col("user_id"), col("event_id"))
      .limit(500)
  }

  /** #25 5-row moving average per key. */
  def winMovingAvg(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-4, 0)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        round(avg(col("value")).over(w), 6).as("ma5"))
      .orderBy(col("user_id"), col("event_id"))
      .limit(500)
  }

  /** #26 running total per key. */
  def winCumsum(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, 0)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        round(sum(col("o_totalprice")).over(w), 2).as("cum"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
      .limit(500)
  }

  /** #27 trailing 10-minute time-range frame per key. Spark range frames
    * need a numeric ordering key: order on epoch MICROseconds (not seconds —
    * second-granularity truncation would move the window boundary relative
    * to an interval-precise oracle) and bound the frame at ±600e6 µs. */
  def winRangeTime(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(unix_micros(col("ts")))
      .rangeBetween(-600000000L, 0)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("c10m"))
      .orderBy(col("event_id"))
      .limit(500)
  }

  /** #28 first/last value per key ordering; last_value needs the full frame
    * (default frame stops at CURRENT ROW). */
  def winFirstLast(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        first(col("event_type")).over(w).as("f"),
        last(col("event_type")).over(wFull).as("l"))
      .orderBy(col("user_id"), col("event_id"))
      .limit(500)
  }

  /** #29 quartile bucket + percent_rank over a global ordering. */
  def winNtilePctrank(s: SparkSession, d: String): DataFrame = {
    val w = Window.orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(s, d)
      .select(col("c_custkey"),
        ntile(4).over(w).cast("long").as("q"),
        round(percent_rank().over(w), 6).as("pr"))
      .orderBy(col("c_custkey"))
      .limit(200)
  }
}
