package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the judged parquet star schema (TESTDATA.md, FIXTURES.md).
  *
  * Each table is a single parquet file per scale factor; `spark.read.parquet`
  * picks up the footer schema, and Spark's vectorized reader + Catalyst column
  * pruning / predicate pushdown make the scan cost proportional to the columns
  * and row groups a query actually touches. At 100 TB the same call reads a
  * partitioned directory instead of one file — nothing else changes for the
  * operators built on top.
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader rejects
    * outright (PARQUET_TYPE_ILLEGAL). Read it as raw nanos via the legacy
    * flag and truncate to microseconds — the same ns→µs truncation DuckDB
    * applies on read, so both engines see identical timestamp values. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(s, d, "events").withColumn("ts",
      org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
