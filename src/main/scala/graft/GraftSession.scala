package graft

import org.apache.spark.sql.SparkSession

import graft.functions.{Aggregates, Bloom, CountMin, Hll, Kmv, MisraGries, QuantileSketch}
import graft.plans.{AsofJoin, LatestPerKeyRule}

/** One-call session setup for the engine: a user switching to this library
  * gets every engine convention — UTC session time, µs parquet output,
  * nanos-tolerant reads, right-sized shuffle parallelism, the rmssd UDAF
  * and the latest-per-key optimizer rule — from a single entry point.
  *
  * {{{
  *   val spark = GraftSession.local()            // local[n] dev session
  *   val spark = GraftSession.configure(builder) // any builder (cluster)
  * }}}
  */
object GraftSession {

  /** Engine conventions applied to any builder (cluster or local). */
  def configure(builder: SparkSession.Builder,
      shufflePartitions: Option[Int] = None): SparkSession = {
    shufflePartitions.foreach(n =>
      builder.config("spark.sql.shuffle.partitions", n.toString))
    val spark = builder
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    enrich(spark)
    spark
  }

  /** Local development/test session sized to the machine. */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    configure(
      SparkSession.builder()
        .master(s"local[$cores]")
        .config("spark.ui.enabled", "false"),
      shufflePartitions = Some(cores))

  /** Register the engine's session-level extensions on an existing session
    * (idempotent): custom aggregates + optimizer rules. */
  def enrich(spark: SparkSession): Unit = {
    Aggregates.register(spark)
    Hll.register(spark) // graft_hll / graft_hll_sketch / graft_hll_merge
    CountMin.register(spark) // graft_cms_sketch / graft_cms_merge / graft_cms_estimate
    QuantileSketch.register(spark) // graft_quantile_sketch / _merge / _estimate
    Bloom.register(spark) // graft_bloom_sketch / graft_bloom_merge / graft_bloom_contains
    Kmv.register(spark) // graft_kmv_sketch / _merge / _estimate / _jaccard
    MisraGries.register(spark) // graft_mg_sketch / _merge / _estimate / _error
    LatestPerKeyRule.install(spark)
    AsofJoin.install(spark)
  }
}
