package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{Features, Hrv}
import graft.sources.Ingest

/** The reference's end-to-end shape — ingestor + features creator — as one
  * composition: raw device export (CSV of keyed timestamped samples) →
  * schema-validated ingest with quarantine → artifact cleaning →
  * per-sample rolling features → per-series HRV feature table → partitioned
  * parquet.
  *
  * Every stage is the library operator documented elsewhere; this object
  * only composes them, so the pipeline inherits their scale behavior: the
  * whole flow is one shuffle on the series key plus the final write.
  */
object Pipeline {

  /** Raw sample schema of the ingestion edge: a device export row is
    * (series key, event time, sample value). */
  val rawSchema: StructType = StructType(Seq(
    StructField("series_id", LongType),
    StructField("ts", TimestampType),
    StructField("value", DoubleType)))

  case class Summary(validRows: Long, quarantinedRows: Long, series: Long,
      featureRows: Long)

  /** The shared clean→rolling-features stage: artifact flagging,
    * interpolation, rolling statistics, day-partition column. Used by both
    * the batch and streaming paths so the two cannot diverge. Extra
    * columns on `valid` (e.g. a provenance marker) pass through. */
  private def cleanAndRoll(valid: DataFrame, lo: Double, hi: Double,
      rollingN: Int): DataFrame = {
    val cleaned = Hrv.interpolateOutliers(
      Hrv.flagOutliers(valid, col("series_id"), col("ts"), col("ts"),
        col("value"), lo, hi),
      col("series_id"), col("ts"), col("ts"), col("value"))
    Features.rollingByRows(cleaned, col("series_id"), col("ts"),
      col("ts"), col("value_clean"), rollingN)
      .withColumn("day", to_date(col("ts")))
  }

  /** Ingest a raw CSV export and materialize both feature tables.
    *
    * @param lo/hi        plausibility bounds for the sample value
    * @param rollingN     rolling-window length (rows) for sample features
    * @return counts per stage (also the driver for the whole DAG)
    */
  def ingestAndFeaturize(spark: SparkSession, rawCsvPath: String,
      outDir: String, lo: Double, hi: Double, rollingN: Int = 5): Summary = {
    // 1. schema-enforced read; malformed rows quarantined, not fatal
    val raw = Ingest.readCsv(spark, rawCsvPath, rawSchema)
    val (valid, bad) = Ingest.partitionValid(raw)
    bad.write.mode("overwrite").parquet(s"$outDir/quarantine")
    val (_, validRows, quarantinedRows) = Ingest.counts(raw)

    // 2.+3. artifact cleaning and rolling features, day-partitioned
    val rolling = cleanAndRoll(valid, lo, hi, rollingN)
    Ingest.writePartitioned(rolling, s"$outDir/sample_features", Seq("day"))

    // 4. per-series HRV feature table (batch-only: per-series aggregates
    // over the full history don't append incrementally)
    val cleaned = rolling // value_clean travels on the feature rows
    val hrv = Hrv.timeDomain(cleaned, col("series_id"), col("ts"), col("ts"),
        col("value_clean"))
      .join(Hrv.poincare(cleaned, col("series_id"), col("ts"), col("ts"),
        col("value_clean")), Seq("series_key"), "left_outer")
    hrv.write.mode("overwrite").parquet(s"$outDir/series_features")

    Summary(
      validRows = validRows,
      quarantinedRows = quarantinedRows,
      series = hrv.count(),
      featureRows = spark.read.parquet(s"$outDir/sample_features").count())
  }

  /** Most recent per-series tail written by a batch id strictly below
    * `currentId` (deterministic on replay: a half-finished batch N never
    * feeds its own retry). */
  private def latestTail(spark: SparkSession, tailBase: String,
      currentId: Long): Option[DataFrame] = {
    val path = new org.apache.hadoop.fs.Path(tailBase)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return None
    val ids = fs.listStatus(path).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("batch=") => n.stripPrefix("batch=").toLong }
      .filter(_ < currentId)
    if (ids.isEmpty) None
    else Some(spark.read.parquet(s"$tailBase/batch=${ids.max}"))
  }

  /** Continuous deployment path: watch `rawCsvDir` as a file stream and
    * run the shared clean→rolling stage per micro-batch via foreachBatch.
    *
    * Cross-batch correctness: the last `tailRows` rows of every series are
    * carried in a small state-tail table between batches and prepended to
    * the next batch before the window pass, so rolling features and the
    * outlier median see their full lookback even when a series spans file
    * drops. Only the current batch's rows are emitted. One caveat remains:
    * an artifact in the final rows of a batch interpolates from its past
    * neighbor only (the future neighbor hasn't arrived yet).
    *
    * Replay safety: every sink write is `mode("overwrite")` into a
    * `batch=<id>` directory, so re-running a micro-batch after a failure
    * rewrites the same paths instead of appending duplicates, and the tail
    * a retry reads (largest id < its own) is the same one the original
    * attempt read. The streaming path produces the rolling sample features
    * only; the per-series HRV table is a batch/backfill product
    * (`ingestAndFeaturize`).
    *
    * Returns the running StreamingQuery; callers own its lifecycle
    * (`processAllAvailable`/`stop` in tests, `awaitTermination` in jobs).
    */
  def ingestAndFeaturizeStream(spark: SparkSession, rawCsvDir: String,
      outDir: String, checkpointDir: String, lo: Double, hi: Double,
      rollingN: Int = 5, tailRows: Int = 8): org.apache.spark.sql.streaming.StreamingQuery = {
    val tailBase = s"$outDir/state_tail"
    Ingest.readCsvStream(spark, rawCsvDir, rawSchema)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        batch.persist()
        try {
          val (valid, bad) = Ingest.partitionValid(batch)
          if (!bad.isEmpty) {
            bad.write.mode("overwrite").parquet(s"$outDir/quarantine/batch=$id")
          }
          val work = latestTail(spark, tailBase, id) match {
            case Some(tail) =>
              valid.withColumn("_new", lit(true))
                .unionByName(tail.withColumn("_new", lit(false)))
            case None => valid.withColumn("_new", lit(true))
          }
          work.persist()
          try {
            cleanAndRoll(work, lo, hi, rollingN)
              .filter(col("_new")).drop("_new")
              .write.mode("overwrite").partitionBy("day")
              .parquet(s"$outDir/sample_features/batch=$id")
            val wTail = Window.partitionBy(col("series_id"))
              .orderBy(col("ts").desc)
            work.drop("_new")
              .withColumn("_rn", row_number().over(wTail))
              .filter(col("_rn") <= tailRows).drop("_rn")
              .write.mode("overwrite").parquet(s"$tailBase/batch=$id")
          } finally work.unpersist()
        } finally batch.unpersist()
        ()
      }
      .start()
  }
}
