package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
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

    // 2. artifact cleaning per series
    val cleaned = Hrv.interpolateOutliers(
      Hrv.flagOutliers(valid, col("series_id"), col("ts"), col("ts"),
        col("value"), lo, hi),
      col("series_id"), col("ts"), col("ts"), col("value"))

    // 3. per-sample rolling features, partitioned by day for pruned reads
    val rolling = Features.rollingByRows(cleaned, col("series_id"), col("ts"),
      col("ts"), col("value_clean"), rollingN)
      .withColumn("day", to_date(col("ts")))
    Ingest.writePartitioned(rolling, s"$outDir/sample_features", Seq("day"))

    // 4. per-series HRV feature table
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

  /** Continuous deployment path: watch `rawCsvDir` as a file stream and
    * run the same clean→features stages on each micro-batch via
    * foreachBatch, appending day-partitioned parquet. foreachBatch gives
    * the batch DataFrame + a batch id, so the sink write can be made
    * idempotent on replay (the parquet append here relies on the
    * checkpoint for exactly-once file-source progress).
    *
    * Returns the running StreamingQuery; callers own its lifecycle
    * (`processAllAvailable`/`stop` in tests, `awaitTermination` in jobs).
    */
  def ingestAndFeaturizeStream(spark: SparkSession, rawCsvDir: String,
      outDir: String, checkpointDir: String, lo: Double, hi: Double,
      rollingN: Int = 5): org.apache.spark.sql.streaming.StreamingQuery = {
    val raw = spark.readStream
      .schema(Ingest.rawWithCorrupt(rawSchema))
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", Ingest.CorruptCol)
      .csv(rawCsvDir)
    raw.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val (valid, bad) = Ingest.partitionValid(batch)
        bad.write.mode("append").parquet(s"$outDir/quarantine")
        val cleaned = Hrv.interpolateOutliers(
          Hrv.flagOutliers(valid, col("series_id"), col("ts"), col("ts"),
            col("value"), lo, hi),
          col("series_id"), col("ts"), col("ts"), col("value"))
        val rolling = Features.rollingByRows(cleaned, col("series_id"), col("ts"),
          col("ts"), col("value_clean"), rollingN)
          .withColumn("day", to_date(col("ts")))
        rolling.write.mode("append").partitionBy("day")
          .parquet(s"$outDir/sample_features")
        ()
      }
      .start()
  }
}
