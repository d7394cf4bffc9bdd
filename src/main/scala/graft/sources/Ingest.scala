package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Ingestion edge: schema-declared CSV/JSON readers with malformed-record
  * quarantine, and a partitioned parquet sink — the reference's
  * "ingestor" surface re-expressed as Spark sources/sinks.
  *
  * Readers run PERMISSIVE with a corrupt-record column so one bad line
  * never fails a 100 TB load; `partitionValid` splits the quarantine off
  * as data, keeping the pipeline declarative end to end.
  */
object Ingest {

  val CorruptCol = "_corrupt_record"

  private def withCorrupt(schema: StructType): StructType =
    if (schema.fieldNames.contains(CorruptCol)) schema
    else schema.add(StructField(CorruptCol, StringType, nullable = true))

  /** Schema-enforced CSV read; malformed rows land in `_corrupt_record`. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)

  /** Schema-enforced JSON-lines read with the same quarantine contract. */
  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** Split a permissively-read frame into (valid, quarantined). Valid rows
    * drop the corrupt column; quarantined rows keep the raw text for
    * replay/debugging. */
  def partitionValid(df: DataFrame): (DataFrame, DataFrame) = {
    val cached = df.cache()
    val valid = cached.filter(col(CorruptCol).isNull).drop(CorruptCol)
    val bad = cached.filter(col(CorruptCol).isNotNull)
    (valid, bad)
  }

  /** Partitioned parquet sink: at scale, partition columns (typically a
    * date derivative and/or key hash bucket) bound file listing and enable
    * partition pruning on read. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
}
