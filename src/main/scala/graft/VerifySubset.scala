package graft

import org.apache.spark.sql.SparkSession

/** Focused correctness iteration: `runMain graft.VerifySubset <sfDir>
  * <outDir> <name>...` dumps ONLY the named SparkEntry queries (plus
  * their oracle SQL) in Verify's exact format, so `tools/check.py` can
  * gate a handful of touched queries in seconds instead of re-running
  * the full suite. Same session settings as [[Verify]]. */
object VerifySubset {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSet
    require(names.nonEmpty, "VerifySubset: pass at least one query name")
    val unknown = names -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    // default must MATCH Verify's ("4"): shuffle.partitions follows it,
    // and a different partition count changes float summation order —
    // a query could pass the subset gate and fail the real one
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Verify.run(spark, sfDir, outDir,
      SparkEntry.queries.view.filterKeys(names).toMap,
      SparkEntry.oracleSql.view.filterKeys(names).toMap)
    spark.stop()
  }
}
