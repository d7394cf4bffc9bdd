package graft

import java.nio.file.Files

class PipelineSpec extends SparkSpecBase {

  test("streaming ingest carries cross-batch context and quarantines per batch") {
    val dir = Files.createTempDirectory("graft_pipe_stream").toFile
    val in = new java.io.File(dir, "incoming"); in.mkdirs()
    val out = new java.io.File(dir, "out").getAbsolutePath
    val ckpt = new java.io.File(dir, "ckpt").getAbsolutePath
    def drop(name: String, rows: String): Unit =
      Files.writeString(new java.io.File(in, name).toPath,
        "series_id,ts,value\n" + rows)
    // series 1 SPANS the two file drops — its batch-2 rows must see the
    // batch-1 rows as rolling context via the state tail
    drop("a.csv", "1,2024-01-01 00:00:00,800\n1,2024-01-01 00:00:01,810\n")
    val q = Pipeline.ingestAndFeaturizeStream(spark, in.getAbsolutePath, out,
      ckpt, lo = 300, hi = 2000)
    try {
      q.processAllAvailable()
      drop("b.csv", "1,2024-01-01 00:00:02,830\n2,2024-01-02 00:00:00,600\nbad,row,here\n")
      q.processAllAvailable()
    } finally q.stop()
    import org.apache.spark.sql.functions.col
    val feats = spark.read.parquet(s"$out/sample_features")
    assert(feats.count() == 4) // 2 + 2 valid rows across two batches
    assert(spark.read.parquet(s"$out/quarantine").count() == 1)
    // cross-batch continuity: the batch-2 row of series 1 has a delta
    // against the batch-1 predecessor and a 3-row rolling count
    val contRow = feats.filter(col("series_id") === 1
      && col("ts") === java.sql.Timestamp.valueOf("2024-01-01 00:00:02")).collect().head
    assert(contRow.getAs[Double]("f_delta") == 20.0) // 830 - 810
    assert(contRow.getAs[Long]("f_cnt") == 3)
    // streaming features equal the batch pipeline over the concatenated data
    val batchDir = new java.io.File(dir, "batch_out").getAbsolutePath
    val both = new java.io.File(dir, "all.csv")
    Files.writeString(both.toPath,
      "series_id,ts,value\n1,2024-01-01 00:00:00,800\n1,2024-01-01 00:00:01,810\n" +
        "1,2024-01-01 00:00:02,830\n2,2024-01-02 00:00:00,600\n")
    Pipeline.ingestAndFeaturize(spark, both.getAbsolutePath, batchDir, lo = 300, hi = 2000)
    val batchFeats = spark.read.parquet(s"$batchDir/sample_features")
    val fCols = batchFeats.columns.filter(c => c.startsWith("f_") || c == "series_id").map(col)
    assert(feats.select(fCols: _*).except(batchFeats.select(fCols: _*)).count() == 0)
  }

  test("raw CSV to feature tables, with quarantine and cleaning applied") {
    val dir = Files.createTempDirectory("graft_pipe").toFile
    val raw = new java.io.File(dir, "export.csv")
    // series 1: clean run with one absolute artifact (5000); series 2: short;
    // one malformed line that must be quarantined, not fatal
    Files.writeString(raw.toPath,
      """series_id,ts,value
        |1,2024-01-01 00:00:00,800
        |1,2024-01-01 00:00:01,810
        |1,2024-01-01 00:00:02,5000
        |1,2024-01-01 00:00:03,820
        |1,2024-01-01 00:00:04,790
        |2,2024-01-02 00:00:00,600
        |2,2024-01-02 00:00:01,610
        |garbage,not_a_ts,nope
        |""".stripMargin)
    val out = new java.io.File(dir, "out").getAbsolutePath
    val s = Pipeline.ingestAndFeaturize(spark, raw.getAbsolutePath, out,
      lo = 300, hi = 2000)

    assert(s.validRows == 7)
    assert(s.quarantinedRows == 1)
    assert(s.series == 2)
    assert(s.featureRows == 7)

    // the artifact was interpolated before features: max clean value sane
    val sample = spark.read.parquet(s"$out/sample_features")
    import org.apache.spark.sql.functions._
    val maxClean = sample.agg(max(col("value_clean"))).collect().head.getDouble(0)
    assert(maxClean <= 2000, s"artifact leaked into features: $maxClean")

    // day partitioning materialized on disk
    assert(new java.io.File(s"$out/sample_features/day=2024-01-01").exists())
    assert(new java.io.File(s"$out/sample_features/day=2024-01-02").exists())

    // series feature table has the HRV block
    val series = spark.read.parquet(s"$out/series_features")
    assert(series.columns.toSet.intersect(Set("sdnn", "rmssd", "sd1", "sd2")).size == 4)
  }
}
