package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the Avro quarantine validation pass: the structural
  * skip-walk (graft.sources.Avro.validateStream — varints walked,
  * string payloads skipped, nothing materialized) against a full
  * decode drain on the same container bytes, plus the end-to-end
  * readAvroWithQuarantine wall. The round-14 verdict priced the
  * quarantine path at "2× decode"; this records what the skip-walk
  * validation actually costs — the SkewMeasure/PqMeasure tradition of
  * measuring the claim rather than arguing it.
  *
  * Usage: runMain graft.AvroMeasure [sfDir] [rows]
  * Prints one JSON line {"metric":"avro_validate",...}.
  */
object AvroMeasure {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import org.apache.spark.sql.types._
    val declared = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_comment", StringType, nullable = false)))
    val replicate = if (args.length > 1) args(1).toInt else 8
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_measure").toString
    val orders = Tables.orders(spark, sfDir)
      // replicate for stable timings (sf0.1 orders alone is ~8 MB of
      // container — too small to time a per-byte claim against JIT noise)
      .crossJoin(spark.range(replicate).select(col("id").as("rep")))
      .select(
        (col("o_orderkey") * replicate + col("rep")).as("o_orderkey"),
        col("o_custkey"), col("o_orderstatus"), col("o_totalprice"),
        // a fat string column: the value-materialization cost the
        // skip-walk avoids is mostly UTF-8 decode of payload strings
        concat_ws("-", col("o_orderpriority"),
          md5(col("o_orderkey").cast("string")),
          md5(col("o_custkey").cast("string"))).as("o_comment"))
    graft.sources.Avro.writeAvro(orders, dir, codec = "deflate")
    val nRows = orders.count()

    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro")).sortBy(_.getName)
    val totalBytes = files.map(_.length).sum

    def best3(f: => Unit): Double = {
      f // warmup
      (1 to 3).map { _ =>
        val t0 = System.nanoTime; f; (System.nanoTime - t0) / 1e9
      }.min
    }

    // single-threaded per-byte comparison: the per-task work the two
    // validation designs differ on (cluster wall divides both by cores)
    val tSkip = best3 {
      files.foreach { f =>
        graft.sources.Avro.validateStream(
          new java.io.FileInputStream(f), declared, f.getName)
      }
    }
    val tDecode = best3 {
      files.foreach { f =>
        val it = graft.sources.Avro.decodeStream(
          new java.io.FileInputStream(f), declared, f.getName)
        while (it.hasNext) it.next()
      }
    }
    // end-to-end: quarantine read (skip-walk validate + decode) vs the
    // trusted-producer plain read (decode only)
    val tPlain = best3 {
      graft.sources.Avro.readAvro(spark, dir, declared)
        .agg(count(lit(1))).head
      ()
    }
    val tQuarantine = best3 {
      val (d, q) = graft.sources.Avro.readAvroWithQuarantine(spark, dir, declared)
      d.agg(count(lit(1))).head
      q.count()
      ()
    }

    // null-codec twin: with no inflate in the way, the structural walk's
    // own cost shows — this is the regime of producers that ship
    // uncompressed containers (and the ceiling for any faster codec)
    val dirN = java.nio.file.Files.createTempDirectory("graft_avro_measure_n").toString
    graft.sources.Avro.writeAvro(orders, dirN, codec = "null")
    val filesN = new java.io.File(dirN).listFiles()
      .filter(_.getName.endsWith(".avro")).sortBy(_.getName)
    val tSkipN = best3 {
      filesN.foreach { f =>
        graft.sources.Avro.validateStream(
          new java.io.FileInputStream(f), declared, f.getName)
      }
    }
    val tDecodeN = best3 {
      filesN.foreach { f =>
        val it = graft.sources.Avro.decodeStream(
          new java.io.FileInputStream(f), declared, f.getName)
        while (it.hasNext) it.next()
      }
    }

    println(f"""{"metric":"avro_validate","rows":$nRows,"bytes":$totalBytes,""" +
      f""""files":${files.length},"skip_walk_s":$tSkip%.3f,"full_decode_s":$tDecode%.3f,""" +
      f""""decode_over_skip":${tDecode / tSkip}%.2f,""" +
      f""""skip_walk_null_s":$tSkipN%.3f,"full_decode_null_s":$tDecodeN%.3f,""" +
      f""""decode_over_skip_null":${tDecodeN / tSkipN}%.2f,""" +
      f""""read_plain_s":$tPlain%.3f,"read_quarantine_s":$tQuarantine%.3f,""" +
      f""""quarantine_overhead":${tQuarantine / tPlain}%.2f}""")
    spark.stop()
  }
}
