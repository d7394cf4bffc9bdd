package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.sources.Avro

/** The hand-rolled Avro object-container codec (graft.sources.Avro):
  * round-trips, null unions, empty partitions, schema-drift refusal,
  * and — the load-bearing part — byte-level INTEROP in both directions
  * with the `org.apache.avro` 1.12 reference implementation on Spark's
  * own classpath: files we write must be read by the reference reader,
  * and reference-written files must be read by our reader. That pins
  * the codec to the public spec, not to itself. */
class AvroSpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("score", DoubleType, nullable = true),
    StructField("size", IntegerType, nullable = true),
    StructField("ok", BooleanType, nullable = true),
    StructField("ts", TimestampNTZType, nullable = true)))

  private def ts(s: String): java.time.LocalDateTime =
    java.time.LocalDateTime.parse(s)

  private def sampleRows: Seq[Row] = Seq(
    Row(1L, "alice", 1.5, 10, true, ts("1995-03-07T12:34:56.000123")),
    Row(2L, null, 2.5, null, false, null),
    Row(3L, "bob", null, -7, null, ts("1969-12-31T23:59:59.999999")), // pre-epoch µs
    Row(-4L, "", 0.0, 0, true, ts("1970-01-01T00:00:00")),
    Row(Long.MaxValue, "ünïcödé ☃", Double.MinPositiveValue,
      Int.MinValue, false, ts("2262-01-01T00:00:00.5")))

  private def sampleDf = spark.createDataFrame(
    spark.sparkContext.parallelize(sampleRows, 2), schema)

  private def collectSorted(df: org.apache.spark.sql.DataFrame): Seq[Row] =
    df.collect().toSeq.sortBy(_.getLong(0))

  test("roundtrip: null codec preserves every value, null, and µs") {
    val dir = Files.createTempDirectory("graft_avro").toString
    Avro.writeAvro(sampleDf, dir, codec = "null")
    val back = Avro.readAvro(spark, dir, schema)
    assert(collectSorted(back) == sampleRows.sortBy(_.getLong(0)))
  }

  test("roundtrip: deflate codec, small blocks force multi-block files") {
    val dir = Files.createTempDirectory("graft_avro").toString
    Avro.writeAvro(sampleDf, dir, codec = "deflate", blockRows = 2)
    val back = Avro.readAvro(spark, dir, schema)
    assert(collectSorted(back) == sampleRows.sortBy(_.getLong(0)))
  }

  test("empty partitions write header-only files that read as zero rows") {
    val dir = Files.createTempDirectory("graft_avro").toString
    val empty = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq.empty[Row], 3), schema)
    Avro.writeAvro(empty, dir)
    assert(Avro.readAvro(spark, dir, schema).count() == 0L)
  }

  test("schema drift fails loudly: wrong type, wrong name, wrong nullability") {
    val dir = Files.createTempDirectory("graft_avro").toString
    Avro.writeAvro(sampleDf, dir)
    def declaredWith(f: StructField): StructType =
      StructType(schema.fields.map(x => if (x.name == f.name) f else x))
    val wrongType = intercept[Exception] {
      Avro.readAvro(spark, dir,
        declaredWith(StructField("score", LongType, nullable = true))).count()
    }
    assert(wrongType.getMessage.contains("score"))
    val wrongName = intercept[Exception] {
      Avro.readAvro(spark, dir, StructType(
        schema.fields.map(f => if (f.name == "name") f.copy(name = "nom") else f))).count()
    }
    assert(wrongName.getMessage.contains("nom"))
    val wrongNull = intercept[Exception] {
      Avro.readAvro(spark, dir,
        declaredWith(StructField("name", StringType, nullable = false))).count()
    }
    assert(wrongNull.getMessage.toLowerCase.contains("nullability"))
  }

  test("unsupported declared type refuses up front") {
    val bad = StructType(Seq(StructField("x", ArrayType(LongType))))
    intercept[IllegalArgumentException] {
      Avro.schemaJson(bad)
    }
  }

  test("quarantine: corrupt containers are isolated per file, clean rows all survive") {
    val dir = Files.createTempDirectory("graft_avro").toString
    Avro.writeAvro(sampleDf, dir, codec = "deflate", blockRows = 2)
    // three corruption shapes next to the good files
    Files.write(java.nio.file.Paths.get(s"$dir/bad_magic.avro"),
      "not an avro container at all".getBytes("UTF-8"))
    val good = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".avro"))
    assert(good.nonEmpty)
    val bytes = Files.readAllBytes(good.head.toPath)
    Files.write(java.nio.file.Paths.get(s"$dir/truncated.avro"),
      java.util.Arrays.copyOf(bytes, bytes.length - 7))
    val flipped = bytes.clone()
    flipped(flipped.length - 3) = (flipped(flipped.length - 3) ^ 0x5a).toByte
    Files.write(java.nio.file.Paths.get(s"$dir/bitflip.avro"), flipped)
    val (data, quarantine) = Avro.readAvroWithQuarantine(spark, dir, schema)
    val q = quarantine.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(q.size >= 2, s"expected the corrupt files quarantined, got $q")
    assert(q.keys.exists(_.contains("bad_magic")))
    assert(q.keys.exists(_.contains("truncated")))
    assert(q.values.forall(_.nonEmpty))
    // every clean row survives — including rows of the file whose COPY
    // was corrupted (fault isolation is per file, not per content)
    assert(collectSorted(data).size >= sampleRows.size)
    val clean = data.collect().map(_.getLong(0)).toSet
    assert(sampleRows.map(_.getLong(0)).toSet.subsetOf(clean))
  }

  // ---- interop with the org.apache.avro reference implementation ----

  private def refSchema: org.apache.avro.Schema =
    new org.apache.avro.Schema.Parser().parse(Avro.schemaJson(schema))

  test("interop: reference reader decodes our files byte-for-byte") {
    val dir = Files.createTempDirectory("graft_avro").toString
    Avro.writeAvro(sampleDf, dir, codec = "deflate", blockRows = 2)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.nonEmpty)
    val got = files.flatMap { f =>
      val r = new org.apache.avro.file.DataFileReader(
        f, new org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord](refSchema))
      try r.iterator().asScala.map { rec =>
        Row(
          rec.get("id").asInstanceOf[Long],
          Option(rec.get("name")).map(_.toString).orNull,
          rec.get("score"),
          rec.get("size"),
          rec.get("ok"),
          Option(rec.get("ts")).map(us =>
            java.time.LocalDateTime.ofEpochSecond(
              Math.floorDiv(us.asInstanceOf[Long], 1000000L),
              Math.floorMod(us.asInstanceOf[Long], 1000000L).toInt * 1000,
              java.time.ZoneOffset.UTC)).orNull)
      }.toList
      finally r.close()
    }.toSeq
    assert(got.sortBy(_.getLong(0)) == sampleRows.sortBy(_.getLong(0)))
  }

  test("interop: our reader decodes reference-written files (incl. deflate)") {
    val dir = Files.createTempDirectory("graft_avro").toFile
    val f = new java.io.File(dir, "ref.avro")
    val w = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](refSchema))
    w.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
    w.create(refSchema, f)
    sampleRows.foreach { r =>
      val rec = new org.apache.avro.generic.GenericData.Record(refSchema)
      rec.put("id", r.getLong(0))
      rec.put("name", r.getString(1))
      rec.put("score", if (r.isNullAt(2)) null else r.getDouble(2))
      rec.put("size", if (r.isNullAt(3)) null else r.getInt(3))
      rec.put("ok", if (r.isNullAt(4)) null else r.getBoolean(4))
      rec.put("ts", if (r.isNullAt(5)) null else {
        val ldt = r.getAs[java.time.LocalDateTime](5)
        java.lang.Long.valueOf(
          ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
            ldt.getNano / 1000L)
      })
      w.append(rec)
    }
    w.close()
    val back = Avro.readAvro(spark, dir.toString, schema)
    assert(collectSorted(back) == sampleRows.sortBy(_.getLong(0)))
  }
}
