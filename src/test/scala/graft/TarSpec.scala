package graft

import java.nio.file.Files

import org.apache.spark.sql.Row

import graft.sources.Tar

/** The hand-rolled ustar codec + WebDataset grouping (sources/Tar.scala):
  * roundtrips, checksum verification, padding discipline, cross-shard
  * sample grouping, and loud failures on malformed archives. */
class TarSpec extends SparkSpecBase {

  private def entriesDf(rows: Seq[(String, Array[Byte])], parts: Int) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (n, c) => Row(n, c) }, parts),
      Tar.entrySchema)

  test("roundtrip: names, bytes, and odd sizes (padding) all survive") {
    val dir = Files.createTempDirectory("graft_tar").toString
    val rows = (0 until 30).map { k =>
      // sizes straddle block boundaries: 0, 1, 511, 512, 513, ...
      val n = Seq(0, 1, 511, 512, 513, 1024, 777)(k % 7)
      (f"f$k%03d.bin", Array.tabulate[Byte](n)(i => ((k * 31 + i) % 127).toByte))
    }
    Tar.writeTar(entriesDf(rows, 2), dir)
    val back = Tar.readTar(spark, dir).collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(back.keySet == rows.map(_._1).toSet)
    rows.foreach { case (n, c) => assert(back(n) == c.toSeq, s"bytes of $n") }
  }

  test("an interop sanity pin: the header is real ustar") {
    val e = Tar.encodeEntry("hello.txt", "hi".getBytes("UTF-8"))
    assert(e.length == 1024) // header + one padded block
    assert(new String(e, 257, 5, "US-ASCII") == "ustar")
    assert(new String(e, 124, 11, "US-ASCII") == "00000000002") // octal size
    // checksum recomputes
    var sum = 0
    for (i <- 0 until 512) sum += (if (i >= 148 && i < 156) ' '.toInt else e(i) & 0xff)
    val stored = Integer.parseInt(new String(e, 148, 6, "US-ASCII"), 8)
    assert(sum == stored)
  }

  test("webdataset grouping: one row per key, even across shards") {
    val dir = Files.createTempDirectory("graft_tar").toString
    val rows = (0 until 12).flatMap { k =>
      Seq((f"$k%04d.img", Array[Byte](k.toByte, 1)),
        (f"$k%04d.txt", s"cap-$k".getBytes("UTF-8")))
    }
    // 3 partitions WITHOUT keeping a key's entries together: grouping
    // must still pair them (shuffle on key, not shard locality)
    val scrambled = new scala.util.Random(3).shuffle(rows)
    Tar.writeTar(entriesDf(scrambled, 3), dir)
    val got = Tar.readWebDataset(spark, dir).collect()
      .map(r => r.getString(0) ->
        r.getMap[String, Array[Byte]](1).map { case (e, c) => e -> c.toSeq }.toMap)
      .toMap
    assert(got.size == 12)
    (0 until 12).foreach { k =>
      val m = got(f"$k%04d")
      assert(m.keySet == Set("img", "txt"))
      assert(m("txt") == s"cap-$k".getBytes("UTF-8").toSeq)
    }
  }

  test("webdataset key collisions across shards fail loudly, never fuse") {
    val dir = Files.createTempDirectory("graft_tar").toString
    // per-shard-local numbering: both shards carry 0001.img — unrelated
    // samples that silent grouping would fuse into one row
    val rows = Seq(
      ("0001.img", Array[Byte](1)), ("0001.txt", "a".getBytes("UTF-8")),
      ("0001.img", Array[Byte](2)), ("0002.txt", "b".getBytes("UTF-8")))
    Tar.writeTar(entriesDf(rows.take(2), 1), s"$dir/s1")
    Tar.writeTar(entriesDf(rows.drop(2), 1), s"$dir/s2")
    // merge the two shard dirs
    new java.io.File(s"$dir/s2").listFiles().foreach { f =>
      Files.move(f.toPath, java.nio.file.Paths.get(dir, "z-" + f.getName))
    }
    new java.io.File(s"$dir/s1").listFiles().foreach { f =>
      Files.move(f.toPath, java.nio.file.Paths.get(dir, f.getName))
    }
    val err = intercept[Exception] {
      Tar.readWebDataset(spark, dir).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(err).exists(_.contains("key collision")),
      s"got ${messages(err)}")
  }

  test("malformed archives fail loudly: magic, checksum, truncation") {
    def parse(b: Array[Byte]): List[Row] =
      Tar.decodeStream(new java.io.ByteArrayInputStream(b), "t").toList
    val good = Tar.encodeEntry("a.txt", "abc".getBytes("UTF-8")) ++
      new Array[Byte](1024)
    assert(parse(good).size == 1)
    val badMagic = good.clone(); badMagic(257) = 'X'.toByte
    intercept[IllegalArgumentException] { parse(badMagic) }
    val badSum = good.clone(); badSum(0) = 'z'.toByte // name change breaks sum
    intercept[IllegalArgumentException] { parse(badSum) }
    intercept[IllegalArgumentException] { // EOF inside content padding
      parse(java.util.Arrays.copyOf(good, 600))
    }
    val badSize = good.clone(); badSize(124) = '9'.toByte // non-octal
    intercept[IllegalArgumentException] { parse(badSize) }
  }
}
