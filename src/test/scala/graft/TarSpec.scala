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

  private def parseBytes(b: Array[Byte]): List[Row] =
    Tar.decodeStream(new java.io.ByteArrayInputStream(b), "t").toList

  private val eoa = new Array[Byte](1024)

  test("pax long names roundtrip: the path override replaces the truncated name") {
    val longName = "webdataset/shards/split-3/category-5/" + "x" * 60 + "-000000042.bmp"
    assert(longName.length > 100)
    val short = "short.txt"
    val bytes = Tar.encodePaxEntry(longName, "img-bytes".getBytes("UTF-8")) ++
      Tar.encodePaxEntry(short, "caption".getBytes("UTF-8")) ++ eoa
    val rows = parseBytes(bytes)
    assert(rows.map(_.getString(0)) == List(longName, short))
    assert(new String(rows.head.getAs[Array[Byte]](1), "UTF-8") == "img-bytes")
    // the x entry itself must NOT surface as a data row
    assert(rows.size == 2)
  }

  test("pax entries with short names stay plain ustar (byte-identical)") {
    val e = Tar.encodePaxEntry("a.txt", "abc".getBytes("UTF-8"))
    assert(e.toSeq == Tar.encodeEntry("a.txt", "abc".getBytes("UTF-8")).toSeq)
  }

  test("pax record framing is the POSIX fixed point and parses back") {
    val r = new String(Tar.paxRecord("path", "p/q.txt"), "UTF-8")
    assert(r == "16 path=p/q.txt\n") // 2 digits + " path=p/q.txt\n" = 16
    val m = Tar.parsePax(Tar.paxRecord("path", "x" * 120) ++
      Tar.paxRecord("mtime", "123.5"), "t")
    assert(m("path") == "x" * 120 && m("mtime") == "123.5")
  }

  test("pax global headers validate and skip; unknown typeflags fail loudly") {
    // hand-build a 'g' entry via the writer's own framing, then flip
    // the typeflag byte and re-checksum
    def retype(entry: Array[Byte], flag: Char): Array[Byte] = {
      val e = entry.clone()
      e(156) = flag.toByte
      java.util.Arrays.fill(e, 148, 156, ' '.toByte)
      var sum = 0
      for (i <- 0 until 512) sum += e(i) & 0xff
      val cs = f"$sum%06o".getBytes("US-ASCII")
      System.arraycopy(cs, 0, e, 148, 6); e(154) = 0; e(155) = ' '
      e
    }
    val g = retype(Tar.encodeEntry("pax_global", Tar.paxRecord("comment", "c")), 'g')
    val data = Tar.encodeEntry("a.txt", "abc".getBytes("UTF-8"))
    assert(parseBytes(g ++ data ++ eoa).map(_.getString(0)) == List("a.txt"))
    // GNU longname ('L') and directory ('5') are NOT silently data
    for (flag <- Seq('L', '5')) {
      val bad = retype(data, flag)
      val err = intercept[IllegalArgumentException] { parseBytes(bad ++ eoa) }
      assert(err.getMessage.contains("typeflag"), s"flag=$flag: ${err.getMessage}")
    }
  }

  test("malformed pax records and dangling overrides fail loudly") {
    def xEntry(content: Array[Byte]): Array[Byte] = {
      val e = Tar.encodeEntry("pax_hdr", content).clone()
      e(156) = 'x'.toByte
      java.util.Arrays.fill(e, 148, 156, ' '.toByte)
      var sum = 0
      for (i <- 0 until 512) sum += e(i) & 0xff
      val cs = f"$sum%06o".getBytes("US-ASCII")
      System.arraycopy(cs, 0, e, 148, 6); e(154) = 0; e(155) = ' '
      e
    }
    val data = Tar.encodeEntry("a.txt", "abc".getBytes("UTF-8"))
    // no decimal length prefix
    intercept[IllegalArgumentException] {
      parseBytes(xEntry("path=x\n".getBytes("UTF-8")) ++ data ++ eoa)
    }
    // length overruns the entry
    intercept[IllegalArgumentException] {
      parseBytes(xEntry("999 path=x\n".getBytes("UTF-8")) ++ data ++ eoa)
    }
    // record without '='
    intercept[IllegalArgumentException] {
      parseBytes(xEntry("8 pathx\n".getBytes("UTF-8")) ++ data ++ eoa)
    }
    // a path override with no following entry is a malformed archive
    val dangling = xEntry(Tar.paxRecord("path", "long/name.bin"))
    val err = intercept[IllegalArgumentException] { parseBytes(dangling ++ eoa) }
    assert(err.getMessage.contains("no following entry"))
  }

  test("webdataset grouping works across pax long-name shards") {
    val dir = Files.createTempDirectory("graft_tar_pax").toString
    val prefix = "corpus/split-0/" + "y" * 70 + "/sample-"
    val rows = (0 until 6).flatMap { k =>
      Seq(Row(f"$prefix$k%06d.txt", s"cap $k".getBytes("UTF-8")),
        Row(f"$prefix$k%06d.cls", s"$k".getBytes("UTF-8")))
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Tar.entrySchema)
    Tar.writeTar(df, dir, pax = true)
    val back = Tar.readWebDataset(spark, dir).collect()
    assert(back.length == 6)
    assert(back.map(_.getString(0)).sorted.toSeq ==
      (0 until 6).map(k => f"$prefix$k%06d").sorted)
  }
}
