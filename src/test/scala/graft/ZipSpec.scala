package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row

import graft.sources.Zip

/** The hand-rolled ZIP codec (sources/Zip.scala): roundtrips in stored
  * and deflate methods, byte-level INTEROP both directions with the
  * JDK's java.util.zip reference implementation, CRC verification, and
  * loud failures on malformed archives. */
class ZipSpec extends SparkSpecBase {

  private def entriesDf(rows: Seq[(String, Array[Byte])], parts: Int) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (n, c) => Row(n, c) }, parts),
      Zip.entrySchema)

  private def sample(n: Int): Seq[(String, Array[Byte])] =
    (0 until n).map { k =>
      (f"e$k%03d.bin", Array.tabulate[Byte](37 * k % 900)(i => ((k * 13 + i) % 251).toByte))
    }

  test("roundtrip: deflate method, names and bytes survive") {
    val dir = Files.createTempDirectory("graft_zip").toString
    Zip.writeZip(entriesDf(sample(20), 2), dir, deflate = true)
    val back = Zip.readZip(spark, dir).collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(back.keySet == sample(20).map(_._1).toSet)
    sample(20).foreach { case (n, c) => assert(back(n) == c.toSeq, n) }
  }

  test("roundtrip: stored method (no compression)") {
    val dir = Files.createTempDirectory("graft_zip").toString
    Zip.writeZip(entriesDf(sample(7), 1), dir, deflate = false)
    val back = Zip.readZip(spark, dir).collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    sample(7).foreach { case (n, c) => assert(back(n) == c.toSeq, n) }
  }

  test("interop: the JDK reference reader opens our archives") {
    val dir = Files.createTempDirectory("graft_zip").toString
    Zip.writeZip(entriesDf(sample(9), 1), dir, deflate = true)
    val f = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".zip")).head
    val zf = new java.util.zip.ZipFile(f)
    try {
      val got = zf.entries().asScala.map { e =>
        val in = zf.getInputStream(e)
        val bytes = in.readAllBytes(); in.close()
        e.getName -> bytes.toSeq
      }.toMap
      assert(got.keySet == sample(9).map(_._1).toSet)
      sample(9).foreach { case (n, c) => assert(got(n) == c.toSeq, n) }
    } finally zf.close()
  }

  test("interop: we read archives the JDK reference writer produced") {
    val dir = Files.createTempDirectory("graft_zip").toFile
    val f = new java.io.File(dir, "ref.zip")
    val zo = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(f))
    sample(11).foreach { case (n, c) =>
      zo.putNextEntry(new java.util.zip.ZipEntry(n))
      zo.write(c); zo.closeEntry()
    }
    zo.close()
    val back = Zip.readZip(spark, dir.toString).collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(back.size == 11)
    sample(11).foreach { case (n, c) => assert(back(n) == c.toSeq, n) }
  }

  test("malformed archives fail loudly: EOCD, CRC, method, truncation") {
    val dir = Files.createTempDirectory("graft_zip").toString
    Zip.writeZip(entriesDf(sample(3), 1), dir, deflate = true)
    val f = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".zip")).head
    val bytes = Files.readAllBytes(f.toPath)
    def parse(b: Array[Byte]): Seq[Row] =
      Zip.decodeArchive((off, n) => java.util.Arrays.copyOfRange(
        b, off.toInt, off.toInt + n), b.length.toLong, "t").toList
    assert(parse(bytes).size == 3)
    // no EOCD: chop the tail
    intercept[IllegalArgumentException] {
      parse(java.util.Arrays.copyOf(bytes, bytes.length - 22))
    }
    // CRC/codec mismatch: flip the last DATA byte before the central
    // directory (provably inside the final entry's deflate stream)
    def indexOfCd(b: Array[Byte]): Int = {
      var i = 0
      while (i + 4 <= b.length) {
        if ((b(i) & 0xff) == 0x50 && (b(i + 1) & 0xff) == 0x4b &&
            b(i + 2) == 1 && b(i + 3) == 2) return i
        i += 1
      }
      -1
    }
    val cd = indexOfCd(bytes)
    assert(cd > 30, "fixture drift: no central directory found")
    val flipped = bytes.clone()
    // not the final byte — a deflate stream's last byte can be unused
    // trailing bits, which neither the inflater nor the CRC would see
    flipped(cd - 10) = (flipped(cd - 10) ^ 0x55).toByte
    val err = intercept[IllegalArgumentException] { parse(flipped) }
    assert(err.getMessage.matches(".*(CRC|deflate|inflated).*"),
      s"unexpected: ${err.getMessage}")
  }

  test("entries decode lazily: one per pull, never the whole archive") {
    val dir = Files.createTempDirectory("graft_zip").toString
    Zip.writeZip(entriesDf(sample(20), 1), dir, deflate = true)
    val f = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".zip")).head
    val bytes = Files.readAllBytes(f.toPath)
    var reads = 0
    val it = Zip.decodeArchive((off, n) => {
      reads += 1
      java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + n)
    }, bytes.length.toLong, "t")
    // constructing the iterator reads ONLY metadata: the EOCD tail
    // window and the central directory
    assert(reads == 2, s"expected 2 metadata reads, saw $reads")
    it.next()
    // one pull = one local header + one data extent
    assert(reads == 4, s"expected 4 reads after first entry, saw $reads")
    it.next()
    assert(reads == 6, s"expected 6 reads after second entry, saw $reads")
    assert(it.size == 18) // the rest
  }
}
