package graft.sources

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, Inflater}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** ZIP archive source/sink, hand-rolled on the public format
  * specification (PKWARE APPNOTE.TXT) — the third archive family a
  * media/crawl corpus arrives in (after tar shards and WARC): local
  * file headers, a central directory, and the end-of-central-directory
  * record, all little-endian, with a per-entry CRC-32 the reader
  * VERIFIES (zip is the one container here whose integrity check is
  * part of the format itself — a corrupt member is detected by spec
  * machinery, not by decode luck).
  *
  * Reading goes the way the format intends: locate the EOCD by
  * scanning backward from the file end, read the CENTRAL DIRECTORY
  * (the authoritative entry table — local headers alone under-count
  * when archives carry deleted/overwritten members), then seek each
  * local header and stream its data. That requires a seekable input,
  * which HDFS-style streams provide; entries decode stored (method 0)
  * or raw-deflate (method 8) and both CRC and uncompressed size are
  * checked against the directory's claim.
  *
  * Scale shape mirrors Tar/Warc: one archive per input partition at
  * write, one streamed task per archive at read — media zips ship
  * many archives by construction. ZIP64 is out of scope (entries and
  * archives here are partition-sized; a >4 GB single archive should
  * be shards instead) and fails loudly, never silently truncates.
  */
object Zip {

  val entrySchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("content", BinaryType, nullable = false)))

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  private class W {
    val out = new ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = {
      out.write(v.toInt & 0xff); out.write((v >> 8).toInt & 0xff)
      out.write((v >> 16).toInt & 0xff); out.write((v >> 24).toInt & 0xff)
    }
    def bytes(b: Array[Byte]): Unit = out.write(b, 0, b.length)
    def size: Long = out.size().toLong
  }

  private def rawDeflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION, /*nowrap=*/ true)
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream(math.max(64, data.length / 3))
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def rawInflate(data: Array[Byte], expect: Int, file: String,
      name: String): Array[Byte] = {
    val inf = new Inflater(/*nowrap=*/ true)
    inf.setInput(data)
    val out = new Array[Byte](expect)
    var off = 0
    while (off < expect && !inf.finished()) {
      val n = inf.inflate(out, off, expect - off)
      if (n == 0 && inf.needsInput())
        fail(file, s"truncated deflate data in entry '$name'")
      off += n
    }
    if (off != expect)
      fail(file, s"entry '$name' inflated to $off, directory claims $expect")
    inf.end()
    out
  }

  /** Write `df` (rows shaped like [[entrySchema]]) as one `.zip` per
    * input partition, executor-side. `deflate` selects method 8 for
    * every entry; false stores them (method 0). */
  def writeZip(df: DataFrame, path: String, deflate: Boolean = true): Unit = {
    require(df.schema.fieldNames.toSeq == entrySchema.fieldNames.toSeq,
      s"writeZip needs columns ${entrySchema.fieldNames.mkString(",")}")
    ShardSink.writeShards(df, path, pid => f"archive-$pid%05d.zip") { (_, rows, os) =>
      val w = new W
      // central-directory entries accumulate as locals are written
      case class Cd(name: Array[Byte], method: Int, crc: Long,
          csize: Long, usize: Long, offset: Long)
      val cds = scala.collection.mutable.ArrayBuffer[Cd]()
      rows.foreach { r =>
        val name = r.getString(0).getBytes("US-ASCII")
        val content = r.getAs[Array[Byte]](1)
        val crc = new CRC32
        crc.update(content, 0, content.length)
        val method = if (deflate) 8 else 0
        val data = if (deflate) rawDeflate(content) else content
        val offset = w.size
        w.w32(0x04034b50L) // local file header
        w.w16(20); w.w16(0); w.w16(method)
        w.w16(0); w.w16(0x21) // deterministic mod time/date (1980-01-01)
        w.w32(crc.getValue); w.w32(data.length.toLong); w.w32(content.length.toLong)
        w.w16(name.length); w.w16(0)
        w.bytes(name); w.bytes(data)
        cds += Cd(name, method, crc.getValue, data.length.toLong,
          content.length.toLong, offset)
      }
      val cdStart = w.size
      cds.foreach { c =>
        w.w32(0x02014b50L) // central directory header
        w.w16(20); w.w16(20); w.w16(0); w.w16(c.method)
        w.w16(0); w.w16(0x21)
        w.w32(c.crc); w.w32(c.csize); w.w32(c.usize)
        w.w16(c.name.length); w.w16(0); w.w16(0)
        w.w16(0); w.w16(0); w.w32(0L)
        w.w32(c.offset)
        w.bytes(c.name)
      }
      val cdSize = w.size - cdStart
      w.w32(0x06054b50L) // end of central directory
      w.w16(0); w.w16(0)
      w.w16(cds.length); w.w16(cds.length)
      w.w32(cdSize); w.w32(cdStart)
      w.w16(0)
      os.write(w.out.toByteArray)
    }
  }

  private def fail(file: String, msg: String): Nothing =
    throw new IllegalArgumentException(s"invalid zip in $file: $msg")

  /** One central-directory entry's metadata — parsed eagerly (the
    * directory is metadata-scale); the entry's DATA decodes lazily. */
  private case class CdEntry(name: String, method: Int, crc: Long,
      csize: Int, usize: Int, localOff: Long)

  /** Decode one archive through its central directory (seekable
    * input). Returns (name, content) rows in directory order, as a
    * LAZY iterator: the EOCD and central directory (metadata) are read
    * and validated up front, but each entry's bytes are fetched,
    * inflated, and CRC-checked only when `next()` pulls its row — one
    * entry is the only decompressed buffer resident per task, matching
    * the WARC (one record) and tar (one entry) readers. */
  private[graft] def decodeArchive(read: (Long, Int) => Array[Byte],
      fileLen: Long, file: String): Iterator[Row] = {
    // EOCD: fixed 22 bytes + comment; scan the tail window backward
    val tailLen = math.min(fileLen, 22L + 65535L).toInt
    if (tailLen < 22) fail(file, "too short for an end-of-central-directory")
    val tail = read(fileLen - tailLen, tailLen)
    var e = tailLen - 22
    while (e >= 0 && u32(tail, e) != 0x06054b50L) e -= 1
    if (e < 0) fail(file, "no end-of-central-directory signature")
    val n = u16(tail, e + 10)
    if (u16(tail, e + 8) != n)
      fail(file, "multi-disk archives are not supported")
    val cdSize = u32(tail, e + 12)
    val cdOff = u32(tail, e + 16)
    if (cdOff == 0xffffffffL || n == 0xffff)
      fail(file, "ZIP64 archive — shard it instead")
    if (cdOff + cdSize > fileLen) fail(file, "central directory overruns file")
    // the directory is 46+ bytes per entry of METADATA; a multi-GB claim
    // is corrupt or adversarial and must fail loudly, not
    // NegativeArraySizeException on the Int cast below
    if (cdSize > (1L << 28))
      fail(file, s"central directory claims $cdSize bytes — corrupt EOCD")
    val cd = read(cdOff, cdSize.toInt)
    val entries = new Array[CdEntry](n)
    var p = 0
    var i = 0
    while (i < n) {
      if (p + 46 > cd.length) fail(file, s"central directory truncated at entry $i")
      if (u32(cd, p) != 0x02014b50L)
        fail(file, s"bad central-directory signature at entry $i")
      val method = u16(cd, p + 10)
      val crc = u32(cd, p + 16)
      val csize = u32(cd, p + 20)
      val usize = u32(cd, p + 24)
      val nameLen = u16(cd, p + 28)
      val extraLen = u16(cd, p + 30)
      val commentLen = u16(cd, p + 32)
      val localOff = u32(cd, p + 42)
      if (p + 46 + nameLen > cd.length) fail(file, s"entry $i name overruns directory")
      val name = new String(cd, p + 46, nameLen, "US-ASCII")
      if (method != 0 && method != 8)
        fail(file, s"entry '$name' uses unsupported method $method")
      if (usize > Int.MaxValue || csize > Int.MaxValue)
        fail(file, s"entry '$name' too large")
      entries(i) = CdEntry(name, method, crc, csize.toInt, usize.toInt, localOff)
      p += 46 + nameLen + extraLen + commentLen
      i += 1
    }
    entries.iterator.map { ent =>
      // local header: sig(4) ver(2) flag(2) method(2) time(4) crc(4)
      // csize(4) usize(4) nameLen(2) extraLen(2) — the LOCAL name/extra
      // lengths govern the data offset (they may differ from the CD's)
      val lh = read(ent.localOff, 30)
      if (u32(lh, 0) != 0x04034b50L)
        fail(file, s"entry '${ent.name}' local-header signature missing")
      val dataOff = ent.localOff + 30 + u16(lh, 26) + u16(lh, 28)
      val data = read(dataOff, ent.csize)
      val content =
        if (ent.method == 8) rawInflate(data, ent.usize, file, ent.name)
        else {
          if (data.length != ent.usize)
            fail(file, s"entry '${ent.name}' stored size mismatch")
          data
        }
      val check = new CRC32
      check.update(content, 0, content.length)
      if (check.getValue != ent.crc)
        fail(file, s"entry '${ent.name}' CRC ${check.getValue} != directory ${ent.crc}")
      Row(ent.name, content)
    }
  }

  /** Read every `*.zip` under `path` as one entry per row. One task per
    * archive; entries are fetched by directory-driven seeks. */
  def readZip(spark: SparkSession, path: String): DataFrame = {
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val pat = new org.apache.hadoop.fs.Path(s"$path/*.zip")
    val fs0 = pat.getFileSystem(hconf.value)
    val files = Option(fs0.globStatus(pat)).getOrElse(Array.empty)
      .map(st => (st.getPath.toString, st.getLen)).toSeq
    val rows = spark.sparkContext
      .parallelize(files, math.max(1, files.length))
      .flatMap { case (f, len) =>
        val p = new org.apache.hadoop.fs.Path(f)
        val in = p.getFileSystem(hconf.value).open(p)
        // the iterator decodes one entry per pull, so the stream must
        // outlive this call — closed at task completion (success,
        // failure, or a partially-consumed limit/take)
        TaskClose.onTaskDone(in)
        def read(off: Long, n: Int): Array[Byte] = {
          val b = new Array[Byte](n)
          in.readFully(off, b, 0, n)
          b
        }
        decodeArchive(read, len, f)
      }
    spark.createDataFrame(rows, entrySchema)
  }
}
