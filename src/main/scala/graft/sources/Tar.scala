package graft.sources

import java.io.{BufferedInputStream, ByteArrayOutputStream, InputStream}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TAR (ustar, POSIX.1-1988; pax extended headers, POSIX.1-2001)
  * source/sink plus the WebDataset shard
  * convention on top — the standard way large multimodal training
  * corpora ship: a dataset is a set of `.tar` shards whose entries are
  * named `<sample-key>.<ext>` (e.g. `0001.jpg`, `0001.txt`,
  * `0001.cls`), and one SAMPLE is the group of consecutive entries
  * sharing a key. Training loaders stream shards sequentially; an
  * analytics engine gets the same sequential-friendly layout with one
  * task per shard.
  *
  * Format per the public ustar spec: 512-byte header blocks (name 100,
  * mode 8, uid 8, gid 8, size 12 OCTAL, mtime 12, checksum 8 — the
  * unsigned byte sum of the header with the checksum field as spaces —
  * typeflag 1, linkname 100, magic `ustar` + NUL + version `00`),
  * content rounded up to 512-byte blocks, and an end-of-archive marker
  * of two zero blocks. The reader is STRICT (bad magic, bad checksum,
  * non-octal size, or a truncated entry fails loudly with context) and
  * streamed — one entry's bytes are the only buffered unit.
  *
  * Scale shape: shards are written one per input partition
  * executor-side (a WebDataset is MANY shards by construction — the
  * loader-parallelism convention), read one streamed task per shard.
  * Sub-file splits are meaningless for tar (no sync marker, and the
  * grouping is consecutive-by-key), which is exactly why the ecosystem
  * standardized on many medium shards instead.
  */
object Tar {

  val entrySchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("content", BinaryType, nullable = false)))

  private val BlockSize = 512

  /** Encode one ustar entry (header block + content padded to 512). */
  def encodeEntry(name: String, content: Array[Byte]): Array[Byte] =
    encodeEntryTyped(name, content, '0')

  private def encodeEntryTyped(name: String, content: Array[Byte],
      typeflag: Char): Array[Byte] = {
    val nameB = name.getBytes("US-ASCII")
    require(nameB.length <= 100, s"ustar name too long (${nameB.length} > 100): $name")
    val hdr = new Array[Byte](BlockSize)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes("US-ASCII")
      System.arraycopy(b, 0, hdr, off, b.length)
    }
    put(0, name)
    put(100, "0000644".padTo(7, ' ')) // mode, NUL-terminated octal
    hdr(107) = 0
    put(108, "0000000"); hdr(115) = 0 // uid
    put(116, "0000000"); hdr(123) = 0 // gid
    put(124, f"${content.length}%011o"); hdr(135) = 0 // size, octal
    put(136, "00000000000"); hdr(147) = 0 // mtime (deterministic epoch)
    // checksum field is spaces while summing
    java.util.Arrays.fill(hdr, 148, 156, ' '.toByte)
    hdr(156) = typeflag.toByte
    put(257, "ustar"); hdr(262) = 0 // magic + NUL
    put(263, "00") // version
    var sum = 0
    var i = 0
    while (i < BlockSize) { sum += hdr(i) & 0xff; i += 1 }
    put(148, f"$sum%06o"); hdr(154) = 0; hdr(155) = ' '
    val padded = (content.length + BlockSize - 1) / BlockSize * BlockSize
    val out = new ByteArrayOutputStream(BlockSize + padded)
    out.write(hdr, 0, BlockSize)
    out.write(content, 0, content.length)
    var pad = padded - content.length
    while (pad > 0) { out.write(0); pad -= 1 }
    out.toByteArray
  }

  /** One pax extended-header record, `"%d %s=%s\n"` where the leading
    * decimal is the length of the WHOLE record including itself (POSIX
    * pax interchange format): find the fixed point of
    * len = digits(len) + |" key=value\n"|. */
  private[graft] def paxRecord(key: String, value: String): Array[Byte] = {
    val base = 1 + key.getBytes("UTF-8").length + 1 +
      value.getBytes("UTF-8").length + 1 // " key=value\n"
    var len = base + 1
    while (len.toString.length + base != len) len = len.toString.length + base
    s"$len $key=$value\n".getBytes("UTF-8")
  }

  /** Encode one entry in pax form when the name needs it: names that
    * fit ustar's 100-byte field encode as plain [[encodeEntry]]; longer
    * names emit a typeflag-`x` extended-header entry carrying a
    * `path=` record (the POSIX.1-2001 mechanism — and python tarfile's
    * DEFAULT output format), followed by the data entry under a
    * truncated best-effort header name the override replaces. */
  def encodePaxEntry(name: String, content: Array[Byte]): Array[Byte] = {
    if (name.getBytes("US-ASCII").length <= 100) encodeEntry(name, content)
    else {
      val pax = paxRecord("path", name)
      val hdrName = ("PaxHeaders.0/" + name).take(100)
      val out = new ByteArrayOutputStream(pax.length + content.length + 4 * BlockSize)
      val x = encodeEntryTyped(hdrName, pax, 'x')
      out.write(x, 0, x.length)
      val dataEntry = encodeEntryTyped(name.take(100), content, '0')
      out.write(dataEntry, 0, dataEntry.length)
      out.toByteArray
    }
  }

  /** Write `df` (rows shaped like [[entrySchema]], in partition order)
    * as one `.tar` shard per input partition, executor-side. `pax`
    * selects [[encodePaxEntry]] (names over 100 bytes get an extended
    * header; short names stay plain ustar); false is strict ustar and
    * rejects long names loudly. */
  def writeTar(df: DataFrame, path: String, pax: Boolean = false): Unit = {
    require(df.schema.fieldNames.toSeq == entrySchema.fieldNames.toSeq,
      s"writeTar needs columns ${entrySchema.fieldNames.mkString(",")}")
    ShardSink.writeShards(df, path, pid => f"shard-$pid%05d.tar") { (_, rows, os) =>
      rows.foreach { r =>
        val e =
          if (pax) encodePaxEntry(r.getString(0), r.getAs[Array[Byte]](1))
          else encodeEntry(r.getString(0), r.getAs[Array[Byte]](1))
        os.write(e, 0, e.length)
      }
      val zeros = new Array[Byte](BlockSize * 2) // end-of-archive marker
      os.write(zeros, 0, zeros.length)
    }
  }

  private def fail(file: String, msg: String): Nothing =
    throw new IllegalArgumentException(s"invalid tar in $file: $msg")

  private def readBlock(in: InputStream, file: String): Array[Byte] = {
    val b = new Array[Byte](BlockSize)
    var off = 0
    while (off < BlockSize) {
      val k = in.read(b, off, BlockSize - off)
      if (k < 0) fail(file, s"EOF inside a 512-byte block at $off")
      off += k
    }
    b
  }

  private def octal(hdr: Array[Byte], off: Int, len: Int, file: String,
      what: String): Long = {
    var v = 0L
    var i = off
    val end = off + len
    // skip leading spaces, stop at NUL/space terminator
    while (i < end && hdr(i) == ' ') i += 1
    var any = false
    while (i < end && hdr(i) != 0 && hdr(i) != ' ') {
      val c = hdr(i)
      if (c < '0' || c > '7') fail(file, s"non-octal $what digit '${c.toChar}'")
      v = v * 8 + (c - '0')
      i += 1
      any = true
    }
    if (!any) fail(file, s"empty $what field")
    v
  }

  /** Parse a pax extended-header entry's records (`"%d %s=%s\n"`, the
    * leading decimal covering the whole record). Strict: a bad length,
    * a missing `=`, or a missing trailing newline fails loudly. */
  private[graft] def parsePax(content: Array[Byte], file: String): Map[String, String] = {
    val out = scala.collection.mutable.LinkedHashMap[String, String]()
    var p = 0
    while (p < content.length) {
      var q = p
      while (q < content.length && content(q) != ' ') {
        val c = content(q)
        if (c < '0' || c > '9') fail(file, "pax record without decimal length prefix")
        q += 1
      }
      if (q == p || q >= content.length)
        fail(file, "pax record without decimal length prefix")
      val len = new String(content, p, q - p, "US-ASCII").toInt
      if (len <= q - p + 1 || p + len > content.length)
        fail(file, s"pax record length $len overruns entry (${content.length} bytes)")
      if (content(p + len - 1) != '\n')
        fail(file, "pax record not newline-terminated")
      val body = new String(content, q + 1, p + len - 1 - (q + 1), "UTF-8")
      val eq = body.indexOf('=')
      if (eq < 0) fail(file, s"pax record without '=': '${body.take(40)}'")
      out(body.substring(0, eq)) = body.substring(eq + 1)
      p += len
    }
    out.toMap
  }

  /** Stream the entries of one tar archive. Typeflag discipline
    * (offset 156): regular files (`0`/NUL) emit; pax per-file
    * extended headers (`x` — python tarfile's DEFAULT format emits
    * them) are parsed and a `path=` record overrides the NEXT entry's
    * name (the long-name mechanism); pax global headers (`g`) are
    * framing-validated and skipped. Anything else fails loudly — a
    * metadata entry surfacing as a data row would silently pollute
    * WebDataset samples, and a GNU `L` longname or a directory entry
    * must be visible, not mis-read. */
  private[graft] def decodeStream(in0: InputStream, file: String): Iterator[Row] = {
    val in = new BufferedInputStream(in0, 1 << 16)
    new Iterator[Row] {
      private var nextRow: Row = null
      private var done = false
      private var pendingPath: String = null

      private def advance(): Unit = {
        while (!done && nextRow == null) {
          val hdr = readBlock(in, file)
          if (hdr.forall(_ == 0)) {
            // end-of-archive: first zero block; consume the second and stop
            val second = readBlock(in, file)
            if (!second.forall(_ == 0)) fail(file, "lone zero block (spec wants two)")
            if (pendingPath != null)
              fail(file, "pax path override with no following entry")
            done = true
            in.close()
            return
          }
          val magic = new String(hdr, 257, 5, "US-ASCII")
          if (magic != "ustar") fail(file, s"bad magic '$magic'")
          // verify checksum: unsigned byte sum with the checksum field as spaces
          val stored = octal(hdr, 148, 8, file, "checksum")
          var sum = 0L
          var i = 0
          while (i < BlockSize) {
            sum += (if (i >= 148 && i < 156) ' '.toInt else hdr(i) & 0xff)
            i += 1
          }
          if (sum != stored) fail(file, s"checksum $sum != stored $stored")
          var nameEnd = 0
          while (nameEnd < 100 && hdr(nameEnd) != 0) nameEnd += 1
          val name = new String(hdr, 0, nameEnd, "US-ASCII")
          val size = octal(hdr, 124, 12, file, "size")
          if (size > Int.MaxValue) fail(file, s"entry too large: $size")
          val content = new Array[Byte](size.toInt)
          var off = 0
          while (off < size) {
            val k = in.read(content, off, size.toInt - off)
            if (k < 0) fail(file, s"EOF inside entry '$name' at $off/$size")
            off += k
          }
          // consume the block padding. skip() may legitimately return 0
          // on a non-EOF stream (some Hadoop stream impls), so a zero
          // skip falls back to read() and only a -1 read is EOF.
          val padded = (size + BlockSize - 1) / BlockSize * BlockSize
          var pad = (padded - size).toInt
          while (pad > 0) {
            val k = in.skip(pad)
            if (k > 0) pad -= k.toInt
            else {
              if (in.read() < 0) fail(file, s"EOF inside padding of '$name'")
              pad -= 1
            }
          }
          hdr(156) match {
            case '0' | 0 =>
              val outName = if (pendingPath != null) pendingPath else name
              pendingPath = null
              nextRow = Row(outName, content)
            case 'x' =>
              if (pendingPath != null)
                fail(file, "consecutive pax extended headers (override never consumed)")
              parsePax(content, file).get("path").foreach(pendingPath = _)
            case 'g' =>
              // global defaults: validate the framing, apply nothing —
              // a 'g' path= default applied to EVERY entry is never
              // what shard data means
              parsePax(content, file)
              ()
            case other =>
              fail(file, s"unsupported tar typeflag '${other.toChar}' on '$name' " +
                "(regular files and pax x/g headers only)")
          }
        }
      }

      override def hasNext: Boolean = { advance(); !done }
      override def next(): Row = {
        advance()
        if (done) throw new NoSuchElementException
        val r = nextRow; nextRow = null; r
      }
    }
  }

  /** Read every `*.tar` under `path` as one entry per row. One streamed
    * task per shard. */
  def readTar(spark: SparkSession, path: String): DataFrame = {
    val rows = spark.sparkContext
      .binaryFiles(s"$path/*.tar")
      .flatMap { case (file, pds) =>
        val in = pds.open()
        TaskClose.onTaskDone(in)
        decodeStream(in, file)
      }
    spark.createDataFrame(rows, entrySchema)
  }

  /** The WebDataset convention over [[readTar]]: entries named
    * `<key>.<ext>` group into one row per SAMPLE with an ext→content
    * map. Grouping is by full key (everything before the last dot), a
    * plain shuffle on the key — samples whose entries span shards
    * still group correctly (the convention keeps them consecutive in
    * one shard, but correctness must not depend on it).
    *
    * Keys must be DATASET-unique, which is what the convention's shard
    * builders produce; two shards reusing a key (per-shard-local
    * numbering) would otherwise silently FUSE unrelated samples, so a
    * duplicated (key, ext) fails loudly with the offending name — the
    * in-plan guard below, cheaper and clearer than relying on
    * map_from_entries' generic duplicate-key error. */
  def readWebDataset(spark: SparkSession, path: String): DataFrame = {
    readTar(spark, path)
      .withColumn("key", regexp_extract(col("name"), "^(.*)\\.([^.]+)$", 1))
      .withColumn("ext", regexp_extract(col("name"), "^(.*)\\.([^.]+)$", 2))
      .filter(col("key") =!= "" && col("ext") =!= "")
      .groupBy(col("key"), col("ext"))
      .agg(count(lit(1)).as("_n"), first(col("content")).as("content"))
      .select(col("key"), col("ext"),
        when(col("_n") > 1, raise_error(concat(
          lit("webdataset key collision: entry '"), col("key"), lit("."),
          col("ext"), lit("' appears "), col("_n").cast("string"),
          lit(" times across shards — keys must be dataset-unique"))))
          .otherwise(col("content")).as("content"))
      .groupBy(col("key"))
      .agg(map_from_entries(collect_list(struct(col("ext"), col("content"))))
        .as("sample"))
  }
}
