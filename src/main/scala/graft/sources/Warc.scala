package graft.sources

import java.io.{BufferedInputStream, ByteArrayOutputStream, DataInputStream, EOFException, InputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** WARC (Web ARChive) source/sink, hand-rolled on the public format
  * specification (ISO 28500 / WARC 1.1) — THE container format of
  * crawl corpora, and therefore the entry point of a 100 TB text
  * training-data pipeline: the raw web arrives as WARC response
  * records whose payload is an HTTP/1.1 message wrapping the HTML.
  *
  * Layout per the spec: each record is a version line (`WARC/1.1`),
  * CRLF-terminated named headers (`WARC-Type`, `WARC-Target-URI`,
  * `WARC-Date`, `Content-Type`, `Content-Length`, ...), an empty line,
  * exactly `Content-Length` payload bytes, and a CRLF CRLF record
  * terminator. Compressed WARC follows the crawl convention of ONE
  * GZIP MEMBER PER RECORD concatenated into a `.warc.gz` — readable
  * as one stream (multi-member gzip decode is part of RFC 1952) while
  * leaving record boundaries recoverable for external indexes.
  *
  * Scale shape mirrors [[Avro]]: the WRITER emits one container per
  * input partition executor-side; the READER parallelizes per file
  * (`binaryFiles`, streamed — a record body is the only buffered
  * unit) and walks records sequentially within a task. Crawl corpora
  * ship many container files by construction (one per crawler shard),
  * so the file count is the natural split unit; for FAT containers,
  * `writeWarc(index = true)` additionally emits a CDX-style sidecar
  * record index (the convention crawls actually use, because a gzip
  * member boundary has no sync marker) and [[readWarcSplit]] fans one
  * container into byte-range tasks driven by it.
  *
  * Parsing is STRICT and loud: a malformed version line, a header
  * without a colon, a short body, or a missing record terminator
  * throws with the file and byte context rather than resynchronizing
  * silently — resync heuristics are how crawl pipelines quietly eat
  * records. (Fault isolation belongs to the quarantine wrapper
  * pattern at the FILE level, as with Avro.)
  */
object Warc {

  /** One parsed WARC record: the spec headers a curation pass routes
    * on, plus the raw payload bytes. */
  val recordSchema: StructType = StructType(Seq(
    StructField("warc_type", StringType, nullable = false),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("record_id", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("payload", BinaryType, nullable = false)))

  private val Crlf = "\r\n".getBytes("US-ASCII")

  /** Encode one WARC/1.1 record (headers in spec order, CRLF
    * discipline, Content-Length exact, CRLF CRLF terminator).
    * `extraHeaders` carries additional named WARC headers — the spec's
    * revisit machinery (`WARC-Payload-Digest`, `WARC-Refers-To-*`,
    * `WARC-Profile`) rides here; emitted in the given order, after the
    * core headers and before Content-Length. */
  def encodeRecord(warcType: String, targetUri: String, warcDate: String,
      recordId: String, contentType: String, payload: Array[Byte],
      extraHeaders: Seq[(String, String)] = Nil): Array[Byte] = {
    val out = new ByteArrayOutputStream(payload.length + 256)
    def line(s: String): Unit = {
      val b = s.getBytes("US-ASCII")
      out.write(b, 0, b.length); out.write(Crlf, 0, 2)
    }
    line("WARC/1.1")
    line(s"WARC-Type: $warcType")
    if (targetUri != null) line(s"WARC-Target-URI: $targetUri")
    if (warcDate != null) line(s"WARC-Date: $warcDate")
    if (recordId != null) line(s"WARC-Record-ID: $recordId")
    if (contentType != null) line(s"Content-Type: $contentType")
    extraHeaders.foreach { case (k, v) => line(s"$k: $v") }
    line(s"Content-Length: ${payload.length}")
    out.write(Crlf, 0, 2)
    out.write(payload, 0, payload.length)
    out.write(Crlf, 0, 2); out.write(Crlf, 0, 2)
    out.toByteArray
  }

  /** Wrap an HTTP/1.1 response message around `body` — the payload of
    * a WARC `response` record (Content-Type
    * `application/http;msgtype=response`). */
  def encodeHttpResponse(status: Int, reason: String, contentType: String,
      body: Array[Byte]): Array[Byte] = {
    val head = s"HTTP/1.1 $status $reason\r\n" +
      s"Content-Type: $contentType\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n"
    val h = head.getBytes("US-ASCII")
    val out = new ByteArrayOutputStream(h.length + body.length)
    out.write(h, 0, h.length)
    out.write(body, 0, body.length)
    out.toByteArray
  }

  /** Write `df` (rows shaped like [[recordSchema]]) as WARC containers
    * under `path` — one file per input partition, executor-side; with
    * `gzipPerRecord` each record becomes its own gzip member
    * (`.warc.gz`, the crawl convention), else a plain `.warc`.
    *
    * With `index = true` each container gets a CDX-style sidecar
    * (`crawl-NNNNN.cdx`, lines `offset length uri`) recording every
    * record's byte extent — the convention real crawls use to make a
    * fat `.warc.gz` splittable, since gzip members carry no sync
    * marker to resynchronize on. The writer knows each member's offset
    * as it writes, so the index is free; [[readWarcSplit]] turns it
    * into sub-file byte-range parallelism. */
  def writeWarc(df: DataFrame, path: String, gzipPerRecord: Boolean = true,
      index: Boolean = false): Unit = {
    val schema = df.schema
    // the six core columns, optionally followed by `extra_headers`
    // (array of "Name: value" strings — the revisit machinery)
    require(schema.fieldNames.toSeq == recordSchema.fieldNames.toSeq ||
      schema.fieldNames.toSeq ==
        recordSchema.fieldNames.toSeq :+ "extra_headers",
      s"writeWarc needs columns ${recordSchema.fieldNames.mkString(",")} " +
        s"(+ optional extra_headers), got ${schema.fieldNames.mkString(",")}")
    val ext = if (gzipPerRecord) "warc.gz" else "warc"
    if (index) {
      ShardSink.writeShardsWithSidecar(df, path,
        pid => f"crawl-$pid%05d.$ext", pid => f"crawl-$pid%05d.cdx") {
        (_, rows, os, ios) =>
          var offset = 0L
          rows.foreach { r =>
            val m = encodeMember(r, gzipPerRecord)
            os.write(m, 0, m.length)
            // uri LAST: URIs carry no spaces (spec), so the line splits
            // unambiguously on the first two
            val uri = Option(r.getString(1)).getOrElse("-")
            val line = s"$offset ${m.length} $uri\n".getBytes("US-ASCII")
            ios.write(line, 0, line.length)
            offset += m.length
          }
      }
    } else {
      ShardSink.writeShards(df, path, pid => f"crawl-$pid%05d.$ext") { (_, rows, os) =>
        rows.foreach { r =>
          val m = encodeMember(r, gzipPerRecord)
          os.write(m, 0, m.length)
        }
      }
    }
  }

  /** One container member for row `r`: the encoded record, gzipped as
    * its own member when `gzipPerRecord` (object-level, NOT a local
    * def — a local def would make the writer closures capture the
    * non-serializable enclosing object). */
  private def encodeMember(r: Row, gzipPerRecord: Boolean): Array[Byte] = {
    val extras: Seq[(String, String)] =
      if (r.length > 6 && !r.isNullAt(6))
        r.getSeq[String](6).map { h =>
          val i = h.indexOf(':')
          require(i > 0, s"extra_headers entry without colon: '$h'")
          (h.substring(0, i).trim, h.substring(i + 1).trim)
        }
      else Nil
    val rec = encodeRecord(r.getString(0), r.getString(1), r.getString(2),
      r.getString(3), r.getString(4), r.getAs[Array[Byte]](5), extras)
    if (gzipPerRecord) {
      val buf = new ByteArrayOutputStream(rec.length / 2 + 64)
      val gz = new GZIPOutputStream(buf)
      gz.write(rec, 0, rec.length); gz.finish(); gz.close()
      buf.toByteArray
    } else rec
  }

  private def fail(file: String, msg: String): Nothing =
    throw new IllegalArgumentException(s"invalid WARC in $file: $msg")

  /** Headers are metadata: a "header line" of a megabyte is a corrupt
    * or adversarial stream, and buffering it unboundedly would turn a
    * bad byte into executor memory pressure. */
  private val MaxHeaderLine = 1 << 20

  /** Read one CRLF-terminated ASCII line; None at clean EOF on the
    * first byte (record-boundary EOF). A lone CR or LF is a spec
    * violation and fails loudly, as does an unbounded line. */
  private def readLine(in: InputStream, file: String): Option[String] = {
    val buf = new ByteArrayOutputStream(64)
    var b = in.read()
    if (b < 0) return None
    while (b != '\r') {
      if (b < 0) fail(file, "EOF inside header line")
      if (b == '\n') fail(file, "bare LF in header (spec requires CRLF)")
      if (buf.size() >= MaxHeaderLine)
        fail(file, s"header line exceeds $MaxHeaderLine bytes")
      buf.write(b)
      b = in.read()
    }
    if (in.read() != '\n') fail(file, "CR not followed by LF")
    Some(buf.toString("US-ASCII"))
  }

  private def readFully(in: InputStream, n: Int, file: String): Array[Byte] = {
    val b = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val k = in.read(b, off, n - off)
      if (k < 0) fail(file, s"EOF inside ${n}-byte payload at $off")
      off += k
    }
    b
  }

  /** Stream the records of one (possibly multi-member-gzip) container. */
  private[graft] def decodeStream(in0: InputStream, file: String,
      gzipped: Boolean, captureExtra: Boolean = false): Iterator[Row] = {
    val in: InputStream = {
      val buffered = new BufferedInputStream(in0, 1 << 16)
      if (gzipped) {
        // a ZERO-byte .warc.gz is the writer's own empty-partition
        // output and must read as zero records — but the
        // GZIPInputStream CONSTRUCTOR throws EOF on an empty stream,
        // so peek one byte first
        buffered.mark(1)
        if (buffered.read() < 0) { buffered.close(); return Iterator.empty }
        buffered.reset()
        // GZIPInputStream handles concatenated members per RFC 1952 —
        // exactly the one-member-per-record crawl convention
        new BufferedInputStream(new GZIPInputStream(buffered, 1 << 16), 1 << 16)
      } else buffered
    }
    new Iterator[Row] {
      private var nextRow: Row = null
      private var done = false

      private def advance(): Unit = {
        if (done || nextRow != null) return
        readLine(in, file) match {
          case None => done = true; in.close()
          case Some(version) =>
            if (!version.startsWith("WARC/"))
              fail(file, s"bad version line '${version.take(40)}'")
            var warcType: String = null
            var uri: String = null
            var date: String = null
            var id: String = null
            var ctype: String = null
            var extra: scala.collection.mutable.ArrayBuffer[(String, String)] =
              if (captureExtra) scala.collection.mutable.ArrayBuffer.empty
              else null
            var len = -1L
            var header = readLine(in, file).getOrElse(fail(file, "EOF in headers"))
            while (header.nonEmpty) {
              val i = header.indexOf(':')
              if (i < 0) fail(file, s"header without colon: '${header.take(40)}'")
              // Locale.ROOT: under a Turkish default locale a bare
              // toLowerCase maps 'I' to dotless ı, silently nulling
              // WARC-Target-URI / WARC-Record-ID on such JVMs
              val k = header.substring(0, i).trim.toLowerCase(java.util.Locale.ROOT)
              val v = header.substring(i + 1).trim
              k match {
                case "warc-type" => warcType = v
                case "warc-target-uri" => uri = v
                case "warc-date" => date = v
                case "warc-record-id" => id = v
                case "content-type" => ctype = v
                case "content-length" =>
                  len = try v.toLong
                  catch { case _: NumberFormatException =>
                    fail(file, s"bad Content-Length '$v'") }
                case _ =>
                  // unknown headers are legal; captured (lowercased
                  // key) for the extended reader, skipped otherwise
                  if (captureExtra) extra += ((k, v))
              }
              header = readLine(in, file).getOrElse(fail(file, "EOF in headers"))
            }
            if (warcType == null) fail(file, "record without WARC-Type")
            if (len < 0) fail(file, "record without Content-Length")
            if (len > Int.MaxValue) fail(file, s"payload too large: $len")
            val payload = readFully(in, len.toInt, file)
            // the spec's record terminator: exactly CRLF CRLF
            val term = readFully(in, 4, file)
            if (!(term(0) == '\r' && term(1) == '\n' && term(2) == '\r' && term(3) == '\n'))
              fail(file, "missing CRLFCRLF record terminator")
            nextRow =
              if (captureExtra)
                Row(warcType, uri, date, id, ctype, payload, extra.toMap)
              else Row(warcType, uri, date, id, ctype, payload)
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

  /** [[recordSchema]] plus `warc_headers`: every non-core WARC header
    * (lowercased names) — the revisit machinery (WARC-Payload-Digest,
    * WARC-Refers-To-Target-URI, WARC-Profile) rides here. */
  val recordSchemaExt: StructType = StructType(recordSchema.fields :+
    StructField("warc_headers", MapType(StringType, StringType),
      nullable = true))

  /** Extended read: one row per record with captured non-core headers
    * ([[recordSchemaExt]]). Same one-streamed-task-per-container shape
    * as [[readWarc]]. */
  def readWarcExt(spark: SparkSession, path: String): DataFrame = {
    val rows = spark.sparkContext
      .binaryFiles(s"$path/*.warc*")
      .flatMap { case (file, pds) =>
        val in = pds.open()
        TaskClose.onTaskDone(in)
        decodeStream(in, file, gzipped = file.endsWith(".gz"),
          captureExtra = true)
      }
    spark.createDataFrame(rows, recordSchemaExt)
  }

  /** Read every `*.warc` / `*.warc.gz` under `path` as one record per
    * row. One streamed task per container file. */
  def readWarc(spark: SparkSession, path: String): DataFrame = {
    val rows = spark.sparkContext
      .binaryFiles(s"$path/*.warc*")
      .flatMap { case (file, pds) =>
        val in = pds.open()
        TaskClose.onTaskDone(in)
        decodeStream(in, file, gzipped = file.endsWith(".gz"))
      }
    spark.createDataFrame(rows, recordSchema)
  }

  /** Parse one CDX-style sidecar: `offset length uri` per line, one
    * line per record member, STRICTLY validated — offsets must start
    * at 0, be contiguous (offset(i+1) = offset(i) + length(i)), and
    * end inside the container. Contiguity is load-bearing for
    * [[readWarcSplit]]: a gap would put unindexed bytes inside a
    * decoded span, and an overlap would decode a member twice. */
  private[graft] def readCdx(in: InputStream, fileLen: Long,
      file: String): IndexedSeq[(Long, Long, String)] = {
    val out = scala.collection.immutable.IndexedSeq.newBuilder[(Long, Long, String)]
    val br = new java.io.BufferedReader(
      new java.io.InputStreamReader(in, "US-ASCII"), 1 << 16)
    try {
      var expect = 0L
      var line = br.readLine()
      var n = 0
      while (line != null) {
        val a = line.indexOf(' ')
        val b = if (a < 0) -1 else line.indexOf(' ', a + 1)
        if (b < 0) fail(file, s"bad cdx line $n: '${line.take(60)}'")
        val (off, len) =
          try (line.substring(0, a).toLong, line.substring(a + 1, b).toLong)
          catch { case _: NumberFormatException =>
            fail(file, s"non-numeric cdx extent at line $n: '${line.take(60)}'") }
        if (off != expect)
          fail(file, s"cdx line $n: offset $off, expected $expect (index must be contiguous)")
        if (len <= 0 || off + len > fileLen)
          fail(file, s"cdx line $n: extent [$off,+$len) overruns $fileLen-byte container")
        out += ((off, len, line.substring(b + 1)))
        expect = off + len
        n += 1
        line = br.readLine()
      }
      if (expect != fileLen)
        fail(file, s"cdx covers $expect of $fileLen container bytes")
    } finally br.close()
    out.result()
  }

  /** An InputStream view of `[0, limit)` bytes of `in` — the bounded
    * span a byte-range task decodes. */
  private class LimitedInputStream(in: InputStream, var limit: Long)
      extends InputStream {
    override def read(): Int =
      if (limit <= 0) -1
      else { val b = in.read(); if (b >= 0) limit -= 1; b }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (limit <= 0) return -1
      val k = in.read(b, off, math.min(len.toLong, limit).toInt)
      if (k > 0) limit -= k
      k
    }
    override def close(): Unit = in.close()
  }

  /** Index-driven SUB-FILE splits over `.warc`/`.warc.gz` containers
    * written with `index = true`: each container fans out into
    * byte-range tasks of ~`splitBytes`, a task owns exactly the
    * members whose START offset falls in its range (the
    * [[Avro.readAvroSplit]] ownership rule — every member lands in
    * exactly one task under ANY range partition), seeks once to its
    * first owned member and streams the contiguous owned span. This is
    * the 100 TB posture for fat third-party containers: one 40 GB
    * `.warc.gz` fans out instead of straggling as a single task. A
    * missing or malformed index fails loudly — [[readWarc]] is the
    * per-file fallback, and guessing record boundaries inside
    * sync-markerless gzip is exactly the resynchronization heuristic
    * this reader refuses to have. */
  def readWarcSplit(spark: SparkSession, path: String, splitBytes: Long): DataFrame = {
    require(splitBytes > 0, s"splitBytes must be positive, got $splitBytes")
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val pat = new org.apache.hadoop.fs.Path(s"$path/*.warc*")
    val fs0 = pat.getFileSystem(hconf.value)
    val files = Option(fs0.globStatus(pat)).getOrElse(Array.empty)
      .map(st => (st.getPath.toString, st.getLen)).toSeq
    val tasks = files.flatMap { case (f, len) =>
      val n = math.max(1L, (len + splitBytes - 1) / splitBytes)
      (0L until n).map(i =>
        (f, len, i * splitBytes, math.min((i + 1) * splitBytes, len)))
    }
    val rows = spark.sparkContext
      .parallelize(tasks, math.max(1, tasks.length))
      .flatMap { case (f, fileLen, lo, hi) =>
        val dataPath = new org.apache.hadoop.fs.Path(f)
        val fs = dataPath.getFileSystem(hconf.value)
        val idxPath = new org.apache.hadoop.fs.Path(
          f.replaceAll("\\.warc(\\.gz)?$", ".cdx"))
        if (!fs.exists(idxPath))
          fail(f, "no .cdx record index — write with index=true, or readWarc per-file")
        val members = readCdx(fs.open(idxPath), fileLen, f)
        val owned = members.filter(m => m._1 >= lo && m._1 < hi)
        if (owned.isEmpty) Iterator.empty
        else {
          val start = owned.head._1
          val end = owned.last._1 + owned.last._2
          val in = fs.open(dataPath)
          in.seek(start)
          val span = new LimitedInputStream(in, end - start)
          TaskClose.onTaskDone(span)
          decodeStream(span, f, gzipped = f.endsWith(".gz"))
        }
      }
    spark.createDataFrame(rows, recordSchema)
  }

  /** [[readWarc]] with the per-FILE quarantine contract of
    * [[Avro.readAvroWithQuarantine]]: returns (data, quarantine) where
    * `quarantine` holds one (file, error) row per container that fails
    * the strict walk — bad version line, CRLF violations, short
    * payload, missing terminator, truncated/corrupt gzip member — and
    * `data` holds every record of every clean file. Crawl corpora
    * ALWAYS contain some corrupt containers; one must cost one
    * quarantine row, never the ingest job, and partial salvage would
    * make results depend on where the break sat. The validation pass
    * is the full record walk (records are framing + payload bytes —
    * there is no per-value decode to skip, so unlike Avro there is no
    * cheaper verdict-equivalent walk). */
  def readWarcWithQuarantine(spark: SparkSession, path: String):
      (DataFrame, DataFrame) = {
    // ONE listing snapshot drives both the validation pass and the
    // data read: with two independent globs, a container appearing
    // between them would be neither decoded nor quarantined (silently
    // dropped) — snapshotting makes the verdict set and the read set
    // the same set by construction.
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val pat = new org.apache.hadoop.fs.Path(s"$path/*.warc*")
    val fs0 = pat.getFileSystem(hconf.value)
    val files = Option(fs0.globStatus(pat)).getOrElse(Array.empty)
      .map(_.getPath.toString).toSeq
    def open(f: String): InputStream = {
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(hconf.value).open(p)
    }
    val verdicts = spark.sparkContext
      .parallelize(files, math.max(1, files.length))
      .map { file =>
        val in = open(file)
        try {
          val it = decodeStream(in, file, gzipped = file.endsWith(".gz"))
          while (it.hasNext) it.next()
          (file, null: String)
        } catch {
          case scala.util.control.NonFatal(e) =>
            (file, Option(e.getMessage).getOrElse(e.getClass.getName).take(500))
        } finally {
          try in.close() catch { case scala.util.control.NonFatal(_) => }
        }
      }.collect() // one row per FILE — metadata-scale
    val cleanFiles = verdicts.collect { case (f, err) if err == null => f }.toSeq
    import spark.implicits._
    val quarantine = verdicts.filter(_._2 != null).toSeq.toDF("file", "error")
    val rows = spark.sparkContext
      .parallelize(cleanFiles, math.max(1, cleanFiles.length))
      .flatMap { file =>
        val in = open(file)
        TaskClose.onTaskDone(in)
        decodeStream(in, file, gzipped = file.endsWith(".gz"))
      }
    (spark.createDataFrame(rows, recordSchema), quarantine)
  }

  /** Wrap an HTTP/1.1 response with `Transfer-Encoding: chunked`
    * framing around `body` — the other message form real crawl WARCs
    * are full of (servers stream dynamic pages without knowing their
    * length up front). The body is split into `chunkSize`-byte chunks,
    * each framed as hex-size line + data + CRLF, terminated by the
    * zero chunk and the final empty line (RFC 9112 §7.1). */
  def encodeHttpResponseChunked(status: Int, reason: String, contentType: String,
      body: Array[Byte], chunkSize: Int = 64): Array[Byte] = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    val out = new ByteArrayOutputStream(body.length + 256)
    def ascii(s: String): Unit = {
      val b = s.getBytes("US-ASCII"); out.write(b, 0, b.length)
    }
    ascii(s"HTTP/1.1 $status $reason\r\n" +
      s"Content-Type: $contentType\r\n" +
      "Transfer-Encoding: chunked\r\n\r\n")
    var off = 0
    while (off < body.length) {
      val n = math.min(chunkSize, body.length - off)
      ascii(java.lang.Integer.toHexString(n) + "\r\n")
      out.write(body, off, n)
      ascii("\r\n")
      off += n
    }
    ascii("0\r\n\r\n")
    out.toByteArray
  }

  /** Wrap an HTTP/1.1 response whose body travels gzip-compressed
    * (`Content-Encoding: gzip` — how most real servers actually send
    * text), framed either by Content-Length over the COMPRESSED bytes
    * (`chunkSize = 0`) or by chunked transfer coding (`chunkSize > 0`,
    * both layers stacked exactly as RFC 9110/9112 order them:
    * Content-Encoding is the representation, Transfer-Encoding the
    * framing on top). */
  def encodeHttpResponseGzip(status: Int, reason: String, contentType: String,
      body: Array[Byte], chunkSize: Int = 0): Array[Byte] = {
    val zipped = {
      val buf = new ByteArrayOutputStream(body.length / 2 + 64)
      val gz = new GZIPOutputStream(buf)
      gz.write(body, 0, body.length); gz.finish(); gz.close()
      buf.toByteArray
    }
    val out = new ByteArrayOutputStream(zipped.length + 256)
    def ascii(s: String): Unit = {
      val b = s.getBytes("US-ASCII"); out.write(b, 0, b.length)
    }
    if (chunkSize <= 0) {
      ascii(s"HTTP/1.1 $status $reason\r\n" +
        s"Content-Type: $contentType\r\n" +
        "Content-Encoding: gzip\r\n" +
        s"Content-Length: ${zipped.length}\r\n\r\n")
      out.write(zipped, 0, zipped.length)
    } else {
      ascii(s"HTTP/1.1 $status $reason\r\n" +
        s"Content-Type: $contentType\r\n" +
        "Content-Encoding: gzip\r\n" +
        "Transfer-Encoding: chunked\r\n\r\n")
      var off = 0
      while (off < zipped.length) {
        val n = math.min(chunkSize, zipped.length - off)
        ascii(java.lang.Integer.toHexString(n) + "\r\n")
        out.write(zipped, off, n)
        ascii("\r\n")
        off += n
      }
      ascii("0\r\n\r\n")
    }
    out.toByteArray
  }

  /** Decompress a `Content-Encoding: gzip` body. Strict: a truncated
    * or corrupt stream fails with context — silently passing
    * compressed bytes through as "text" poisons every downstream
    * length and feature (the same failure class as unframed chunks). */
  private def gunzipBody(raw: Array[Byte], file: String): Array[Byte] = {
    val out = new ByteArrayOutputStream(raw.length * 3 + 64)
    try {
      val in = new GZIPInputStream(new java.io.ByteArrayInputStream(raw), 1 << 16)
      try {
        val buf = new Array[Byte](8192)
        var k = in.read(buf)
        while (k >= 0) { out.write(buf, 0, k); k = in.read(buf) }
      } finally in.close()
    } catch {
      case e: java.io.IOException =>
        fail(file, s"corrupt gzip Content-Encoding body: ${e.getMessage}")
    }
    out.toByteArray
  }

  /** Reassemble a `Transfer-Encoding: chunked` message body: hex-size
    * line (chunk extensions after ';' are legal and ignored), that many
    * data bytes, CRLF, repeated until the zero chunk, then optional
    * trailer fields and the final empty line. STRICT and loud — a
    * non-hex size line, a truncated chunk, a missing CRLF, a missing
    * terminator, or bytes after the terminator all fail with context:
    * mis-framed chunk decode is how body lengths and every downstream
    * text feature silently go wrong on real crawl data. */
  private def dechunk(raw: Array[Byte], file: String): Array[Byte] = {
    val out = new ByteArrayOutputStream(raw.length)
    var p = 0
    def line(what: String): String = {
      val start = p
      while (p + 1 < raw.length && !(raw(p) == '\r' && raw(p + 1) == '\n')) p += 1
      if (p + 1 >= raw.length) fail(file, s"chunked body: EOF before CRLF in $what")
      val s = new String(raw, start, p - start, "US-ASCII")
      p += 2
      s
    }
    var more = true
    while (more) {
      val sizeLine = line("chunk-size line")
      val semi = sizeLine.indexOf(';')
      val hex = (if (semi >= 0) sizeLine.substring(0, semi) else sizeLine).trim
      if (hex.isEmpty || hex.length > 8 ||
          !hex.forall(c => Character.digit(c, 16) >= 0))
        fail(file, s"chunked body: bad chunk-size line '${sizeLine.take(40)}'")
      val n = java.lang.Integer.parseInt(hex, 16)
      if (n == 0) {
        // optional trailer fields, then the final empty line
        var t = line("trailer")
        while (t.nonEmpty) t = line("trailer")
        if (p != raw.length)
          fail(file, s"chunked body: ${raw.length - p} bytes after the final chunk")
        more = false
      } else {
        if (p + n + 2 > raw.length)
          fail(file, s"chunked body: truncated $n-byte chunk at $p/${raw.length}")
        out.write(raw, p, n)
        p += n
        if (!(raw(p) == '\r' && raw(p + 1) == '\n'))
          fail(file, "chunked body: chunk data not CRLF-terminated")
        p += 2
      }
    }
    out.toByteArray
  }

  /** Encode a 3xx HTTP response with a `Location` header and an empty
    * body — the redirect shape real crawls are full of (a large
    * fraction of fetches land on 301/302 before content). */
  def encodeHttpRedirect(status: Int, reason: String,
      location: String): Array[Byte] =
    (s"HTTP/1.1 $status $reason\r\n" +
      s"Location: $location\r\n" +
      "Content-Length: 0\r\n\r\n").getBytes("US-ASCII")

  /** Status code + one named header (case-insensitive; null when
    * absent) WITHOUT touching body bytes — the redirect-resolution
    * path needs only (status, Location), and 3xx bodies are
    * empty/irrelevant, so decoding them (dechunk/gunzip) would be
    * wasted work per record at crawl scale. Same strictness on the
    * status line and header-block framing as [[parseHttpResponse]]. */
  def httpStatusHeader(payload: Array[Byte], header: String,
      file: String = "<payload>"): (Int, String) = {
    var i = 0
    var split = -1
    while (split < 0 && i + 3 < payload.length) {
      if (payload(i) == '\r' && payload(i + 1) == '\n' &&
          payload(i + 2) == '\r' && payload(i + 3) == '\n') split = i
      i += 1
    }
    if (split < 0) fail(file, "HTTP payload without header terminator")
    val head = new String(payload, 0, split, "US-ASCII")
    val lines = head.split("\r\n")
    val status = lines(0).split(" ")
    if (status.length < 2 || !status(0).startsWith("HTTP/"))
      fail(file, s"bad HTTP status line '${lines(0).take(40)}'")
    val code = try status(1).toInt
    catch { case _: NumberFormatException =>
      fail(file, s"bad HTTP status code '${status(1)}'") }
    val want = header.toLowerCase(java.util.Locale.ROOT) + ":"
    val value = lines.drop(1).collectFirst {
      case l if l.toLowerCase(java.util.Locale.ROOT).startsWith(want) =>
        l.substring(l.indexOf(':') + 1).trim
    }
    (code, value.orNull)
  }

  /** Split a `response` record's HTTP/1.1 payload into (status code,
    * content-type, body bytes), reassembling `Transfer-Encoding:
    * chunked` bodies ([[dechunk]]) so the returned bytes are always the
    * message content, never framing. Strict: a payload without a valid
    * status line or header block fails loudly, as does a
    * Transfer-Encoding this engine can't decode (silently returning
    * still-encoded bytes would poison every downstream length and
    * feature). */
  def parseHttpResponse(payload: Array[Byte], file: String = "<payload>"):
      (Int, String, Array[Byte]) = {
    // find the header/body split (CRLFCRLF)
    var i = 0
    var split = -1
    while (split < 0 && i + 3 < payload.length) {
      if (payload(i) == '\r' && payload(i + 1) == '\n' &&
          payload(i + 2) == '\r' && payload(i + 3) == '\n') split = i
      i += 1
    }
    if (split < 0) fail(file, "HTTP payload without header terminator")
    val head = new String(payload, 0, split, "US-ASCII")
    val lines = head.split("\r\n")
    val status = lines(0).split(" ")
    if (status.length < 2 || !status(0).startsWith("HTTP/"))
      fail(file, s"bad HTTP status line '${lines(0).take(40)}'")
    val code = try status(1).toInt
    catch { case _: NumberFormatException =>
      fail(file, s"bad HTTP status code '${status(1)}'") }
    val ctype = lines.drop(1).collectFirst {
      case l if l.toLowerCase(java.util.Locale.ROOT).startsWith("content-type:") =>
        l.substring(l.indexOf(':') + 1).trim
    }.orNull
    val te = lines.drop(1).collectFirst {
      case l if l.toLowerCase(java.util.Locale.ROOT).startsWith("transfer-encoding:") =>
        l.substring(l.indexOf(':') + 1).trim.toLowerCase(java.util.Locale.ROOT)
    }
    val ce = lines.drop(1).collectFirst {
      case l if l.toLowerCase(java.util.Locale.ROOT).startsWith("content-encoding:") =>
        l.substring(l.indexOf(':') + 1).trim.toLowerCase(java.util.Locale.ROOT)
    }
    val raw = java.util.Arrays.copyOfRange(payload, split + 4, payload.length)
    // framing first (Transfer-Encoding), then representation
    // (Content-Encoding) — the RFC 9110/9112 layering
    val framed = te match {
      case None => raw
      case Some("chunked") => dechunk(raw, file)
      case Some(other) => fail(file, s"unsupported Transfer-Encoding '$other'")
    }
    val body = ce match {
      case None | Some("identity") => framed
      case Some("gzip") | Some("x-gzip") => gunzipBody(framed, file)
      case Some(other) => fail(file, s"unsupported Content-Encoding '$other' " +
        "(compressed bytes must never pass through as text)")
    }
    (code, ctype, body)
  }
}
