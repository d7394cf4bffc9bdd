package graft

import java.nio.file.Files

import org.apache.spark.sql.Row

import graft.sources.Warc

/** The hand-rolled WARC/1.1 codec (sources/Warc.scala): roundtrips in
  * plain and one-gzip-member-per-record form, CRLF strictness, HTTP
  * payload splitting, and loud failures on malformed records. */
class WarcSpec extends SparkSpecBase {

  private def rec(k: Int): Row = Row(
    "response",
    s"http://ex.example/p/$k",
    f"2024-01-${1 + k % 28}%02dT00:00:00Z",
    f"<urn:uuid:00000000-0000-0000-0000-$k%012d>",
    "application/http;msgtype=response",
    Warc.encodeHttpResponse(200, "OK", "text/html",
      s"<b>body-$k</b>".getBytes("UTF-8")))

  private def recsDf(n: Int, parts: Int) = spark.createDataFrame(
    spark.sparkContext.parallelize((0 until n).map(rec), parts),
    Warc.recordSchema)

  private def collectKeys(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.getString(1)).sorted.toSeq

  test("roundtrip: plain .warc preserves every record and payload byte") {
    val dir = Files.createTempDirectory("graft_warc").toString
    Warc.writeWarc(recsDf(40, 3), dir, gzipPerRecord = false)
    val back = Warc.readWarc(spark, dir)
    assert(back.count() == 40)
    assert(collectKeys(back) == (0 until 40).map(k => s"http://ex.example/p/$k").sorted)
    val one = back.filter(org.apache.spark.sql.functions.col("target_uri")
      .endsWith("/p/7")).head
    val (code, ctype, body) = Warc.parseHttpResponse(one.getAs[Array[Byte]](5))
    assert(code == 200 && ctype == "text/html")
    assert(new String(body, "UTF-8") == "<b>body-7</b>")
  }

  test("roundtrip: .warc.gz with one gzip member per record (crawl convention)") {
    val dir = Files.createTempDirectory("graft_warc").toString
    Warc.writeWarc(recsDf(25, 2), dir, gzipPerRecord = true)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".warc.gz"))
    assert(files.length == 2)
    // each file is a CONCATENATION of gzip members: more than one magic
    val bytes = Files.readAllBytes(files.head.toPath)
    val members = bytes.sliding(3).count(w =>
      (w(0) & 0xff) == 0x1f && (w(1) & 0xff) == 0x8b && w(2) == 8)
    assert(members > 1, s"expected multiple gzip members, saw $members")
    val back = Warc.readWarc(spark, dir)
    assert(back.count() == 25)
    assert(collectKeys(back) == (0 until 25).map(k => s"http://ex.example/p/$k").sorted)
  }

  test("unknown WARC headers are skipped; warcinfo records surface typed") {
    val raw = Warc.encodeRecord("warcinfo", null, "2024-01-01T00:00:00Z",
      "<urn:uuid:x>", "application/warc-fields",
      "software: test\r\n".getBytes("UTF-8"))
    // splice an unknown header before Content-Length
    val s = new String(raw, "US-ASCII")
    val patched = s.replace("Content-Length:",
      "WARC-Concurrent-To: <urn:uuid:y>\r\nContent-Length:")
    val rows = Warc.decodeStream(
      new java.io.ByteArrayInputStream(patched.getBytes("US-ASCII")),
      "t", gzipped = false).toList
    assert(rows.map(_.getString(0)) == List("warcinfo"))
    assert(rows.head.getString(1) == null) // no target URI on warcinfo
  }

  test("malformed records fail loudly: version, bare LF, length, terminator") {
    def parse(b: Array[Byte]): List[Row] =
      Warc.decodeStream(new java.io.ByteArrayInputStream(b), "t",
        gzipped = false).toList
    val good = Warc.encodeRecord("response", "http://x/", null, null,
      null, "abc".getBytes("UTF-8"))
    assert(parse(good).size == 1)
    intercept[IllegalArgumentException] {
      parse("HTTP/1.1 200 OK\r\n\r\n".getBytes("US-ASCII"))
    }
    val bareLf = new String(good, "US-ASCII").replaceFirst("\r\n", "\n")
    intercept[IllegalArgumentException] { parse(bareLf.getBytes("US-ASCII")) }
    intercept[IllegalArgumentException] { // truncated payload
      parse(java.util.Arrays.copyOf(good, good.length - 6))
    }
    val noTerm = java.util.Arrays.copyOf(good, good.length - 4)
    intercept[IllegalArgumentException] { parse(noTerm) }
    val badLen = new String(good, "US-ASCII")
      .replace("Content-Length: 3", "Content-Length: many")
    intercept[IllegalArgumentException] { parse(badLen.getBytes("US-ASCII")) }
  }

  test("empty partitions write zero-byte .warc.gz files that read as zero records") {
    val dir = Files.createTempDirectory("graft_warc").toString
    // 2 records in 5 partitions: at least three shards are zero-byte
    Warc.writeWarc(recsDf(2, 5), dir, gzipPerRecord = true)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".warc.gz"))
    assert(files.length == 5 && files.exists(_.length == 0))
    val back = Warc.readWarc(spark, dir)
    assert(back.count() == 2)
    // and the quarantine path must NOT quarantine the writer's own output
    val (data, q) = Warc.readWarcWithQuarantine(spark, dir)
    assert(q.count() == 0 && data.count() == 2)
  }

  test("quarantine: corrupt containers are isolated per file, clean records survive") {
    val dir = Files.createTempDirectory("graft_warc").toString
    Warc.writeWarc(recsDf(30, 2), dir, gzipPerRecord = true)
    Files.write(java.nio.file.Paths.get(s"$dir/bad.warc"),
      "nothing warc about this".getBytes("UTF-8"))
    val good = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("crawl-")).minBy(_.getName)
    val bytes = Files.readAllBytes(good.toPath)
    Files.write(java.nio.file.Paths.get(s"$dir/zz_trunc.warc.gz"),
      java.util.Arrays.copyOf(bytes, bytes.length - 9))
    val (data, q) = Warc.readWarcWithQuarantine(spark, dir)
    val bad = q.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(bad.size == 2 && bad.keys.exists(_.contains("bad.warc")) &&
      bad.keys.exists(_.contains("zz_trunc")), s"got $bad")
    assert(bad.values.forall(_.nonEmpty))
    // all 30 clean records present exactly once (the truncated COPY of a
    // good shard must contribute nothing — no dup, no loss)
    assert(collectKeys(data) == (0 until 30).map(k => s"http://ex.example/p/$k").sorted)
  }

  test("HTTP payload splitting is strict and exact") {
    val body = "x".getBytes("UTF-8")
    val p = Warc.encodeHttpResponse(404, "Not Found", "text/plain", body)
    val (code, ctype, got) = Warc.parseHttpResponse(p)
    assert(code == 404 && ctype == "text/plain" && got.toSeq == body.toSeq)
    intercept[IllegalArgumentException] {
      Warc.parseHttpResponse("no header terminator here".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] {
      Warc.parseHttpResponse("BOGUS line\r\n\r\n".getBytes("US-ASCII"))
    }
  }

  test("cdx index: every member lands in exactly one byte range, any splitBytes") {
    val dir = Files.createTempDirectory("graft_warc_idx").toString
    Warc.writeWarc(recsDf(60, 1), dir, gzipPerRecord = true, index = true)
    val files = new java.io.File(dir).listFiles()
    assert(files.exists(_.getName.endsWith(".warc.gz")))
    assert(files.exists(_.getName.endsWith(".cdx")))
    val whole = collectKeys(Warc.readWarc(spark, dir))
    val fileLen = files.filter(_.getName.endsWith(".warc.gz")).head.length
    // ownership property: for MANY forced split sizes — from one task to
    // more tasks than members — the multiset of records is identical to
    // the whole-file read (no member dropped, none decoded twice)
    for (splitBytes <- Seq(fileLen + 1, fileLen / 2, fileLen / 7, 300L, 64L)) {
      val split = collectKeys(Warc.readWarcSplit(spark, dir, splitBytes))
      assert(split == whole, s"splitBytes=$splitBytes")
    }
  }

  test("cdx index lines are contiguous extents the reader validates") {
    val dir = Files.createTempDirectory("graft_warc_idx2").toString
    Warc.writeWarc(recsDf(10, 1), dir, gzipPerRecord = true, index = true)
    val d = new java.io.File(dir)
    val cdx = d.listFiles().filter(_.getName.endsWith(".cdx")).head
    val data = d.listFiles().filter(_.getName.endsWith(".warc.gz")).head
    val lines = new String(Files.readAllBytes(cdx.toPath), "US-ASCII")
      .split("\n").filter(_.nonEmpty)
    assert(lines.length == 10)
    val extents = lines.map { l =>
      val p = l.split(" ", 3); (p(0).toLong, p(1).toLong, p(2))
    }
    assert(extents.head._1 == 0L)
    extents.sliding(2).foreach { case Array(a, b) =>
      assert(b._1 == a._1 + a._2, "extents must be contiguous")
    }
    assert(extents.last._1 + extents.last._2 == data.length)
    assert(extents.forall(_._3.startsWith("http://ex.example/p/")))
    // a corrupted index fails loudly, never resyncs
    val broken = lines.updated(3, "999999 17 http://x").mkString("", "\n", "\n")
    Files.write(cdx.toPath, broken.getBytes("US-ASCII"))
    val err = intercept[org.apache.spark.SparkException] {
      Warc.readWarcSplit(spark, dir, 128).collect()
    }
    assert(err.getMessage.contains("cdx") || Option(err.getCause).toSeq
      .flatMap(c => Option(c.getMessage)).exists(_.contains("cdx")))
  }

  test("a container without its index fails the split read loudly") {
    val dir = Files.createTempDirectory("graft_warc_noidx").toString
    Warc.writeWarc(recsDf(5, 1), dir, gzipPerRecord = true, index = false)
    val err = intercept[org.apache.spark.SparkException] {
      Warc.readWarcSplit(spark, dir, 128).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(err).exists(_.contains("no .cdx record index")))
  }

  test("chunked Transfer-Encoding bodies reassemble to the plain body") {
    val body = ("alpha " * 50).trim.getBytes("UTF-8") // forces many chunks
    for (chunkSize <- Seq(1, 7, 64, 1 << 16)) {
      val p = Warc.encodeHttpResponseChunked(200, "OK", "text/html", body, chunkSize)
      val (code, ctype, got) = Warc.parseHttpResponse(p)
      assert(code == 200 && ctype == "text/html", s"chunkSize=$chunkSize")
      assert(got.toSeq == body.toSeq, s"chunkSize=$chunkSize")
    }
    // empty body: just the zero chunk
    val empty = Warc.encodeHttpResponseChunked(204, "No Content", "text/plain",
      Array.emptyByteArray)
    assert(Warc.parseHttpResponse(empty)._3.isEmpty)
  }

  test("chunk extensions and trailer fields are legal and ignored") {
    val p = ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "5;ext=1\r\nhello\r\n0\r\nX-Trailer: t\r\n\r\n").getBytes("US-ASCII")
    assert(new String(Warc.parseHttpResponse(p)._3, "UTF-8") == "hello")
  }

  test("malformed chunked framing fails loudly, never returns framed bytes") {
    def msg(framed: String): Array[Byte] =
      ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" + framed)
        .getBytes("US-ASCII")
    // truncated chunk: size line claims more data than present
    val e1 = intercept[IllegalArgumentException] {
      Warc.parseHttpResponse(msg("ff\r\nshort\r\n0\r\n\r\n"))
    }
    assert(e1.getMessage.contains("truncated"))
    // missing zero-chunk terminator
    intercept[IllegalArgumentException] {
      Warc.parseHttpResponse(msg("5\r\nhello\r\n"))
    }
    // non-hex size line
    intercept[IllegalArgumentException] {
      Warc.parseHttpResponse(msg("xyz\r\nhello\r\n0\r\n\r\n"))
    }
    // chunk data not CRLF-terminated
    intercept[IllegalArgumentException] {
      Warc.parseHttpResponse(msg("5\r\nhelloXX0\r\n\r\n"))
    }
    // bytes after the final chunk
    intercept[IllegalArgumentException] {
      Warc.parseHttpResponse(msg("5\r\nhello\r\n0\r\n\r\ntrailing-garbage"))
    }
    // an encoding this engine can't decode must fail, not pass through
    val gz = ("HTTP/1.1 200 OK\r\nTransfer-Encoding: gzip\r\n\r\nxx")
      .getBytes("US-ASCII")
    val e2 = intercept[IllegalArgumentException] { Warc.parseHttpResponse(gz) }
    assert(e2.getMessage.contains("unsupported Transfer-Encoding"))
  }

  test("gzip Content-Encoding bodies decompress, plain and chunk-stacked") {
    val body = ("sigma " * 40).trim.getBytes("UTF-8")
    // Content-Length framing over the compressed bytes
    val plain = Warc.encodeHttpResponseGzip(200, "OK", "text/html", body)
    val (c1, t1, b1) = Warc.parseHttpResponse(plain)
    assert(c1 == 200 && t1 == "text/html" && b1.toSeq == body.toSeq)
    // chunked framing OVER the gzip representation (RFC layering)
    for (chunkSize <- Seq(7, 64)) {
      val stacked = Warc.encodeHttpResponseGzip(200, "OK", "text/html", body, chunkSize)
      assert(new String(stacked.takeWhile(_ != '\r'.toByte), "US-ASCII")
        .startsWith("HTTP/1.1"))
      assert(Warc.parseHttpResponse(stacked)._3.toSeq == body.toSeq,
        s"chunkSize=$chunkSize")
    }
  }

  test("extra WARC headers round-trip: written in order, captured lowercased") {
    val rec = Warc.encodeRecord("revisit", "http://x.example/p/7",
      "2024-01-01T00:00:00Z", "<urn:uuid:1>",
      "application/http;msgtype=response", Array.emptyByteArray,
      Seq("WARC-Payload-Digest" -> "sha256:abc123",
        "WARC-Refers-To-Target-URI" -> "/p/3"))
    val txt = new String(rec, "US-ASCII")
    // extras sit between the core headers and Content-Length
    assert(txt.contains("WARC-Payload-Digest: sha256:abc123\r\n"))
    assert(txt.indexOf("WARC-Payload-Digest") <
      txt.indexOf("Content-Length"))
    // the plain reader ignores them; the extended reader captures them
    val in = new java.io.ByteArrayInputStream(rec)
    val rows = Warc.decodeStream(in, "<test>", gzipped = false,
      captureExtra = true).toList
    assert(rows.size == 1)
    val hdrs = rows.head.getAs[Map[String, String]](6)
    assert(hdrs("warc-payload-digest") == "sha256:abc123")
    assert(hdrs("warc-refers-to-target-uri") == "/p/3")
    val in2 = new java.io.ByteArrayInputStream(rec)
    assert(Warc.decodeStream(in2, "<test>", gzipped = false)
      .toList.head.length == 6)
  }

  test("redirect encode + header-only parse: status and Location, no body touch") {
    val msg = Warc.encodeHttpRedirect(301, "Moved Permanently", "/r/42")
    assert(Warc.httpStatusHeader(msg, "location") == ((301, "/r/42")))
    assert(Warc.httpStatusHeader(msg, "Location") == ((301, "/r/42"))) // ci
    // absent header is null, status still parses
    assert(Warc.httpStatusHeader(msg, "retry-after") == ((301, null)))
    // a CHUNKED body does not get decoded (or choked on) by the
    // header-only path — that is the point of it
    val chunked = Warc.encodeHttpResponseChunked(
      200, "OK", "text/html", "hello world".getBytes("UTF-8"), 4)
    assert(Warc.httpStatusHeader(chunked, "location") == ((200, null)))
    // malformed head still fails loudly
    val e = intercept[IllegalArgumentException] {
      Warc.httpStatusHeader("not http".getBytes("US-ASCII"), "location")
    }
    assert(e.getMessage.contains("header terminator"))
  }

  test("corrupt or unsupported Content-Encoding fails, never passes through") {
    val body = "hello gzip".getBytes("UTF-8")
    val msg = Warc.encodeHttpResponseGzip(200, "OK", "text/plain", body)
    // flip a byte inside the gzip stream (past the HTTP header block)
    var split = 0
    while (!(msg(split) == '\r' && msg(split + 1) == '\n' &&
        msg(split + 2) == '\r' && msg(split + 3) == '\n')) split += 1
    val corrupt = msg.clone()
    corrupt(split + 4 + 12) = (corrupt(split + 4 + 12) ^ 0x5a).toByte
    val e1 = intercept[IllegalArgumentException] { Warc.parseHttpResponse(corrupt) }
    assert(e1.getMessage.contains("gzip"))
    // brotli (or anything else) must fail loudly, not surface as text
    val br = ("HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n\r\nxxxx")
      .getBytes("US-ASCII")
    val e2 = intercept[IllegalArgumentException] { Warc.parseHttpResponse(br) }
    assert(e2.getMessage.contains("unsupported Content-Encoding"))
    // identity is a legal no-op
    val id = ("HTTP/1.1 200 OK\r\nContent-Encoding: identity\r\n\r\nok")
      .getBytes("US-ASCII")
    assert(new String(Warc.parseHttpResponse(id)._3, "UTF-8") == "ok")
  }
}
