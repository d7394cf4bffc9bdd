package graft.multimodal

import java.io.ByteArrayOutputStream

/** EXIF metadata — writer and parser for the TIFF-structured APP1
  * segment of a JPEG, per the public specifications (EXIF 2.3 / CIPA
  * DC-008, which embeds a TIFF 6.0 IFD; ITU-T T.81 for the JPEG
  * segment stream it rides in).
  *
  * Why this exists: orientation, capture timestamp, camera make and
  * pixel dimensions are THE metadata a 100 TB media-curation pass
  * filters, dedups and shards on BEFORE scheduling any frame decode —
  * the same role the ISO-BMFF header walk (Mp4.scala) plays for video.
  * The judged query (`mm_image_exif`) synthesizes a closed-form EXIF
  * block per key, splices it into a REAL JPEG from the in-tree codec,
  * and parses it back; the oracle recomputes every field from the key.
  *
  * Both byte orders are implemented and judged (`II` little-endian and
  * `MM` big-endian, chosen per key) — endianness is where naive EXIF
  * readers break, and TIFF's header makes it explicit. ASCII values
  * longer than 4 bytes exercise the out-of-line value-offset path;
  * SHORT values exercise the left-justified inline path.
  */
object Exif {

  /** EXIF/TIFF tags used (public tag ids, TIFF 6.0 / EXIF 2.3). */
  val TagImageWidth = 0x0100
  val TagImageLength = 0x0101
  val TagMake = 0x010f
  val TagOrientation = 0x0112
  val TagDateTime = 0x0132

  case class ExifInfo(byteOrder: String, width: Long, height: Long,
      make: String, orientation: Int, dateTime: String)

  // ---- writer ----

  private class W(le: Boolean) {
    val out = new ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit =
      if (le) { u8(v); u8(v >> 8) } else { u8(v >> 8); u8(v) }
    def u32(v: Long): Unit =
      if (le) { u8(v.toInt); u8((v >> 8).toInt); u8((v >> 16).toInt); u8((v >> 24).toInt) }
      else { u8((v >> 24).toInt); u8((v >> 16).toInt); u8((v >> 8).toInt); u8(v.toInt) }
    def bytes(b: Array[Byte]): Unit = out.write(b, 0, b.length)
  }

  /** A minimal valid TIFF block (what sits after "Exif\0\0"): header +
    * one IFD with the five curation tags. `littleEndian` selects the
    * byte order ("II" vs "MM"). Strings land out-of-line after the IFD
    * (the >4-byte value-offset path); width/length are LONGs,
    * orientation a left-justified inline SHORT. */
  def tiffBlock(width: Long, height: Long, make: String, orientation: Int,
      dateTime: String, littleEndian: Boolean): Array[Byte] = {
    require(orientation >= 1 && orientation <= 8, s"bad orientation $orientation")
    // TIFF 6.0: values must begin on a WORD boundary, so odd-length
    // ASCII values carry a pad byte (not counted in the entry's count)
    // - round-14 review: without it, half the camera ids produced a
    // spec-violating odd DateTime offset strict external readers may
    // reject
    val makeB = (make + "\u0000").getBytes("US-ASCII")
    val makePad = makeB.length % 2
    val dtB = (dateTime + "\u0000").getBytes("US-ASCII")
    require(dtB.length == 20, s"DateTime must be 19 chars + NUL, got '$dateTime'")
    val n = 5 // IFD entries
    val ifdStart = 8L // right after the TIFF header
    val dataStart = ifdStart + 2 + n * 12 + 4 // count + entries + next-IFD
    val makeOff = dataStart
    val dtOff = dataStart + makeB.length + makePad
    val w = new W(littleEndian)
    // TIFF header
    w.bytes((if (littleEndian) "II" else "MM").getBytes("US-ASCII"))
    w.u16(42)
    w.u32(ifdStart)
    // IFD: entry count, then entries in ascending tag order (TIFF rule)
    w.u16(n)
    def entry(tag: Int, typ: Int, count: Long)(value: => Unit): Unit = {
      w.u16(tag); w.u16(typ); w.u32(count)
      val before = w.out.size()
      value
      require(w.out.size() - before == 4, s"tag $tag value field must be 4 bytes")
    }
    entry(TagImageWidth, 4, 1)(w.u32(width)) // LONG
    entry(TagImageLength, 4, 1)(w.u32(height)) // LONG
    entry(TagMake, 2, makeB.length.toLong)(w.u32(makeOff)) // ASCII, out of line
    entry(TagOrientation, 3, 1) { w.u16(orientation); w.u16(0) } // SHORT, inline left-justified
    entry(TagDateTime, 2, dtB.length.toLong)(w.u32(dtOff)) // ASCII, out of line
    w.u32(0) // no next IFD
    w.bytes(makeB)
    if (makePad == 1) w.u8(0) // word-alignment pad, outside the count
    w.bytes(dtB)
    w.out.toByteArray
  }

  /** Splice an EXIF APP1 segment (marker 0xFFE1, "Exif\0\0" + TIFF
    * block) immediately after a JPEG's SOI — the standard placement.
    * The payload must be a real JPEG (leading SOI). */
  def withExif(jpeg: Array[Byte], tiff: Array[Byte]): Array[Byte] = {
    require(jpeg.length >= 2 &&
      (jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8,
      "withExif needs a JPEG (leading SOI)")
    val seg = new ByteArrayOutputStream()
    seg.write(0xff); seg.write(0xe1)
    val len = 2 + 6 + tiff.length // length field counts itself
    require(len <= 0xffff, "EXIF block too large for one APP1 segment")
    seg.write((len >> 8) & 0xff); seg.write(len & 0xff)
    seg.write("Exif".getBytes("US-ASCII")); seg.write(0); seg.write(0)
    seg.write(tiff, 0, tiff.length)
    val out = new ByteArrayOutputStream(jpeg.length + len + 2)
    out.write(jpeg, 0, 2)
    val s = seg.toByteArray
    out.write(s, 0, s.length)
    out.write(jpeg, 2, jpeg.length - 2)
    out.toByteArray
  }

  // ---- parser ----

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"invalid EXIF: $msg")

  /** Walk the JPEG segment stream to the EXIF APP1, then parse its TIFF
    * IFD. Returns None when no EXIF APP1 exists (plain JPEG); fails
    * loudly on a malformed one. Stops at SOS — EXIF precedes scan data
    * by spec, so entropy-coded bytes are never walked. */
  def parseExif(bytes: Array[Byte]): Option[ExifInfo] = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8)
      fail("missing SOI")
    var p = 2
    while (p + 4 <= bytes.length) {
      if ((bytes(p) & 0xff) != 0xff) fail(f"expected marker at $p, got 0x${bytes(p)}%02x")
      val m = bytes(p + 1) & 0xff
      if (m == 0xda || m == 0xd9) return None // SOS/EOI: no EXIF seen
      val len = ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
      if (len < 2 || p + 2 + len > bytes.length) fail(s"segment at $p overruns")
      if (m == 0xe1 && len >= 8 &&
          new String(bytes, p + 4, 4, "US-ASCII") == "Exif" &&
          bytes(p + 8) == 0 && bytes(p + 9) == 0)
        return Some(parseTiff(bytes, p + 10, p + 2 + len))
      p += 2 + len
    }
    None
  }

  /** Parse the TIFF block in bytes[start, end): header, first IFD, the
    * five curation tags. Unknown tags are skipped (forward-compatible,
    * the TIFF rule); missing curation tags fail loudly. */
  def parseTiff(bytes: Array[Byte], start: Int, end: Int): ExifInfo = {
    if (end - start < 8) fail("TIFF block too short")
    val order = new String(bytes, start, 2, "US-ASCII")
    val le = order match {
      case "II" => true
      case "MM" => false
      case other => fail(s"bad byte order '$other'")
    }
    // lower bounds too (round-14 review): a corrupt 32-bit offset cast
    // to a negative Int must fail loudly, not read bytes BEFORE the
    // TIFF block (which the upper-bound check alone would allow)
    def u16(o: Int): Int = {
      if (o < start || o + 2 > end) fail(s"u16 at $o out of [$start,$end)")
      val a = bytes(o) & 0xff; val b = bytes(o + 1) & 0xff
      if (le) (b << 8) | a else (a << 8) | b
    }
    def u32(o: Int): Long = {
      if (o < start || o + 4 > end) fail(s"u32 at $o out of [$start,$end)")
      val a = (bytes(o) & 0xffL); val b = (bytes(o + 1) & 0xffL)
      val c = (bytes(o + 2) & 0xffL); val d = (bytes(o + 3) & 0xffL)
      if (le) (d << 24) | (c << 16) | (b << 8) | a
      else (a << 24) | (b << 16) | (c << 8) | d
    }
    if (u16(start + 2) != 42) fail("bad TIFF magic")
    val ifd = start + u32(start + 4).toInt
    val n = u16(ifd)
    var width = -1L; var height = -1L; var orientation = -1
    var make: String = null; var dateTime: String = null
    def ascii(count: Long, valueOff: Int): String = {
      // count includes the NUL; value inline when count <= 4, else offset.
      // Sanity-bound count FIRST: a corrupt 2^31-scale count casts to a
      // negative Int and would slip past an additive range check
      if (count < 1 || count > end - start) fail(s"ASCII count $count out of range")
      val o = if (count <= 4) valueOff else start + u32(valueOff).toInt
      if (o < start || o + count.toInt > end) fail("ASCII value out of range")
      new String(bytes, o, count.toInt - 1, "US-ASCII")
    }
    var i = 0
    while (i < n) {
      val e = ifd + 2 + i * 12
      val tag = u16(e); val typ = u16(e + 2); val count = u32(e + 4)
      val v = e + 8
      tag match {
        case TagImageWidth =>
          width = if (typ == 3) u16(v).toLong else u32(v)
        case TagImageLength =>
          height = if (typ == 3) u16(v).toLong else u32(v)
        case TagOrientation =>
          if (typ != 3) fail(s"orientation type $typ"); orientation = u16(v)
        case TagMake => make = ascii(count, v)
        case TagDateTime => dateTime = ascii(count, v)
        case _ => // unknown tag: skip (forward compatibility)
      }
      i += 1
    }
    if (width < 0 || height < 0 || orientation < 0 || make == null || dateTime == null)
      fail(s"missing curation tags (w=$width h=$height o=$orientation)")
    ExifInfo(order, width, height, make, orientation, dateTime)
  }
}
