package graft.sources

import java.nio.ByteBuffer
import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}

/** Charset detection + decoding for HTTP response bodies in the crawl
  * chain — the step between [[Warc.parseHttpResponse]]'s content bytes
  * and the text every downstream feature consumes. Decoding everything
  * as UTF-8 is wrong on real crawls: a large fraction of the web is
  * windows-1252 (often mislabeled `iso-8859-1`, whose 0x80–0x9F range
  * cp1252 reassigns to €‚ƒ„… — the WHATWG Encoding Standard therefore
  * maps the latin-1 labels TO windows-1252, and so does this engine),
  * UTF-16 appears behind BOMs, and many pages declare their encoding
  * only in a `<meta>` tag, not the Content-Type header.
  *
  * Detection precedence is the WHATWG / browser algorithm, simplified
  * to the layered sources this engine can see:
  *
  *   1. BOM (trumps everything, including a lying Content-Type):
  *      EF BB BF → UTF-8, FF FE → UTF-16LE, FE FF → UTF-16BE.
  *   2. `charset=` parameter of the Content-Type header (quoted or
  *      bare, case-insensitive).
  *   3. Meta prescan of the first 1024 BYTES only (the WHATWG window —
  *      a declaration past it is ignored by browsers and by us):
  *      `<meta charset=...>` or the http-equiv `content=` form.
  *   4. Default: windows-1252 (the WHATWG fallback for en/Western
  *      locales; pure-ASCII bytes decode identically under it).
  *
  * Label handling: the common WHATWG aliases below normalize to their
  * canonical charset. An UNKNOWN label (shift_jis, euc-kr, gb2312,
  * iso-8859-2 — all common on the real web and outside this subset)
  * must NOT throw: the decode runs inside a per-page UDF, and one
  * exotic page would kill the whole 100 TB shard. Instead the page is
  * QUARANTINED in place — decoded with replacement under the
  * windows-1252 fallback and surfaced as `unknown:<label>` in the
  * charset column, so downstream curation can filter or re-route it
  * while the job keeps running (the same fail-soft posture as the
  * U+FFFD rule below, and the per-record quarantine pattern of the
  * Avro/WARC readers). Malformed byte sequences under the chosen
  * charset decode to U+FFFD replacement characters — the browser
  * behavior; a 100 TB crawl shard must not die on one mojibake byte,
  * and U+FFFD is visible and greppable downstream.
  */
object HttpCharset {

  /** WHATWG label → canonical charset name (subset: the labels that
    * dominate crawl corpora). Keys are lowercase, dashes/underscores
    * as the standard lists them. */
  private val Labels: Map[String, String] = Map(
    "utf-8" -> "UTF-8", "utf8" -> "UTF-8", "unicode-1-1-utf-8" -> "UTF-8",
    // WHATWG maps ALL latin-1 labels to windows-1252 (see header note)
    "iso-8859-1" -> "windows-1252", "iso8859-1" -> "windows-1252",
    "latin1" -> "windows-1252", "latin-1" -> "windows-1252",
    "l1" -> "windows-1252", "cp819" -> "windows-1252",
    "ascii" -> "windows-1252", "us-ascii" -> "windows-1252",
    "windows-1252" -> "windows-1252", "cp1252" -> "windows-1252",
    "x-cp1252" -> "windows-1252",
    "utf-16" -> "UTF-16LE", "utf-16le" -> "UTF-16LE",
    "utf-16be" -> "UTF-16BE")

  /** A sniffed label resolved to the charset this engine will report
    * and decode with: a known label canonicalizes; an unknown one
    * becomes the quarantine sentinel `unknown:<label>` (reported
    * as-is, decoded under the windows-1252 fallback — see header). */
  private def canonical(label: String): String = {
    val cleaned = label.trim.stripPrefix("\"").stripSuffix("\"")
      .stripPrefix("'").stripSuffix("'").toLowerCase(java.util.Locale.ROOT)
    Labels.getOrElse(cleaned, s"unknown:${cleaned.take(40)}")
  }

  /** The charset [[decode]] actually decodes `name` with: the name
    * itself for a known canonical, the windows-1252 fallback for a
    * quarantined `unknown:<label>` sentinel. */
  private[sources] def decodeCharsetOf(name: String): String =
    if (name.startsWith("unknown:")) "windows-1252" else name

  /** `charset=` parameter of a Content-Type value, or None. The
    * parameter NAME boundary is matched explicitly (`;` or whitespace
    * before `charset`), so a parameter merely ending in "charset"
    * (e.g. `x-nocharset=foo`) or a value containing the substring is
    * not misparsed; the value may be quoted or bare. */
  private val CharsetParamRe =
    "(?i)[;\\s]charset\\s*=\\s*(\"[^\"]*\"|'[^']*'|[^;\\s]+)".r

  private[sources] def charsetParam(ctype: String): Option[String] =
    if (ctype == null) None
    else CharsetParamRe.findFirstMatchIn(";" + ctype).map(_.group(1))

  private val MetaRe =
    ("(?is)<meta\\s[^>]*?charset\\s*=\\s*[\"']?([A-Za-z0-9_.:-]+)").r

  /** Meta prescan: decode the first 1024 bytes as latin-1 (an ASCII
    * superset — charset labels are ASCII, so the prescan reads them
    * correctly whatever the page's real single-byte encoding) and look
    * for a charset declaration. Covers both `<meta charset=utf-8>` and
    * `<meta http-equiv="Content-Type" content="text/html;
    * charset=utf-8">` — the regex keys on the `charset=` attribute
    * text either form carries. */
  private[sources] def metaPrescan(body: Array[Byte]): Option[String] = {
    val n = math.min(body.length, 1024)
    val head = new String(body, 0, n, StandardCharsets.ISO_8859_1)
    MetaRe.findFirstMatchIn(head).map(_.group(1))
  }

  /** Detect the charset of an HTTP body per the precedence above.
    * Returns (reported charset name, BOM length to strip) — the name
    * is a canonical charset, or the `unknown:<label>` quarantine
    * sentinel when the page declares a label outside [[Labels]]. */
  def sniff(ctype: String, body: Array[Byte],
      file: String = "<payload>"): (String, Int) = {
    if (body.length >= 3 && (body(0) & 0xFF) == 0xEF &&
        (body(1) & 0xFF) == 0xBB && (body(2) & 0xFF) == 0xBF)
      return ("UTF-8", 3)
    if (body.length >= 2 && (body(0) & 0xFF) == 0xFF && (body(1) & 0xFF) == 0xFE)
      return ("UTF-16LE", 2)
    if (body.length >= 2 && (body(0) & 0xFF) == 0xFE && (body(1) & 0xFF) == 0xFF)
      return ("UTF-16BE", 2)
    charsetParam(ctype) match {
      case Some(label) => (canonical(label), 0)
      case None => metaPrescan(body) match {
        case Some(label) => (canonical(label), 0)
        case None => ("windows-1252", 0)
      }
    }
  }

  /** Decode `body` per the sniffed charset. Returns (reported charset
    * name, decoded text). An `unknown:<label>` sentinel decodes under
    * the windows-1252 fallback but REPORTS the sentinel, so the row
    * stays alive and quarantinable. Malformed sequences become U+FFFD
    * — see the header note. */
  def decode(ctype: String, body: Array[Byte],
      file: String = "<payload>"): (String, String) = {
    val (name, bom) = sniff(ctype, body, file)
    val dec = Charset.forName(decodeCharsetOf(name)).newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    val text = dec.decode(
      ByteBuffer.wrap(body, bom, body.length - bom)).toString
    (name, text)
  }
}
