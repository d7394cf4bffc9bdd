package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.HttpCharset

/** [[graft.sources.HttpCharset]] — the WHATWG-precedence charset sniff
  * and decode behind the judged `source_warc_charset` chain. */
class HttpCharsetSpec extends AnyFunSuite {

  test("BOM trumps a lying Content-Type header, and is stripped") {
    val b = Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
      "naïve Ω".getBytes("UTF-8")
    val (cs, text) = HttpCharset.decode("text/html; charset=iso-8859-1", b)
    assert(cs == "UTF-8")
    assert(text == "naïve Ω") // no BOM char, correct UTF-8 decode
  }

  test("UTF-16LE BOM detected and decoded") {
    val b = Array[Byte](0xFF.toByte, 0xFE.toByte) ++ "utf16 ✓".getBytes("UTF-16LE")
    val (cs, text) = HttpCharset.decode("text/html", b)
    assert(cs == "UTF-16LE")
    assert(text == "utf16 ✓")
  }

  test("Content-Type charset param: quoted, mixed case, extra params") {
    assert(HttpCharset.sniff("text/html; CHARSET=\"Windows-1252\"; boundary=x",
      "hi".getBytes("US-ASCII"))._1 == "windows-1252")
    assert(HttpCharset.sniff("Text/HTML;charset=UTF-8",
      "hi".getBytes("US-ASCII"))._1 == "UTF-8")
  }

  test("latin-1 labels map to windows-1252 (WHATWG), and 0x80 decodes as €") {
    val b = "price ".getBytes("US-ASCII") :+ 0x80.toByte
    val (cs, text) = HttpCharset.decode("text/html; charset=iso-8859-1", b)
    assert(cs == "windows-1252")
    assert(text == "price €") // latin-1 proper would give the C1 control U+0080
  }

  test("meta prescan finds the declaration inside the first 1024 bytes") {
    val html = "<html><head><meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=utf-8\"></head><body>Ω</body></html>"
    val (cs, text) = HttpCharset.decode("text/html", html.getBytes("UTF-8"))
    assert(cs == "UTF-8")
    assert(text.contains("Ω"))
    // the short <meta charset=...> form too
    val h2 = "<meta charset='utf-8'><p>αβ</p>"
    assert(HttpCharset.decode("text/html", h2.getBytes("UTF-8"))._2.contains("αβ"))
  }

  test("a meta declaration PAST the 1024-byte window is ignored (cp1252 default)") {
    val pad = "<!-- " + ("x" * 1100) + " -->"
    val html = pad + "<meta charset=utf-8><p>late</p>"
    val (cs, _) = HttpCharset.decode("text/html", html.getBytes("UTF-8"))
    assert(cs == "windows-1252")
  }

  test("no declaration anywhere defaults to windows-1252") {
    val b = "plain r".getBytes("US-ASCII") ++ Array(0xE9.toByte) ++
      "sum".getBytes("US-ASCII") ++ Array(0xE9.toByte)
    val (cs, text) = HttpCharset.decode("text/html", b)
    assert(cs == "windows-1252")
    assert(text == "plain résumé")
  }

  test("an unknown charset label quarantines the row, never kills the task") {
    // decode() runs inside a per-page UDF — throwing would fail the
    // Spark task and the whole shard on one exotic page. Instead the
    // page decodes under the cp1252 fallback and the charset column
    // carries the `unknown:<label>` sentinel for downstream filtering.
    val (cs, text) =
      HttpCharset.decode("text/html; charset=shift_jis", "hi".getBytes("US-ASCII"))
    assert(cs == "unknown:shift_jis")
    assert(text == "hi") // ASCII bytes decode identically under the fallback
    // the sentinel surfaces from a meta declaration too, label bounded
    val h = "<meta charset=euc-kr><p>x</p>"
    assert(HttpCharset.decode("text/html", h.getBytes("US-ASCII"))._1
      == "unknown:euc-kr")
    // non-ASCII bytes under an unknown label decode VISIBLY (cp1252 /
    // U+FFFD), not by crashing: 0x81 is unmapped in cp1252
    val b = "a".getBytes("US-ASCII") ++ Array(0x81.toByte)
    val (cs2, t2) = HttpCharset.decode("text/html; charset=gb2312", b)
    assert(cs2 == "unknown:gb2312" && t2 == "a�")
  }

  test("charset param needs a real parameter boundary, not a substring") {
    // a parameter NAME merely ending in charset is not the charset param
    assert(HttpCharset.sniff("text/html; x-nocharset=foo",
      "hi".getBytes("US-ASCII"))._1 == "windows-1252")
    // ...but the real parameter still parses in all its usual shapes
    assert(HttpCharset.sniff("text/html;charset=utf-8",
      "hi".getBytes("US-ASCII"))._1 == "UTF-8")
    assert(HttpCharset.sniff("text/html; charset = utf-8",
      "hi".getBytes("US-ASCII"))._1 == "UTF-8")
  }

  test("malformed bytes under the chosen charset decode to U+FFFD, not a crash") {
    val b = "ok ".getBytes("US-ASCII") ++ Array(0xC3.toByte) // truncated UTF-8 seq
    val (_, text) = HttpCharset.decode("text/html; charset=utf-8", b)
    assert(text == "ok �")
  }

  test("pure-ASCII bodies decode identically under the cp1252 default") {
    val s = "just ascii <b>here</b> 123"
    assert(HttpCharset.decode("text/html", s.getBytes("US-ASCII"))._2 == s)
  }
}
