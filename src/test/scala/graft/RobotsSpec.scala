package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Robots

/** [[graft.sources.Robots]] — RFC 9309 parsing, group selection, and
  * the longest-match/allow-tie decision rule behind the judged
  * `crawl_robots_filter` row. */
class RobotsSpec extends AnyFunSuite {

  private def allowed(txt: String, agent: String, path: String): Boolean =
    Robots.isAllowed(Robots.parse(txt, agent), path)

  private val basic =
    """User-agent: otherbot
      |Disallow: /
      |
      |User-agent: graftbot
      |Disallow: /private/
      |Allow: /private/ok/
      |
      |User-agent: *
      |Disallow: /none/
      |""".stripMargin

  test("group selection: the specific agent's group, not otherbot's or *'s") {
    assert(allowed(basic, "graftbot", "/anything"))          // otherbot's / ignored
    assert(!allowed(basic, "graftbot", "/private/doc"))
    assert(allowed(basic, "graftbot", "/none/x"))            // * group ignored
    assert(!allowed(basic, "unlistedbot", "/none/x"))        // * applies
    assert(allowed(basic, "unlistedbot", "/private/doc"))
    assert(!allowed(basic, "otherbot", "/anything"))
  }

  test("agent token match is case-insensitive") {
    assert(!allowed(basic, "GraftBot", "/private/doc"))
  }

  test("longest pattern wins: the allow carve-out under a disallow") {
    assert(!allowed(basic, "graftbot", "/private/doc"))
    assert(allowed(basic, "graftbot", "/private/ok/doc"))
  }

  test("allow wins a specificity tie") {
    val txt = "User-agent: graftbot\nDisallow: /dir/\nAllow: /dirx/\n" +
      "Disallow: /same/\nAllow: /same/\n"
    assert(!allowed(txt, "graftbot", "/dir/a"))
    assert(allowed(txt, "graftbot", "/same/a")) // equal length: allow wins
  }

  test("wildcards: * spans octets, trailing $ anchors the end") {
    val txt = "User-agent: graftbot\nDisallow: /*.pdf$\nDisallow: /dl/*/raw\n"
    assert(!allowed(txt, "graftbot", "/public/file7.pdf"))
    assert(allowed(txt, "graftbot", "/public/file7.pdfx")) // $ anchored
    assert(allowed(txt, "graftbot", "/public/pdf/item"))   // no .pdf suffix
    assert(!allowed(txt, "graftbot", "/dl/v2/raw99"))      // prefix after *
    assert(allowed(txt, "graftbot", "/dl/v2/other"))
  }

  test("multiple user-agent lines head ONE group (union, RFC 9309 §2.2)") {
    val txt = "User-agent: graftbot\nUser-agent: helperbot\nDisallow: /x/\n"
    assert(!allowed(txt, "graftbot", "/x/1"))
    assert(!allowed(txt, "helperbot", "/x/1"))
  }

  test("two groups for the same agent merge") {
    val txt = "User-agent: graftbot\nDisallow: /a/\n\n" +
      "User-agent: graftbot\nDisallow: /b/\n"
    assert(!allowed(txt, "graftbot", "/a/1"))
    assert(!allowed(txt, "graftbot", "/b/1"))
  }

  test("an empty trailing group is the agent's allow-all and still beats *") {
    val txt = "User-agent: *\nDisallow: /\n\nUser-agent: graftbot\n"
    assert(allowed(txt, "graftbot", "/anything"))
    assert(!allowed(txt, "unlistedbot", "/anything"))
  }

  test("empty Disallow value is a no-op, never block-everything") {
    val txt = "User-agent: graftbot\nDisallow:\n"
    assert(allowed(txt, "graftbot", "/anything"))
  }

  test("comments, CRLF, case-insensitive field names, unknown fields") {
    val txt = "User-AGENT: graftbot # our crawler\r\n" +
      "Crawl-delay: 10\r\n" +
      "DISALLOW: /secret/ # hands off\r\n" +
      "Sitemap: http://x.example/sitemap.xml\r\n"
    assert(!allowed(txt, "graftbot", "/secret/x"))
    assert(allowed(txt, "graftbot", "/open/x"))
  }

  test("an unknown field between user-agent lines SPLITS the groups (§2.2)") {
    // only consecutive user-agent lines head one group: a gets its own
    // (empty = allow-all) group, b alone carries the disallow
    val txt = "User-agent: a\nCrawl-delay: 10\nUser-agent: b\nDisallow: /x/\n"
    assert(allowed(txt, "a", "/x/1"))   // a does NOT inherit b's rules
    assert(!allowed(txt, "b", "/x/1"))
    // ...and a's empty group still beats a * group (allow-all for a)
    val txt2 = txt + "\nUser-agent: *\nDisallow: /\n"
    assert(allowed(txt2, "a", "/anything"))
    assert(!allowed(txt2, "c", "/anything"))
  }

  test("rules before any user-agent line are ignored") {
    val txt = "Disallow: /\nUser-agent: graftbot\nDisallow: /y/\n"
    assert(allowed(txt, "graftbot", "/z"))
    assert(!allowed(txt, "graftbot", "/y/1"))
  }

  test("no matching group and no * group: everything allowed") {
    val txt = "User-agent: otherbot\nDisallow: /\n"
    assert(allowed(txt, "graftbot", "/anything"))
  }

  test("percent-encoding: unreserved escapes decode before comparison") {
    // %7E encodes ~ (unreserved) — pattern and path compare equal in
    // either spelling, both directions (RFC 9309 §2.2.2 / RFC 3986)
    val enc = "User-agent: graftbot\nDisallow: /%7Eadmin/\n"
    assert(!allowed(enc, "graftbot", "/~admin/sec"))
    assert(!allowed(enc, "graftbot", "/%7Eadmin/sec"))
    val dec = "User-agent: graftbot\nDisallow: /~admin/\n"
    assert(!allowed(dec, "graftbot", "/%7Eadmin/sec"))
    assert(allowed(dec, "graftbot", "/other"))
  }

  test("percent-encoding: reserved escapes stay encoded, hex case-folded") {
    // %2F encodes / (reserved): it must NOT match a literal slash —
    // decoding would change the path structure — but %2f and %2F
    // compare equal after hex uppercasing
    val txt = "User-agent: graftbot\nDisallow: /a%2Fb/\n"
    assert(!allowed(txt, "graftbot", "/a%2Fb/x"))
    assert(!allowed(txt, "graftbot", "/a%2fb/x"))
    assert(allowed(txt, "graftbot", "/a/b/x"))
    // non-ASCII octets stay encoded too, matching across hex case
    val cafe = "User-agent: graftbot\nDisallow: /caf%C3%A9/\n"
    assert(!allowed(cafe, "graftbot", "/caf%c3%a9/menu"))
    assert(allowed(cafe, "graftbot", "/cafe/menu"))
  }

  test("percent-encoding: invalid escapes pass through literally") {
    val txt = "User-agent: graftbot\nDisallow: /100%/\n"
    assert(!allowed(txt, "graftbot", "/100%/x"))
    assert(allowed(txt, "graftbot", "/100/x"))
    // a bare trailing % in the path must not crash the normalizer
    assert(allowed(txt, "graftbot", "/other%"))
  }

  test("regex metacharacters in rule paths are literal") {
    val txt = "User-agent: graftbot\nDisallow: /a+b(c)/\n"
    assert(!allowed(txt, "graftbot", "/a+b(c)/d"))
    assert(allowed(txt, "graftbot", "/aab(c)/d")) // + is not regex-plus
  }
}
