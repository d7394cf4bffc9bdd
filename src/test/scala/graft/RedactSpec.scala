package graft

import org.apache.spark.sql.functions._

import graft.functions.Redact

class RedactSpec extends SparkSpecBase {
  import spark.implicits._

  private def scrubOne(s: String): (String, Long) = {
    val r = Seq(s).toDF("t")
      .select(Redact.scrub($"t"), Redact.piiCount($"t").cast("long"))
      .collect().head
    (r.getString(0), r.getLong(1))
  }

  test("each PII shape is replaced by its placeholder") {
    assert(scrubOne("mail me at jane.doe+x@corp.example.org today") ==
      ("mail me at [EMAIL] today", 1L))
    assert(scrubOne("ssn 123-45-6789.") == ("ssn [SSN].", 1L))
    assert(scrubOne("card 1234-5678-9012-3456 on file") == ("card [CARD] on file", 1L))
    assert(scrubOne("call 555-867-5309 now") == ("call [PHONE] now", 1L))
    assert(scrubOne("host 192.168.10.1 up") == ("host [IP] up", 1L))
  }

  test("a card is never half-eaten by the phone pattern") {
    val (out, n) = scrubOne("pay 1234-5678-9012-3456 or call 555-867-5309")
    assert(out == "pay [CARD] or call [PHONE]")
    assert(n == 2L)
  }

  test("clean text is untouched and redaction is idempotent") {
    val clean = "no personal data here, just words and numbers like 42"
    assert(scrubOne(clean) == (clean, 0L))
    val once = scrubOne("mail x@y.zz and 555-123-4567")._1
    assert(scrubOne(once) == (once, 0L))
  }

  test("overlapping shapes count once (fold semantics, not raw-text sum)") {
    // the phone-shaped local part is consumed by the EMAIL replacement, so
    // it must not ALSO count as a phone hit (scrub replaces it once)
    assert(scrubOne("reach 555-867-5309@x.com now") == ("reach [EMAIL] now", 1L))
  }

  test("digits embedded in longer runs do not false-positive") {
    // 11-digit run: not a phone (no word boundary alignment)
    assert(scrubOne("id 12345678901 raw")._2 == 0L)
  }

  test("token-count form equals the stepwise fold, even on placeholder-bearing input") {
    // piiCount counts inserted placeholders (O(k) passes); pin it
    // against the stepwise prefix-chain count it replaced, across every
    // shape, overlap, and a text that ALREADY contains literal tokens
    def stepwise(text: org.apache.spark.sql.Column) =
      Redact.patterns.foldLeft((text, lit(0L))) { case ((t, acc), (p, r)) =>
        (regexp_replace(t, p, r), acc + regexp_count(t, lit(p)))
      }._2
    val texts = Seq(
      "mail a@b.cc ssn 123-45-6789 card 1234-5678-9012-3456 call 555-867-5309 ip 1.2.3.4",
      "reach 555-867-5309@x.com now",
      "prior [EMAIL] token stays uncounted, x@y.zz counts",
      "[IP] [CARD] nothing else",
      "nothing at all")
    val got = texts.toDF("t")
      .select(Redact.piiCount($"t").cast("long"), stepwise($"t").cast("long"))
      .collect()
    got.zip(texts).foreach { case (r, t) =>
      assert(r.getLong(0) == r.getLong(1), s"divergence on '$t': ${r.toSeq}")
    }
    // sanity on the literal-token line: only the real email counted
    assert(got(2).getLong(0) == 1L)
  }
}
