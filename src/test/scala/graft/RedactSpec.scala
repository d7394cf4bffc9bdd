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
}
