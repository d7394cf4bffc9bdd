package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML-to-text extraction for the crawl chain — the step between a
  * WARC response body and every downstream text feature (quality,
  * dedup, tokenization). A bare tag strip is NOT enough on real pages:
  * `<script>` and `<style>` CONTENT is code, not page text, and must
  * be dropped with its element, and character entities must decode or
  * every length/token/fingerprint downstream counts `&amp;` as five
  * characters of page text.
  *
  * Kept deliberately as a plain Column chain (regexp_replace for the
  * element drops and tag strip, a replace chain for entities) so it
  * stays inside whole-stage codegen AND so the DuckDB oracle can
  * replay it exactly ([[duckExtractSql]] is generated from the same
  * entity table — single source of truth, the [[Bpe]] discipline).
  * Java regex and DuckDB's RE2 agree on every construct used here
  * (inline `(?is)` flags, lazy `.*?`, character classes).
  *
  * Entity coverage is the pinned common set below (named + numeric
  * forms); an entity outside it passes through verbatim — visible and
  * greppable, never silently mis-decoded. Decode order is the
  * standard one-pass discipline: every non-ampersand entity first,
  * the ampersand forms LAST, so `&amp;lt;` yields the literal text
  * `&lt;` (double-encoded markup stays text, exactly like a real
  * HTML parser's single decode pass).
  */
object Html {

  /** The pinned entity table, in decode order: (entity, replacement).
    * Ampersand forms must stay last — see the decode-order note above. */
  private val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&#60;" -> "<",
    "&gt;" -> ">", "&#62;" -> ">",
    "&quot;" -> "\"", "&#34;" -> "\"",
    "&apos;" -> "'", "&#39;" -> "'",
    "&nbsp;" -> 160.toChar.toString, "&#160;" -> 160.toChar.toString,
    "&amp;" -> "&", "&#38;" -> "&")

  private val ScriptRe = "(?is)<script\\b[^>]*>.*?</script>"
  private val StyleRe = "(?is)<style\\b[^>]*>.*?</style>"
  private val CommentRe = "(?s)<!--.*?-->"
  private val TagRe = "(?s)<[^>]*>"

  /** Extract the page text of an HTML string column: drop script/style
    * elements INCLUDING their content (replaced by one space, so text
    * on either side never fuses), drop comments (their content is not
    * page text, and a bare `>` INSIDE a comment would derail the tag
    * strip — `<!-- a > b -->` must vanish whole, not leave ` b -->`
    * behind), strip the remaining tags, decode the common entities. */
  def extractText(html: Column): Column = {
    val noScript = regexp_replace(html, ScriptRe, " ")
    val noStyle = regexp_replace(noScript, StyleRe, " ")
    val noComment = regexp_replace(noStyle, CommentRe, " ")
    val noTags = regexp_replace(noComment, TagRe, "")
    Entities.foldLeft(noTags) { case (c, (ent, ch)) =>
      replace(c, lit(ent), lit(ch))
    }
  }

  /** The DuckDB replay of [[extractText]] over the SQL expression
    * `inner` — the same regexes (RE2 reads them identically) and the
    * same entity chain in the same order. */
  def duckExtractSql(inner: String): String = {
    def lit(s: String): String =
      if (s == 160.toChar.toString) "chr(160)" else "'" + s.replace("'", "''") + "'"
    val noScript = s"regexp_replace($inner, '$ScriptRe', ' ', 'g')"
    val noStyle = s"regexp_replace($noScript, '$StyleRe', ' ', 'g')"
    val noComment = s"regexp_replace($noStyle, '$CommentRe', ' ', 'g')"
    val noTags = s"regexp_replace($noComment, '$TagRe', '', 'g')"
    Entities.foldLeft(noTags) { case (e, (ent, ch)) =>
      s"replace($e, '$ent', ${lit(ch)})"
    }
  }
}
