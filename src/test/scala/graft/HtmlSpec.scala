package graft

import org.apache.spark.sql.functions._

import graft.functions.Html

/** HTML-to-text extraction (functions/Html.scala): script/style content
  * drops, tag strip, entity decode order, pass-through of out-of-set
  * entities — the Column chain and its generated DuckDB replay share
  * one regex/entity table, so this spec pins the Scala side's exact
  * semantics. */
class HtmlSpec extends SparkSpecBase {

  private def extract(html: String): String = {
    import spark.implicits._
    Seq(html).toDF("h").select(Html.extractText(col("h")).as("t"))
      .head.getString(0)
  }

  test("script and style CONTENT is dropped, not just the tags") {
    val html = "<p>before</p><script>var a = 1 < 2 && 3 > 2;</script>" +
      "<style>p { color: red; }</style><p>after</p>"
    assert(extract(html) == "before  after")
  }

  test("bare </> comparisons inside scripts don't become fake tags") {
    // a naive one-regex strip eats "< 10 && k >" as a tag and keeps
    // the surrounding code as page text; element-drop must not
    val html = "<script>if (k < 10 && k > 0) { trackPage(k); }</script>ok"
    assert(extract(html) == " ok")
  }

  test("multi-line and attribute-bearing script/style elements drop too") {
    val html = "<script type=\"text/javascript\" src=\"x.js\">\nvar a=1;\n" +
      "var b=2;\n</script>text<STYLE media=\"print\">\nh1{}\n</STYLE>"
    assert(extract(html) == " text ")
  }

  test("the pinned entity set decodes; ampersand forms decode LAST") {
    assert(extract("a &lt;b&gt; &quot;c&quot; &apos;d&apos; &amp; e") ==
      "a <b> \"c\" 'd' & e")
    assert(extract("&#60;x&#62; &#34;y&#34; &#39;z&#39; &#38; w") ==
      "<x> \"y\" 'z' & w")
    assert(extract("n&nbsp;b") == "n" + 160.toChar + "b")
    // double-encoded: &amp;lt; is the literal text "&lt;" after ONE
    // decode pass — never "<"
    assert(extract("&amp;lt;tag&amp;gt;") == "&lt;tag&gt;")
  }

  test("comments vanish whole, even with a bare > inside") {
    assert(extract("a<!-- hidden -->b") == "a b")
    // the hazard case: a naive tag strip eats '<!-- x >' and leaves
    // ' banner -->' as fake page text
    assert(extract("a<!-- ad slot 3 > banner -->b") == "a b")
    assert(extract("<!-- multi\nline\ncomment -->x") == " x")
  }

  test("entities outside the pinned set pass through verbatim") {
    assert(extract("&#169; &copy; &euro;") == "&#169; &copy; &euro;")
  }

  test("tags strip across newlines; text on either side never fuses") {
    assert(extract("<div\nclass=\"x\">word1</div><p>word2</p>") == "word1word2")
    assert(extract("a<script>b</script>c") == "a c")
  }
}
