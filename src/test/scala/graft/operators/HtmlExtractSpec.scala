package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HTML extraction chain invariants beyond the analytic-oracle query:
  * edge entities, block structure, and the documented subset bounds.
  */
class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("h").select(HtmlExtract.text($"h")).as[String].head()

  test("script bodies with embedded tags and comparisons die whole") {
    val t = extract(
      "<body><script>if (a < b) { s = \"</p><p>\"; }</script><p>kept</p></body>")
    assert(t === "kept")
  }

  test("block tags structure lines; inline tags vanish inline") {
    val t = extract(
      "<body><h1>Head</h1><ul><li>one</li><li>two</li></ul><p>a <b>bold</b> word</p></body>")
    assert(t === "Head\none\ntwo\na bold word")
  }

  test("entity decode: double-encoded stays single-decoded, nbsp is a space") {
    val t = extract("<p>&amp;lt; literal &nbsp; x &#39;q&#39; &quot;y&quot;</p>")
    assert(t === "&lt; literal x 'q' \"y\"")
  }

  test("title: entity-decoded, squeezed, trimmed; absent title is empty") {
    val rows = Seq(
      "<head><title>  A &amp; B\n  C </title></head>",
      "<head></head>")
      .toDF("h").select(HtmlExtract.title($"h")).as[String].collect()
    assert(rows(0) === "A & B\nC" || rows(0) === "A & B C")
    assert(rows(1) === "")
  }

  test("links: in order, href values only") {
    val ls = Seq("""<a href="https://x/1">a</a><p/><a class="z" href="https://x/2">b</a>""")
      .toDF("h").select(HtmlExtract.links($"h")).as[Seq[String]].head()
    assert(ls === Seq("https://x/1", "https://x/2"))
  }

  test("plain text passes through unchanged (idempotent on non-HTML)") {
    assert(extract("just words, no markup") === "just words, no markup")
  }

  test("numeric charrefs: decimal, hex (both X casings), C1 remap, NBSP, shy") {
    val t = extract("<p>it&#8217;s &#x2019;q&#X2019; &#146;w a&#160;b &shy;c&#173;d</p>")
    assert(t === "it’s ’q’ ’w a b cd")
  }

  test("guarded-invalid references stay byte-for-byte literal") {
    val t = extract(
      "<p>&#xD800; &#0; &#1114112; &#x110000; &#999999999; &# ; &#x; &unknown; &zz &frac12</p>")
    assert(t ===
      "&#xD800; &#0; &#1114112; &#x110000; &#999999999; &# ; &#x; &unknown; &zz &frac12")
  }

  test("single-pass decode: &amp;#8217; yields the literal reference text") {
    // the HTML semantics: the replacement is never rescanned
    assert(extract("<p>&amp;#8217; &amp;amp; &amp;euro;</p>") ===
      "&#8217; &amp; &euro;")
  }

  test("high-frequency named entities decode; euro, fractions, accents") {
    val t = extract(
      "<p>&mdash;&ndash; &hellip; &copy;&reg;&trade; &euro;5 &frac12; caf&eacute; &laquo;q&raquo;</p>")
    assert(t ===
      "—– … ©®™ €5 ½ café «q»")
  }
}
