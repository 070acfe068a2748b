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
}
