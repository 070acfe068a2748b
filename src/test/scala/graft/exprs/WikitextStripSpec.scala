package graft.exprs

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Wikitext strip: every documented grammar rule has a witness, the
  * adversarial nesting/unterminated edges are pinned, and the plan
  * stays inside whole-stage codegen (no UDF).
  */
class WikitextStripSpec extends SparkSpec {
  import spark.implicits._

  private def st(s: String): String =
    Wikitext.strip(UTF8String.fromString(s)).toString

  test("templates drop, nested and unterminated") {
    assert(st("a {{cite|x={{inner|1}}|y=2}} b") === "a  b")
    assert(st("a {{never closed tail") === "a ")
    assert(st("{{t}}{{u}}done") === "done")
    // stray }} with no opener is literal
    assert(st("a }} b") === "a }} b")
  }

  test("comments drop, unterminated drops tail") {
    assert(st("a<!-- hidden -->b") === "ab")
    assert(st("a<!-- torn") === "a")
  }

  test("wiki links: plain, labeled, nested label markup, namespaces") {
    assert(st("see [[Main Page]]") === "see Main Page")
    assert(st("see [[Main Page|the main page]]") === "see the main page")
    // label is itself stripped
    assert(st("[[X|''label'']]") === "label")
    // File links drop whole, including nested caption links
    assert(st("a[[File:Pic.png|thumb|a [[Nested|n]] caption]]b") === "ab")
    assert(st("a[[Image:p.jpg]]b[[Category:Things]]c") === "abc")
    // case-insensitive namespace
    assert(st("[[file:x.png|cap]]") === "")
    // colon in the TITLE (not a dropped ns) keeps the link text
    assert(st("[[Dr. Who: Special|special]]") === "special")
    // unterminated [[ is a literal bracket pair start
    assert(st("a [[torn") === "a [[torn")
  }

  test("external links: labeled keeps label, bare drops, non-scheme literal") {
    assert(st("go [http://e.org/x the site] now") === "go the site now")
    assert(st("go [https://e.org] now") === "go  now")
    assert(st("go [//cdn.e.org proto] now") === "go proto now")
    assert(st("array[3] stays") === "array[3] stays")
  }

  test("tags: ref/gallery islands drop content, plain tags drop tag only") {
    assert(st("fact<ref name=\"a\">cite {{tmpl}}</ref>.") === "fact.")
    assert(st("fact<ref name=x/>.") === "fact.")
    assert(st("a<gallery>F:1.png\nF:2.png</gallery>b") === "ab")
    assert(st("<math>\\sum x</math>done") === "done")
    assert(st("a <b>bold</b> text") === "a bold text")
    // nowiki drops tags only; its content flows through the normal
    // scan, so markup inside still strips (documented honest subset)
    assert(st("<nowiki>'''kept'''</nowiki>") === "kept")
    assert(st("x < y and 2<3") === "x < y and 2<3")
    assert(st("a<ref>unterminated island") === "a")
    // full-token close match: </reflist> must NOT terminate a <ref>
    // island (prefix of a longer closing tag), the real one must
    assert(st("a<ref>x</reflist>y</ref>b") === "ab")
    assert(st("a<ref attr=1>x</ref more>b") === "ab")
    // a prefix-only close with no real terminator = unterminated
    assert(st("a<ref>x</refx>tail") === "a")
    assert(st("a<ref>x</ref") === "a")
  }

  test("emphasis runs") {
    assert(st("'''''bi''''' '''b''' ''i''") === "bi b i")
    assert(st("it's fine") === "it's fine")
    assert(st("''''four'''' ") === "'four' ")
  }

  test("line grammar: headings, lists, rules, tables") {
    assert(st("== Heading ==\nbody") === "Heading\nbody")
    assert(st("=== '''Deep''' ===\n") === "Deep\n")
    assert(st("* item one\n# item two\n:: indented\nplain") ===
      "item one\nitem two\nindented\nplain")
    assert(st("----\nafter") === "\nafter")
    assert(st("before\n{| class=\"wikitable\"\n|-\n| a || b\n|}\nafter") ===
      "before\n\nafter")
    // nested table
    assert(st("{| t\n|-\n{| inner\n|}\n|}\nafter") === "\nafter")
    // unterminated table drops tail
    assert(st("{| torn\n| row\nafter-ish") === "")
    // mid-line {| is NOT a table (grammar requires line start)
    assert(st("a {| b") === "a {| b")
  }

  test("composition witness: the fixture wrapper shape") {
    val id = 42L
    val text = "value table scan"
    val wiki =
      s"{{Infobox doc|id=$id}}\n== Doc $id ==\n'''$text''' and [[Doc ${id - 1}|prev]]" +
        s"[[Category:src2]]<ref>cite $id</ref>\n* item $id\n[http://e.org/$id ext$id]\n"
    val got = st(wiki).replaceAll("\\s+", " ").trim
    assert(got === s"Doc $id $text and prev item $id ext$id")
  }

  test("column expression stays codegen (no UDF) and null-safe") {
    val df = Seq(("a", "'''x'''"), ("b", null)).toDF("k", "w")
      .select(col("k"), WikitextStrip(col("w")).as("t"))
    val rows = df.orderBy("k").collect()
    assert(rows(0).getString(1) === "x")
    assert(rows(1).isNullAt(1))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }
}
