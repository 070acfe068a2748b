package graft.exprs

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop}

/** HTML character-reference decoding: numeric guards, the HTML5 C1
  * remap, single-pass (no rescan) semantics, corpus normalizations
  * (NBSP→space, shy→drop), and the no-UDF codegen plan.
  */
class HtmlEntitiesSpec extends SparkSpec {
  import spark.implicits._

  private def dec(s: String): String =
    HtmlEntities.decode(UTF8String.fromString(s)).toString

  test("decimal and hex references decode; both x casings; astral plane") {
    assert(dec("it&#8217;s") === "it’s")
    assert(dec("&#x2019;&#X2019;") === "’’")
    assert(dec("&#65;&#x41;") === "AA")
    // astral plane (𝄞 U+1D11E) via surrogate-pair appendCodePoint
    assert(dec("&#x1D11E;") === new String(Character.toChars(0x1d11e)))
    assert(dec("&#128512;") === new String(Character.toChars(0x1f600)))
  }

  test("guards: NUL, surrogates, out-of-plane, overlong digits, no terminator") {
    for (bad <- Seq("&#0;", "&#xD800;", "&#xDFFF;", "&#1114112;", "&#x110000;",
      "&#999999999;", "&#xFFFFFFFFF;", "&#;", "&#x;", "&#12", "&#x12 ;"))
      assert(dec(bad) === bad, s"'$bad' must stay literal")
  }

  test("HTML5 C1 remap: &#146; is a smart quote, &#128; is the euro") {
    assert(dec("&#146;") === "’")
    assert(dec("&#145;&#147;&#148;") === "‘“”")
    assert(dec("&#128;") === "€")
    assert(dec("&#150;&#151;") === "–—")
    // the five unmapped C1 points pass through as themselves
    assert(dec("&#129;") === "\u0081")
    assert(dec("&#157;") === "\u009d")
  }

  test("corpus normalizations: NBSP (named + numeric) → space, shy → dropped") {
    assert(dec("a&nbsp;b&#160;c&#xA0;d") === "a b c d")
    assert(dec("e&shy;f&#173;g&#xAD;h") === "efgh")
  }

  test("single pass: replacements are never rescanned") {
    assert(dec("&amp;lt;") === "&lt;")
    assert(dec("&amp;amp;") === "&amp;")
    assert(dec("&amp;#8217;") === "&#8217;")
  }

  test("unknown names, bare ampersands, and truncated refs stay literal") {
    for (s <- Seq("&unknown;", "&zz", "a & b", "&", "&;", "&frac12", "100 & 200"))
      assert(dec(s) === s, s"'$s' must stay literal")
    assert(dec("&frac12;") === "½")
  }

  test("column expression decodes inside whole-stage codegen (no UDF)") {
    val live = spark.range(10)
      .select(HtmlEntityDecode(
        concat(lit("n&#8217;"), $"id".cast("string"), lit("&euro;"))).as("t"))
    assert(live.where($"t".startsWith("n’")).count() === 10)
    val plan = live.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[htmlentitydecode.*"),
      s"htmlentitydecode not inside a codegen'd Project:\n$plan")
    assert(!plan.toLowerCase.contains("batchevalpython") && !plan.contains("ScalaUDF"))
    val n = Seq((1L, null: String)).toDF("id", "t")
      .select(HtmlEntityDecode($"t")).collect()
    assert(n(0).isNullAt(0))
  }

  test("property: entity-free text is a fixed point; encode∘decode on digits") {
    val genFree = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 1 -> Gen.oneOf(' ', '.', ';', '#'),
      1 -> Gen.oneOf('é', '中', '’'))).map(_.mkString)
    val p1 = Prop.forAll(genFree) { s => dec(s) == s }
    // any valid non-special BMP code point round-trips through &#N;
    val genCp = Gen.chooseNum(32, 0xd7ff).suchThat(c =>
      c != 160 && c != 173 && !(c >= 0x80 && c <= 0x9f))
    val p2 = Prop.forAll(genCp) { c => dec(s"&#$c;") == c.toChar.toString }
    for (p <- Seq(p1, p2)) {
      val res = org.scalacheck.Test.check(
        org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(80), p)
      assert(res.passed, res.status.toString)
    }
  }
}
