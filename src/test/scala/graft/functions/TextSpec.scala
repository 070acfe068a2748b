package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "el perro la casa de la madre el dia"),
    (3L, ""),
    (4L, "   spaced   out   "),
    (5L, "word")).toDF("id", "text").cache()

  test("token counts") {
    val got = docs.select($"id", Text.tokenCount($"text")).as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 9L, 2L -> 9L, 3L -> 0L, 4L -> 2L, 5L -> 1L))
  }

  test("bpe-ish token estimate ≥ word count, scales with word length") {
    val got = docs.filter($"id" === 1).select(Text.bpeTokenEstimate($"text")).as[Long].head()
    assert(got >= 9L && got <= 2 * 9L)
  }

  test("quality score in [0,1]; empty text scores low") {
    val scores = docs.select($"id", Text.qualityScore($"text")).as[(Long, Double)].collect().toMap
    assert(scores.values.forall(s => s >= 0.0 && s <= 1.0))
    assert(scores(3L) < scores(1L))
  }

  test("language id picks the language with most marker hits") {
    val markers = Map(
      "en" -> Seq("the", "and", "of"),
      "es" -> Seq("el", "la", "de"))
    val got = docs.select($"id", Text.langIdScore($"text", markers)).as[(Long, String)].collect().toMap
    assert(got(1L) === "en")
    assert(got(2L) === "es")
    assert(got(5L) === "und")
  }

  test("fingerprint and exact key are normalization-invariant") {
    val df = Seq(Tuple1("Hello World"), Tuple1("  hello world  ")).toDF("t")
    assert(df.select(Text.fingerprint(lower($"t"))).distinct().count() === 1)
    assert(df.select(Text.exactKey($"t")).distinct().count() === 1)
  }

  test("repetition score counts repeated n-gram instances exactly") {
    val df = Seq(
      "a b a b a",   // bigrams: ab ba ab ba → 4 total, 2 distinct → 0.5
      "x y z",       // all distinct → 0.0
      "w w w w",     // ww ww ww → 3 total, 1 distinct → 2/3
      "solo",        // < n tokens → 0.0
      "")            // empty → 0.0
      .toDF("t")
    val got = df.select(Text.repetitionScore($"t", 2).as("r")).as[Double].collect()
    assert(got(0) === 0.5)
    assert(got(1) === 0.0)
    assert(got(2) === 2.0 / 3.0)
    assert(got(3) === 0.0)
    assert(got(4) === 0.0)
  }
  test("pii redaction scrubs emails, ips and phones; clean text unchanged") {
    val df = Seq(
      "write to jane.doe+spam@sub.example.co.uk today",
      "server at 192.168.0.1 and 10.0.255.7 responded",
      "call +1 555 010-99 or +44 (0)20 7946 0958 now",
      "version 1.2.3 costs 12.50 at example.com shop",
      "nothing sensitive here at all").toDF("t")
    val got = df.select(Text.redactPii($"t")).as[String].collect()
    assert(got(0) === "write to <EMAIL> today")
    assert(got(1) === "server at <IP> and <IP> responded")
    assert(got(2) === "call <PHONE> or <PHONE> now")
    // dotted version/price strings and bare domains are NOT dotted quads/emails
    assert(got(3) === "version 1.2.3 costs 12.50 at example.com shop")
    assert(got(4) === "nothing sensitive here at all")
    val hits = df.select(Text.piiHits(Text.redactPii($"t"))).as[Long].collect()
    assert(hits.toSeq === Seq(1L, 2L, 2L, 0L, 0L))
  }

  test("char class ratios: exact fractions, empty text scores zero") {
    val df = Seq("ab1 c.", "").toDF("t")
    val got = df.select(
      Text.charClassRatio($"t", "[A-Za-z]").as("l"),
      Text.charClassRatio($"t", "[0-9]").as("d"),
      Text.charClassRatio($"t", " ").as("s"),
      Text.charClassRatio($"t", "[.,;:!?]").as("p"))
      .as[(Double, Double, Double, Double)].collect()
    assert(got(0) === ((3.0 / 6, 1.0 / 6, 1.0 / 6, 1.0 / 6)))
    assert(got(1) === ((0.0, 0.0, 0.0, 0.0)))
  }

  test("gopher flags: each rule trips on its own violation") {
    val fifty = (1 to 50).map(i => s"the of word$i").mkString(" ") // 150 words, clean
    val cases = Seq(
      (1L, fifty),                                   // all pass
      (2L, "the of tiny doc"),                       // wc < 50
      (3L, (1 to 60).map(_ => "xy").mkString(" ") + " the of"), // mean word < 3
      (4L, (1 to 60).map(i => s"w$i ###").mkString(" ") + " the of"), // symbols > 10%
      (5L, (1 to 60).map(i => s"1$i 2$i").mkString(" ") + " the of"), // <80% alphabetic
      (6L, (1 to 60).map(i => s"alpha beta$i").mkString(" ")))       // no stopwords
      .toDF("id", "text")
    val got = cases
      .select(col("id"), Text.gopherFlags(col("text"),
        stopwords = Seq("the", "of", "and")).as("g"))
      .select(col("id"), col("g.*"))
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(6), r.getBoolean(7)))
      .toMap // (wc_ok, mean_word_ok, symbol_ok, alpha_ok, stopword_ok)
    assert(got(1L) === ((true, true, true, true, true)))
    assert(got(2L)._1 === false)
    assert(got(3L)._2 === false)
    assert(got(4L)._3 === false)
    assert(got(5L)._4 === false)
    assert(got(6L)._5 === false)
  }

  test("gopher flags: line rules count bullet-led and ellipsis-ended lines") {
    val bullets = (1 to 10).map(i => s"- bullet line number$i").mkString("\n")
    val dots = (1 to 10).map(i => s"line number$i trails off...").mkString("\n")
    val clean = (1 to 10).map(i => s"plain line number$i").mkString("\n")
    val got = Seq((1L, bullets), (2L, dots), (3L, clean)).toDF("id", "text")
      .select(col("id"), Text.gopherFlags(col("text")).as("g"))
      .select(col("id"), col("g.bullet_ok"), col("g.ellipsis_ok"))
      .as[(Long, Boolean, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === ((false, true)))
    assert(got(2L) === ((true, false)))
    assert(got(3L) === ((true, true)))
  }
}

class AssetsSpec extends SparkSpec {
  import spark.implicits._
  import graft.etl.Assets

  test("asset parse splits amount and symbol; rejects malformed") {
    val df = Seq("12.3456 EOS", "1 TST", "-3.5 ABC", "garbage", "1.0EOS").toDF("a")
    val got = df.select(Assets.parse($"a").as("p"))
      .select($"p.amount", $"p.symbol").collect()
    assert(got(0).getDouble(0) === 12.3456 && got(0).getString(1) === "EOS")
    assert(got(1).getDouble(0) === 1.0 && got(1).getString(1) === "TST")
    assert(got(2).getDouble(0) === -3.5)
    assert(got(3).isNullAt(0) && got(4).isNullAt(0))
  }
}

class DecodeCharsetSpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.functions.Text.decodeCharset

  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("plain UTF-8 (including astral) and ASCII decode as UTF-8") {
    assert(decodeCharset("hello".getBytes("UTF-8")) === "hello")
    assert(decodeCharset("caf\u00e9 \u4e2d\u6587 \ud83d\ude00".getBytes("UTF-8")) ===
      "caf\u00e9 \u4e2d\u6587 \ud83d\ude00")
    assert(decodeCharset(Array.emptyByteArray) === "")
    assert(decodeCharset(null) === null)
  }

  test("BOMs route: UTF-8 BOM stripped, UTF-16 LE/BE flavors honored") {
    assert(decodeCharset(b(0xef, 0xbb, 0xbf) ++ "x\u00e9".getBytes("UTF-8")) === "x\u00e9")
    assert(decodeCharset(b(0xff, 0xfe) ++ "ab\u20ac".getBytes("UTF-16LE")) === "ab\u20ac")
    assert(decodeCharset(b(0xfe, 0xff) ++ "ab\u20ac".getBytes("UTF-16BE")) === "ab\u20ac")
  }

  test("invalid UTF-8 falls back to windows-1252 (NOT Latin-1 C1 controls)") {
    // 0x93 quoted 0x94, 0x85 ellipsis, 0xe9 e-acute followed by space
    assert(decodeCharset(b(0x93) ++ "q".getBytes("UTF-8") ++ b(0x94)) === "\u201cq\u201d")
    assert(decodeCharset(b(0x85)) === "\u2026")
    assert(decodeCharset("caf".getBytes("UTF-8") ++ b(0xe9, 0x20) ++ "au lait".getBytes("UTF-8")) ===
      "caf\u00e9 au lait")
  }

  test("garbage never throws: truncated UTF-16 after BOM falls back whole") {
    val odd = b(0xff, 0xfe, 0x41) // BOM + one dangling byte
    val out = decodeCharset(odd)
    assert(out != null && out.nonEmpty) // cp1252 of the raw bytes
    assert(decodeCharset(b(0xc3)) === "\u00c3") // lone UTF-8 lead byte
  }
}
