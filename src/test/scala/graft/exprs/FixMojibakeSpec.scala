package graft.exprs

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop}

/** Mojibake repair: exact inverses for one and two layers of
  * UTF-8-read-as-Latin-1, conservative fixed points for everything
  * else, strict UTF-8 gating, and the no-UDF codegen plan.
  */
class FixMojibakeSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, min: Int = 60): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(min), p)
    assert(res.passed, res.status.toString)
  }

  private def mojibake(s: String): String =
    new String(s.getBytes("UTF-8"), "ISO-8859-1")

  private def fix(s: String): String =
    Mojibake.fix(UTF8String.fromString(s)).toString

  test("repairs one and two layers; leaves clean text alone") {
    val clean = Seq(
      "plain ascii only",
      "café au lait", // real Latin-1-range text: é alone must NOT repair
      "№ 42 — em-dash and numero", // chars > 0xFF prove non-mojibake
      "日本語テキスト",
      "")
    for (s <- clean if s.nonEmpty) {
      if (s.exists(_ > 0xff) || s.forall(_ < 0x80))
        assert(fix(s) === s, s"clean '$s' must be a fixed point")
    }
    // 'café au lait': é = 0xE9 is NOT a valid UTF-8 lead for the
    // following ' ' — strict validation refuses, so it passes through
    assert(fix("café au lait") === "café au lait")

    for (s <- Seq("café №9", "résumé — ünïcode", "Ω≈ç√∫", "中文 mixed ascii")) {
      assert(fix(mojibake(s)) === s, s"single mojibake of '$s'")
      assert(fix(mojibake(mojibake(s))) === s, s"double mojibake of '$s'")
    }
  }

  test("strict UTF-8 gate: overlongs, surrogates, bare continuations refuse") {
    // overlong '/' (C0 AF) as Latin-1 chars
    assert(fix("\u00c0\u00af") === "\u00c0\u00af")
    // CESU-style surrogate encoding (ED A0 80)
    assert(fix("\u00ed\u00a0\u0080") === "\u00ed\u00a0\u0080")
    // bare continuation byte
    assert(fix("\u0080abc") === "\u0080abc")
    // past U+10FFFF (F4 90 80 80)
    assert(fix("\u00f4\u0090\u0080\u0080") === "\u00f4\u0090\u0080\u0080")
    // truncated multibyte at end
    assert(fix("ok\u00c3") === "ok\u00c3")
  }

  test("column expression repairs inside whole-stage codegen (no UDF)") {
    val df = Seq(
      (1L, mojibake("café №1")),
      (2L, "plain"),
      (3L, mojibake(mojibake("Ω two layers")))
    ).toDF("id", "t")
    val out = df.select($"id", FixMojibake($"t").as("fixed"))
    val got = out.orderBy("id").as[(Long, String)].collect()
    assert(got(0)._2 === "café №1")
    assert(got(1)._2 === "plain")
    assert(got(2)._2 === "Ω two layers")
    // plan lock on a non-foldable source (a local Seq const-folds away)
    val live = spark.range(10)
      .select(FixMojibake(concat(lit("caf\u00c3\u00a9 nr "), $"id".cast("string"))).as("f"))
    assert(live.where($"f".startsWith("café")).count() === 10)
    val plan = live.queryExecution.executedPlan.toString
    // "*(n)" is the WholeStageCodegen marker in the compact plan string
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[fixmojibake.*"),
      s"fixmojibake not inside a codegen'd Project:\n$plan")
    assert(!plan.toLowerCase.contains("batchevalpython") && !plan.contains("ScalaUDF"))
    // null passes through as null
    val n = Seq((1L, null: String)).toDF("id", "t")
      .select(FixMojibake($"t")).collect()
    assert(n(0).isNullAt(0))
  }

  test("property: fix ∘ mojibake = identity for text with a >U+00FF witness") {
    val genStr = for {
      n <- Gen.chooseNum(1, 60)
      cs <- Gen.listOfN(n, Gen.frequency(
        6 -> Gen.alphaNumChar,
        2 -> Gen.oneOf('é', 'ü', 'ß', 'ñ', 'ç'),
        2 -> Gen.oneOf('№', '—', 'Ω', '中', '中')))
    } yield cs.mkString + "№" // the witness char proves the original clean
    check(Prop.forAll(genStr) { s =>
      fix(mojibake(s)) == s && fix(s) == s
    })
  }
}
