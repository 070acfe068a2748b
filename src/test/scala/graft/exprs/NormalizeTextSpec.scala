package graft.exprs

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NormalizeTextSpec extends SparkSpec {
  import spark.implicits._

  test("folds accents, case and whitespace runs to canonical form") {
    val df = Seq(
      "Café  ÜBER\tnaïve",
      "  São RÉSUMÉ Ångström  ",
      "already plain text",
      "MIXEDÉcaseéend",
      "",
      "   \t  ").toDF("t")
    val got = df.select(NormalizeText($"t")).as[String].collect()
    assert(got(0) === "cafe uber naive")
    assert(got(1) === "sao resume angstrom")
    assert(got(2) === "already plain text")
    assert(got(3) === "mixedecaseeend")
    assert(got(4) === "")
    assert(got(5) === "")
  }

  test("null in, null out") {
    val df = Seq(Some("A"), None).toDF("t")
    val got = df.select(NormalizeText($"t")).collect()
    assert(got(0).getString(0) === "a")
    assert(got(1).isNullAt(0))
  }

  test("interpreted eval matches the codegen path") {
    // force the interpreted path through the expression's eval
    val e = NormalizeText(org.apache.spark.sql.catalyst.expressions.Literal(
      org.apache.spark.unsafe.types.UTF8String.fromString("Ævar  Güntér"),
      org.apache.spark.sql.types.StringType))
    // Æ has no combining-mark decomposition — it must survive (lowercased)
    assert(e.eval(null).toString === "ævar gunter")
  }

  test("composed and decomposed input normalize identically") {
    // U+00E9 (é composed) vs U+0065 U+0301 (e + combining acute)
    val df = Seq(("café", "café")).toDF("a", "b")
    val got = df.select(NormalizeText($"a").as("a"), NormalizeText($"b").as("b"))
      .as[(String, String)].head()
    assert(got._1 === got._2 && got._1 === "cafe")
  }

  test("SQL surface: normalize_text and redact_pii registered") {
    GraftExtensions.registerAll(spark)
    val got = spark.sql(
      "SELECT normalize_text(' Crème  BRÛLÉE ') AS n, " +
        "redact_pii('mail a@b.io or 10.0.0.1') AS r").head()
    assert(got.getString(0) === "creme brulee")
    assert(got.getString(1) === "mail <EMAIL> or <IP>")
  }
}
