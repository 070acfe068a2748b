package graft.exprs

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** NFC canonical composition: decomposed sequences compose, NFC input
  * is an identity fast path, and the expression stays codegen'd.
  */
class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def nfc(s: String): String =
    NfcNormalize.nfc(UTF8String.fromString(s)).toString

  test("composes decomposed sequences; NFC input passes through") {
    assert(nfc("e\u0301cole") === "\u00e9cole")
    assert(nfc("a\u030angstro\u0308m") === "\u00e5ngstr\u00f6m")
    assert(nfc("plain ascii") === "plain ascii")
    assert(nfc("\u00e9 already composed") === "\u00e9 already composed")
    assert(nfc("") === "")
    // exact-dedup keys split without it: the two spellings md5 apart
    assert("e\u0301" != "\u00e9" && nfc("e\u0301") === nfc("\u00e9"))
  }

  test("column expression composes inside codegen; null-safe") {
    val out = spark.range(5)
      .select(NfcNormalize(concat(lit("e\u0301cole "), $"id".cast("string"))).as("t"))
    assert(out.where($"t".startsWith("\u00e9cole")).count() === 5)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[nfcnormalize.*"),
      s"not codegen'd:\n$plan")
    val n = Seq((1L, null: String)).toDF("id", "t")
      .select(NfcNormalize($"t")).collect()
    assert(n(0).isNullAt(0))
  }
}
