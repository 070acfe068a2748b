package graft.exprs

import graft.SparkSpec
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.types._

/** The codegen-compiles gate: every graft expression with a `doGenCode`
  * must produce Java that Janino actually compiles. A bad codegen
  * reference (e.g. a `MODULE$` field Janino can't resolve on a Scala
  * static-forwarder class) is invisible to eval-path unit tests —
  * Spark logs the CompileException at runtime and silently falls back
  * to interpreted execution, so the bug ships through a green suite as
  * a 100 TB-scale perf defect. `GenerateUnsafeProjection.generate`
  * compiles directly with NO fallback, so a compile failure is a red
  * test here, and the compiled result must also agree with the
  * interpreted `eval` on a representative non-null input.
  */
class CodegenGateSpec extends SparkSpec {

  private def lit(v: Any, dt: DataType): Expression = Literal.create(v, dt)
  private def str(s: String): Expression = lit(s, StringType)
  private def arr(dt: DataType, vs: Any*): Expression =
    lit(vs, ArrayType(dt))

  /** Every graft expression, over representative literal inputs. */
  private val cases: Seq[(String, Expression)] = Seq(
    "AcMatches" -> AcMatches(str("abcabc the quick ab"), Seq("ab", "bc")),
    "CdcCuts" -> CdcCuts(str("the quick brown fox jumps over the lazy dog"), 8, 3),
    "CharEntropy" -> CharEntropy(str("hello entropy world")),
    "CosineSim" -> CosineSim(arr(DoubleType, 1.0, 2.0, 3.0), arr(DoubleType, 3.0, 2.0, 1.0)),
    "CosineSim float" -> CosineSim(arr(FloatType, 1.0f, 2.0f), arr(FloatType, 2.0f, 1.0f)),
    "CosineSimInt" -> CosineSimInt(arr(IntegerType, 1, 2, 3), arr(IntegerType, 3, 2, 1)),
    "CosineSimInt byte" -> CosineSimInt(arr(ByteType, 1.toByte, 2.toByte), arr(ByteType, 2.toByte, 1.toByte)),
    "FirstEqualIndex" -> FirstEqualIndex(arr(LongType, 1L, 2L, 3L), arr(LongType, 9L, 2L, 3L)),
    "FixMojibake" -> FixMojibake(str("cafÃ© rÃ©sumÃ©")),
    "GearCuts" -> GearCuts(str("the quick brown fox jumps over the lazy dog"), 3),
    "GramKeys" -> GramKeys(str("shingle me timbers"), 3),
    "HtmlEntityDecode" -> HtmlEntityDecode(str("a &amp; b &#65; &lt;c&gt;")),
    "HyperplaneBuckets" -> HyperplaneBuckets(arr(FloatType, 0.5f, -1.0f, 2.0f), 2, 4, 3),
    "LshBandKeys" -> LshBandKeys(arr(LongType, 11L, 22L, 33L, 44L), 2, 2),
    "LshBandKeys md5" -> LshBandKeys(arr(LongType, 11L, 22L, 33L, 44L), 2, 2, md5Base = true),
    "MinHashSig" -> MinHashSig(arr(StringType, "the qu", "he qui", "e quic"), 8),
    "MinHashSig md5" -> MinHashSig(arr(StringType, "the qu", "he qui"), 4, md5Base = true),
    "NearestCentroid" -> NearestCentroid(arr(DoubleType, 0.9, 0.1),
      Seq(7, 8), Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))),
    "NfcNormalize" -> NfcNormalize(str("éclair")),
    "NormalizeText" -> NormalizeText(str("  The  QUICK   brown\tfox ")),
    "PhraseHits" -> PhraseHits(str("the quick brown fox the quick"), Seq("the", "quick")),
    "PqCodes" -> PqCodes(arr(DoubleType, 0.1, 0.9, 0.8, 0.2),
      Array(Array(Array(0.0, 1.0), Array(1.0, 0.0)), Array(Array(0.5, 0.5), Array(0.9, 0.1)))),
    "Shingles" -> Shingles(str("the quick brown"), 3),
    "SimHash64" -> SimHash64(arr(StringType, "the qu", "he qui", "e quic")),
    "SuffixLcp ascii" -> SuffixLcp(str("banana"), lit(1L, LongType), str("ananas"), lit(0L, LongType)),
    "SuffixLcp unicode" -> SuffixLcp(str("bánana"), lit(1L, LongType), str("ánanas"), lit(0L, LongType)),
    "WikitextStrip" -> WikitextStrip(str("'''Bold''' [[link|text]] {{tmpl}} end")),
    "WinnowKeys" -> WinnowKeys(str("the quick brown fox jumps"), 3, 4)
  )

  for ((name, expr) <- cases) {
    test(s"codegen gate: $name compiles and agrees with interpreted eval") {
      assert(expr.checkInputDataTypes().isSuccess,
        s"$name: bad test fixture types: ${expr.checkInputDataTypes()}")
      // Direct Janino compile — throws on invalid generated Java, no
      // interpreted fallback (unlike UnsafeProjection.create).
      val proj = GenerateUnsafeProjection.generate(Seq(expr))
      val row = proj(InternalRow.empty)
      val fromCodegen = CatalystTypeConverters.convertToScala(
        row.get(0, expr.dataType), expr.dataType)
      val fromEval = CatalystTypeConverters.convertToScala(
        expr.eval(InternalRow.empty), expr.dataType)
      assert(fromCodegen === fromEval, s"$name: codegen != interpreted")
    }
  }
}
