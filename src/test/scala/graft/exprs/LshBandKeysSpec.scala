package graft.exprs

import graft.SparkSpec
import graft.functions.Sim
import org.apache.spark.sql.functions._

/** LshBandKeys must equal the HOF banding formula bit-for-bit — it
  * exists purely as the fused fast path, never as different semantics.
  */
class LshBandKeysSpec extends SparkSpec {
  import spark.implicits._

  private val bands = 16
  private val rows = 4

  test("matches the HOF band-bucket formula on real signatures") {
    val docs = Seq(
      (1L, "spark query table scan merge join filter group sort window"),
      (2L, "the quick brown fox jumps over the lazy dog again"),
      (3L, "short text"), (4L, "unicode tøkens 漢字 emoji"))
      .toDF("id", "text")
      .select($"id", MinHashSig(Shingles($"text", 2), bands * rows).as("sig"))
    val both = docs.select(
      LshBandKeys($"sig", bands, rows).as("fused"),
      transform(Sim.lshBands($"sig", bands, rows), x => x("bucket")).as("hof"))
    assert(both.filter(not($"fused" <=> $"hof")).count() === 0)
  }

  test("all-null signature (empty doc) keys every band like the HOF") {
    // an empty token array signs to all nulls; array_join skips nulls so
    // every band keys at "b_" — the documented empty-text skew
    val docs = Seq(Tuple1("")).toDF("text")
      .select(MinHashSig(Shingles($"text", 3), bands * rows).as("sig"))
    val r = docs.select(
      LshBandKeys($"sig", bands, rows).as("fused"),
      transform(Sim.lshBands($"sig", bands, rows), x => x("bucket")).as("hof"))
      .head()
    assert(r.getSeq[Long](0) === r.getSeq[Long](1))
  }

  test("interpreted eval equals codegen output") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val sig = (1L to (bands * rows)).map(_ * 7919L)
    val viaCodegen = Seq(Tuple1(sig)).toDF("sig")
      .select(LshBandKeys($"sig", bands, rows).as("k")).head().getSeq[Long](0)
    val viaEval = LshBandKeys(
      Literal.create(sig, ArrayType(LongType)), bands, rows)
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq
    assert(viaCodegen === viaEval)
  }

  test("md5Base mode: bucket = md5 draw of the same key string, eval ≡ codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType}
    def draw(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16)
    }
    val sig = Seq(11L, 22L, 33L, 44L, 55L, 66L, 77L, 88L)
    val expected = (0 until 4).map(b =>
      draw(s"${b}_${sig(b * 2)}_${sig(b * 2 + 1)}"))
    val viaCodegen = Seq(Tuple1(sig)).toDF("sig")
      .select(LshBandKeys($"sig", 4, 2, md5Base = true).as("k"))
      .head().getSeq[Long](0)
    val viaEval = LshBandKeys(
      Literal.create(sig, ArrayType(LongType)), 4, 2, md5Base = true)
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq
    assert(viaCodegen === expected)
    assert(viaEval === expected)
  }
}
