package graft.exprs

import graft.SparkSpec
import graft.functions.Sim
import org.apache.spark.sql.functions._

/** MinHashSig must equal the composable HOF formula bit-for-bit — it
  * exists purely as the fused fast path, never as different semantics.
  */
class MinHashSigSpec extends SparkSpec {
  import spark.implicits._

  private val h = 64

  test("matches the HOF minhash formula on real token arrays") {
    val docs = Seq(
      (1L, "spark query table scan merge join filter group"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "a"), (4L, "unicode tøkens ünïcode 漢字 emoji"),
      (5L, "repeated repeated repeated repeated"))
      .toDF("id", "text")
      .select($"id", split($"text", " ").as("toks"))
    val both = docs.select(
      MinHashSig($"toks", h).as("fused"),
      Sim.minHash($"toks", h).as("hof"))
    assert(both.filter(not($"fused" <=> $"hof")).count() === 0)
  }

  test("empty token array yields the HOF's all-null signature") {
    val docs = Seq(Tuple1(Seq.empty[String])).toDF("toks")
    val fused = docs.select(MinHashSig($"toks", h).as("f")).head().getSeq[Any](0)
    val hof = docs.select(Sim.minHash($"toks", h).as("f")).head().getSeq[Any](0)
    assert(fused.length === h && fused.forall(_ == null))
    assert(fused === hof)
  }

  test("null tokens hash like xxhash64's null (seed), matching the HOF") {
    val docs = Seq(Tuple1(Seq[String]("alpha", null, "beta")))
      .toDF("toks")
    val both = docs.select(
      MinHashSig($"toks", h).as("fused"), Sim.minHash($"toks", h).as("hof"))
      .head()
    assert(both.getSeq[Long](0) === both.getSeq[Long](1))
  }

  test("interpreted eval equals codegen output") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val tokenSets = Seq(
      Seq("spark", "query", "table"), Seq("x"), Seq("a", "b", "c", "d", "e"))
    val viaCodegen = tokenSets.toDF("toks")
      .select(MinHashSig($"toks", h).as("s")).collect().map(_.getSeq[Long](0))
    val viaEval = tokenSets.map { ts =>
      MinHashSig(Literal.create(ts, ArrayType(StringType)), h)
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSeq
    }
    assert(viaCodegen.map(_.toSeq).toSeq === viaEval)
  }

  test("md5Base mode matches an independent MessageDigest computation") {
    // independent evaluator: no shared code with Md5Draw
    def draw(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16)
    }
    val p = 2147483647L
    def expected(toks: Seq[String], n: Int): Seq[Long] =
      (0 until n).map { j =>
        val a = (2654435761L * (j + 1) + 40503L) % (p - 1) + 1
        val b = (1103515245L * (j + 1) + 12345L) % p
        toks.map(t => ((draw(t) % p) * a + b) % p).min
      }
    val toks = Seq("spark", "query", "tøkens", "漢字", "😀")
    val got = Seq(Tuple1(toks)).toDF("toks")
      .select(MinHashSig($"toks", 16, md5Base = true).as("s"))
      .head().getSeq[Long](0)
    assert(got === expected(toks, 16))
  }

  test("md5Base: interpreted eval equals codegen output") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val ts = Seq("alpha", "beta", "漢字")
    val viaCodegen = Seq(Tuple1(ts)).toDF("toks")
      .select(MinHashSig($"toks", 8, md5Base = true).as("s"))
      .head().getSeq[Long](0)
    val viaEval = MinHashSig(Literal.create(ts, ArrayType(StringType)), 8, md5Base = true)
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq
    assert(viaCodegen === viaEval)
  }

  test("rejects non-string arrays at analysis") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(Tuple1(Seq(1L, 2L))).toDF("toks")
        .select(MinHashSig($"toks", h)).collect()
    }
    assert(e.getMessage.contains("minhash_sig"))
  }
}
