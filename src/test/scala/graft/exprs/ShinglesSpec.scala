package graft.exprs

import graft.SparkSpec
import graft.functions.Sim
import org.apache.spark.sql.functions._

/** Shingles must equal the composable HOF formula bit-for-bit — it
  * exists purely as the fused fast path, never as different semantics.
  */
class ShinglesSpec extends SparkSpec {
  import spark.implicits._

  private val edgeTexts = Seq(
    "spark query table scan merge join",
    "  leading and trailing   spaces  ",
    "multi   internal     runs",
    "a", "a b", "",
    "repeated repeated repeated repeated",
    "unicode tøkens 漢字 emoji ünïcode",
    "the the the and and of")

  test("matches the HOF shingle formula for n = 1, 2, 3") {
    val docs = edgeTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    for (n <- Seq(1, 2, 3)) {
      val both = docs.select(
        Shingles($"text", n).as("fused"), Sim.shingles($"text", n).as("hof"))
      assert(both.filter(not($"fused" <=> $"hof")).count() === 0,
        s"mismatch at n=$n")
    }
  }

  test("null text yields null, short text yields empty array") {
    val docs = Seq((1L, Some("a b")), (2L, None)).toDF("id", "text")
    val out = docs.select($"id", Shingles($"text", 3).as("s")).collect()
    assert(out.find(_.getLong(0) == 2L).get.isNullAt(1))
    assert(out.find(_.getLong(0) == 1L).get.getSeq[String](1) === Seq.empty)
  }

  test("interpreted eval equals codegen output") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val viaCodegen = edgeTexts.toDF("text")
      .select(Shingles($"text", 2).as("s")).collect().map(_.getSeq[String](0))
    val viaEval = edgeTexts.map { t =>
      Shingles(Literal(t), 2).eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq
    }
    assert(viaCodegen.map(_.toSeq).toSeq === viaEval)
  }
}
