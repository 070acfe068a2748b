package graft.exprs

import graft.SparkSpec
import graft.functions.Sim
import org.apache.spark.sql.functions._

/** SimHash64 must equal the composable HOF formula bit-for-bit — it
  * exists purely as the fused fast path, never as different semantics.
  */
class SimHash64Spec extends SparkSpec {
  import spark.implicits._

  test("matches the HOF simhash formula on real token arrays") {
    val docs = Seq(
      (1L, "spark query table scan merge join filter group"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "a"), (4L, "unicode tøkens ünïcode 漢字 emoji"),
      (5L, "repeated repeated repeated repeated"),
      (6L, "x y"))
      .toDF("id", "text")
      .select($"id", split($"text", " ").as("toks"))
    val both = docs.select(
      SimHash64($"toks").as("fused"), Sim.simHash($"toks").as("hof"))
    assert(both.filter($"fused" =!= $"hof").count() === 0)
  }

  test("empty token array gives 0L, matching the HOF all-votes-lose") {
    val docs = Seq(Tuple1(Seq.empty[String])).toDF("toks")
    val fused = docs.select(SimHash64($"toks")).head().getLong(0)
    val hof = docs.select(Sim.simHash($"toks")).head().getLong(0)
    assert(fused === 0L && fused === hof)
  }

  test("null tokens hash like xxhash64's null, matching the HOF") {
    val docs = Seq(Tuple1(Seq[String]("alpha", null, null))).toDF("toks")
    val r = docs.select(SimHash64($"toks").as("f"), Sim.simHash($"toks").as("h")).head()
    assert(r.getLong(0) === r.getLong(1))
  }

  test("interpreted eval equals codegen output") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val tokenSets = Seq(Seq("spark", "query"), Seq("x"), Seq("a", "b", "c"))
    val viaCodegen = tokenSets.toDF("toks")
      .select(SimHash64($"toks").as("s")).collect().map(_.getLong(0))
    val viaEval = tokenSets.map { ts =>
      SimHash64(Literal.create(ts, ArrayType(StringType))).eval(null)
        .asInstanceOf[Long]
    }
    assert(viaCodegen.toSeq === viaEval)
  }
}
