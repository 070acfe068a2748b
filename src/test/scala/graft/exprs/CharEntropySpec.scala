package graft.exprs

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CharEntropySpec extends SparkSpec {
  import spark.implicits._

  private def entropy(s: String): Double =
    Seq(s).toDF("t").select(CharEntropy($"t").as("e")).as[Double].head()

  test("empty string → 0.0; single repeated char → 0.0") {
    assert(entropy("") === 0.0)
    assert(entropy("aaaaaaaa") === 0.0)
    assert(entropy("中") === 0.0)
  }

  test("known distributions: uniform n symbols → log2(n) bits") {
    assert(math.abs(entropy("ab") - 1.0) < 1e-12)
    assert(math.abs(entropy("abcd") - 2.0) < 1e-12)
    assert(math.abs(entropy("aabb") - 1.0) < 1e-12)
    // 3/4 vs 1/4: H = 0.75·log2(4/3) + 0.25·log2(4) ≈ 0.811278
    assert(math.abs(entropy("aaab") - 0.8112781244591328) < 1e-12)
  }

  test("surrogate pairs count as ONE code point") {
    // 😀 is U+1F600 (two UTF-16 chars). "😀😀ab" = counts {😀:2, a:1, b:1}
    // over n=4 → H = 1.5; counting UTF-16 units would give n=6.
    assert(math.abs(entropy("😀😀ab") - 1.5) < 1e-12)
    // a string of one repeated astral char is zero-entropy
    assert(entropy("😀😀😀") === 0.0)
  }

  test("null propagates; codegen and interpreted paths agree") {
    val df = Seq(Some("abab"), None).toDF("t")
    val got = df.select(CharEntropy($"t").as("e")).collect()
    assert(got(0).getDouble(0) === 1.0)
    assert(got(1).isNullAt(0))
    // force the interpreted path via the expression's eval
    val e = CharEntropy(org.apache.spark.sql.GraftShim.eagerExpression(lit("abab")))
    assert(e.eval(null) === 1.0)
  }

  test("SQL surface: char_entropy registered") {
    GraftExtensions.registerAll(spark)
    val got = spark.sql("SELECT char_entropy('abcd') AS e").as[Double].head()
    assert(math.abs(got - 2.0) < 1e-12)
  }

  test("gibberish discriminates from repetition — the quality-gate signal") {
    val prose = entropy("the quick brown fox jumps over the lazy dog")
    val junk = entropy("zzzzzzzzzzzzzzzzzzzzzzzzzzzzzz")
    assert(prose > 3.0 && junk === 0.0)
  }
}
