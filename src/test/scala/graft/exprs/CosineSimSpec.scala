package graft.exprs

import graft.SparkSpec
import graft.functions.Sim
import org.apache.spark.sql.functions._

class CosineSimSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f), Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (4L, Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f))
  ).toDF("id", "a", "b")

  test("native expression agrees with the HOF composition") {
    val native = vecs.select($"id", CosineSim($"a", $"b").as("c"))
    val hof = vecs.filter($"id" =!= 4) // HOF path divides by zero norm → NaN
      .select($"id", Sim.cosine($"a", $"b").as("c"))
    val n = native.as[(Long, Double)].collect().toMap
    val h = hof.as[(Long, Double)].collect().toMap
    h.foreach { case (id, v) => assert(math.abs(n(id) - v) < 1e-12) }
    assert(n(1L) === 1.0 && n(2L) === 0.0 && n(4L) === 0.0)
    assert(math.abs(n(3L) - (32.0 / (math.sqrt(14) * math.sqrt(77)))) < 1e-12)
  }

  test("interpreted (non-codegen) eval agrees with codegen") {
    val withCodegen = vecs.select(CosineSim($"a", $"b").as("c")).as[Double].collect()
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interpreted = vecs.select(CosineSim($"a", $"b").as("c")).as[Double].collect()
      assert(withCodegen.toSeq === interpreted.toSeq)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("length mismatch and nulls → null") {
    val df = Seq(
      (1L, Some(Array(1.0f, 2.0f)), Some(Array(1.0f))),
      (2L, None, Some(Array(1.0f)))
    ).toDF("id", "a", "b")
    val out = df.select(CosineSim($"a", $"b")).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("mixed float/double arrays work") {
    val df = Seq((Array(1.0f, 2.0f), Array(1.0, 2.0))).toDF("a", "b")
    assert(math.abs(df.select(CosineSim($"a", $"b")).as[Double].head() - 1.0) < 1e-12)
  }

  test("SQL registration via GraftExtensions-style injection") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSim(exprs(0), exprs(1)), "built-in")
    vecs.createOrReplaceTempView("v")
    val got = spark.sql("SELECT cosine_sim(a, b) FROM v WHERE id = 1").as[Double].head()
    assert(got === 1.0)
  }
}
