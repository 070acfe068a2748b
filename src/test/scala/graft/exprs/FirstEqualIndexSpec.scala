package graft.exprs

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FirstEqualIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val arrs = Seq(
    (1L, Array(1L, 2L, 3L), Array(9L, 2L, 3L)), // first agree at 2
    (2L, Array(1L, 2L, 3L), Array(1L, 2L, 3L)), // agree at 1
    (3L, Array(1L, 2L, 3L), Array(9L, 8L, 7L)), // never → 0
    (4L, Array(1L, 2L, 3L), Array(9L, 8L, 3L, 1L)), // shorter length governs
    (5L, Array.empty[Long], Array(1L, 2L, 3L)) // empty → 0
  ).toDF("id", "a", "b")

  test("native expression agrees with the HOF composition it replaces") {
    val native = arrs
      .select($"id", FirstEqualIndex($"a", $"b").as("p"))
      .as[(Long, Long)].collect().toMap
    val hof = arrs
      .select($"id",
        array_position(zip_with($"a", $"b", (x, y) => x === y), lit(true)).as("p"))
      .as[(Long, Long)].collect().toMap
    assert(native === hof)
    assert(native === Map(1L -> 2L, 2L -> 1L, 3L -> 0L, 4L -> 3L, 5L -> 0L))
  }

  test("interpreted (non-codegen) eval agrees with codegen") {
    val withCodegen =
      arrs.select(FirstEqualIndex($"a", $"b").as("p")).as[Long].collect()
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interpreted =
        arrs.select(FirstEqualIndex($"a", $"b").as("p")).as[Long].collect()
      assert(withCodegen.toSeq === interpreted.toSeq)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("null input is null; rejects non-long element types") {
    val withNull = Seq((1L, Option.empty[Array[Long]], Some(Array(1L))))
      .toDF("id", "a", "b")
      .select(FirstEqualIndex($"a", $"b").as("p"))
    assert(withNull.collect()(0).isNullAt(0))
    val bad = Seq((1, Array(1.0), Array(1.0))).toDF("id", "a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      bad.select(FirstEqualIndex($"a", $"b")).collect()
    }
  }
}
