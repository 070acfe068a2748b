package graft.exprs

import graft.SparkSpec
import graft.functions.Sim
import org.apache.spark.sql.functions._

/** HyperplaneBuckets must equal the composable HOF formula bit-for-bit —
  * it exists purely as the fused fast path, never as different semantics.
  */
class HyperplaneBucketsSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  private val tables = 3
  private val planes = 5

  private def hofBuckets(vecCol: String) =
    array((0 until tables).map { t =>
      (0 until planes).map { pl =>
        val proj = Sim.dot(col(vecCol),
          array((0 until dim).map { i =>
            lit(math.sin(1.0 + t * 97.0 + pl * 31.0 + i * 7.0))
          }: _*))
        when(proj >= 0, shiftleft(lit(1L), pl)).otherwise(lit(0L))
      }.reduce((x, y) => x.bitwiseOR(y))
    }: _*)

  test("matches the HOF hyperplane formula on float vectors") {
    val vecs = (0 until 50).map { k =>
      (k.toLong, (0 until dim).map(i => math.sin(k * 13.0 + i).toFloat))
    }.toDF("id", "v")
    val both = vecs.select(
      HyperplaneBuckets(col("v"), tables, planes, dim).as("fused"),
      hofBuckets("v").as("hof"))
    assert(both.filter(col("fused") =!= col("hof")).count() === 0)
  }

  test("interpreted eval equals codegen output") {
    val vecs = (0 until 20).map { k =>
      (k.toLong, (0 until dim).map(i => math.cos(k * 7.0 + i * 3.0)))
    }.toDF("id", "v")
    val fused = vecs.select(HyperplaneBuckets(col("v"), tables, planes, dim).as("b"))
    val collected = fused.collect().map(_.getSeq[Long](0))
    // interpreted path: eval the expression over a typed literal child
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val rows = (0 until 20).map { k =>
      val lit = Literal.create(
        (0 until dim).map(i => math.cos(k * 7.0 + i * 3.0)),
        ArrayType(DoubleType))
      HyperplaneBuckets(lit, tables, planes, dim)
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSeq
    }
    assert(collected.map(_.toSeq).toSeq === rows)
  }

  test("SQL registration via GraftExtensions-style injection") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hyperplane_buckets",
      exprs => HyperplaneBuckets(exprs(0),
        exprs(1).asInstanceOf[Literal].value.toString.toInt,
        exprs(2).asInstanceOf[Literal].value.toString.toInt,
        exprs(3).asInstanceOf[Literal].value.toString.toInt),
      "built-in")
    Seq((1L, Seq(1.0, -1.0, 0.5, 0.25))).toDF("id", "v")
      .createOrReplaceTempView("hb_v")
    val got = spark.sql(
      s"SELECT hyperplane_buckets(v, $tables, $planes, 4) FROM hb_v")
      .head().getSeq[Long](0)
    assert(got.length === tables)
  }

  test("integral element types read correctly (same buckets as double)") {
    val asInt = Seq((1L, Seq(3, -2, 5, 0, 7, -1, 4, -6))).toDF("id", "v")
    val asDouble = Seq((1L, Seq(3.0, -2.0, 5.0, 0.0, 7.0, -1.0, 4.0, -6.0)))
      .toDF("id", "v")
    val bInt = asInt.select(HyperplaneBuckets(col("v"), tables, planes, 8).as("b"))
      .head().getSeq[Long](0)
    val bDouble = asDouble.select(HyperplaneBuckets(col("v"), tables, planes, 8).as("b"))
      .head().getSeq[Long](0)
    assert(bInt === bDouble)
    val asLong = Seq((1L, Seq(3L, -2L, 5L, 0L, 7L, -1L, 4L, -6L))).toDF("id", "v")
    assert(asLong.select(HyperplaneBuckets(col("v"), tables, planes, 8).as("b"))
      .head().getSeq[Long](0) === bDouble)
  }

  test("array<decimal> is rejected at analysis, never silently misread") {
    val dec = Seq((1L, Seq(BigDecimal(1.5), BigDecimal(-2.5)))).toDF("id", "v")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      dec.select(HyperplaneBuckets(col("v"), tables, planes, 2)).collect()
    }
    assert(e.getMessage.contains("hyperplane_buckets"))
  }

  test("null elements contribute 0.0 (same bucket as explicit zero)") {
    val withNull = Seq((1L, Seq[java.lang.Double](1.0, null, 0.5, -2.0)))
      .toDF("id", "v")
    val withZero = Seq((1L, Seq(1.0, 0.0, 0.5, -2.0))).toDF("id", "v")
    val a = withNull.select(HyperplaneBuckets(col("v"), tables, planes, 4).as("b"))
      .head().getSeq[Long](0)
    val b = withZero.select(HyperplaneBuckets(col("v"), tables, planes, 4).as("b"))
      .head().getSeq[Long](0)
    assert(a === b)
  }

  test("null vector yields null; buckets are stable per row") {
    val vecs = Seq((1L, Some(Seq(1.0, -1.0, 0.5, 0.0, 2.0, -2.0, 1.5, -0.5))),
      (2L, None)).toDF("id", "v")
    val out = vecs.select(col("id"),
      HyperplaneBuckets(col("v"), tables, planes, 8).as("b")).collect()
    assert(out.find(_.getLong(0) == 2L).get.isNullAt(1))
    assert(!out.find(_.getLong(0) == 1L).get.isNullAt(1))
  }
}
