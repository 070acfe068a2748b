package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

class ZOrderSpec extends SparkSpec with TableDrivenPropertyChecks {
  import spark.implicits._

  /** Independent bit-by-bit Morton reference (no magic masks). */
  private def mortonRef(a: Long, b: Long): Long = {
    var r = 0L
    var i = 0
    while (i < 31) {
      r |= ((a >> i) & 1L) << (2 * i)
      r |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    r
  }

  test("zorderKey is bit-identical to the bit-by-bit Morton reference") {
    val rng = new scala.util.Random(7)
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (0x7FFFFFFFL, 0x7FFFFFFFL)) ++
      Seq.fill(500)((rng.nextLong().abs & 0x7FFFFFFFL, rng.nextLong().abs & 0x7FFFFFFFL))
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zorderKey(col("a"), col("b")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) =>
      assert(z === mortonRef(a, b), s"morton($a, $b)")
    }
  }

  test("per-axis monotone: fixing one coordinate, the key orders like the other") {
    val as = Seq(0L, 1L, 5L, 100L, 4096L, 1 << 20, 0x7FFFFFFFL)
    for (fixed <- Seq(0L, 3L, 12345L)) {
      val alongA = as.map(a => mortonRef(a, fixed))
      assert(alongA === alongA.sorted, s"a-axis at b=$fixed")
      val alongB = as.map(b => mortonRef(fixed, b))
      assert(alongB === alongB.sorted, s"b-axis at a=$fixed")
    }
  }

  test("the sign bit is never set: long ordering equals curve ordering") {
    val z = Layout.zorderKey(lit(0x7FFFFFFFL), lit(0x7FFFFFFFL))
    val v = spark.range(1).select(z.as("z")).as[Long].head()
    assert(v === 0x3FFFFFFFFFFFFFFFL && v > 0)
  }

  test("the key is codegen'd column arithmetic: narrow plan, no UDF") {
    val df = spark.range(100).select(
      Layout.zorderKey(col("id"), col("id") + 1).as("z"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("ScalaUDF"), plan)
  }

  test("writeZOrdered files are square-ish: both dims prune, unlike a one-column sort") {
    // 64×64 grid, one row per cell: under z-order each of 16 files covers
    // a ~16×16 square; under an a-sorted layout each file covers the FULL
    // b range. Compare per-file b-spans.
    val grid = (for (a <- 0 until 64; b <- 0 until 64) yield (a.toLong, b.toLong))
      .toDF("a", "b")
    val dirZ = java.nio.file.Files.createTempDirectory("graft_z").toString + "/t"
    val dirA = java.nio.file.Files.createTempDirectory("graft_a").toString + "/t"
    Layout.writeZOrdered(grid, dirZ, nFiles = 16, dimA = "a", dimB = "b")
    grid.repartitionByRange(16, col("a")).sortWithinPartitions(col("a"))
      .write.mode("overwrite").parquet(dirA)
    def maxSpanB(dir: String): Long = {
      val spans = spark.read.parquet(dir)
        .withColumn("__f", input_file_name())
        .groupBy("__f").agg((max("b") - min("b")).as("span"))
        .as[(String, Long)].collect().map(_._2)
      assert(spans.length === 16)
      spans.max
    }
    val zSpan = maxSpanB(dirZ)
    val aSpan = maxSpanB(dirA)
    assert(aSpan === 63L, "a-sorted layout scatters b across every file")
    assert(zSpan <= 31L, s"z-order must localize b too (got span $zSpan)")
    // and the a dimension stays localized as well
    val zSpanA = spark.read.parquet(dirZ)
      .withColumn("__f", input_file_name())
      .groupBy("__f").agg((max("a") - min("a")).as("span"))
      .as[(String, Long)].collect().map(_._2).max
    assert(zSpanA <= 31L, s"z-order must keep a localized (got span $zSpanA)")
  }

  test("negative coordinates fail loudly instead of silently breaking monotonicity") {
    // -1 & 0x7FFFFFFF would map to the 31-bit MAX — ordered past every
    // legitimate key, destroying the documented per-axis monotonicity
    val df = Seq((-1L, 3L)).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(Layout.zorderKey(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("non-negative"))
  }
}
