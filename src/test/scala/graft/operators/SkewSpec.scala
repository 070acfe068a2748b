package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // pathological skew: one key holds 90% of rows
  private lazy val skewed = (
    (1 to 9000).map(i => ("hot", i.toLong)) ++
      (1 to 1000).map(i => (s"k${i % 50}", i.toLong))
    ).toDF("k", "v").repartition(8).cache()

  test("salted aggregation equals plain aggregation") {
    val plain = skewed.groupBy($"k")
      .agg(sum($"v").as("s"), count($"v").as("c"), min($"v").as("mn"), max($"v").as("mx"))
    val salted = Skew.saltedAgg(skewed, Seq("k"),
      Seq(("v", "sum", "s"), ("v", "count", "c"), ("v", "min", "mn"), ("v", "max", "mx")))
    assert(salted.exceptAll(plain).count() === 0 && plain.exceptAll(salted).count() === 0)
  }

  test("salted join equals plain join") {
    val dim = (Seq("hot") ++ (0 until 50).map(i => s"k$i")).zipWithIndex
      .map { case (k, i) => (k, s"payload$i") }.toDF("k", "p")
    val plain = skewed.join(dim, Seq("k")).groupBy($"k").agg(count(lit(1)).as("n"), first($"p").as("p"))
    val salted = Skew.saltedJoin(skewed, dim, "k").groupBy($"k").agg(count(lit(1)).as("n"), first($"p").as("p"))
    assert(salted.exceptAll(plain).count() === 0 && plain.exceptAll(salted).count() === 0)
  }

  test("salted join preserves left rows for left joins") {
    val dim = Seq(("hot", "x")).toDF("k", "p")
    val out = Skew.saltedJoin(skewed, dim, "k", joinType = "left")
    assert(out.count() === skewed.count())
    assert(out.filter($"p".isNull).count() === 1000)
  }

  test("key histogram surfaces the hot key") {
    val h = Skew.keyHistogram(skewed, "k", 3).collect()
    assert(h.head.getAs[String]("k") === "hot")
    assert(h.head.getAs[Double]("share") > 0.8)
  }
}
