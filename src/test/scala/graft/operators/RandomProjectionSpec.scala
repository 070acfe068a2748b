package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int, dim: Int): Seq[(Long, Seq[Float])] = {
    val rng = new scala.util.Random(23)
    (1 to n).map(i => (i.toLong, Seq.fill(dim)(rng.nextGaussian().toFloat)))
  }

  test("randomProject matches an independent Scala rebuild of the sign matrix") {
    val dim = 16; val k = 4
    val data = vecs(30, dim)
    val got = Ann.randomProject(data.toDF("vec_id", "embedding"),
        "vec_id", "embedding", dim, k)
      .as[(Long, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> Seq(r._2, r._3, r._4, r._5)).toMap
    val invSqrtK = 1.0 / math.sqrt(k.toDouble)
    data.foreach { case (id, v) =>
      val exp = (0 until k).map { c =>
        val s = (0 until dim).map { i =>
          v(i).toDouble * (Ann.rademacherSign("", c, i) * invSqrtK)
        }.sum
        BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
      }
      assert(got(id) === exp, s"vec $id")
    }
  }

  test("norms are preserved in expectation (the JL property)") {
    val dim = 32; val k = 16
    val data = vecs(300, dim)
    val proj = Ann.randomProject(data.toDF("vec_id", "embedding"),
        "vec_id", "embedding", dim, k)
    val cols = (0 until k).map(c => col(s"r$c") * col(s"r$c"))
    val projNorm = proj.select(col("vec_id"), cols.reduce(_ + _).as("n2"))
      .as[(Long, Double)].collect().toMap
    val ratios = data.map { case (id, v) =>
      val n2 = v.map(x => x.toDouble * x).sum
      projNorm(id) / n2
    }
    val mean = ratios.sum / ratios.size
    assert(math.abs(mean - 1.0) < 0.1,
      s"E||f(x)||^2 must track ||x||^2: mean ratio $mean")
    // distortion shrinks with k: individual ratios concentrate around 1
    assert(ratios.count(r => r > 0.3 && r < 2.5) > ratios.size * 0.95)
  }

  test("the salt changes the matrix; the same salt reproduces it") {
    val df = vecs(5, 8).toDF("vec_id", "embedding")
    def run(salt: String) =
      Ann.randomProject(df, "vec_id", "embedding", 8, 2, salt)
        .as[(Long, Double, Double)].collect().toSeq
    assert(run("a") === run("a"))
    assert(run("a") !== run("b"))
  }

  test("projection is one narrow codegen'd pass: no Exchange, no UDF") {
    val df = vecs(5, 8).toDF("vec_id", "embedding")
    val plan = Ann.randomProject(df, "vec_id", "embedding", 8, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("ScalaUDF"), plan)
  }
}
