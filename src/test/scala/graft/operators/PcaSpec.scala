package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def syntheticEmb(n: Int, dim: Int): Seq[(Long, Seq[Float])] =
    // deterministic anisotropic cloud: axis 0 has ~4x the spread of axis
    // 1, the rest are small — eigenvalue ordering is unambiguous
    (1 to n).map { i =>
      val base = Seq.tabulate(dim) { d =>
        val t = (i * (d + 3) % 17) - 8.0
        (t / (d + 1.0) / 2.0).toFloat
      }
      (i.toLong, base.updated(0, (((i % 13) - 6) * 2.0).toFloat))
    }

  test("covariance matches a plain-Scala covariance on the same rows") {
    val data = syntheticEmb(40, 5)
    val df = data.toDF("vec_id", "embedding")
    val got = Pca.covariance(df, "embedding", 5)
      .as[(Int, Int, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val vecs = data.map(_._2.map(_.toDouble))
    val n = vecs.size.toDouble
    def mean(i: Int) = vecs.map(_(i)).sum / n
    for (i <- 0 until 5; j <- 0 until 5) {
      val exp = vecs.map(v => v(i) * v(j)).sum / n - mean(i) * mean(j)
      assert(math.abs(got((i, j)) - exp) < 1e-6, s"cell ($i,$j)")
    }
  }

  test("eigenSym solves a hand-checkable symmetric matrix") {
    // [[2,1],[1,2]] → λ = 3, 1; eigvecs (1,1)/√2 and (1,-1)/√2
    val (vals, vecs) = Pca.eigenSym(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals(0) - 3.0) < 1e-12 && math.abs(vals(1) - 1.0) < 1e-12)
    val r = 1 / math.sqrt(2)
    assert(vecs(0).zip(Array(r, r)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    assert(math.abs(math.abs(vecs(1)(0)) - r) < 1e-12)
    assert(math.abs(vecs(1)(0) + vecs(1)(1)) < 1e-12)
  }

  test("fit satisfies the eigen invariants: residual, orthonormality, trace, order") {
    val dim = 8
    val df = syntheticEmb(60, dim).toDF("vec_id", "embedding")
    val model = Pca.fit(df, "embedding", dim)
    val cov = Pca.covariance(df, "embedding", dim, snapDp = None)
      .as[(Int, Int, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val a = Array.tabulate(dim, dim)((i, j) => cov((i, j)))
    // A·v = λ·v for every pair
    for (c <- 0 until dim) {
      val v = model.components(c)
      val av = Array.tabulate(dim)(i => (0 until dim).map(j => a(i)(j) * v(j)).sum)
      val res = math.sqrt(av.zip(v).map { case (x, y) =>
        val d = x - model.eigenvalues(c) * y; d * d
      }.sum)
      assert(res < 1e-9, s"eigenpair $c residual $res")
    }
    // orthonormal basis
    for (c1 <- 0 until dim; c2 <- c1 until dim) {
      val dot = model.components(c1).zip(model.components(c2)).map(p => p._1 * p._2).sum
      val expect = if (c1 == c2) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-10, s"<v$c1,v$c2> = $dot")
    }
    // eigenvalues: descending, non-negative (covariance is PSD), Σλ = trace
    assert(model.eigenvalues.toSeq === model.eigenvalues.sortBy(-_).toSeq)
    assert(model.eigenvalues.forall(_ > -1e-10))
    val trace = (0 until dim).map(i => a(i)(i)).sum
    assert(math.abs(model.eigenvalues.sum - trace) < 1e-9)
    // the planted dominant axis wins
    assert(math.abs(model.components(0)(0)) > 0.9, "axis 0 must dominate pc0")
  }

  test("projected coordinate c has variance = eigenvalue c, and coords decorrelate") {
    val dim = 6
    val df = syntheticEmb(80, dim).toDF("vec_id", "embedding")
    val model = Pca.fit(df, "embedding", dim)
    val proj = Pca.project(df, "vec_id", "embedding", model, k = 3)
      .as[(Long, Double, Double, Double)].collect()
    val cols = Seq(proj.map(_._2), proj.map(_._3), proj.map(_._4))
    for (c <- 0 until 3) {
      val xs = cols(c); val m = xs.sum / xs.length
      val v = xs.map(x => (x - m) * (x - m)).sum / xs.length
      assert(math.abs(v - model.eigenvalues(c)) < 1e-9,
        s"var(pc$c)=$v != λ=${model.eigenvalues(c)}")
      assert(math.abs(m) < 1e-9, "projection of centered data must have zero mean")
    }
    val c01 = cols(0).zip(cols(1)).map(p => p._1 * p._2).sum / proj.length
    assert(math.abs(c01) < 1e-9, "pc0 and pc1 must be uncorrelated")
  }

  test("covariance runs ONE corpus pass; the mirror is driver arithmetic") {
    val df = syntheticEmb(30, 5).toDF("vec_id", "embedding")
    val out = Pca.covariance(df, "embedding", 5)
    // the returned frame is a local relation of mirrored cells — the
    // corpus explode ran exactly once, during the moments collect
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Generate") && !plan.contains("Exchange"),
      s"mirror must not re-touch the corpus:\n$plan")
    // and the mirror is exact: cell (i,j) == cell (j,i), d² cells total
    val cells = out.as[(Int, Int, Double)].collect()
    assert(cells.length === 25)
    val m = cells.map(c => (c._1, c._2) -> c._3).toMap
    for (i <- 0 until 5; j <- 0 until 5) assert(m((i, j)) === m((j, i)))
  }

  test("moments capture: equivalent frames share ONE collected pass across views") {
    Pca.clearCaches()
    val df1 = syntheticEmb(40, 5).toDF("vec_id", "embedding")
    Pca.covariance(df1, "embedding", 5)
    assert(Pca.momentsCacheSize === 1)
    // a DISTINCT Dataset object over the same data and operators lands on
    // the same canonicalized key: fit reuses the covariance's capture
    val df2 = syntheticEmb(40, 5).toDF("vec_id", "embedding")
    val model = Pca.fit(df2, "embedding", 5)
    assert(Pca.momentsCacheSize === 1,
      "fit over an equivalent frame must reuse the moments capture")
    // and the shared capture is consistent across views: Σλ = trace
    val cov = Pca.covariance(df1, "embedding", 5, snapDp = None)
      .as[(Int, Int, Double)].collect().map(c => (c._1, c._2) -> c._3).toMap
    val trace = (0 until 5).map(i => cov((i, i))).sum
    assert(math.abs(model.eigenvalues.sum - trace) < 1e-9)
    // a different declared dim is a different capture, not a stale hit
    Pca.covariance(df1, "embedding", 4)
    assert(Pca.momentsCacheSize === 2)
    Pca.clearCaches()
  }

  test("moments capture: in-place Layout mutation invalidates; stale cov never served") {
    Pca.clearCaches()
    val dir = java.nio.file.Files.createTempDirectory("graft_pca_inv").toString + "/emb"
    syntheticEmb(40, 4).toDF("vec_id", "embedding")
      .withColumn("block_bucket", (col("vec_id") % 2).cast("long"))
      .repartition(4).write.partitionBy("block_bucket").parquet(dir)
    val read = () => spark.read.parquet(dir)
    val before = Pca.covariance(read(), "embedding", 4, snapDp = None)
      .as[(Int, Int, Double)].collect().map(c => (c._1, c._2) -> c._3).toMap
    assert(Pca.momentsCacheSize === 1)
    // physically delete half the corpus under the SAME logical plan
    graft.sources.Layout.rewriteFiltered(dir, Seq(0L, 1L),
      col("vec_id") < 20)(spark)
    assert(Pca.momentsCacheSize === 0,
      "Layout mutation must clear the plan-keyed capture")
    val after = Pca.covariance(read(), "embedding", 4, snapDp = None)
      .as[(Int, Int, Double)].collect().map(c => (c._1, c._2) -> c._3).toMap
    assert(before !== after, "covariance must be recomputed from surviving rows")
    Pca.clearCaches()
  }

  test("moments capture is bounded: overflow clears rather than grows") {
    Pca.clearCaches()
    // 66 distinct canonical plans (row-count varies the LocalRelation):
    // crossing the 64-entry bound must CLEAR, never exceed
    var peak = 0
    for (n <- 1 to 66) {
      Pca.covariance(syntheticEmb(5 + n, 2).toDF("vec_id", "embedding"),
        "embedding", 2)
      peak = math.max(peak, Pca.momentsCacheSize)
    }
    assert(peak === 64, s"cache must fill exactly to its bound, saw $peak")
    assert(Pca.momentsCacheSize === 2, "overflow clears then re-fills")
    Pca.clearCaches()
  }

  test("whitened projection has unit variance per axis and zero cross-covariance") {
    val dim = 6
    val df = syntheticEmb(80, dim).toDF("vec_id", "embedding")
    val model = Pca.fit(df, "embedding", dim)
    val proj = Pca.project(df, "vec_id", "embedding", model, k = 3, whiten = true)
      .as[(Long, Double, Double, Double)].collect()
    val cols = Seq(proj.map(_._2), proj.map(_._3), proj.map(_._4))
    for (c <- 0 until 3) {
      val xs = cols(c)
      val v = xs.map(x => x * x).sum / xs.length // mean is 0 (centered)
      assert(math.abs(v - 1.0) < 1e-9, s"var(white pc$c)=$v")
    }
    val c01 = cols(0).zip(cols(1)).map(p => p._1 * p._2).sum / proj.length
    assert(math.abs(c01) < 1e-9)
  }

  test("whitening a degenerate axis fails fast instead of dividing by ~zero") {
    // rank-1 data: axis 0 carries everything, axis 1 is constant
    val df = (1 to 20).map(i => (i.toLong, Seq(i.toFloat, 2f * i, 3f * i)))
      .toDF("vec_id", "embedding")
    val model = Pca.fit(df, "embedding", 3)
    val e = intercept[IllegalArgumentException] {
      Pca.project(df, "vec_id", "embedding", model, k = 3, whiten = true)
    }
    assert(e.getMessage.contains("degenerate"))
  }

  test("projection is a narrow plan: no Exchange, no UDF") {
    val df = syntheticEmb(10, 4).toDF("vec_id", "embedding")
    val model = Pca.fit(df, "embedding", 4)
    val plan = Pca.project(df, "vec_id", "embedding", model, k = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must not shuffle:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }

  test("fit fails fast on ragged vectors instead of averaging them away") {
    val df = (Seq((1L, Seq(1f, 2f, 3f)), (2L, Seq(1f, 2f))))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Pca.fit(df, "embedding", 3)
    }
    assert(e.getMessage.contains("ragged"))
  }

  test("fit and covariance fail fast on NULL ELEMENTS inside vectors") {
    // a null element nulls out its pair products; avg would then skip
    // them per cell with differing counts — silently skewed covariance
    val df = Seq((1L, Seq[java.lang.Float](1f, 2f, 3f)),
        (2L, Seq[java.lang.Float](1f, null, 2f)))
      .toDF("vec_id", "embedding")
    val e1 = intercept[IllegalArgumentException](Pca.fit(df, "embedding", 3))
    assert(e1.getMessage.contains("null elements"))
    val e2 = intercept[IllegalArgumentException](Pca.covariance(df, "embedding", 3))
    assert(e2.getMessage.contains("null elements"))
  }

  test("covariance fails fast on rows SHORTER than dim (wider stays fine)") {
    val df = Seq((1L, Seq(1f, 2f, 3f)), (2L, Seq(1f, 2f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Pca.covariance(df, "embedding", 3)
    }
    assert(e.getMessage.contains("ragged"))
  }

  test("covariance is bounded by the DECLARED dim even when rows are wider") {
    val data = syntheticEmb(25, 6)
    val df = data.toDF("vec_id", "embedding")
    val got = Pca.covariance(df, "embedding", 3)
      .as[(Int, Int, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got.size === 9, "the declared dim, not the array width, sizes the output")
    // and values equal the covariance of the 3-coordinate prefix
    val vecs = data.map(_._2.take(3).map(_.toDouble))
    val n = vecs.size.toDouble
    def mean(i: Int) = vecs.map(_(i)).sum / n
    for (i <- 0 until 3; j <- 0 until 3) {
      val exp = vecs.map(v => v(i) * v(j)).sum / n - mean(i) * mean(j)
      assert(math.abs(got((i, j)) - exp) < 1e-6, s"cell ($i,$j)")
    }
  }

  test("fit on an empty corpus fails loudly, not with a bare map lookup") {
    val df = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Pca.fit(df, "embedding", 4)
    }
    assert(e.getMessage.contains("empty"))
  }

  test("dim guard refuses a covariance that is no longer metadata-sized") {
    val df = Seq((1L, Seq(1f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Pca.covariance(df, "embedding", Pca.MaxDim + 1)
    }
    assert(e.getMessage.contains("exceeds"))
  }
}
