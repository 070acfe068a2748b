package graft.exprs

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NearestCentroidSpec extends SparkSpec {
  import spark.implicits._

  private val cents: Seq[(Int, Seq[Double])] = Seq(
    0 -> Seq(1.0, 0.0, 0.0),
    1 -> Seq(0.0, 1.0, 0.0),
    2 -> Seq(0.0, 0.0, 1.0))

  private lazy val vecs = Seq(
    (1L, Array(0.9f, 0.1f, 0.0f)),   // → 0
    (2L, Array(0.0f, 2.0f, 0.1f)),   // → 1
    (3L, Array(0.1f, 0.0f, 5.0f)),   // → 2
    (4L, Array(0.0f, 0.0f, 0.0f)))   // zero vector: all sims 0.0 → tie
    .toDF("id", "v")

  test("assigns each vector to its max-cosine centroid") {
    val got = vecs.select($"id", NearestCentroid($"v", cents).as("c"))
      .as[(Long, Int)].collect().toMap
    assert(got(1L) === 0 && got(2L) === 1 && got(3L) === 2)
  }

  test("ties prefer the larger centroid id — the struct-greatest order") {
    // zero vector scores 0.0 against every centroid → highest cid wins,
    // exactly as greatest(struct(sim, cid)) resolved it
    val got = vecs.filter($"id" === 4L)
      .select(NearestCentroid($"v", cents).as("c")).as[Int].head()
    assert(got === 2)
    // duplicate centroids: same sim, larger cid wins
    val dup = Seq(5 -> Seq(1.0, 0.0, 0.0), 9 -> Seq(1.0, 0.0, 0.0))
    val d = vecs.filter($"id" === 1L)
      .select(NearestCentroid($"v", dup).as("c")).as[Int].head()
    assert(d === 9)
  }

  test("agrees with the greatest(struct(CosineSim, cid)) form it replaces") {
    val structForm = greatest(cents.map { case (cid, c) =>
      struct(CosineSim($"v", array(c.map(lit): _*)).as("sim"), lit(cid).as("cid"))
    }: _*).getField("cid")
    val both = vecs.select($"id", NearestCentroid($"v", cents).as("a"),
      structForm.as("b")).as[(Long, Int, Int)].collect()
    both.foreach { case (id, a, b) => assert(a === b, s"id=$id") }
  }

  test("interpreted eval agrees with codegen; dim mismatch is null") {
    val withCodegen = vecs.select(NearestCentroid($"v", cents).as("c"))
      .as[Int].collect()
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interpreted = vecs.select(NearestCentroid($"v", cents).as("c"))
        .as[Int].collect()
      assert(withCodegen.toSeq === interpreted.toSeq)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    val bad = Seq((1L, Array(1.0f, 2.0f))).toDF("id", "v")
    val r = bad.select(NearestCentroid($"v", cents).as("c")).collect()
    assert(r.head.isNullAt(0), "dimension mismatch must yield null")
  }

  test("a null element yields null, never a silent 0.0 read") {
    val withNull = Seq(Tuple1(Array[java.lang.Float](1.0f, null, 0.0f)))
      .toDF("v")
    val r = withNull.select(NearestCentroid($"v", cents).as("c")).collect()
    assert(r.head.isNullAt(0))
    val cos = withNull.select(CosineSim($"v",
      org.apache.spark.sql.functions.array(
        org.apache.spark.sql.functions.lit(1.0f),
        org.apache.spark.sql.functions.lit(1.0f),
        org.apache.spark.sql.functions.lit(1.0f))).as("c")).collect()
    assert(cos.head.isNullAt(0))
  }
}
