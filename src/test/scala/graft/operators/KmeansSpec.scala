package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Ann.kmeansTrace]] — the iterated Lloyd loop with the engine-stable
  * (4-dp snapped cosine, larger-cid tie) assignment contract.
  */
class KmeansSpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: (Long, Seq[Double])*) =
    rows.toDF("vec_id", "embedding")

  private def trace(df: org.apache.spark.sql.DataFrame) =
    df.orderBy(col("step"), col("centroid_id"), col("dim"))
      .as[(Int, Int, Int, Long, Double)].collect().toSeq

  test("one step matches the hand-computed assignment and means") {
    val e = emb(
      0L -> Seq(1.0, 0.0), // seed cid 0
      1L -> Seq(0.0, 1.0), // seed cid 1
      2L -> Seq(3.0, 0.0), // cos 1 with cid 0
      3L -> Seq(0.0, 5.0)) // cos 1 with cid 1
    val got = trace(Ann.kmeansTrace(e, "vec_id", "embedding", k = 2, steps = 1))
    assert(got === Seq(
      (1, 0, 0, 2L, 2.0), (1, 0, 1, 2L, 0.0),
      (1, 1, 0, 2L, 0.0), (1, 1, 1, 2L, 3.0)))
  }

  test("a snapped-cosine tie assigns to the LARGER centroid id") {
    val e = emb(
      0L -> Seq(1.0, 0.0),
      1L -> Seq(0.0, 1.0),
      2L -> Seq(1.0, 1.0)) // cos 0.7071 with both seeds → cid 1
    val got = trace(Ann.kmeansTrace(e, "vec_id", "embedding", k = 2, steps = 1))
    assert(got === Seq(
      (1, 0, 0, 1L, 1.0), (1, 0, 1, 1L, 0.0),
      (1, 1, 0, 2L, 0.5), (1, 1, 1, 2L, 1.0)))
  }

  test("a centroid that loses every member is dropped (lloydStep convention)") {
    // seeds are collinear: every vector ties at cos 1 → all go to cid 1
    val e = emb(0L -> Seq(2.0, 0.0), 1L -> Seq(1.0, 0.0), 2L -> Seq(4.0, 0.0))
    val got = trace(Ann.kmeansTrace(e, "vec_id", "embedding", k = 2, steps = 2))
    assert(got.map(_._2).distinct === Seq(1))
    assert(got.filter(_._1 == 1).map(_._4).forall(_ == 3L))
    // step 2 re-assigns against the single survivor and reproduces it
    assert(got.filter(_._1 == 2) === got.filter(_._1 == 1).map(t => t.copy(_1 = 2)))
  }

  test("the trace is invariant to input partitioning") {
    val rows = (0L until 60L).map(i =>
      (i, Seq((i * 17 % 23).toDouble, (i * 31 % 19).toDouble, (i % 7).toDouble)))
    val a = trace(Ann.kmeansTrace(
      emb(rows: _*).repartition(7), "vec_id", "embedding", k = 4, steps = 3))
    val b = trace(Ann.kmeansTrace(
      emb(rows: _*).repartition(2), "vec_id", "embedding", k = 4, steps = 3))
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("an empty corpus yields an empty trace, not a crash") {
    val e = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "embedding")
    assert(Ann.kmeansTrace(e, "vec_id", "embedding", k = 2, steps = 2).count() === 0L)
  }

  test("null vectors are dropped, not assigned") {
    val withNull = emb(
      0L -> Seq(1.0, 0.0), 1L -> Seq(0.0, 1.0),
      2L -> Seq(3.0, 0.0), 3L -> null)
    val clean = emb(0L -> Seq(1.0, 0.0), 1L -> Seq(0.0, 1.0), 2L -> Seq(3.0, 0.0))
    assert(trace(Ann.kmeansTrace(withNull, "vec_id", "embedding", k = 2, steps = 2)) ===
      trace(Ann.kmeansTrace(clean, "vec_id", "embedding", k = 2, steps = 2)))
  }

  test("cluster sizes sum to the corpus on every step") {
    val rows = (0L until 40L).map(i =>
      (i, Seq((i % 5).toDouble + 1.0, (i % 3).toDouble, (i % 11).toDouble)))
    val got = trace(Ann.kmeansTrace(
      emb(rows: _*), "vec_id", "embedding", k = 3, steps = 2))
    (1 to 2).foreach { s =>
      val perDim = got.filter(t => t._1 == s && t._3 == 0).map(_._4).sum
      assert(perDim === 40L, s"step $s")
    }
  }
}
