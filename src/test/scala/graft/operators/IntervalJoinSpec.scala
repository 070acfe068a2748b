package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketized interval joins ≡ naive theta joins (result sets equal on
  * randomized fixtures), pair-exactness without distinct, and the
  * span guard actually firing.
  */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pointInInterval equals the naive BETWEEN join, incl. boundary points") {
    val rnd = new scala.util.Random(11)
    val pts = (0 until 400).map(i => (i.toLong, rnd.nextInt(10000).toLong))
      .toDF("pid", "sec")
    val ivs = (0 until 60).map { i =>
      val s = rnd.nextInt(9500).toLong
      (i.toLong, s, s + rnd.nextInt(800).toLong)
    }.toDF("iid", "s_sec", "e_sec")
    val got = IntervalJoin.pointInInterval(pts, "sec", ivs, "s_sec", "e_sec",
        bucketWidth = 256L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val want = pts.join(ivs, col("sec").between(col("s_sec"), col("e_sec")))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got === want)
    // boundary inclusivity witnesses
    val one = IntervalJoin.pointInInterval(
      Seq((1L, 100L), (2L, 200L), (3L, 99L), (4L, 201L)).toDF("pid", "sec"),
      "sec",
      Seq((7L, 100L, 200L)).toDF("iid", "s_sec", "e_sec"),
      "s_sec", "e_sec", 64L)
      .select("pid").as[Long].collect().toSet
    assert(one === Set(1L, 2L))
  }

  test("intervalOverlap equals the naive join and emits each pair ONCE") {
    val rnd = new scala.util.Random(23)
    def ivs(n: Int, tag: Long) = (0 until n).map { i =>
      val s = rnd.nextInt(8000).toLong
      (tag * 1000 + i, s, s + rnd.nextInt(1200).toLong)
    }.toDF("id", "s", "e")
    val a = ivs(50, 1L); val b = ivs(50, 2L)
    val bb = b.select(col("id").as("bid"), col("s").as("bs"), col("e").as("be"))
    val got = IntervalJoin.intervalOverlap(a, "s", "e", bb, "bs", "be", 512L)
      .select("id", "bid").as[(Long, Long)].collect()
    val want = a.join(bb, col("s") <= col("be") && col("bs") <= col("e"))
      .select("id", "bid").as[(Long, Long)].collect().toSet
    assert(got.toSet === want)
    assert(got.length === got.toSet.size,
      "canonical-bucket rule must dedupe without a distinct")
  }

  test("the span guard fails loudly instead of exploding a long interval") {
    val pts = Seq((1L, 5L)).toDF("pid", "sec")
    val long = Seq((1L, 0L, 10000000L)).toDF("iid", "s_sec", "e_sec")
    val ex = intercept[Exception] {
      IntervalJoin.pointInInterval(pts, "sec", long, "s_sec", "e_sec",
        bucketWidth = 10L, maxBucketsPerInterval = 100).count()
    }
    assert(ex.getMessage.contains("buckets") ||
      ex.getCause != null && ex.getCause.getMessage.contains("buckets"))
  }

  test("plan shape: equi-join on the bucket, no nested-loop join") {
    val pts = Seq((1L, 5L)).toDF("pid", "sec")
    val ivs = Seq((1L, 0L, 10L)).toDF("iid", "s_sec", "e_sec")
    val plan = IntervalJoin.pointInInterval(pts, "sec", ivs, "s_sec", "e_sec", 8L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"bucketized join must be an equi-join:\n$plan")
  }
}
