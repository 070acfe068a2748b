package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product quantization: codes must be valid and deterministic, a seed
  * vector must code to itself, ADC must reproduce the table arithmetic
  * exactly, the plan must stay narrow, and on clustered data the
  * PQ top-k must actually find the true neighbors (the recall property
  * that makes ADC a useful ANN scan, not just a compressor).
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private val m = 4
  private val k = 4

  /** 4 well-separated anchors; each vector = anchor + small per-dim
    * deterministic jitter. Ids 0..3 ARE the anchors (so seeded codebooks
    * are the cluster centers themselves).
    */
  private def clustered(n: Int): Seq[(Long, Seq[Float])] = {
    def anchor(c: Int): Seq[Double] =
      Seq.tabulate(dim)(i => if (i % 4 == c) 10.0 else 0.0)
    (0 until n).map { j =>
      val c = j % 4
      val jit = if (j < 4) 0.0 else 0.01 * ((j / 4) % 7)
      (j.toLong, anchor(c).map(v => (v + jit).toFloat))
    }
  }

  private lazy val df = clustered(200).toDF("vec_id", "embedding")
  private lazy val cbs = Ann.pqSeedCodebooks(df, "vec_id", "embedding", m, k, dim)

  test("codes are m entries in [0, k) and deterministic") {
    val codes = Ann.pqEncode(df, "vec_id", "embedding", cbs)
      .as[(Long, Seq[Int])].collect().toMap
    assert(codes.size === 200)
    codes.values.foreach { cs =>
      assert(cs.length === m)
      cs.foreach(c => assert(c >= 0 && c < k))
    }
    val again = Ann.pqEncode(df, "vec_id", "embedding", cbs)
      .as[(Long, Seq[Int])].collect().toMap
    assert(again === codes)
  }

  test("a seed vector codes to its own subvectors (distance 0 per subspace)") {
    val codes = Ann.pqEncode(df.filter(col("vec_id") < 4), "vec_id", "embedding", cbs)
      .as[(Long, Seq[Int])].collect().toMap
    // seed j's subvector is codebook entry j in every subspace — but a
    // DIFFERENT entry could tie at distance 0 only if two seeds share a
    // subvector; the 4 anchors differ in every subspace here, so the
    // code must be exactly j
    for (j <- 0L until 4L) assert(codes(j) === Seq.fill(m)(j.toInt), s"seed $j")
  }

  test("tie at equal distance resolves to the LARGER codebook index") {
    // two identical codebook entries → every vector ties between them
    val dupCbs = Array.tabulate(1)(_ =>
      Array(Array.fill(4)(1.0), Array.fill(4)(1.0)))
    val tiny = Seq((0L, Seq.fill(4)(5.0f))).toDF("vec_id", "embedding")
    val code = Ann.pqEncode(tiny, "vec_id", "embedding", dupCbs)
      .as[(Long, Seq[Int])].head()._2
    assert(code === Seq(1), "equal distances must pick the larger index")
  }

  test("ADC score of a seed equals the sum of its own table entries") {
    val q = clustered(1).head._2.map(_.toDouble)
    val codes = Ann.pqEncode(df, "vec_id", "embedding", cbs)
    val scored = Ann.pqAdcTopK(codes, "vec_id", q, cbs, 200)
      .as[(Long, Double)].collect().toMap
    // vec 0 IS the query: every subspace distance is 0 → score 0
    assert(scored(0L) === 0.0)
  }

  test("PQ top-10 retrieves only the query's cluster (quantization-resolution recall)") {
    // within-cluster jitter sits BELOW the codebooks' resolution — every
    // member of a cluster shares one code, so ADC ties inside the
    // cluster and the meaningful guarantee is cluster-level: all top-10
    // must come from the query's cluster, and their score must beat
    // every other cluster's by the anchor separation
    val q = clustered(8).last._2.map(_.toDouble) // a cluster-3 member
    val codes = Ann.pqEncode(df.filter(col("vec_id") =!= 7), "vec_id", "embedding", cbs)
    val pq = Ann.pqAdcTopK(codes, "vec_id", q, cbs, 10)
      .as[(Long, Double)].collect()
    assert(pq.length === 10)
    pq.foreach { case (id, _) =>
      assert(id % 4 === 3, s"vec $id is not from the query's cluster")
    }
    // and the winning score is far under a wrong-cluster score (anchors
    // differ by 10.0 in 8 of 16 dims → cross-cluster d2 ≥ ~800)
    assert(pq.map(_._2).max < 100.0)
  }

  test("one per-subspace Lloyd refinement step keeps codes valid and recall intact") {
    // production path: refine seeded codebooks with a k-means step per
    // subspace (assign → mean per code) — driver-side on the collected
    // per-code sums, m×k×sub doubles
    val codes = Ann.pqEncode(df, "vec_id", "embedding", cbs)
    val joined = df.join(codes.withColumnRenamed("vec_id", "__cid"),
      col("vec_id") === col("__cid"))
    val sub = dim / m
    val refined = Array.tabulate(m) { s =>
      val byCode = joined
        .select(col("codes")(s).as("code"),
          slice(col("embedding").cast("array<double>"), s * sub + 1, sub).as("sv"))
        .groupBy("code")
        .agg(count(lit(1)).as("n"),
          array((0 until sub).map(i =>
            sum(col("sv")(i))): _*).as("sums"))
        .as[(Int, Long, Seq[Double])].collect()
        .map { case (c, n, sums) => c -> sums.map(_ / n).toArray }.toMap
      Array.tabulate(k)(j => byCode.getOrElse(j, cbs(s)(j)))
    }
    val codes2 = Ann.pqEncode(df, "vec_id", "embedding", refined)
      .as[(Long, Seq[Int])].collect()
    assert(codes2.length === 200)
    codes2.foreach { case (_, cs) =>
      cs.foreach(c => assert(c >= 0 && c < k))
    }
  }

  test("fused PqCodes kernel is bit-equal to the unrolled reference form") {
    val fused = Ann.pqEncode(df, "vec_id", "embedding", cbs)
      .as[(Long, Seq[Int])].collect().toMap
    val unrolled = Ann.pqEncodeUnrolled(df, "vec_id", "embedding", cbs)
      .as[(Long, Seq[Int])].collect().toMap
    assert(fused === unrolled)
    // and on random vectors, where rounding boundaries are actually near
    val rnd = new scala.util.Random(97)
    val rdf = (0L until 100L).map(i =>
      (i, Seq.fill(dim)(rnd.nextFloat() * 4 - 2))).toDF("vec_id", "embedding")
    val f2 = Ann.pqEncode(rdf, "vec_id", "embedding", cbs)
      .as[(Long, Seq[Int])].collect().toMap
    val u2 = Ann.pqEncodeUnrolled(rdf, "vec_id", "embedding", cbs)
      .as[(Long, Seq[Int])].collect().toMap
    assert(f2 === u2)
  }

  test("IVF-PQ probe equals PQ-ADC restricted to the probed cells") {
    // composition contract: ivfPqTopK(corpus) ≡ pqAdcTopK(pqEncode(rows
    // of the nProbe nearest cells)) — proven by building the right-hand
    // side from the same centroid assignment
    val cents = Ann.seedCentroids(df, "vec_id", "embedding", 4)
    val q = clustered(8).last._2.map(_.toDouble) // a cluster-3 member
    val composed = Ann.ivfPqTopK(df, "vec_id", "embedding", cents, cbs, q, 10, 2)
      .as[(Long, Double)].collect().toSeq
    val qn = math.sqrt(q.map(x => x * x).sum)
    def cos(c: Seq[Double]): Double = {
      val cn = math.sqrt(c.map(x => x * x).sum)
      if (cn == 0 || qn == 0) 0.0
      else c.zip(q).map { case (a, b) => a * b }.sum / (cn * qn)
    }
    val probeIds = cents.sortBy { case (_, c) => -cos(c) }.take(2).map(_._1)
    val manual = Ann.pqAdcTopK(
      Ann.pqEncode(
        Ann.ivfAssign(df, "vec_id", "embedding", cents)
          .filter(col("centroid_id").isin(probeIds: _*)),
        "vec_id", "embedding", cbs),
      "vec_id", q, cbs, 10).as[(Long, Double)].collect().toSeq
    assert(composed === manual)
  }

  test("IVF-PQ with one probe still retrieves the query's cluster") {
    // centroids are the 4 anchors; every cluster member assigns to its
    // own anchor by cosine, so the single probed cell CONTAINS the true
    // neighbors — recall survives the coarse pruning on clustered data
    val cents = Ann.seedCentroids(df, "vec_id", "embedding", 4)
    val q = clustered(8).last._2.map(_.toDouble)
    val hits = Ann.ivfPqTopK(df.filter(col("vec_id") =!= 7),
      "vec_id", "embedding", cents, cbs, q, 10, 1)
      .as[(Long, Double)].collect()
    assert(hits.length === 10)
    hits.foreach { case (id, _) =>
      assert(id % 4 === 3, s"vec $id is not from the query's cluster")
    }
    assert(hits.map(_._2).max < 100.0)
  }

  test("IVF-PQ plan is one narrow pipeline: no shuffle, one top-k node") {
    val cents = Ann.seedCentroids(df, "vec_id", "embedding", 4)
    val q = clustered(1).head._2.map(_.toDouble)
    val plan = Ann.ivfPqTopK(df, "vec_id", "embedding", cents, cbs, q, 10, 2)
      .queryExecution.executedPlan.toString
    // assign → prune → encode → ADC are all per-row: the ONLY wide-ish
    // node is the final TakeOrderedAndProject (partial per partition,
    // merged on the driver) — no Exchange anywhere
    assert(!plan.contains("Exchange"), s"IVF-PQ probe must not shuffle:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must run as TakeOrderedAndProject:\n$plan")
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"))
  }

  test("ADC plan is narrow: no shuffle before the top-k sort, no UDF") {
    val q = clustered(1).head._2.map(_.toDouble)
    val codes = Ann.pqEncode(df, "vec_id", "embedding", cbs)
    val plan = Ann.pqAdcTopK(codes, "vec_id", q, cbs, 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"))
    // TakeOrderedAndProject folds the order+limit — no global sort stage
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must run as TakeOrderedAndProject:\n$plan")
  }
}
