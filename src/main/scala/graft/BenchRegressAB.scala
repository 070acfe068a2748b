package graft

import org.apache.spark.sql.SparkSession

/** Round-12 verdict ask #6: three queries regressed >30% (and >0.3 s)
  * between the r11d and r12e 100× sweeps — `q_decontaminate`
  * 3.37→4.48 s, `q_weighted_sample` 2.50→3.29 s,
  * `q_percentiles_sampled` 0.76→1.01 s — with sweep cache pressure the
  * suspected cause (the `q_ppr` precedent measured 18.9% of a far
  * larger delta as same-JVM pressure, BENCH_ppr_ab_r12.json). This
  * main adjudicates each with the same interleaved same-JVM A/B: arm
  * A runs the query from an idle position, arm B immediately after a
  * cache-pressure load, alternating so JVM age cannot masquerade as
  * either arm. If B−A covers the sweep delta, the regression is
  * position noise, not a plan change.
  *
  * Env: SPARK_GRAFT_SF_DIR (default /tmp/graft_sf10),
  * SPARK_GRAFT_AB_ROUNDS (default 3), SPARK_GRAFT_CPUS (default 32),
  * SPARK_GRAFT_AB_QUERIES (comma list, default the three above).
  */
object BenchRegressAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_AB_ROUNDS", "3").toInt
    val targets = sys.env.getOrElse("SPARK_GRAFT_AB_QUERIES",
      "q_decontaminate,q_weighted_sample,q_percentiles_sampled")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def fmt(v: Double) = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }

    Seq("orders", "lineitem", "documents", "embeddings").foreach { t =>
      Tables.table(spark, sfDir, t).count()
    }
    // the pressure load: heavy shuffle + block-cache churn immediately
    // before the B measurement (the sweep-position simulation)
    val pressure = Seq("q_hits", "q_pagerank", "q_repeated_spans")

    targets.foreach { q =>
      val warm = run(q) // JVM/codegen steady state, discarded
      val a = scala.collection.mutable.Buffer.empty[Double]
      val b = scala.collection.mutable.Buffer.empty[Double]
      (1 to rounds).foreach { _ =>
        a += run(q)
        pressure.foreach(run)
        b += run(q)
      }
      println(s"""{"metric":"regress_ab","query":"$q","sf":"$sfDir","rounds":$rounds,"warm_first":${fmt(
        warm)},"a_idle":[${a.map(fmt).mkString(",")}],"b_pressured":[${b
        .map(fmt).mkString(",")}],"a_min":${fmt(a.min)},"b_min":${fmt(
        b.min)},"b_over_a_pct":${fmt(100.0 * (b.min - a.min) / a.min)}}""")
    }
    spark.stop()
  }
}
