package graft

import org.apache.spark.sql.SparkSession

/** Controlled headline re-capture — the round-10 verdict's open question:
  * the 16-query headline sum moved 8.64 → 9.27 s (7%) round-over-round
  * for the first time, with every uptick a few hundredths and no headline
  * code path changed. Is that variance or a real regression?
  *
  * The two registries cannot share one JVM (they are git states of the
  * same classes), but the question doesn't need them to: the headline
  * QUERY CODE is diff-identical between the snapshots (adjudicated per
  * query in SCALING.md), so "r9 vs r10" is the same program measured
  * twice — and the right instrument is the distribution of repeated
  * same-JVM sweeps. This main runs N interleaved sweeps of the headline
  * set in ONE JVM (idle probes before/after, same warm-up as [[Bench]])
  * and prints per-sweep totals plus per-query min/max/spread. If the
  * recorded r9→r10 delta sits inside the measured same-JVM spread, the
  * round-over-round movement is noise by demonstration, not assertion.
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_AB_SWEEPS
  * (default 6), SPARK_GRAFT_CPUS (default 32).
  */
object BenchAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sweeps = sys.env.getOrElse("SPARK_GRAFT_AB_SWEEPS", "6").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val headline = Seq("q1_agg", "q_join_enrich", "q_date_histogram",
      "q_asof_join", "q_latest_per_key", "q_sessionize", "q_json_extract",
      "q_dedup_exact", "q_ngram_jaccard", "q_ann_cosine", "q_ann_ivf",
      "q_embed_neardup", "q_semdedup", "q_span_dedup", "q_lm_score",
      "q_tfidf_topk")

    // same warm-up as Bench: every table + one shuffle/codegen exercise
    SparkEntry.queries("q1_agg")(spark, sfDir).count()
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      Tables.table(spark, sfDir, t).count()
    }
    Tables.events(spark, sfDir).count()

    def probe(): Double = {
      val t0 = System.nanoTime()
      spark.range(0, 50000000L, 1, 32)
        .selectExpr("bit_xor(xxhash64(id)) AS s").collect()
      (System.nanoTime() - t0) / 1e9
    }
    def fmt(v: Double) = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    val probeStart = (1 to 3).map(_ => probe()).min

    val perQuery = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    val totals = (1 to sweeps).map { s =>
      val times = headline.map { name =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        perQuery(name) = perQuery(name) :+ dt
        name -> dt
      }
      val total = times.map(_._2).sum
      println(s"""{"metric":"headline_sweep","sweep":$s,"total_sec":${fmt(total)}}""")
      total
    }
    val probeEnd = (1 to 3).map(_ => probe()).min
    val qjson = headline.map { n =>
      val v = perQuery(n)
      s""""$n":{"min":${fmt(v.min)},"max":${fmt(v.max)},"spread_pct":${fmt(100.0 * (v.max - v.min) / v.min)}}"""
    }.mkString("{", ",", "}")
    println(
      s"""{"metric":"headline_ab","sweeps":$sweeps,"sf":"$sfDir","totals":[${totals
        .map(fmt).mkString(",")}],"total_min":${fmt(totals.min)},"total_max":${fmt(
        totals.max)},"total_spread_pct":${fmt(100.0 * (totals.max - totals.min) / totals.min)},"probe_start_sec":${fmt(
        probeStart)},"probe_end_sec":${fmt(probeEnd)},"queries":$qjson}""")
    spark.stop()
  }
}
