package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q_repeated_spans cost attribution — the round-10 verdict's watch item
  * (1.66 s → 24.5 s at 100×, the suite's #2 absolute cost): which stage
  * pays, and does a tighter winnow-candidate df cap buy anything?
  *
  * Measures, on SPARK_GRAFT_SF_DIR with the registered query's exact
  * fixture (%25 subset + planted sentinel):
  *  - `candidates_only`: the [[graft.operators.Winnow.overlap]] stage
  *    alone (inverted-index candidate join, maxDf-guarded);
  *  - `spans_maxdf{50,20,10}`: the full five-stage chain at the
  *    registered cap and two tighter ones.
  * Each point is the min of two passes (the Bench convention).
  */
object BenchSpans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def fixture: DataFrame = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 25 === 0)
      .withColumn("text",
        when(col("doc_id") % 75 === 0,
          concat(col("text"),
            lit(" Repeated-span sentinel passage: planted once, shared verbatim across every third subset document.")))
          .otherwise(col("text")))

    def fmt(v: Double) = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    def best(f: => Long): (Long, Double) = {
      def one(): (Long, Double) = {
        val t0 = System.nanoTime()
        val n = f
        (n, (System.nanoTime() - t0) / 1e9)
      }
      val a = one(); val b = one()
      (a._1, math.min(a._2, b._2))
    }

    // warm-up: tables + one small spans pass
    fixture.count()
    graft.operators.Winnow.repeatedSpans(
      fixture.limit(200), "doc_id", "text", k = 12, w = 12).count()

    val (nc, tc) = best(graft.operators.Winnow.overlap(
      fixture, "doc_id", "text", k = 12, w = 12, maxDf = 50, minCommon = 1).count())
    println(s"""{"metric":"candidates_only","maxdf":50,"pairs":$nc,"sec":${fmt(tc)},"sf":"$sfDir"}""")
    for (df <- Seq(50, 20, 10)) {
      val (n, t) = best(graft.operators.Winnow.repeatedSpans(
        fixture, "doc_id", "text", k = 12, w = 12, maxDf = df).count())
      println(s"""{"metric":"spans_maxdf$df","spans":$n,"sec":${fmt(t)},"sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
