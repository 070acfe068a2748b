package graft

import org.apache.spark.sql.SparkSession

/** Encode-vs-decode decomposition for the archive-ingest pair (r17
  * verdict ask #7): q_7z_ingest and q_arrow_ingest time fixture ENCODE +
  * from-spec DECODE + rollup inside one measurement (by design — the
  * oracle replays from the base table). This main times the encode phase
  * alone (noop sink, guide §1.4 — every payload byte is built and
  * discarded) next to the full query, so the wall is attributed instead
  * of re-litigated each round.
  *
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (default 32).
  */
object BenchIngestSplit {
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
    Tables.documents(spark, sfDir).count() // warm the source

    def time(label: String)(f: => Unit): Unit = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[ingestsplit] $label%-18s ${runs.min}%8.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    spark.sparkContext.setJobDescription("ingestsplit: 7z encode")
    time("7z encode only") { noop(SparkEntry.sevenZArchives(spark, sfDir)) }
    spark.sparkContext.setJobDescription("ingestsplit: 7z full")
    time("7z full query") {
      SparkEntry.queries("q_7z_ingest")(spark, sfDir).count(): Unit
    }
    spark.sparkContext.setJobDescription("ingestsplit: arrow encode")
    time("arrow encode only") { noop(SparkEntry.arrowFiles(spark, sfDir)) }
    spark.sparkContext.setJobDescription("ingestsplit: arrow full")
    time("arrow full query") {
      SparkEntry.queries("q_arrow_ingest")(spark, sfDir).count(): Unit
    }
    spark.sparkContext.setJobDescription(null)
    spark.stop()
  }
}
