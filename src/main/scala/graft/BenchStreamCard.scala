package graft

import org.apache.spark.sql.SparkSession

/** Stage decomposition for q_stream_cardinality (r17 verdict ask #4):
  * the ×10-rehearsal residual was 33.1 s with no attribution between
  * fixture staging, the windowed-HLL stream itself, and the estimate
  * readout. Times each phase separately (the query function is the
  * composition of exactly these phases, so the sum is the query).
  *
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (default 32),
  * SPARK_GRAFT_SC_RUNS (default 2; min reported).
  */
object BenchStreamCard {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_SC_RUNS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Micro-batch attribution: per-batch durationMs breakdown + state
    // store metrics, so "the stream phase is slow" decomposes further
    // into source scan (addBatch minus state) vs state commit vs
    // offset/walCommit bookkeeping.
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit = {
          val p = e.progress
          val d = p.durationMs
          val st = p.stateOperators.map { s =>
            f"rows=${s.numRowsTotal} commitMs=${s.commitTimeMs} memKB=${s.memoryUsedBytes / 1024}"
          }.mkString(" | ")
          println(f"[streamcard]   batch ${p.batchId}: rows=${p.numInputRows} " +
            f"addBatch=${d.getOrDefault("addBatch", 0L)}ms " +
            f"getBatch=${d.getOrDefault("getBatch", 0L)}ms " +
            f"latestOffset=${d.getOrDefault("latestOffset", 0L)}ms " +
            f"queryPlanning=${d.getOrDefault("queryPlanning", 0L)}ms " +
            f"walCommit=${d.getOrDefault("walCommit", 0L)}ms " +
            f"commitOffsets=${d.getOrDefault("commitOffsets", 0L)}ms " +
            f"state[$st]")
        }
      })
    Tables.events(spark, sfDir).count() // warm the source

    def t[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }
    val rows = (1 to runs).map { _ =>
      spark.sparkContext.setJobDescription("streamcard: stage")
      val (stageS, tmp) = t(SparkEntry.streamCardStage(spark, sfDir))
      spark.sparkContext.setJobDescription("streamcard: stream")
      val (streamS, est) = t(SparkEntry.streamCardRun(spark, tmp))
      spark.sparkContext.setJobDescription("streamcard: readout")
      val (readS, n) = t(est.count())
      spark.sparkContext.setJobDescription(null)
      println(f"[streamcard] stage=$stageS%.2f s  stream=$streamS%.2f s  " +
        f"readout=$readS%.2f s  total=${stageS + streamS + readS}%.2f s  (rows $n)")
      (stageS, streamS, readS)
    }
    val best = (rows.map(_._1).min, rows.map(_._2).min, rows.map(_._3).min)
    println(f"[streamcard] MIN stage=${best._1}%.2f stream=${best._2}%.2f " +
      f"readout=${best._3}%.2f")
    spark.stop()
  }
}
