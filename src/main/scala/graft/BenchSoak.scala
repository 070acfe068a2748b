package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Long ingest soak — the question a 10-micro-batch benchmark cannot
  * answer: does per-batch latency stay FLAT as the history table grows
  * across hundreds of micro-batches, with compaction and retention
  * engaged mid-soak the way an operator would run them?
  *
  * Shape: `segments` drain cycles of the S1/S4 action-ingest path
  * ([[graft.streaming.Ingest.startActionIngest]]), each one a real
  * Structured Streaming run draining `filesPerSeg` block-keyed files one
  * file per trigger — so a 10×50 soak is 500 genuine micro-batches into
  * ONE growing block-bucketed history dir. Between segments the
  * operational cadence runs: [[graft.sources.Layout.compact]] every
  * third segment (append-mode ingest accumulates one file per
  * batch×bucket), [[graft.sources.Layout.expire]] after segment 6 (the
  * ES ILM delete-phase analogue). A listener captures EVERY batch's
  * trigger duration (recentProgress only keeps a tail), and the report
  * compares the first and last 50 batches — drift, not just means —
  * plus per-segment history size/file counts, so an unbounded-state or
  * latency-creep defect has nowhere to hide.
  *
  * Correctness rides along: after the soak the history must hold exactly
  * the actions of every retained block, once each (receipts-merge 3:1,
  * append idempotence, expiry boundary all checked by one count).
  *
  * Knobs: SPARK_GRAFT_SOAK_SEGMENTS (default 10),
  * SPARK_GRAFT_SOAK_BLOCKS (blocks per segment, default 5000).
  */
object BenchSoak {

  def main(args: Array[String]): Unit = {
    val segments = sys.env.getOrElse("SPARK_GRAFT_SOAK_SEGMENTS", "10").toInt
    val blocksPerSeg = sys.env.getOrElse("SPARK_GRAFT_SOAK_BLOCKS", "5000").toLong
    val txPerBlock = 8
    val filesPerSeg = 50
    val partitionSize = 5000L // one block_bucket per segment
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val sp: SparkSession = spark
    import org.apache.hadoop.fs.Path

    val base = java.nio.file.Files.createTempDirectory("graft_soak").toString
    val outDir = s"$base/history"
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)

    val batchMs = new scala.collection.mutable.ArrayBuffer[Double]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        if (e.progress.numInputRows > 0) batchMs.synchronized {
          batchMs += e.progress.durationMs.get("triggerExecution").toDouble
        }
    })

    def dirStats(dir: String): (Long, Long) = {
      val p = new Path(dir)
      if (!fs.exists(p)) return (0L, 0L)
      val it = fs.listFiles(p, true)
      var files = 0L; var bytes = 0L
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) { files += 1; bytes += f.getLen }
      }
      (files, bytes)
    }

    def fmt(v: Double) = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)

    val segReports = new scala.collection.mutable.ArrayBuffer[String]()
    var expireWatermark = 0L
    val t0 = System.nanoTime()
    for (seg <- 0 until segments) {
      val srcDir = s"$base/src$seg"
      BenchIngest.traces(spark, blocksPerSeg, txPerBlock,
          blockOffset = seg * blocksPerSeg)
        .toDF()
        .repartition(filesPerSeg, col("block_num"))
        .write.parquet(srcDir)
      val stream = spark.readStream
        .schema(spark.read.parquet(srcDir).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(srcDir)
      val segT0 = System.nanoTime()
      val q = graft.streaming.Ingest.startActionIngest(
        stream, outDir, s"$base/ckpt$seg", partitionSize = partitionSize)
      require(q.awaitTermination(1800000), s"segment $seg did not finish in 30m")
      val segWall = (System.nanoTime() - segT0) / 1e9
      // operational cadence between drain cycles
      val compacted =
        if (seg % 3 == 2)
          graft.sources.Layout.compact(outDir,
            targetFileBytes = 64L << 20, partitionCol = "block_bucket")
        else 0
      val expired =
        if (seg == 6) {
          // retention: keep the most recent 4 segments' blocks
          expireWatermark = 1000L + (seg - 3) * blocksPerSeg
          graft.sources.Layout.expire(outDir, expireWatermark,
            partitionSize, partitionCol = "block_bucket")
        } else 0
      val (files, bytes) = dirStats(outDir)
      segReports += s"""{"seg":$seg,"wall_sec":${fmt(segWall)},""" +
        s""""blocks_per_sec":${fmt(blocksPerSeg / segWall)},""" +
        s""""files":$files,"mb":${fmt(bytes / 1048576.0)},""" +
        s""""compacted_buckets":$compacted,"expired_buckets":$expired}"""
    }
    val wall = (System.nanoTime() - t0) / 1e9

    // correctness: exactly the actions of every retained block, once
    // each. Expiry is bucket-granular by design (metadata-only drops),
    // so the retained range starts at the WATERMARK'S BUCKET FLOOR —
    // the straddling bucket is kept whole.
    val history = spark.read.parquet(outDir)
    val bucketFloor = (expireWatermark / partitionSize) * partitionSize
    val firstKept = math.max(1000L, bucketFloor)
    val lastBlock = 1000L + segments * blocksPerSeg - 1
    val expected = (lastBlock - firstKept + 1) * txPerBlock
    val got = history.count()
    val distinctGs = history.select(countDistinct(col("global_sequence"))).head().getLong(0)
    val minBlock = history.agg(min("block_num")).head().getLong(0)
    require(got == expected && distinctGs == got,
      s"history corrupt: rows=$got distinct=$distinctGs expected=$expected")
    require(minBlock == firstKept,
      s"expiry boundary wrong: minBlock=$minBlock bucketFloor=$bucketFloor")

    val all = batchMs.toIndexedSeq
    def mean(xs: Seq[Double]) = if (xs.isEmpty) 0.0 else xs.sum / xs.size
    val head50 = all.take(50)
    val tail50 = all.takeRight(50)
    val line =
      s"""{"metric":"ingest_soak","value":${fmt(segments * blocksPerSeg / wall)},"unit":"blocks/sec",""" +
        s""""batches":${all.size},"wall_sec":${fmt(wall)},""" +
        s""""batch_ms_mean_first50":${fmt(mean(head50))},"batch_ms_mean_last50":${fmt(mean(tail50))},""" +
        s""""batch_ms_max":${fmt(all.max)},"drift_ratio":${fmt(mean(tail50) / math.max(mean(head50), 1e-9))},""" +
        s""""rows_retained":$got,"segments":[${segReports.mkString(",")}]}"""
    println(line)
    spark.stop()
  }
}
