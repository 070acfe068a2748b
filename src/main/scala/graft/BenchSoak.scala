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
  * Fork cadence rides every segment (S3/ST5/ST6): 20 blocks near the
  * segment tip are retracted, half re-adopted (fork-of-a-fork) — the
  * [[graft.state.Forks]] event model. Standing tombstones above LIB are
  * carried; at each compaction, tombstones that have fallen below LIB
  * (tip − 340) are PHYSICALLY applied ([[graft.sources.Layout
  * .rewriteFiltered]] on the affected buckets only) and dropped
  * ([[graft.state.Forks.pruneBelowLib]]) — so tombstone state is
  * bounded by the reversible window by construction, and the report
  * proves it per segment.
  *
  * Correctness rides along: after the soak the history must hold exactly
  * the actions of every retained block, once each (receipts-merge 3:1,
  * append idempotence, expiry boundary all checked by one count), and
  * the [[graft.state.Forks.liveView]] anti-join must hide exactly the
  * standing forked blocks.
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
    // fork-event log (tiny — bounded by segments × fork rate) + the
    // driver-side mirrors the final gates need
    val forkEvents = new scala.collection.mutable.ArrayBuffer[(Long, String, Long, Boolean)]()
    var forkSeq = 0L
    var appliedForkBlocks = Set.empty[Long] // physically rewritten away
    var standingForked = Set.empty[Long] // retracted, never re-adopted
    import spark.implicits._
    def eventsDf = forkEvents.toSeq.toDF("block_num", "block_id", "seq", "retracted")
    // Forks.effectiveTombstones is block_id-keyed (its production shape);
    // recover block_num for LIB arithmetic from the event log, and drop
    // tombstones already physically applied by a past rewrite
    def effectiveUnapplied = graft.state.Forks.effectiveTombstones(
        eventsDf.select(col("block_id"), col("seq"), col("retracted")))
      .join(eventsDf.select(col("block_id"), col("block_num")).distinct(),
        Seq("block_id"))
      .join(appliedForkBlocks.toSeq.toDF("block_num"),
        Seq("block_num"), "left_anti")
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
      // fork cadence: 20 retractions near the tip, the even half
      // re-adopted (fork-of-a-fork cancels the tombstone)
      val tip = 1000L + (seg + 1) * blocksPerSeg - 1
      val lib = tip - 340
      val forked = ((tip - 59L) to (tip - 40L)).toSeq
      forked.foreach { b =>
        forkSeq += 1; forkEvents += ((b, BenchIngest.blockId(b), forkSeq, true))
      }
      forked.filter(_ % 2 == 0).foreach { b =>
        forkSeq += 1; forkEvents += ((b, BenchIngest.blockId(b), forkSeq, false))
      }
      standingForked ++= forked.filter(_ % 2 != 0)
      // operational cadence between drain cycles
      val compacted =
        if (seg % 3 == 2)
          graft.sources.Layout.compact(outDir,
            targetFileBytes = 64L << 20, partitionCol = "block_bucket")
        else 0
      // physical tombstone application at the same cadence: below-LIB
      // forked rows are deleted from their (reversible-window-sized)
      // buckets, and their tombstones drop — the pruneBelowLib contract
      val appliedNow =
        if (seg % 3 == 2) {
          val toApply = effectiveUnapplied.filter(col("block_num") <= lib)
            .select(col("block_num"), col("block_id"))
            .as[(Long, String)].collect()
          if (toApply.nonEmpty) {
            graft.sources.Layout.rewriteFiltered(outDir,
              toApply.map(_._1 / partitionSize).toSeq,
              !col("block_id").isin(toApply.map(_._2).toSeq: _*))
            appliedForkBlocks ++= toApply.map(_._1)
          }
          toApply.length
        } else 0
      val tombstonesCarried = effectiveUnapplied.count()
      if (seg % 3 == 2) {
        // ST6 invariant: immediately after application, pruning below
        // LIB is a no-op — every below-LIB tombstone was just rewritten
        // away, so pruning can never hide an unapplied one
        val pruned = graft.state.Forks.pruneBelowLib(effectiveUnapplied, lib).count()
        require(pruned == tombstonesCarried,
          s"tombstones below LIB survived application: $pruned != $tombstonesCarried")
      }
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
        s""""compacted_buckets":$compacted,"expired_buckets":$expired,""" +
        s""""lib":$lib,"forks_applied":$appliedNow,"tombstones":$tombstonesCarried}"""
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
    // physically applied forked blocks in the retained range are gone
    // from the raw history; standing-but-unapplied ones are still there
    val appliedRetained = appliedForkBlocks.count(_ >= firstKept)
    val expected = (lastBlock - firstKept + 1 - appliedRetained) * txPerBlock
    val got = history.count()
    val distinctGs = history.select(countDistinct(col("global_sequence"))).head().getLong(0)
    val minBlock = history.agg(min("block_num")).head().getLong(0)
    require(got == expected && distinctGs == got,
      s"history corrupt: rows=$got distinct=$distinctGs expected=$expected")
    require(minBlock == firstKept,
      s"expiry boundary wrong: minBlock=$minBlock bucketFloor=$bucketFloor")
    // fork gate: the liveView anti-join must hide exactly the STANDING
    // forked blocks — applied ones physically absent, unapplied ones
    // tombstone-hidden, re-adopted ones fully visible
    val liveGot = graft.state.Forks
      .liveView(history, effectiveUnapplied.select(col("block_id")))
      .count()
    val standingRetained = standingForked.count(_ >= firstKept)
    val expectedLive = (lastBlock - firstKept + 1 - standingRetained) * txPerBlock
    require(liveGot == expectedLive,
      s"liveView wrong: got=$liveGot expected=$expectedLive " +
        s"(standing=$standingRetained applied=$appliedRetained)")

    val all = batchMs.toIndexedSeq
    def mean(xs: Seq[Double]) = if (xs.isEmpty) 0.0 else xs.sum / xs.size
    val head50 = all.take(50)
    val tail50 = all.takeRight(50)
    val line =
      s"""{"metric":"ingest_soak","value":${fmt(segments * blocksPerSeg / wall)},"unit":"blocks/sec",""" +
        s""""batches":${all.size},"wall_sec":${fmt(wall)},""" +
        s""""batch_ms_mean_first50":${fmt(mean(head50))},"batch_ms_mean_last50":${fmt(mean(tail50))},""" +
        s""""batch_ms_max":${fmt(all.max)},"drift_ratio":${fmt(mean(tail50) / math.max(mean(head50), 1e-9))},""" +
        s""""rows_retained":$got,"rows_live":$liveGot,""" +
        s""""forks_applied_total":${appliedForkBlocks.size},""" +
        s""""segments":[${segReports.mkString(",")}]}"""
    println(line)
    spark.stop()
  }
}
