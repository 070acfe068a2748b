package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Long stateful-window soak — the round-11 ask: prove the
  * HLL-register streaming state ([[graft.operators.Sketch]] registers
  * under [[graft.streaming.Windows.tumbling]]) stays BOUNDED under
  * continuous watermark eviction across hundreds of micro-batches, the
  * way [[BenchSoak]] proved the ingest/fork path.
  *
  * Shape: `nFiles` hour-slice files drain one per trigger through ONE
  * stateful streaming aggregation — distinct users per 6-hour window
  * per event type, state = the register file (window, type, bucket) →
  * max rank, NEVER the user set. Event time advances one hour per
  * batch with 30-minute lateness, so windows continuously finalize and
  * EVICT: state is a sawtooth bounded by (active windows) × types ×
  * 2ᵖ, however long the stream runs. A listener captures every batch's
  * trigger duration AND state-operator row count; the report compares
  * first/last quartiles of both (drift, not means) and asserts the
  * analytic bound. A far-future sentinel file flushes the last real
  * windows (its own window never emits — the registered-fixture
  * convention), and the sink is then compared REGISTER-FOR-REGISTER
  * against the batch derivation over the same events: the WindowsSpec
  * stream ≡ batch lock, held across the whole soak.
  *
  * Knobs: SPARK_GRAFT_WSOAK_FILES (default 300),
  * SPARK_GRAFT_WSOAK_ROWS (rows per file, default 2000),
  * SPARK_GRAFT_CPUS (default 32).
  */
object BenchWindowSoak {
  def main(args: Array[String]): Unit = {
    val nFiles = sys.env.getOrElse("SPARK_GRAFT_WSOAK_FILES", "300").toInt
    val rowsPerFile = sys.env.getOrElse("SPARK_GRAFT_WSOAK_ROWS", "2000").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nTypes = 5
    val p = 6 // 2^6 = 64 registers per (window, type)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.streaming.Trigger

    val base = java.nio.file.Files.createTempDirectory("graft_wsoak").toString
    val in = s"$base/in"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(in))

    // ---- fixture: hour-slice files, deterministic users, pinned mtimes
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val events = spark.range(nFiles.toLong * rowsPerFile)
      .select(
        (col("id") / rowsPerFile).cast("int").as("__slice"),
        (col("id") % rowsPerFile).as("__j"))
      .select(
        col("__slice"),
        // spread rows across the slice hour
        (lit(t0).cast("long") + col("__slice") * 3600L +
          (col("__j") * 3600L / rowsPerFile)).cast("timestamp").as("ts"),
        concat(lit("type_"), (col("__j") % nTypes)).as("event_type"),
        // user population drifts per slice so every window's distinct
        // count differs; collisions within a window are intended
        (xxhash64(col("__slice") * lit(10007L) + col("__j")) % 5000L).as("user_id"))
    events.repartition(col("__slice"))
      .write.partitionBy("__slice").parquet(s"$base/gen")
    var mt = 1000000L
    (0 until nFiles).foreach { i =>
      fs.listStatus(new Path(s"$base/gen/__slice=$i"))
        .filter(_.getPath.getName.startsWith("part-"))
        .zipWithIndex.foreach { case (f, j) =>
          val dst = new Path(in, f"$i%05d-$j.parquet")
          fs.rename(f.getPath, dst)
          fs.setTimes(dst, mt, -1)
        }
      mt += 1000
    }
    // sentinel far past the last real window: flushes every real window;
    // its own window ends past the final watermark and never emits
    val sentinelTs = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    spark.range(1).select(lit(sentinelTs).as("ts"),
        lit("zz_sentinel").as("event_type"), lit(-1L).as("user_id"))
      .coalesce(1).write.parquet(s"$base/sent")
    fs.listStatus(new Path(s"$base/sent"))
      .filter(_.getPath.getName.startsWith("part-"))
      .foreach { f =>
        val dst = new Path(in, "zzzzz-sentinel.parquet")
        fs.rename(f.getPath, dst)
        fs.setTimes(dst, mt, -1)
      }

    // ---- listener: every batch's duration + state rows
    val batchMs = new scala.collection.mutable.ArrayBuffer[Double]()
    val stateRows = new scala.collection.mutable.ArrayBuffer[Long]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        if (e.progress.numInputRows > 0) {
          batchMs += e.progress.durationMs.get("triggerExecution").toDouble
          val so = e.progress.stateOperators
          if (so.nonEmpty) stateRows += so.map(_.numRowsTotal).sum
        }
      }
    })

    // ---- the soak: one stateful run, one file per trigger
    import graft.operators.Sketch
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    val (bucket, rank) = Sketch.hllBucketRank(col("user_id"), p, salt = "wsoak")
    def registers(df: org.apache.spark.sql.DataFrame) =
      graft.streaming.Windows.tumbling(
        df.select(col("ts"), col("event_type"),
          bucket.as("bucket"), rank.as("r")),
        "ts", "6 hours", "30 minutes",
        Seq("event_type", "bucket"), Seq(max(col("r")).as("mr")))
    val tRun0 = System.nanoTime()
    val finished = registers(stream)
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .format("parquet").option("path", out)
      .start().awaitTermination(1800000)
    require(finished, "window soak did not finish within 30 min")
    val runSec = (System.nanoTime() - tRun0) / 1e9

    // ---- correctness: sink registers ≡ batch derivation (whole soak)
    val sink = spark.read.parquet(out)
      .select(col("window.start").as("ws"), col("event_type"),
        col("bucket"), col("mr"))
    val batch = registers(spark.read.parquet(in))
      .select(col("window.start").as("ws"), col("event_type"),
        col("bucket"), col("mr"))
      .filter(col("event_type") =!= "zz_sentinel") // never-emitted window
    val onlySink = sink.exceptAll(batch).count()
    val onlyBatch = batch.exceptAll(sink).count()
    val sinkRows = sink.count()

    // ---- report
    def fmt(v: Double) = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val q = batchMs.length / 4
    val firstQ = batchMs.take(q); val lastQ = batchMs.takeRight(q)
    val drift = (lastQ.sum / lastQ.length) / (firstQ.sum / firstQ.length)
    // analytic bound: windows alive within (width + lateness + 1 slice)
    // of the tip, × types × 2^p registers (+ the sentinel's one row)
    val activeWindows = math.ceil((6.0 + 0.5) / 6.0).toInt + 1
    val bound = (activeWindows + 1) * nTypes * (1 << p) + 1
    val sFirst = stateRows.take(q); val sLast = stateRows.takeRight(q)
    println(s"""{"metric":"window_soak","files":$nFiles,"batches":${batchMs.length},
      |"run_sec":${fmt(runSec)},
      |"batch_ms_first_q":${fmt(firstQ.sum / firstQ.length)},
      |"batch_ms_last_q":${fmt(lastQ.sum / lastQ.length)},
      |"latency_drift":${fmt(drift)},
      |"state_rows_max":${stateRows.max},
      |"state_rows_bound":$bound,
      |"state_rows_first_q_mean":${fmt(sFirst.sum.toDouble / sFirst.length)},
      |"state_rows_last_q_mean":${fmt(sLast.sum.toDouble / sLast.length)},
      |"sink_rows":$sinkRows,
      |"sink_minus_batch":$onlySink,"batch_minus_sink":$onlyBatch}"""
      .stripMargin.replace("\n", ""))
    require(onlySink == 0 && onlyBatch == 0,
      "stream registers must equal the batch derivation")
    require(stateRows.max <= bound,
      s"state rows ${stateRows.max} exceeded the analytic bound $bound")
    spark.stop()
  }
}
