package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class WindowsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int, sec: Int = 0): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$sec%02d")

  test("tumbling windows with watermark drop late data in append mode (ST6 analog)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val agg = Windows.tumbling(
      input.toDF().toDF("ts", "event_type", "value"),
      tsCol = "ts", width = "5 minutes", lateness = "2 minutes",
      groupCols = Seq("event_type"),
      aggs = Seq(count(lit(1)).as("n"), round(sum($"value"), 2).as("v")))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("win_out")
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      // batch 1: fill window [10:00, 10:05)
      input.addData((ts(0), "a", 1.0), (ts(1), "a", 2.0), (ts(4, 59), "b", 3.0))
      q.processAllAvailable()
      // batch 2: advance event time past watermark for window 1 → it closes
      input.addData((ts(10), "a", 5.0))
      q.processAllAvailable()
      // batch 3: LATE row for the closed window must be dropped
      input.addData((ts(1), "a", 100.0))
      q.processAllAvailable()
      // batch 4: advance far enough to close window [10:10, 10:15)
      input.addData((ts(20), "a", 7.0))
      q.processAllAvailable()
      val out = spark.table("win_out")
        .select($"window.start".cast("string"), $"event_type", $"n", $"v")
        .as[(String, String, Long, Double)].collect().toSet
      // closed window 1 emitted WITHOUT the late 100.0 row
      assert(out.contains(("2024-01-01 10:00:00", "a", 2L, 3.0)))
      assert(out.contains(("2024-01-01 10:00:00", "b", 1L, 3.0)))
      assert(out.contains(("2024-01-01 10:10:00", "a", 1L, 5.0)))
      assert(!out.exists(_._4 > 99.0), "late data leaked into a closed window")
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS win_out")
    }
  }

  test("streaming HLL registers equal the batch derivation; state is register-bounded") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, String)]
    val (bucket, rank) = graft.operators.Sketch.hllBucketRank($"user", 6, "hll")
    val regs = Windows.tumbling(
      input.toDF().toDF("ts", "g", "user")
        .select($"ts", $"g", bucket.as("bucket"), rank.as("r")),
      tsCol = "ts", width = "5 minutes", lateness = "0 seconds",
      groupCols = Seq("g", "bucket"),
      aggs = Seq(max($"r").as("mr")))
    val q = regs.writeStream.outputMode("append")
      .format("memory").queryName("hll_out")
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      // 200 distinct users into window [10:00, 10:05), one group
      input.addData((0 until 200).map(i => (ts(0), "a", s"u$i")): _*)
      q.processAllAvailable()
      // sentinel past the window closes it
      input.addData((ts(10), "zz", "s"))
      q.processAllAvailable()
      val got = spark.table("hll_out")
        .filter($"g" === "a")
        .select($"g", $"bucket", $"mr")
      // identical to the BATCH register derivation over the same rows —
      // the merge-freely contract between live and backfill sketches
      val batch = graft.operators.Sketch.hllSketch(
        (0 until 200).map(i => ("a", s"u$i")).toDF("g", "v"), "g", "v", 6)
      assert(got.select("bucket", "mr").as[(Long, Int)].collect().toSet ===
        batch.select("bucket", "mr").as[(Long, Int)].collect().toSet)
      // and the state the stream carried is register-bounded: ≤ 2^6 rows
      // for the group, NOT 200 user rows
      assert(got.count() <= 64,
        "streaming state must be the register file, not the distinct set")
      val lastProgress = q.lastProgress
      val stateRows = Option(lastProgress)
        .flatMap(p => p.stateOperators.headOption).map(_.numRowsTotal)
      stateRows.foreach(n => assert(n <= 2 * 64 + 2,
        s"state rows $n exceed the register bound"))
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS hll_out")
    }
  }

  test("sliding windows produce overlapping buckets") {
    // batch-frame check of the window shape (no stream needed)
    val df = Seq((ts(0), 1.0), (ts(3), 1.0)).toDF("ts", "value")
    val out = df.groupBy(window($"ts", "5 minutes", "1 minute"))
      .agg(sum($"value").as("v"))
    // event at 10:00 belongs to 5 sliding windows; 10:03 to 5; 2 shared
    assert(out.count() === 8)
  }
}
