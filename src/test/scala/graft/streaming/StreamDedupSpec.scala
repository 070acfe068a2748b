package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("unbounded dedup drops duplicates across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val out = StreamDedup.dedupStream(
      input.toDF().toDF("id", "k"), Seq("k"))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sd_out")
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      input.addData((1L, "a"), (2L, "b"), (3L, "a"))
      q.processAllAvailable()
      input.addData((4L, "b"), (5L, "c"), (6L, "a"))
      q.processAllAvailable()
      val keys = spark.table("sd_out").select($"k").as[String].collect().toSeq
      // one row per key, batch boundaries invisible
      assert(keys.sorted === Seq("a", "b", "c"))
    } finally {
      q.stop(); spark.sql("DROP TABLE IF EXISTS sd_out")
    }
  }

  test("watermarked dedup: in-horizon dups dropped, state evicted beyond it") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val out = StreamDedup.dedupStreamWithinWatermark(
      input.toDF().toDF("ts", "k"), Seq("k"), "ts", "5 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sdw_out")
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      // batch 1: a dup inside one batch
      input.addData((ts(0), "a"), (ts(1), "a"), (ts(0), "b"))
      q.processAllAvailable()
      // batch 2: still within horizon → dup of a dropped
      input.addData((ts(3), "a"))
      q.processAllAvailable()
      // batch 3: advance watermark far past a's expiry...
      input.addData((ts(30), "z"))
      q.processAllAvailable()
      // batch 4: ...then a re-arrival beyond the horizon passes through
      input.addData((ts(31), "a"))
      q.processAllAvailable()
      val ks = spark.table("sdw_out").select($"k").as[String].collect().toSeq
      assert(ks.count(_ == "a") === 2, s"horizon re-arrival must pass: $ks")
      assert(ks.count(_ == "b") === 1 && ks.count(_ == "z") === 1)
    } finally {
      q.stop(); spark.sql("DROP TABLE IF EXISTS sdw_out")
    }
  }
}
