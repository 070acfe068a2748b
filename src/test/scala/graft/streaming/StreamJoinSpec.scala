package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Stream-stream attribution join witnesses: in-window matches across
  * micro-batch boundaries with exact integer lags, multi-click
  * fan-out, out-of-window exclusion, and the left-outer null-click
  * emission once the watermark passes a view's horizon.
  */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")

  private def run(
      viewRows: Seq[Seq[(Long, Long, java.sql.Timestamp)]],
      clickRows: Seq[Seq[(Long, Long, java.sql.Timestamp)]],
      withinSeconds: Long): Seq[(Long, Long, Option[Long], Option[Long])] = {
    implicit val sqlCtx = spark.sqlContext
    val vs = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val cs = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val out = StreamJoin.attribute(
      vs.toDF().toDF("event_id", "user_id", "ts")
        .select($"user_id", $"event_id", $"ts"),
      cs.toDF().toDF("event_id", "user_id", "ts")
        .select($"user_id", $"event_id", $"ts"),
      delay = "2 minutes", withinSeconds = withinSeconds)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sj_out")
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      viewRows.zipAll(clickRows, Seq.empty, Seq.empty).foreach { case (v, c) =>
        if (v.nonEmpty) vs.addData(v)
        if (c.nonEmpty) cs.addData(c)
        q.processAllAvailable()
      }
      spark.table("sj_out")
        .select($"user_id", $"view_id", $"click_id", $"lag_us")
        .as[(Long, Long, Option[Long], Option[Long])]
        .collect().toSeq.sortBy(r => (r._1, r._2, r._3.getOrElse(-1L)))
    } finally {
      q.stop(); spark.sql("DROP TABLE IF EXISTS sj_out")
    }
  }

  test("in-window matches across batches, exact integer lag, fan-out") {
    val out = run(
      // views: batch 1
      Seq(Seq((100L, 1L, ts(0)), (101L, 2L, ts(1)))),
      // clicks: user 1 twice in window (batch 2), user 2 once
      Seq(Seq.empty,
        Seq((200L, 1L, ts(2)), (201L, 1L, ts(4)), (202L, 2L, ts(3)))),
      withinSeconds = 300L)
    val matched = out.filter(_._3.isDefined)
    assert(matched === Seq(
      (1L, 100L, Some(200L), Some(120000000L)), // 2 min
      (1L, 100L, Some(201L), Some(240000000L)), // 4 min
      (2L, 101L, Some(202L), Some(120000000L))))
  }

  test("a click outside the window never matches; the view goes unmatched") {
    val out = run(
      // the GLOBAL watermark is the min across both inputs, so BOTH
      // sides need a late row before the outer view can emit
      Seq(Seq((100L, 1L, ts(0))), Seq((199L, 8L, ts(40)))),
      // click at +10 min > 5-min window
      Seq(Seq((200L, 1L, ts(10))), Seq((201L, 9L, ts(40)))),
      withinSeconds = 300L)
    assert(out.contains((1L, 100L, None, None)))
    assert(!out.exists(r => r._1 == 1L && r._3.isDefined))
  }

  test("unmatched views surface exactly once with a null click") {
    val out = run(
      // sentinels advance BOTH sides (global watermark = min of the two)
      Seq(Seq((100L, 1L, ts(0)), (101L, 2L, ts(0))), Seq((998L, -2L, ts(60)))),
      // user 1 clicks in window; user 2 never
      Seq(Seq((200L, 1L, ts(1))), Seq((999L, -1L, ts(60)))),
      withinSeconds = 300L)
    assert(out.count(r => r._1 == 2L && r._2 == 101L) === 1)
    assert(out.filter(r => r._1 == 2L).forall(_._3.isEmpty))
    assert(out.filter(r => r._1 == 1L && r._3.isDefined).size === 1)
  }
}
