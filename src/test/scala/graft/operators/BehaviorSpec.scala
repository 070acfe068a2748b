package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** Ordered-funnel and cohort-retention semantics on hand-built event
  * fixtures — strict-ordering rules, cohort assignment, offset math.
  */
class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def ev(rows: (Long, String, String)*) =
    rows.map { case (u, t, w) => (u, t, ts(w)) }.toDF("user_id", "event_type", "ts")

  test("funnel: out-of-order completion does not convert") {
    val events = ev(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 11:00:00"),
      (1L, "purchase", "2024-01-01 12:00:00"), // fully ordered → all stages
      (2L, "purchase", "2024-01-02 09:00:00"), // purchase BEFORE view/click
      (2L, "view", "2024-01-02 10:00:00"),
      (2L, "click", "2024-01-02 11:00:00"),
      (3L, "view", "2024-01-03 10:00:00")      // stalls after view
    )
    val f = Behavior.funnel(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    assert(f === Array((1, "view", 3L), (2, "click", 2L), (3, "purchase", 1L)))
  }

  test("funnel: equal timestamps are NOT strictly after — no conversion") {
    val events = ev(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 10:00:00")) // same instant
    val f = Behavior.funnel(events, "user_id", "event_type", "ts",
        Seq("view", "click"))
      .collect().map(r => (r.getInt(0), r.getLong(2))).toMap
    assert(f(1) === 1L)
    assert(f.getOrElse(2, 0L) === 0L)
  }

  test("funnel: stage uses the EARLIEST completion of the previous stage") {
    // user views at 10:00 and again at 14:00; click at 12:00 is after
    // the FIRST view → converts even though it precedes the second view
    val events = ev(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 12:00:00"),
      (1L, "view", "2024-01-01 14:00:00"))
    val f = Behavior.funnel(events, "user_id", "event_type", "ts",
        Seq("view", "click"))
      .collect().map(r => (r.getInt(0), r.getLong(2))).toMap
    assert(f(2) === 1L)
  }

  test("retention: cohorts are Monday weeks; offsets count distinct users once") {
    val events = ev(
      // user 1: first event Tue Jan 2 → cohort Mon Jan 1; active weeks 0 and 2
      (1L, "view", "2024-01-02 10:00:00"),
      (1L, "view", "2024-01-03 10:00:00"), // same week — one distinct row
      (1L, "view", "2024-01-16 10:00:00"), // Jan 15 week → offset 2
      // user 2: first event Thu Jan 11 → cohort Mon Jan 8; active weeks 0, 1
      (2L, "click", "2024-01-11 09:00:00"),
      (2L, "click", "2024-01-18 09:00:00"))
    val r = Behavior.retention(events, "user_id", "ts")
      .collect()
      .map(x => (x.getTimestamp(0).toString.take(10), x.getLong(1), x.getLong(2)))
      .sortBy(t => (t._1, t._2))
    assert(r === Array(
      ("2024-01-01", 0L, 1L),
      ("2024-01-01", 2L, 1L),
      ("2024-01-08", 0L, 1L),
      ("2024-01-08", 1L, 1L)))
  }
}
