package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Behavioral event analytics — ordered funnels and cohort retention
  * over the events stream (reference surface: the per-account activity
  * timelines behind `get_actions` / `get_created_accounts` generalized
  * to the conversion/retention questions an analytics user asks of
  * them; cf. `/root/reference/src/api/routes/v2-history/get_actions/
  * get_actions.ts` time-bucketed aggregations).
  */
object Behavior {

  /** Strictly-ordered funnel: how many users reach each stage prefix,
    * where stage i+1 counts only events STRICTLY AFTER the user's
    * earliest completion of stage i (the standard ordered-funnel
    * semantics — a purchase before the first view does not convert).
    *
    * Plan: one conditional-min aggregate per stage, each joined back to
    * the events keyed by user — every join and aggregate shares the
    * user-id partitioning, so stage count s costs s co-partitioned
    * passes with no broadcast of user state. Output is one row per
    * stage: (stage index, stage event, users reaching it).
    *
    * 100 TB shape: per-stage state is one timestamp per user; the
    * event table is re-scanned per stage but filtered to that stage's
    * event type at the scan (predicate pushdown makes pass s read only
    * stage-s rows).
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String, tsCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    var reached = events
      .filter(col(typeCol) === stages.head)
      .groupBy(col(userCol).as("user_id"))
      .agg(min(col(tsCol)).as("t"))
    val levels = Seq.newBuilder[DataFrame]
    levels += reached.select(
      lit(1).as("stage"), lit(stages.head).as("event_type"), col("user_id"))
    for ((st, i) <- stages.zipWithIndex.drop(1)) {
      reached = events
        .filter(col(typeCol) === st)
        .select(col(userCol).as("user_id"), col(tsCol).as("__ts"))
        .join(reached, "user_id")
        .filter(col("__ts") > col("t"))
        .groupBy("user_id")
        .agg(min(col("__ts")).as("t"))
      levels += reached.select(
        lit(i + 1).as("stage"), lit(st).as("event_type"), col("user_id"))
    }
    // one lazy union-aggregate job — no per-stage driver actions
    levels.result().reduce(_ unionAll _)
      .groupBy("stage", "event_type")
      .agg(count(lit(1)).as("users"))
  }

  /** Weekly cohort retention: users grouped by the ISO week of their
    * first event; for each (cohort week, week offset) the number of
    * distinct users active in that offset week. `date_trunc('week')`
    * (Monday-start) on both engines; offsets are exact integer
    * second-arithmetic — no float anywhere.
    *
    * Plan: first-event aggregate keyed by user → join back to events on
    * the same key (co-partitioned) → distinct (cohort, offset, user) →
    * count aggregate. Two shuffles on user, one on (cohort, offset).
    */
  def retention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val firsts = events
      .groupBy(col(userCol).as("user_id"))
      .agg(date_trunc("week", min(col(tsCol))).as("cohort_week"))
    events
      .select(col(userCol).as("user_id"), date_trunc("week", col(tsCol)).as("active_week"))
      .join(firsts, "user_id")
      .select(
        col("cohort_week"),
        ((unix_timestamp(col("active_week")) - unix_timestamp(col("cohort_week")))
          / 604800L).cast("long").as("week_offset"),
        col("user_id"))
      .distinct()
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("users"))
  }
}
