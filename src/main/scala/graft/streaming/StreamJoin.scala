package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream join — the live two-stream correlation
  * the reference approximates by querying one indexed stream from the
  * other's handler (action arrives → look up its matching state delta;
  * `/root/reference/src/indexer/modules/master.ts` routes both streams
  * through one process precisely so handlers can correlate them).
  * Spark-first, that correlation is a first-class operator: two
  * watermarked streams joined on key + event-time range, with state
  * for each side bounded by the watermark delay plus the join window —
  * never the full history (the property that keeps a 100 TB/day event
  * feed joinable: state is O(rate × horizon), independent of stream
  * age).
  *
  * [[attribute]] is the canonical shape — attribute each `view` to the
  * `click`s that follow it from the same user within `withinSeconds`,
  * LEFT OUTER so views with no click in the horizon surface once, with
  * a null click, after the watermark passes their horizon. Eviction
  * correctness falls out of the range predicate (Spark derives the
  * state-retention bound from `click_ts ≤ view_ts + within`); emission
  * of unmatched rows requires the watermark to actually pass, which a
  * bounded replay forces with one far-future sentinel row per side
  * (the [[graft.SparkEntry]] fixture does; sentinels carry user −1 and
  * are filtered in the rollup).
  *
  * Lag is exact integer microseconds (`unix_micros` both sides), so
  * the whole result hash-oracles against a batch self-join in DuckDB.
  */
object StreamJoin {

  /** Left-outer view→click attribution within `withinSeconds`.
    * Inputs are streaming DataFrames with (event_id, ts, user_id).
    * Output: (user_id, view_id, view_ts, click_id, lag_us) — one row
    * per (view, click) match plus one null-click row per view that
    * saw no click before its horizon expired.
    */
  def attribute(views: DataFrame, clicks: DataFrame,
      delay: String = "1 hour", withinSeconds: Long = 21600L): DataFrame = {
    val v = views
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", delay)
    val c = clicks
      .select(col("user_id").as("click_user"),
        col("event_id").as("click_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", delay)
    v.join(c,
      expr(s"""user_id = click_user AND
               click_ts >= view_ts AND
               click_ts <= view_ts + interval $withinSeconds seconds"""),
      "leftOuter")
      .select(col("user_id"), col("view_id"), col("view_ts"),
        col("click_id"),
        (unix_micros(col("click_ts")) - unix_micros(col("view_ts")))
          .as("lag_us"))
  }
}
