package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation with watermarking — the engine's
  * late-data/finality story (the reference's closest analogs: calendar
  * `date_histogram` buckets (A9) and the LIB watermark (ST6) that
  * finalizes state below the last-irreversible block).
  *
  * The watermark is the streaming LIB: buckets older than
  * `lateness` behind the max observed event time are finalized and
  * late rows for them are dropped, exactly how LIB finalizes blocks.
  */
object Windows {

  /** Tumbling event-time window aggregation (streaming or batch frame). */
  def tumbling(
      events: DataFrame,
      tsCol: String,
      width: String,
      lateness: String,
      groupCols: Seq[String],
      aggs: Seq[Column]): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), width) +: groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Sliding window variant. */
  def sliding(
      events: DataFrame,
      tsCol: String,
      width: String,
      slide: String,
      lateness: String,
      groupCols: Seq[String],
      aggs: Seq[Column]): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), width, slide) +: groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
}
