package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming exact dedup — drop duplicate records IN FLIGHT, across
  * micro-batch boundaries, so an ingest pipeline never lands the same
  * document twice. The state store holds one entry per key.
  *
  * Two contracts:
  *   - unbounded (`dedupStream`): exact forever — state grows with the
  *     distinct-key count. Right for bounded key spaces (block ids,
  *     content digests of a capped corpus).
  *   - watermarked (`dedupStreamWithinWatermark`): exact within the
  *     event-time horizon; the state store EVICTS keys older than the
  *     watermark, so state is bounded by the horizon's key arrival rate —
  *     the only shape that survives an unbounded 100 TB stream. Late
  *     duplicates beyond the horizon pass through (by design; pair with
  *     a downstream batch dedup over the landing zone for the tail).
  */
object StreamDedup {

  /** Exact streaming dedup on `keyCols`, unbounded state. */
  def dedupStream(stream: DataFrame, keyCols: Seq[String]): DataFrame =
    stream.dropDuplicates(keyCols)

  /** Exact-within-horizon streaming dedup: requires an event-time
    * watermark on `eventTimeCol`; state older than the watermark is
    * evicted.
    */
  def dedupStreamWithinWatermark(
      stream: DataFrame,
      keyCols: Seq[String],
      eventTimeCol: String,
      delay: String): DataFrame =
    stream.withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)
}
