package graft.streaming

import graft.schema.{Receipt, RawTrace}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Assembled transaction (the stateful session's output). */
final case class TrxSession(
    trx_id: String,
    block_num: Long,
    n_actions: Long,
    n_receipts: Long,
    min_global_sequence: Long,
    max_global_sequence: Long,
    complete_at_watermark: Boolean)

private final case class TrxBuf(
    block_num: Long,
    digests: Set[String],
    nReceipts: Long,
    minSeq: Long,
    maxSeq: Long,
    maxEventMs: Long)

/** Stateful per-transaction assembly (ST9's stateful streaming form).
  *
  * The batch receipts-merge (`etl.ActionDedup`) assumes a transaction's
  * receipts arrive within one micro-batch. When the source interleaves
  * (a trx's receipts split across batches), correct assembly needs keyed
  * state: `groupByKey(trx_id).flatMapGroupsWithState` accumulates
  * receipts per transaction and emits the assembled summary when the
  * event-time watermark passes the transaction's block time — the same
  * finality rule as LIB (ST6). State for emitted transactions is
  * removed; abandoned keys expire via the event-time timeout.
  */
object Sessions {

  def assembleTransactions(
      traces: Dataset[RawTrace],
      lateness: String = "10 seconds")(implicit spark: SparkSession): Dataset[TrxSession] = {
    import spark.implicits._
    traces
      .withWatermark("timestamp", lateness)
      .groupByKey(_.trx_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(assemble)
  }

  private def assemble(
      trxId: String,
      rows: Iterator[RawTrace],
      state: GroupState[TrxBuf]): Iterator[TrxSession] = {
    if (state.hasTimedOut) {
      // watermark passed this trx's block time → finalize and clear
      val b = state.get
      state.remove()
      Iterator.single(TrxSession(
        trxId, b.block_num, b.digests.size, b.nReceipts, b.minSeq, b.maxSeq,
        complete_at_watermark = true))
    } else {
      val merged = rows.foldLeft(state.getOption.getOrElse(
        TrxBuf(Long.MaxValue, Set.empty, 0L, Long.MaxValue, Long.MinValue, 0L))) { (b, t) =>
        TrxBuf(
          math.min(b.block_num, t.block_num),
          b.digests + t.act_digest,
          b.nReceipts + 1,
          math.min(b.minSeq, t.receipt.global_sequence),
          math.max(b.maxSeq, t.receipt.global_sequence),
          math.max(b.maxEventMs, t.timestamp.getTime))
      }
      state.update(merged)
      // finalize once the watermark passes the trx's own event time:
      // the timeout anchors to the data's time (watermark-relative
      // anchoring would expire every key on the next watermark advance)
      state.setTimeoutTimestamp(
        math.max(merged.maxEventMs + 1, state.getCurrentWatermarkMs() + 1))
      Iterator.empty
    }
  }
}
