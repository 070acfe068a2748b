package graft.exprs

import graft.schema.{Receipt, RawTrace}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Merged-action buffer/output of the typed receipts-merge aggregator. */
final case class MergedAction(
    global_sequence: Long,
    block_num: Long,
    trx_id: String,
    act_digest: String,
    receipts: Seq[Receipt],
    notified: Seq[String],
    inline_count: Int)

/** Typed `Aggregator[IN, BUF, OUT]` form of the receipts-merge (ST9) —
  * SURVEY §7.4's one custom aggregate. The DataFrame composition in
  * `etl.ActionDedup` is the production path (it gets map-side partial
  * aggregation from plain `agg` functions); this typed form exists for
  * callers composing typed `KeyValueGroupedDataset` pipelines, e.g.
  *
  *   traces.groupByKey(t => (t.trx_id, t.act_digest))
  *     .agg(ReceiptsMergeAgg.toColumn)
  *
  * and is spec-proven equivalent to the DataFrame path.
  */
object ReceiptsMergeAgg extends Aggregator[RawTrace, MergedAction, MergedAction] {

  override def zero: MergedAction =
    MergedAction(Long.MaxValue, 0L, "", "", Nil, Nil, -1)

  override def reduce(b: MergedAction, t: RawTrace): MergedAction =
    merge(b, MergedAction(
      t.receipt.global_sequence, t.block_num, t.trx_id, t.act_digest,
      Seq(t.receipt), Seq(t.receipt.receiver), 0))

  override def merge(a: MergedAction, b: MergedAction): MergedAction = {
    if (a.inline_count < 0 && a.receipts.isEmpty) return b
    if (b.inline_count < 0 && b.receipts.isEmpty) return a
    val receipts = (a.receipts ++ b.receipts).sortBy(_.global_sequence)
    MergedAction(
      math.min(a.global_sequence, b.global_sequence),
      if (a.global_sequence <= b.global_sequence) a.block_num else b.block_num,
      if (a.trx_id.nonEmpty) a.trx_id else b.trx_id,
      if (a.act_digest.nonEmpty) a.act_digest else b.act_digest,
      receipts,
      receipts.map(_.receiver),
      receipts.size - 1)
  }

  override def finish(r: MergedAction): MergedAction = r
  override def bufferEncoder: Encoder[MergedAction] = Encoders.product[MergedAction]
  override def outputEncoder: Encoder[MergedAction] = Encoders.product[MergedAction]
}
