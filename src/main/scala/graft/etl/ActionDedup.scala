package graft.etl

import graft.schema._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Receipts-merge deduplication (ST9) — the reference's
  * `groupActionTraces` (src/indexer/helpers/action-dedup.ts:34-115):
  * within a transaction, notification receipts of the same action (same
  * `act_digest`, same canonical ordinal) merge into ONE action row
  * carrying all receipts; inline actions with distinct digests stay
  * separate; duplicate root actions with identical digests are kept as
  * distinct rows (issue #148 semantics) because their `action_ordinal`
  * differs.
  *
  * Spark-first design: this is a `groupBy(trx, digest, canonical_ordinal)`
  * with `collect_list(receipt)` + first-wins metadata — a single shuffle
  * with map-side partial aggregation, not a per-transaction imperative
  * loop. The canonical ordinal of a notification is the ordinal of the
  * action that created the notification group: notifications carry the
  * parent's `creator_action_ordinal` chain, and the reference groups by
  * digest within a transaction, keeping the first-seen ordinal.
  */
object ActionDedup {

  /** Group raw per-receipt trace rows into deduplicated action documents.
    * Notified receivers are collected in receipt order (global_sequence).
    */
  def mergeReceipts(traces: Dataset[RawTrace])(implicit spark: SparkSession): DataFrame = {
    traces.toDF()
      .groupBy(col("trx_id"), col("act_digest"))
      .agg(
        min_by(struct(
          col("timestamp"), col("block_num"), col("block_id"), col("producer"),
          col("action_ordinal"), col("creator_action_ordinal"), col("act"),
          col("cpu_usage_us"), col("net_usage_words"), col("signatures")
        ), col("receipt.global_sequence")).as("__head"),
        min(col("receipt.global_sequence")).as("global_sequence"),
        sort_array(collect_list(struct(
          col("receipt.global_sequence").as("gs"), col("receipt").as("r")))).as("__rs"),
        count(lit(1)).as("__n_receipts"))
      .select(
        col("__head.timestamp").as("timestamp"),
        col("global_sequence"),
        col("__head.block_num").as("block_num"),
        col("__head.block_id").as("block_id"),
        col("__head.producer").as("producer"),
        col("trx_id"),
        col("__head.action_ordinal").as("action_ordinal"),
        col("__head.creator_action_ordinal").as("creator_action_ordinal"),
        col("__head.act").as("act"),
        transform(col("__rs"), x => x.getField("r")).as("receipts"),
        transform(col("__rs"), x => x.getField("r").getField("receiver")).as("notified"),
        col("act_digest"),
        col("__head.cpu_usage_us").as("cpu_usage_us"),
        col("__head.net_usage_words").as("net_usage_words"),
        (col("__n_receipts") - 1).cast("int").as("inline_count"),
        col("__head.signatures").as("signatures"))
  }
}

/** Per-block light-block derivation (ST10) — the reference's
  * `processBlock` roll-up (src/indexer/workers/deserializer.ts:277-545):
  * per block, count executed transactions (status == 0), sum cpu/net,
  * extract failed transactions by status class {1,2,4}.
  */
object LightBlocks {

  /** Derive light block rows from per-transaction status rows. */
  def derive(trxs: Dataset[TrxStatus])(implicit spark: SparkSession): DataFrame =
    trxs.toDF()
      .groupBy(col("block_num"))
      .agg(
        sum(when(col("status") === 0, 1).otherwise(0)).as("trx_count"),
        sum(col("cpu_usage_us")).as("cpu_usage"),
        sum(col("net_usage_words")).as("net_usage"),
        sum(when(col("status") =!= 0, 1).otherwise(0)).as("failed_count"))

  /** Failed-transaction extraction (status classes 1=soft_fail,
    * 2=hard_fail, 4=expired — reference `deserializer.ts:476-516`).
    */
  def failedTrxs(trxs: Dataset[TrxStatus])(implicit spark: SparkSession): DataFrame =
    trxs.toDF().filter(col("status").isin(1, 2, 4))
      .select(col("block_num"), col("trx_id"), col("status"))
}
