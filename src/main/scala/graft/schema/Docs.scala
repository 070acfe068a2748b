package graft.schema

import java.sql.Timestamp

/** Typed document model for the engine's history tables.
  *
  * Mirrors the reference's document shapes (see SURVEY.md §1.2):
  * action mapping `src/indexer/definitions/index-templates.ts:52-178` and
  * `src/interfaces/action-trace.ts:3-27`, delta mapping
  * `index-templates.ts:193-259` / `src/interfaces/hyperion-delta.ts:1-13`.
  *
  * Naming divergence (intentional, idiomatic for Spark): the reference's
  * `@timestamp` is `timestamp` here and the `@`-prefixed extension structs
  * (`@transfer`, …) drop the `@` (`transfer`, …) — `@` needs backtick
  * quoting in every Scala/SQL reference and buys nothing under Catalyst.
  */
final case class AuthSequence(account: String, sequence: Long)

final case class Receipt(
    receiver: String,
    global_sequence: Long,
    recv_sequence: Long,
    auth_sequence: Seq[AuthSequence])

final case class Authorization(actor: String, permission: String)

/** `act` struct. `data` is the opaque decoded-action JSON (the reference
  * stores it with `enabled:false`, i.e. not indexed — we keep it as a JSON
  * string column, filterable only post-scan, exactly like the reference).
  */
final case class Act(
    account: String,
    name: String,
    authorization: Seq[Authorization],
    data: String)

/** Typed `@transfer` extension (index-templates.ts:98-111). */
final case class TransferExt(
    from: String,
    to: String,
    amount: Option[Double],
    symbol: String,
    memo: String)

/** One row of the `actions` history table (flattened action trace). */
final case class ActionDoc(
    timestamp: Timestamp,
    global_sequence: Long,
    block_num: Long,
    block_id: String,
    producer: String,
    trx_id: String,
    action_ordinal: Int,
    creator_action_ordinal: Int,
    act: Act,
    receipts: Seq[Receipt],
    notified: Seq[String],
    act_digest: String,
    cpu_usage_us: Int,
    net_usage_words: Int,
    inline_count: Int,
    signatures: Seq[String],
    code_sequence: Int,
    abi_sequence: Int,
    ds_error: Boolean,
    transfer: Option[TransferExt])

/** One row of the `deltas` history table (contract-table row version).
  * `present == 0` means the row was deleted at this block.
  */
final case class DeltaDoc(
    timestamp: Timestamp,
    block_num: Long,
    block_id: String,
    code: String,
    scope: String,
    table: String,
    payer: String,
    primary_key: String,
    present: Int,
    data: String)

/** Light block header (index-templates.ts:399-427 / ST10). */
final case class BlockDoc(
    timestamp: Timestamp,
    block_num: Long,
    block_id: String,
    prev_id: String,
    producer: String,
    schedule_version: Long,
    trx_count: Long,
    cpu_usage: Long,
    net_usage: Long)

/** ABI version row — an as-of dimension keyed by (account, block).
  * All decoding joins against the version valid at the row's block
  * (reference: `src/indexer/workers/deserializer.ts:701-758`).
  */
final case class AbiDoc(
    block: Long,
    account: String,
    abi: String,
    abi_hex: String)

/** Permission link row (index-templates.ts:277-291). */
final case class LinkDoc(
    timestamp: Timestamp,
    block_num: Long,
    present: Int,
    account: String,
    code: String,
    action: String,
    permission: String)

/** Raw (pre-dedup) action trace receipt as emitted by the chain — the
  * input of the receipts-merge ETL stage (ST9). One row per receipt;
  * notification receipts duplicate the parent action's digest.
  */
final case class RawTrace(
    timestamp: Timestamp,
    block_num: Long,
    block_id: String,
    producer: String,
    trx_id: String,
    action_ordinal: Int,
    creator_action_ordinal: Int,
    act: Act,
    receipt: Receipt,
    act_digest: String,
    cpu_usage_us: Int,
    net_usage_words: Int,
    signatures: Seq[String])

/** One transaction trace status row (per trx per block) for light-block
  * derivation (ST10); status 0 = executed, 1/2/4 = failure classes.
  */
final case class TrxStatus(
    block_num: Long,
    trx_id: String,
    status: Int,
    cpu_usage_us: Long,
    net_usage_words: Long)
