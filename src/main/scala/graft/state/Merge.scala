package graft.state

import graft.operators.Latest
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Current-state maintenance over immutable files — the engine-side
  * answer to the reference's mutable stores (S5 scripted last-writer-wins
  * upserts in ES, S6/S7 Mongo bulkWrite upsert/delete).
  *
  * Model: state is a compacted table; each batch of change rows merges by
  * natural key keeping the row with the highest `block_num` (ties: the
  * batch wins over prior state, matching the reference's
  * `params.block_num >= ctx._source.block_num` Painless guard —
  * src/indexer/definitions/updateByBlock.painless.ts:3-30). Rows with
  * `present == 0` are deletions (S6: `deleteOne`).
  *
  * At scale this runs inside `foreachBatch`: `merge(state, batch, …)`
  * produces the next compacted state; with a Delta-style table the same
  * logic is a MERGE statement. The recovery view `fromHistory` rebuilds
  * state from the append-only history at any time — state is always
  * derivable, never authoritative.
  */
object StateMerge {

  /** One merge step: previous compacted state ∪ batch → next state.
    * Keeps max-block row per key; batch beats state at equal block_num;
    * then filters deletions.
    */
  def merge(
      state: DataFrame,
      batch: DataFrame,
      keys: Seq[String],
      blockCol: String = "block_num",
      presentCol: String = "present"): DataFrame = {
    val tagged = state.withColumn("__src", lit(0))
      .unionByName(batch.withColumn("__src", lit(1)))
    Latest.rowNumber(tagged, keys,
        Seq(col(blockCol).desc, col("__src").desc))
      .filter(col(presentCol) =!= 0)
      .drop("__src")
  }

  /** Recovery view: latest row per key over the full history, deletions
    * dropped — the reference's `row_number() = 1` snapshot semantics
    * (get_table_state.ts:35-66) over an ES-like history table.
    */
  def fromHistory(
      history: DataFrame,
      keys: Seq[String],
      blockCol: String = "block_num",
      presentCol: String = "present"): DataFrame =
    Latest.argmax(history, keys, col(blockCol))
      .filter(col(presentCol) =!= 0)
}

/** Fork retraction (ST5) — the reference deletes all rows of a forked
  * block id across indices (`deleteByQuery`,
  * src/indexer/workers/state-reader.ts:863-899). Over immutable files the
  * core stays append-only: forked block ids go to a tombstone table and
  * every read path anti-joins against it. Re-applied forks (same block
  * re-adopted) cancel the tombstone.
  */
object Forks {

  /** Live view of a history table given the fork tombstones. The
    * tombstone set is tiny (bounded by reversible depth) → broadcast
    * anti-join, no shuffle of the history side.
    */
  def liveView(history: DataFrame, tombstones: DataFrame,
      blockIdCol: String = "block_id"): DataFrame =
    history.join(
      broadcast(tombstones.select(col(blockIdCol)).distinct()),
      Seq(blockIdCol), "left_anti")

  /** Cancel tombstones for block ids that were re-adopted (fork of a
    * fork): a tombstone stands only if its retraction is not itself
    * retracted — latest event per block id wins.
    */
  def effectiveTombstones(forkEvents: DataFrame): DataFrame =
    Latest.argmax(forkEvents, Seq("block_id"), col("seq"))
      .filter(col("retracted") === true)
      .select("block_id")

  /** LIB watermark (ST6): tombstones below the last-irreversible block
    * can be compacted away (physically deleting the forked rows at the
    * next rewrite); reversible-window state above LIB stays.
    */
  def pruneBelowLib(tombstones: DataFrame, lib: Long,
      blockNumCol: String = "block_num"): DataFrame =
    tombstones.filter(col(blockNumCol) > lib)
}
