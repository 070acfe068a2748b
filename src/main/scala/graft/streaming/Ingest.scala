package graft.streaming

import graft.schema._
import graft.state.StateMerge
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming ingestion — the Spark re-expression of the
  * reference's reader→deserializer→indexer worker topology (SURVEY §3.3):
  * one streaming job; the master/worker/queue choreography collapses into
  * Spark's own scheduler.
  *
  *   source (file/socket stream of raw trace rows)
  *     → receipts-merge dedup (ActionDedup, per micro-batch)
  *     → append to the partitioned actions history table  [S4]
  *     ∥ state tables maintained by last-writer-wins merge [S5-S7]
  *
  * Idempotency (the reference's natural-key `_id`s,
  * elastic-routes.ts:54-109): appends dedupe on `global_sequence` within
  * the batch; replayed batches overwrite deterministically because the
  * partition layout is a pure function of `block_num`.
  */
object Ingest {

  /** Partition column: block-range bucket, like the reference's
    * `index_partition_size`-block ES indices (elastic-routes.ts:484-486).
    * Partition pruning on block predicates is Catalyst-native.
    */
  def blockBucket(partitionSize: Long = 1000000L) =
    (col("block_num") / partitionSize).cast("long").as("block_bucket")

  /** Start the actions-history ingestion: raw traces stream → dedup →
    * partitioned parquet append.
    */
  def startActionIngest(
      traces: DataFrame,
      outDir: String,
      checkpointDir: String,
      partitionSize: Long = 1000000L)(implicit spark: SparkSession): StreamingQuery = {
    import spark.implicits._
    traces.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val merged = graft.etl.ActionDedup.mergeReceipts(batch.as[RawTrace])
        merged
          .dropDuplicates("global_sequence")
          .withColumn("block_bucket", blockBucket(partitionSize))
          // write-time sort (the reference's index.sort on global_sequence,
          // index-templates.ts:35-38): parquet row-group min/max stats then
          // skip row groups for block/sequence range predicates
          .sortWithinPartitions(col("block_bucket"), col("block_num"), col("global_sequence"))
          .write.mode("append")
          .partitionBy("block_bucket")
          .parquet(outDir)
      }
      .start()
  }

  /** Start a state-table maintenance stream: delta rows → last-writer-wins
    * compacted state at `stateDir` (rewritten per batch; with a
    * Delta-style table this becomes MERGE).
    */
  def startStateMerge(
      deltas: DataFrame,
      stateDir: String,
      checkpointDir: String,
      keys: Seq[String])(implicit spark: SparkSession): StreamingQuery =
    deltas.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val prev =
          try spark.read.parquet(stateDir)
          catch { case _: Exception => spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], batch.schema) }
        val next = StateMerge.merge(prev, batch, keys)
        val tmp = stateDir + "__next"
        next.write.mode("overwrite").parquet(tmp)
        spark.read.parquet(tmp).write.mode("overwrite").parquet(stateDir)
      }
      .start()
}
