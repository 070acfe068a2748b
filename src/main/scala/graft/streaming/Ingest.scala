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
    *
    * `trigger` selects the mode: `AvailableNow` (default) is the bounded
    * backfill/catch-up run; `ProcessingTime` is the reference's continuous
    * live tail (state-reader.ts:446-513) — the same pipeline keeps
    * following the head, each micro-batch appending the newly arrived
    * blocks idempotently.
    */
  def startActionIngest(
      traces: DataFrame,
      outDir: String,
      checkpointDir: String,
      partitionSize: Long = 1000000L,
      trigger: Trigger = Trigger.AvailableNow())(
      implicit spark: SparkSession): StreamingQuery = {
    import spark.implicits._
    traces.writeStream
      .trigger(trigger)
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
    * compacted state at `stateDir`.
    *
    * The state table is partitioned by a stable key-hash bucket `__kb`
    * (`xxhash64(keys) mod nBuckets`), so each micro-batch:
    *   1. computes the buckets its keys touch (≤ nBuckets values — a
    *      metadata-sized collect);
    *   2. reads ONLY those partitions of the previous state (Catalyst
    *      partition pruning on `__kb`);
    *   3. merges and rewrites ONLY those partitions (dynamic partition
    *      overwrite).
    * Per-batch work is therefore O(touched buckets), not O(state) — the
    * plain-parquet equivalent of a keyed MERGE; a Delta/Iceberg table or
    * an upsert KV sink drops in at this same `foreachBatch` boundary. The
    * staging round-trip (`__next`) exists because Spark refuses to
    * overwrite a path that feeds the plan being written; it also only
    * carries the touched buckets.
    */
  def startStateMerge(
      deltas: DataFrame,
      stateDir: String,
      checkpointDir: String,
      keys: Seq[String],
      nBuckets: Int = 256,
      trigger: Trigger = Trigger.AvailableNow())(
      implicit spark: SparkSession): StreamingQuery = {
    import org.apache.hadoop.fs.Path
    // The bucket layout is a pure function of nBuckets; a run with a
    // different value would prune reads to the WRONG partitions and leave
    // stale rows behind (two rows per key). Persist it once and fail fast
    // on mismatch rather than corrupt silently.
    checkBucketMarker(stateDir, nBuckets)
    deltas.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val keyBucket = pmod(xxhash64(keys.map(col): _*), lit(nBuckets)).cast("int")
        val bucketed = batch.withColumn("__kb", keyBucket)
        val touched = bucketed.select(col("__kb")).distinct()
          .collect().map(_.getInt(0)).toSeq.sorted
        if (touched.nonEmpty) {
          val fs = new Path(stateDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
          // First batch ever (no state yet) → empty prior. ANY other read
          // failure — legacy unbucketed layout, corrupt files, transient IO
          // — must propagate and fail the batch: falling back to "no prior
          // state" here would let the dynamic overwrite below silently drop
          // the touched buckets' existing rows.
          val prev =
            if (fs.exists(new Path(stateDir)))
              spark.read.parquet(stateDir).filter(col("__kb").isin(touched: _*))
            else spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], bucketed.schema)
          val next = StateMerge.merge(prev, bucketed, keys)
          val tmp = stateDir + "__next"
          next.write.mode("overwrite").partitionBy("__kb").parquet(tmp)
          val written = fs.listStatus(new Path(tmp)).map(_.getPath.getName)
            .filter(_.startsWith("__kb=")).map(_.stripPrefix("__kb=").toInt).toSet
          if (written.nonEmpty)
            spark.read.parquet(tmp)
              .write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("__kb")
              .parquet(stateDir)
          // dynamic overwrite only replaces partitions present in `next`;
          // a bucket whose keys were ALL deleted this batch has no rows
          // and would keep its stale partition — remove it explicitly
          (touched.toSet -- written).foreach { b =>
            fs.delete(new Path(stateDir, s"__kb=$b"), true)
          }
        }
      }
      .start()
  }

  /** Persisted alongside the state so a later run cannot silently re-bucket
    * with a different modulus (which would break last-writer-wins: a key's
    * fresh row lands in a new bucket while its stale row survives the old).
    */
  private def checkBucketMarker(stateDir: String, nBuckets: Int)(
      implicit spark: SparkSession): Unit = {
    import org.apache.hadoop.fs.Path
    val marker = new Path(stateDir + "__meta", "nbuckets")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      val persisted =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt
        finally in.close()
      require(persisted == nBuckets,
        s"state at $stateDir was bucketed with nBuckets=$persisted; refusing to run with nBuckets=$nBuckets")
    } else {
      val out = fs.create(marker, true)
      try out.write(nBuckets.toString.getBytes("UTF-8")) finally out.close()
    }
  }
}
