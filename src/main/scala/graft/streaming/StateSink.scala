package graft.streaming

import graft.state.StateMerge
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pluggable keyed-upsert sink — the production boundary where one
  * micro-batch of delta rows becomes a last-writer-wins MERGE into the
  * engine's state tables.
  *
  * The reference's equivalent is the ES bulk router
  * (src/indexer/helpers/elastic-routes.ts:54-109): each row's natural key
  * becomes the `_id` of an `index`/`delete` bulk op, so replays overwrite
  * idempotently. Any sink with keyed upsert semantics drops in here:
  *
  *   - Elasticsearch: `_id = keys.mkString(":")` → bulk upsert; deletes
  *     (the merge's tombstone rows) → bulk delete ops.
  *   - Delta/Iceberg: `MERGE INTO state USING batch ON <keys> WHEN
  *     MATCHED UPDATE WHEN NOT MATCHED INSERT` (+ DELETE for tombstones).
  *   - Plain parquet (the in-repo default): [[ParquetStateSink]] — a
  *     key-hash-bucketed layout where each batch rewrites only the
  *     buckets it touches.
  *
  * Contract: `mergeBatch` must be idempotent per batch (Structured
  * Streaming redelivers a batch after a crash-restart) and must apply
  * last-writer-wins on the key columns.
  */
trait StateSink {

  /** The key columns last-writer-wins resolves on. */
  def keys: Seq[String]

  /** Merge one micro-batch of delta rows into the sink's state. */
  def mergeBatch(batch: DataFrame)(implicit spark: SparkSession): Unit

  /** Read the current compacted state back (for queries and tests). */
  def read(implicit spark: SparkSession): DataFrame
}

/** The plain-parquet [[StateSink]]: state partitioned by a stable
  * key-hash bucket `__kb` (`xxhash64(keys) mod nBuckets`), so each
  * micro-batch:
  *   1. computes the buckets its keys touch (≤ nBuckets values — a
  *      metadata-sized collect);
  *   2. reads ONLY those partitions of the previous state (Catalyst
  *      partition pruning on `__kb`);
  *   3. merges and rewrites ONLY those partitions (dynamic partition
  *      overwrite).
  * Per-batch work is therefore O(touched buckets), not O(state). The
  * staging round-trip (`__next`) exists because Spark refuses to
  * overwrite a path that feeds the plan being written; it also only
  * carries the touched buckets.
  */
final class ParquetStateSink(
    stateDir: String,
    val keys: Seq[String],
    nBuckets: Int = 256) extends StateSink {
  import org.apache.hadoop.fs.Path

  def mergeBatch(batch: DataFrame)(implicit spark: SparkSession): Unit = {
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

  def read(implicit spark: SparkSession): DataFrame =
    spark.read.parquet(stateDir)
}
