package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Co-located joins via bucketed tables — the shuffle-elimination story
  * for the engine's recurring join keys (actions ⋈ blocks on block_num,
  * actions ⋈ tx-metadata on trx_id).
  *
  * Writing both sides bucketed by the join key with the same bucket count
  * lets sort-merge joins run with NO Exchange on either side: at 100 TB
  * the recurring-join shuffle disappears entirely, paid once at write
  * time. (Parquet + Hive-style bucket metadata via saveAsTable; Spark's
  * bucket pruning also applies to single-key lookups.)
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      buckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .option("compression", "zstd")
      .bucketBy(buckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on the bucket key — planner emits
    * SortMergeJoin without Exchange when bucket specs line up.
    */
  def colocatedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      key: String,
      joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)
}
