package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketized interval joins — the non-equi join class Spark's planner
  * has no native strategy for: `point BETWEEN start AND end` or
  * interval-overlap predicates fall back to BroadcastNestedLoopJoin
  * (or a cartesian at that), which is O(|A|·|B|) however selective the
  * predicate. The standard fix, implemented here as plain DataFrame
  * algebra: quantize time into fixed-width buckets, explode each
  * interval to the buckets it covers (`sequence()` — codegen'd, no
  * UDF), hash-join on the bucket key, and re-check the exact predicate
  * after the join. Work becomes O(matching bucket pairs) and the join
  * is a shuffle hash/SMJ on an equi-key — partitionable at any scale.
  *
  * Correctness notes baked into the shapes:
  *  - point-in-interval: a point lives in exactly ONE bucket, so no
  *    dedup is ever needed — each (point, interval) match is produced
  *    once, in the point's bucket;
  *  - interval-overlap: a pair can share several buckets, so each pair
  *    is emitted only in its CANONICAL bucket (the greater of the two
  *    start buckets — a bucket both sides provably cover), which
  *    dedupes without a distinct;
  *  - a `maxBucketsPerInterval` guard fails loudly when an interval
  *    spans more buckets than the configured bound — the long-tail
  *    interval that would explode the index belongs on a broadcast
  *    side-path, and silently exploding it is the quadratic this
  *    operator exists to prevent. The guard lives INSIDE the sequence
  *    bound expression (a dropped audit column would be pruned by
  *    Catalyst and never run). Pick `bucketWidth` near the median
  *    interval length; the guard is the skew alarm.
  */
object IntervalJoin {

  /** End-bucket expression with the span guard fused in: evaluating the
    * bound of an over-long interval raises, so the explode can never
    * silently go quadratic.
    */
  private def endBucketGuarded(
      s: Column, e: Column, bucketWidth: Long, maxB: Int): Column = {
    val sb = (s.cast("long") / bucketWidth).cast("long")
    val eb = (e.cast("long") / bucketWidth).cast("long")
    when(eb - sb + 1 > maxB,
      raise_error(concat(
        lit(s"interval spans "), (eb - sb + 1),
        lit(s" buckets > bound $maxB at width $bucketWidth — widen the " +
          "bucket or route long intervals to a broadcast side-path")))
        .cast("long"))
      .otherwise(eb)
  }

  /** Join points (`tsCol`, epoch seconds) to intervals
    * ([`startCol`, `endCol`], inclusive, epoch seconds). Output carries
    * both sides' columns; resolve name collisions by selecting first.
    */
  def pointInInterval(
      points: DataFrame,
      tsCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      bucketWidth: Long,
      maxBucketsPerInterval: Int = 1024): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val iv = intervals.withColumn("__bucket", explode(sequence(
      (col(startCol).cast("long") / bucketWidth).cast("long"),
      endBucketGuarded(col(startCol), col(endCol), bucketWidth,
        maxBucketsPerInterval))))
    val pt = points.withColumn("__bucket",
      (col(tsCol).cast("long") / bucketWidth).cast("long"))
    pt.join(iv, Seq("__bucket"))
      .filter(col(tsCol).cast("long").between(
        col(startCol).cast("long"), col(endCol).cast("long")))
      .drop("__bucket")
  }

  /** Overlap join of two interval tables: rows where
    * `[aStart, aEnd]` and `[bStart, bEnd]` intersect (inclusive).
    * Emits each matching pair exactly once via the canonical-bucket
    * rule — no distinct over the (potentially wide) output.
    */
  def intervalOverlap(
      a: DataFrame, aStart: String, aEnd: String,
      b: DataFrame, bStart: String, bEnd: String,
      bucketWidth: Long,
      maxBucketsPerInterval: Int = 1024): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def bucketed(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn("__sb", (col(s).cast("long") / bucketWidth).cast("long"))
        .withColumn("__bucket", explode(sequence(col("__sb"),
          endBucketGuarded(col(s), col(e), bucketWidth, maxBucketsPerInterval))))
    val av = bucketed(a, aStart, aEnd).withColumnRenamed("__sb", "__sba")
    val bv = bucketed(b, bStart, bEnd).withColumnRenamed("__sb", "__sbb")
    av.join(bv, Seq("__bucket"))
      .filter(col(aStart).cast("long") <= col(bEnd).cast("long") &&
        col(bStart).cast("long") <= col(aEnd).cast("long"))
      // canonical bucket: both sides cover max(sbA, sbB) whenever the
      // intervals overlap, so exactly one joined bucket passes
      .filter(col("__bucket") === greatest(col("__sba"), col("__sbb")))
      .drop("__bucket", "__sba", "__sbb")
  }
}
