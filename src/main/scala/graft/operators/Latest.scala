package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-row-per-key — the reference's universal "current state" recovery
  * (top_hits argmax `get_table_state.ts:55-66`, scripted last-writer-wins
  * upsert `updateByBlock.painless.ts:3-30`).
  *
  * Two physical strategies, both single-shuffle on the key:
  *  - `argmax`: map-side-combining `max_by(struct(*), ord)` aggregate —
  *    preferred at scale (partial aggregation halves shuffle volume when
  *    keys repeat within partitions, the common case for hot keys);
  *  - `rowNumber`: window `row_number() == 1` — keeps the full row without
  *    a struct rebuild; needed when ties must break on multiple columns.
  */
object Latest {

  /** Keep the row with max `ord` per key via map-side-combining argmax. */
  def argmax(df: DataFrame, keys: Seq[String], ord: Column): DataFrame = {
    val others = df.columns.filterNot(keys.contains)
    df.groupBy(keys.map(col): _*)
      .agg(
        max_by(struct(others.map(col): _*), ord).as("__latest"))
      .select(keys.map(col) ++ others.map(c => col(s"__latest.$c").as(c)): _*)
  }

  /** Keep the first row per key in (orderBy...) order via row_number. */
  def rowNumber(df: DataFrame, keys: Seq[String], orderBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderBy: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}

/** Sequence-gap detection — re-expression of the reference's binary-search
  * block-gap scan (`src/cli/repair-cli/scan.ts:298-335`) as one
  * distributed pass: a gap exists between consecutive present values
  * whenever `lead(seq) > seq + 1`. One window shuffle instead of a
  * driver-side recursive count probe.
  */
object Gaps {
  /** Returns (gap_start, gap_end) inclusive ranges of missing values of
    * `seqCol` within the observed min/max.
    */
  def detect(df: DataFrame, seqCol: String): DataFrame = {
    // constant partition key: intended single-partition plan (the
    // bucketed variant is the scale path). NOTE: Spark 4's
    // EliminateWindowPartitions prunes the foldable key, so the
    // WindowExec WARN still fires — see PLANS.md's attribution table
    val w = Window.partitionBy(lit(1)).orderBy(col(seqCol))
    df.select(col(seqCol))
      .distinct()
      .withColumn("__next", lead(col(seqCol), 1).over(w))
      .filter(col("__next") > col(seqCol) + 1)
      .select(
        (col(seqCol) + 1).as("gap_start"),
        (col("__next") - 1).as("gap_end"))
  }

  /** Scalable variant: pre-aggregates per fixed-size bucket so the global
    * single-partition window only sees bucket boundaries. At 100 TB the
    * naive global window is a single-reducer sort; this keeps all heavy
    * work distributed and the final window over ~n/bucketSize rows.
    */
  def detectBucketed(df: DataFrame, seqCol: String, bucketSize: Long = 1000000L): DataFrame = {
    val bucket = floor(col("seq") / bucketSize)
    // Per-bucket dense check: a bucket with count == distinct-span has no
    // internal gaps only if count == (max-min+1); otherwise find gaps
    // inside the bucket locally; cross-bucket gaps via boundary compare.
    val perBucket = df.select(col(seqCol).as("seq"))
      .distinct()
      .groupBy(bucket.as("__b"))
      .agg(min("seq").as("__min"), max("seq").as("__max"),
        count("*").as("__cnt"), collect_list("seq").as("__vals"))
    // constant partition key: the frame is bucket summaries (~n/bucketSize
    // rows) — single-partition by design (the foldable key is pruned by
    // the optimizer, so the WindowExec WARN still fires; see PLANS.md)
    val w = Window.partitionBy(lit(1)).orderBy(col("__b"))
    val withNext = perBucket
      .withColumn("__next_min", lead(col("__min"), 1).over(w))
    // gaps inside a sparse bucket (exploded locally — bounded by bucketSize)
    val inner = withNext
      .filter(col("__cnt") < col("__max") - col("__min") + 1)
      .select(explode(expr(
        """
        filter(
          transform(array_sort(__vals),
            (v, i) -> named_struct(
              'gap_start', v + 1,
              'gap_end', try_element_at(array_sort(__vals), i + 2) - 1)),
          x -> x.gap_end >= x.gap_start)
        """)).as("g"))
      .select(col("g.gap_start"), col("g.gap_end"))
    val boundary = withNext
      .filter(col("__next_min") > col("__max") + 1)
      .select((col("__max") + 1).as("gap_start"), (col("__next_min") - 1).as("gap_end"))
    inner.unionByName(boundary)
  }
}
