package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time as-of join — the core enrichment of the reference's ABI
  * pipeline: for each probe row, attach the latest dimension row with
  * `dim.seq <= probe.seq` for the same key
  * (reference: ABI lookup `src/indexer/workers/deserializer.ts:701-758`,
  * `src/indexer/workers/ds-pool.ts:197-238`).
  *
  * Implementation: union-then-window. Probe and dimension rows are
  * unioned, sorted per key by (seq, side) with dimension rows first at
  * equal seq, and `last(value) ignore nulls` over an unbounded-preceding
  * frame carries each dimension row forward to every later probe. This is
  * a single shuffle on the key — no per-row lookups, no skew from a
  * dimension broadcast of unbounded size, and it scales to any dimension
  * cardinality (at 100 TB the ABI dim is tiny but contract-state dims are
  * not). For genuinely small dimensions prefer `joinBroadcast`.
  */
object AsOf {

  /** Union+window as-of join.
    *
    * @param probe     left side; every row is preserved
    * @param dim       dimension; its `payload` columns are attached as-of
    * @param keys      equality key column names present on both sides
    * @param probeSeq  ordering column on probe (e.g. block_num / ts)
    * @param dimSeq    ordering column on dim, same comparable type
    * @param payload   dim columns to carry onto the probe rows
    */
  def join(
      probe: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      probeSeq: String,
      dimSeq: String,
      payload: Seq[String]): DataFrame = {

    val seqCol = "__asof_seq"
    val sideCol = "__asof_side" // 0 = dim, 1 = probe → dim sorts first on ties
    val probeCols = probe.columns.toSeq

    val p = probe
      .withColumn(seqCol, col(probeSeq))
      .withColumn(sideCol, lit(1))
    val d0 = dim.select(
      (keys.map(col) :+ col(dimSeq).as(seqCol)) ++
        payload.map(c => col(c).as(s"__dim_$c")): _*)
    val withNullPayload = payload.foldLeft(p)((df, c) =>
      df.withColumn(s"__dim_$c", lit(null).cast(d0.schema(s"__dim_$c").dataType)))
    val d = probeCols.filterNot(c => keys.contains(c))
      .foldLeft(d0)((df, c) =>
        df.withColumn(c, lit(null).cast(probe.schema(c).dataType)))
      .withColumn(sideCol, lit(0))
      .select(withNullPayload.columns.map(col): _*)

    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(seqCol).asc, col(sideCol).asc)
      .rowsBetween(Window.unboundedPreceding, 0)

    val carried = payload.foldLeft(withNullPayload.unionByName(d)) { (df, c) =>
      df.withColumn(s"__carried_$c", last(col(s"__dim_$c"), ignoreNulls = true).over(w))
    }

    carried
      .filter(col(sideCol) === 1)
      .select(probeCols.map(col) ++ payload.map(c => col(s"__carried_$c").as(c)): _*)
  }

  /** Custom-ABI fallback (X5 — ds-pool.ts:147-181,253-267): deployments
    * may drop per-contract ABI files valid over an OPEN block interval
    * (`startingBlock < b < endingBlock`, both strict, per the
    * reference's match), consulted when the chain ABI chain cannot
    * serve the row. Spark-first: the defs are extra rows in a
    * broadcast-sized dimension; the probe left-joins on key + open
    * interval, overlapping defs resolve to the LATEST startingBlock
    * (the reference's file-order `find` is load-order-dependent —
    * pinned here so replays are deterministic), and the chain ABI
    * keeps precedence: custom fills only where `chainAbiCol` is null,
    * the try-custom-on-primary-failure order of the reference.
    * Output adds `abi_resolved` and `abi_source` (chain/custom/none).
    *
    * `rowKey`: columns that, together with `keys` + `blockCol`, identify
    * a probe ROW uniquely (e.g. global_sequence). When given, the per-row
    * max_by groups on that slim natural key only and every other probe
    * column rides through the aggregate as a first() buffer value — the
    * probe's payload columns (often including the chain-ABI blob itself)
    * never become grouping/sort keys, so a sort-based aggregate fallback
    * sorts a few longs instead of ABI-sized strings. Identical result by
    * construction: the group is row-unique, so each carried column is
    * constant within it. With `rowKey` empty the historical shape (group
    * on every probe column) is kept — callers without a unique key still
    * get the collapse-identical-rows semantics.
    */
  def withCustomAbi(
      probe: DataFrame,
      customs: DataFrame, // keys… + starting_block, ending_block, abi
      keys: Seq[String],
      blockCol: String,
      chainAbiCol: String,
      rowKey: Seq[String] = Nil): DataFrame = {
    val d = broadcast(customs.select(
      keys.map(c => col(c).as(s"__k_$c")) ++ Seq(
        col("starting_block").as("__start"),
        col("ending_block").as("__end"),
        col("abi").as("__custom_abi")): _*))
    val cond = keys.map(c => col(c) === col(s"__k_$c")).reduce(_ && _) &&
      col("__start") < col(blockCol) && col(blockCol) < col("__end")
    val probeCols = probe.columns.toSeq
    val joined = probe.join(d, cond, "left")
    val resolved =
      if (rowKey.nonEmpty) {
        val groupCols = (keys ++ Seq(blockCol) ++ rowKey).distinct
        val carried = probeCols.filterNot(groupCols.contains)
        joined
          .groupBy(groupCols.map(col): _*)
          .agg(max_by(col("__custom_abi"), col("__start")).as("__custom"),
            carried.map(c => first(col(c)).as(c)): _*)
          .select((probeCols :+ "__custom").map(col): _*)
      } else {
        joined
          .groupBy(probeCols.map(col): _*)
          .agg(max_by(col("__custom_abi"), col("__start")).as("__custom"))
      }
    resolved
      .withColumn("abi_resolved", coalesce(col(chainAbiCol), col("__custom")))
      .withColumn("abi_source",
        when(col(chainAbiCol).isNotNull, "chain")
          .when(col("__custom").isNotNull, "custom")
          .otherwise("none"))
      .drop("__custom")
  }

  /** Broadcast variant for small dimensions (the ABI table): range-join
    * probe × dim on key with dim.seq <= probe.seq, then argmax per probe
    * row. Catalyst broadcasts the dim; the argmax is a cheap partial agg.
    * Correct only when the per-key dim cardinality is modest (ABI versions
    * per contract: a handful).
    */
  def joinBroadcast(
      probe: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      probeSeq: String,
      dimSeq: String,
      payload: Seq[String]): DataFrame = {
    val probeCols = probe.columns.toSeq
    val d = broadcast(dim.select(
      (keys.map(c => col(c).as(s"__k_$c")) :+ col(dimSeq).as("__dim_seq")) ++
        payload.map(c => col(c).as(s"__dim_$c")): _*))
    val cond = keys.map(c => col(c) === col(s"__k_$c")).reduce(_ && _) &&
      col("__dim_seq") <= col(probeSeq)
    probe.join(d, cond, "left")
      .groupBy(probeCols.map(col): _*)
      .agg(
        payload.map(c => max_by(col(s"__dim_$c"), col("__dim_seq")).as(c)).head,
        payload.map(c => max_by(col(s"__dim_$c"), col("__dim_seq")).as(c)).tail: _*)
  }
}
