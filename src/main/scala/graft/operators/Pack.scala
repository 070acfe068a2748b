package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training: concatenate documents in a
  * deterministic order and chunk the stream into fixed token-budget
  * packs (the "concat-and-chunk" packing every LLM training pipeline
  * runs before batching). Each document is tagged with the pack its
  * first token lands in and its token offset within that pack; a
  * document whose tokens straddle a boundary spills into the next pack,
  * exactly as the flattened token stream would.
  *
  * Scale shape: one window shuffle keyed on `partitionCols` — the
  * running token sum per partition — and nothing else. Pack ids are
  * local to a partition (emitted alongside the partition columns), so
  * partitions pack independently and in parallel; at corpus scale add a
  * hash-bucket column (e.g. `pmod(xxhash64(id), 4096)`) to the
  * partition key so no single window partition exceeds an executor.
  * Packing needs no global coordination — a pack never crosses a
  * partition — so the bucket count scales freely with the cluster.
  */
object Pack {

  /** Assign each document a `(pack_id, pack_offset)` within its
    * partition: documents are ordered by `idCol`, token counts
    * accumulated, and the stream cut every `budget` tokens.
    */
  def packSequences(
      docs: DataFrame,
      idCol: String,
      tokensCol: Column,
      budget: Long,
      partitionCols: Seq[String]): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val w = Window
      .partitionBy(partitionCols.map(col): _*)
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val start = sum(col("n_tokens")).over(w) - col("n_tokens")
    docs
      .select((partitionCols.map(col) :+ col(idCol) :+
        tokensCol.cast("long").as("n_tokens")): _*)
      // non-negative offsets well under 2^53, so the double division
      // under floor is exact
      .withColumn("pack_id", floor(start.cast("long") / budget).cast("long"))
      .withColumn("pack_offset", start.cast("long") % budget)
  }
}
