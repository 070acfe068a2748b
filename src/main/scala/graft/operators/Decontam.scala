package graft.operators

import graft.exprs.Shingles
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: remove corpus documents that share any
  * word n-gram with an evaluation/benchmark set, so training data cannot
  * leak test answers (the standard n-gram-overlap decontamination step of
  * a large-scale training-data pipeline).
  *
  * Scale shape: the benchmark side is an eval set — thousands of
  * documents, not billions — so its distinct-gram set is broadcast and
  * the corpus-side probe is a map-side semi join over one narrow
  * shingle pass ([[graft.exprs.Shingles]], codegen'd). The only rows
  * that ever reach a shuffle are the contaminated ids (bounded by the
  * corpus hits, in practice a small fraction), which then drive one
  * broadcast anti join. Corpus data itself is never shuffled.
  */
object Decontam {

  /** Distinct doc ids sharing at least one `n`-gram with `benchmark`,
    * with the number of distinct shared grams per doc.
    */
  def contaminated(
      docs: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    val benchGrams = benchmark
      .select(explode(Shingles(col(textCol), n)).as("__gram"))
      .distinct()
    docs
      .select(col(idCol), explode(Shingles(col(textCol), n)).as("__gram"))
      .join(broadcast(benchGrams), "__gram")
      // Shingles is already distinct within a doc, so this counts
      // distinct shared grams without a second aggregate
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** The corpus with every contaminated document removed. */
  def decontaminate(
      docs: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8): DataFrame = {
    val hits = contaminated(docs, benchmark, idCol, textCol, n)
      .select(col(idCol))
    // hits is bounded by benchmark overlap — broadcast keeps the corpus
    // side shuffle-free end to end
    docs.join(broadcast(hits), Seq(idCol), "left_anti")
  }
}
