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

  /** Contamination FORENSICS: for every contaminated doc, WHICH benchmark
    * n-grams it shares — the evidence a data audit needs before deleting
    * a document (and the input to span-level surgical removal, where only
    * the leaked span dies instead of the whole doc). Same scale shape as
    * [[contaminated]] (broadcast bench grams, corpus never shuffles until
    * the hit aggregation, output bounded by the hit set); the matched
    * grams per doc are at most the benchmark's distinct grams, re-joined
    * '|'-sorted into one string so the result stays flat and
    * hash-comparable.
    */
  def contaminationReport(
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
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"),
        array_join(sort_array(collect_set(col("__gram"))), "|").as("shared_grams"))
  }

  /** SEMANTIC contamination — embedding-space overlap with the benchmark,
    * the companion check to n-gram [[contaminated]]: a paraphrased test
    * question shares no 8-gram with its source but sits at high cosine to
    * it. Returns corpus ids whose rounded cosine to ANY benchmark vector
    * reaches `threshold`, with the hit count and the best match.
    *
    * The threshold compares the 4-dp-ROUNDED cosine (the repo's
    * cross-engine convention): a raw-float compare at exactly the
    * threshold boundary could flip between engines' accumulation orders.
    *
    * Scale shape: the benchmark side is an eval set (thousands of
    * vectors) — broadcast; scoring is a broadcast nested-loop with the
    * fused native [[graft.exprs.CosineSim]], corpus-partition-parallel,
    * zero shuffle; the only aggregation is per-corpus-id over its OWN
    * benchmark hits (map-side combined, output bounded by the hit set).
    * For benchmark sets too big to broadcast, IVF-partition both sides
    * ([[Ann.ivfAssign]]) and run this within probe cells.
    */
  def semanticContaminated(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    val b = benchmark.select(col(vecCol).as("__bv"))
    corpus.select(col(idCol), col(vecCol).as("__cv"))
      .crossJoin(broadcast(b))
      .select(col(idCol),
        round(graft.exprs.CosineSim(col("__cv"), col("__bv")), 4).as("__cos"))
      .filter(col("__cos") >= threshold)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"), max(col("__cos")).as("max_cos"))
  }

  /** The corpus with every semantically-contaminated row removed. The hit
    * set is threshold-dependent (a lax threshold can flag a large corpus
    * fraction), so the anti join carries NO broadcast hint — AQE picks
    * broadcast when the hits measure small, shuffle anti join otherwise
    * (same policy as [[Ann.semDedup]]).
    */
  def semanticDecontaminate(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    val hits = semanticContaminated(corpus, benchmark, idCol, vecCol, threshold)
      .select(col(idCol))
    corpus.join(hits, Seq(idCol), "left_anti")
  }
}
