package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vocabulary-construction and token-safety operators over the corpus'
  * token stream — the tokenizer-training and memorization-risk side of
  * a data pipeline.
  */
object Vocab {

  /** Adjacent character-pair frequencies — the candidate table of BPE
    * training's first merge step (Sennrich et al. 2016): every in-word
    * character bigram, counted corpus-wide, top-k by frequency. One
    * word explode + one in-word bigram explode + one hash aggregate;
    * the top-k is a `TakeOrdered` (never a global sort materialized).
    * The in-word enumeration is a `transform` HOF — interpreted, but a
    * two-op lambda over short arrays, and the surrounding aggregate
    * dominates. Iterating merges (step 2..n) re-runs this over a
    * re-paired corpus; each step is the same linear plan.
    */
  def bpePairCounts(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    docs
      .select(explode(split(trim(col(textCol)), " +")).as("__w"))
      .filter(length(col("__w")) >= 2)
      .select(explode(transform(
        sequence(lit(1), length(col("__w")) - 1),
        i => col("__w").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair").asc)
      .limit(k)
  }

  /** Documents carrying rare tokens — the memorization-risk signal: a
    * token whose corpus document frequency is below `minDf` is likely a
    * unique identifier, key, or personal string; documents containing
    * many of them are flagged for review/removal before training.
    *
    * Scale shape: one distinct-(doc, token) explode feeds the df
    * aggregate; the rare-token set (df < minDf) is by construction the
    * long tail — potentially LARGE — so the flag join is a plain hash
    * join on token, NOT a broadcast hint; AQE broadcasts when the rare
    * set measures small. Returns (doc id, n_rare_tokens, min_df).
    */
  def rareTokenDocs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minDf: Long): DataFrame = {
    require(minDf >= 1, s"minDf must be >= 1, got $minDf")
    val docTokens = docs
      .select(col(idCol), explode(graft.exprs.Shingles(col(textCol), 1)).as("__tok"))
    val df = docTokens
      .groupBy(col("__tok"))
      .agg(countDistinct(col(idCol)).as("__df"))
      .filter(col("__df") < minDf)
    docTokens
      .join(df, "__tok")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_rare_tokens"), min(col("__df")).as("min_df"))
  }
}
