package graft.operators

import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram language-model scoring — the CCNet-style "perplexity filter"
  * of a training-data pipeline: score each document by the mean negative
  * log-likelihood of its tokens under the corpus' own add-α-smoothed
  * unigram distribution. High loss = rare/garbled vocabulary; low loss =
  * common, fluent (or templated) text. Pipelines keep the middle band.
  *
  * Plan: ONE token explode feeds both the vocabulary aggregate and the
  * per-doc mean; the vocabulary (token, count) frame is vocabulary-sized
  * and broadcasts back onto the token stream, so the only corpus-sized
  * shuffle is the per-doc aggregate on the id. Corpus totals are two
  * scalars (metadata-sized driver fetch, same pattern as IVF seeding).
  * At 100 TB cap the broadcast vocabulary at top-V with an OOV bucket —
  * the smoothing term already handles unseen mass.
  *
  * The mean is rounded to 4 dp: `ln` differs across engines in the last
  * ulp and summation order differs across partitionings, so the raw
  * double is accumulation noise; 4 dp snaps it (TfIdf precedent).
  */
object UnigramLm {

  /** Per-document mean negative log-likelihood and token count.
    *
    * `snapDp` rounds the mean to that many decimal places (the default 4
    * is the cross-engine reproducibility convention); pass None for the
    * RAW mean — needed when a downstream operator does its own snapping,
    * e.g. [[Selection.selectByBudget]] with `bucketize`, where rounding
    * twice at different granularities would shift stratum boundaries.
    */
  def docLogLoss(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      alpha: Double = 0.5,
      snapDp: Option[Int] = Some(4)): DataFrame = {
    require(alpha > 0, "smoothing mass must be positive")
    val toks = docs.select(col(idCol), explode(Text.tokens(col(textCol))).as("term"))
    val vocab = toks.groupBy("term").agg(count(lit(1)).as("cnt"))
    val t = vocab.agg(sum("cnt").as("total"), count(lit(1)).as("v")).head()
    // an empty corpus has a null total — there is nothing to score
    if (t.isNullAt(0)) return toks.groupBy(col(idCol))
      .agg(lit(0.0).as("nll"), count(lit(1)).as("n_tokens"))
    val denom = t.getLong(0) + alpha * t.getLong(1)
    val logp = log((col("cnt") + lit(alpha)) / lit(denom))
    val mean = avg(-logp)
    toks.join(broadcast(vocab), "term")
      .groupBy(col(idCol))
      .agg(snapDp.fold(mean)(d => round(mean, d)).as("nll"),
        count(lit(1)).as("n_tokens"))
  }

  /** Per-document mean negative log-likelihood under an add-α-smoothed
    * BIGRAM model trained on the corpus itself — the next fidelity step
    * after [[docLogLoss]]: a unigram model cannot see scrambled word
    * order, a bigram model penalizes it. p(w₂|w₁) = (c(w₁w₂) + α) /
    * (c(w₁·) + α·V) where c(w₁·) sums bigram counts by context (so the
    * model is self-consistent: Σ_w₂ p(w₂|w₁) = 1) and V is the unigram
    * vocabulary size.
    *
    * Plan: ONE in-doc bigram explode (narrow `transform` over the token
    * array) feeds the corpus bigram aggregate, the context aggregate
    * derived FROM it (vocabulary-sized input, not the corpus), and the
    * per-doc mean. Unlike the unigram vocabulary, a corpus-scale bigram
    * table is NOT safely broadcast-able (it grows toward V², and real
    * web-scale bigram tables run to billions of rows), so both model
    * joins are un-hinted hash joins — AQE broadcasts when a table
    * measures small. Docs with fewer than two tokens have no bigrams and
    * drop out, matching the SQL inner join. Mean snapped to 4 dp (ln +
    * order-dependent summation, the repo convention).
    */
  def bigramDocLogLoss(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, "smoothing mass must be positive")
    val toks = Text.tokens(col(textCol))
    val bigrams = docs
      .select(col(idCol), toks.as("__t"))
      .filter(size(col("__t")) >= 2)
      .select(col(idCol), explode(transform(
        sequence(lit(1), size(col("__t")) - 1),
        i => struct(
          element_at(col("__t"), i).as("w1"),
          element_at(col("__t"), i + 1).as("w2")))).as("__b"))
      .select(col(idCol), col("__b.w1").as("w1"), col("__b.w2").as("w2"))
    val big = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val ctx = big.groupBy("w1").agg(sum(col("c12")).as("c1"))
    val v = docs
      .select(explode(toks).as("__w")).agg(countDistinct(col("__w"))).head().getLong(0)
    val logp = log((col("c12") + lit(alpha)) / (col("c1") + lit(alpha * v)))
    bigrams
      .join(big, Seq("w1", "w2"))
      .join(ctx, Seq("w1"))
      .groupBy(col(idCol))
      .agg(round(avg(-logp), 4).as("nll"), count(lit(1)).as("n_bigrams"))
  }

  /** Per-document mean negative log-likelihood under an interpolated
    * Kneser–Ney bigram model — the smoothing the strong n-gram scorers
    * (KenLM-style perplexity filters) actually use. Where add-α gives
    * unseen/rare continuations probability proportional to nothing but α,
    * KN backs off to the CONTINUATION unigram — how many distinct
    * contexts a word follows — so "Francisco" (frequent but only ever
    * after "San") is correctly penalized in novel contexts:
    *
    *   p(w₂|w₁) = max(c(w₁w₂) − D, 0)/c(w₁·)
    *            + D·N₁₊(w₁·)/c(w₁·) · N₁₊(·w₂)/N₁₊(··)
    *
    * with discount 0 < D < 1, N₁₊(w₁·) = distinct continuations of w₁,
    * N₁₊(·w₂) = distinct contexts preceding w₂, N₁₊(··) = distinct
    * bigram types. Scoring the training corpus itself means every scored
    * bigram has c ≥ 1, and the continuation term is strictly positive,
    * so log p is always finite.
    *
    * Plan: identical shape to [[bigramDocLogLoss]] — ONE in-doc bigram
    * explode feeds the bigram-type aggregate; the context (w₁) and
    * continuation (w₂) model tables both derive FROM the type table
    * (vocabulary-sized input, not the corpus); N₁₊(··) is a one-row
    * aggregate cross-joined broadcast (the J2 scalar-lookup pattern), so
    * the WHOLE scorer is one lazy plan — no eager driver job, nothing
    * executed twice when composed into a larger pipeline. All model
    * joins stay un-hinted: bigram-type tables are not safely
    * broadcast-able at corpus scale, and the measured no-broadcast
    * degradation curve for the add-α variant (SCALING.md) covers this
    * plan verbatim — same joins, one more vocabulary-sized side.
    */
  def kneserNeyDocLogLoss(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1, "KN discount must be in (0, 1)")
    val toks = Text.tokens(col(textCol))
    val bigrams = docs
      .select(col(idCol), toks.as("__t"))
      .filter(size(col("__t")) >= 2)
      .select(col(idCol), explode(transform(
        sequence(lit(1), size(col("__t")) - 1),
        i => struct(
          element_at(col("__t"), i).as("w1"),
          element_at(col("__t"), i + 1).as("w2")))).as("__b"))
      .select(col(idCol), col("__b.w1").as("w1"), col("__b.w2").as("w2"))
    val big = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val ctx = big.groupBy("w1")
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1f"))
    val cont = big.groupBy("w2").agg(count(lit(1)).as("n1b"))
    // N₁₊(··) as a lazy 1-row frame, not an eager .count() — keeps the
    // scorer a single plan and the bigram aggregate executed once
    val ty = big.agg(count(lit(1)).cast("double").as("__tt"))
    val p = greatest(col("c12") - lit(discount), lit(0.0)) / col("c1") +
      lit(discount) * col("n1f") / col("c1") * (col("n1b") / col("__tt"))
    bigrams
      .join(big, Seq("w1", "w2"))
      .join(ctx, Seq("w1"))
      .join(cont, Seq("w2"))
      .crossJoin(broadcast(ty))
      .groupBy(col(idCol))
      .agg(round(avg(-log(p)), 4).as("nll"), count(lit(1)).as("n_bigrams"))
  }
}
