package graft.operators

import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
  * arXiv:2302.03169) — pick raw-corpus documents whose hashed n-gram
  * distribution looks like a target domain. Each document's importance
  * weight is its log likelihood ratio under two smoothed bag-of-features
  * models:
  *
  *   w(d) = Σ_b c_b(d) · ln( p̂_target(b) / q̂_raw(b) )
  *
  * over `buckets` hashed feature buckets b, with add-α smoothing on both
  * estimates. The deterministic variant ranks by weight (the paper adds
  * Gumbel noise for sampling — seedable on top of this weight column);
  * rank-by-weight is itself a standard ablation and is auditable.
  *
  * Features hash through the repo's md5 draw ([[Split.hashDraw32]]) so
  * the bucket assignment — like the split/sample operators — is
  * reproducible by any engine, not just Spark.
  *
  * Scale shape: ONE token explode feeds the (doc, bucket) count
  * aggregate; both distribution tables derive FROM it (re-aggregates of
  * a bucket-bounded frame) and are ≤ `buckets` rows by construction, so
  * they broadcast back onto the doc-bucket stream regardless of corpus
  * size — the raw corpus is never joined against anything its own size.
  * Totals are two scalars (metadata-sized driver fetch, the IVF-seed
  * pattern). The target set rides the SAME pass as a conditional
  * aggregate, so target membership costs no second scan.
  */
object Dsir {

  /** Per-document importance weight (4-dp-snapped, ln + summation-order
    * noise — the repo convention) and feature count. `targetPred` marks
    * the in-domain rows of `docs` (e.g. a trusted source); weights are
    * emitted for ALL rows, so the caller can rank the out-of-domain
    * remainder or audit the in-domain scores themselves.
    */
  def importanceWeights(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      targetPred: Column,
      buckets: Int = 1 << 14,
      alpha: Double = 1.0): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(alpha > 0, "smoothing mass must be positive")
    val db = docs
      .select(col(idCol), targetPred.as("__tgt"),
        explode(Text.tokens(col(textCol))).as("__term"))
      .filter(length(col("__term")) >= 1)
      .select(col(idCol), col("__tgt"),
        (Split.hashDraw32(col("__term")) % buckets).as("__b"))
      .groupBy(col(idCol), col("__tgt"), col("__b"))
      .agg(count(lit(1)).as("__c"))
    val dist = db.groupBy("__b").agg(
      sum(col("__c")).as("__rawc"),
      sum(when(col("__tgt"), col("__c")).otherwise(lit(0L))).as("__tgtc"))
    val t = dist.agg(sum("__rawc"), sum("__tgtc")).head()
    if (t.isNullAt(0)) // empty corpus — nothing to weigh
      return db.select(col(idCol), lit(0.0).as("weight"), lit(0L).as("n_features"))
    val (rawTot, tgtTot) = (t.getLong(0).toDouble, t.getLong(1).toDouble)
    val logRatio =
      log((col("__tgtc") + lit(alpha)) / lit(tgtTot + alpha * buckets)) -
        log((col("__rawc") + lit(alpha)) / lit(rawTot + alpha * buckets))
    db.join(broadcast(dist), "__b")
      .groupBy(col(idCol))
      .agg(
        round(sum(col("__c") * logRatio), 4).as("weight"),
        sum(col("__c")).as("n_features"))
  }
}
