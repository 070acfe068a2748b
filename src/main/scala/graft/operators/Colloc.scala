package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Collocation mining — document-level pointwise mutual information
  * between vocabulary terms: `pmi(a,b) = ln(df_ab·N / (df_a·df_b))`,
  * the standard association score behind phrase detection and
  * word-embedding co-occurrence matrices in a training-data pipeline.
  */
object Colloc {

  /** Top-k term pairs by 4-dp-snapped PMI, with document-frequency
    * floors on both the terms (`minDf`) and the pair (`minPair`).
    *
    * Plan: one fused per-doc-distinct unigram pass (`Shingles(·,1)`) →
    * df aggregate → the qualifying vocabulary broadcasts back as a
    * semi-filter → the pair generator is a doc-keyed self-join of the
    * QUALIFIED unigrams only (`term_a < term_b` orders each pair once)
    * → (a,b) hash aggregate → two broadcast df joins → snap → global
    * top-k sort-limit.
    *
    * 100 TB shape: pair volume is Σ_d u_d² where u_d is the per-doc
    * count of VOCABULARY terms — `minDf` is the explicit knob that
    * bounds it (a df floor caps the vocabulary, which caps u_d); the
    * self-join is co-partitioned on doc_id and everything downstream is
    * vocabulary-sized, not corpus-sized. All counts are integers; the
    * only float is the final `ln`, snapped at 4 dp (the repo's
    * transcendental convention).
    */
  def pmiTopK(docs: DataFrame, idCol: String, textCol: String,
      minDf: Long, minPair: Long, k: Int): DataFrame = {
    val n = docs.count()
    val unig = docs.select(
      col(idCol).as("doc_id"),
      explode(graft.exprs.Shingles(col(textCol), 1)).as("term"))
    val df = unig.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
    val qualified = unig.join(broadcast(df.select("term")), "term")
    val pairs = qualified.as("u1")
      .join(qualified.as("u2"),
        col("u1.doc_id") === col("u2.doc_id") && col("u1.term") < col("u2.term"))
      .select(col("u1.term").as("term_a"), col("u2.term").as("term_b"))
      .groupBy("term_a", "term_b")
      .agg(count(lit(1)).as("df_ab"))
      .filter(col("df_ab") >= minPair)
    pairs
      .join(broadcast(df.select(col("term").as("term_a"), col("df").as("df_a"))), "term_a")
      .join(broadcast(df.select(col("term").as("term_b"), col("df").as("df_b"))), "term_b")
      .select(col("term_a"), col("term_b"), col("df_ab"),
        round(log(col("df_ab") * lit(n.toDouble) / (col("df_a") * col("df_b"))), 4)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("term_a").asc, col("term_b").asc)
      .limit(k)
  }
}
