package graft.operators

import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus release diff: what changed between two corpus versions, per
  * group (source/domain/language) — the release-note table a training
  * team reads before swapping corpus vA for vB ("web: +12k docs /
  * +3.1M tokens, books: −40 docs").
  *
  * Identity is the normalized text digest ([[Text.exactKey]]), not the
  * document id: re-ingested or re-keyed but textually identical docs
  * are "common", and an edited doc counts as one removal plus one
  * addition — the definition that matches what dedup and token budgets
  * see.
  *
  * Scale shape: each side reduces to its distinct (group, key, tokens)
  * set with one map-side-combining aggregate; the full-outer join then
  * runs on the SAME (group, key) hash partitioning, so Catalyst reuses
  * the exchanges — two shuffles of digest-sized rows total, then a
  * group-sized aggregate. No text ever crosses the wire.
  */
object Diff {

  /** Per-group added/removed/common doc and token counts from version
    * `a` to version `b`. Token counts use the single-space convention
    * ([[Text.tokenCountSimple]], the corpus-report convention).
    */
  def corpusDiff(
      a: DataFrame,
      b: DataFrame,
      groupCol: String,
      textCol: String): DataFrame = {
    def keyed(df: DataFrame) = df
      .select(col(groupCol).as("grp"),
        Text.exactKey(col(textCol)).as("__k"),
        Text.tokenCountSimple(col(textCol)).as("__t"))
      // one row per distinct text per group; identical texts have
      // identical token counts, so min() is just the dedup
      .groupBy(col("grp"), col("__k"))
      .agg(min(col("__t")).as("__t"))
    val ka = keyed(a).withColumnRenamed("__t", "__ta")
    val kb = keyed(b).withColumnRenamed("__t", "__tb")
    ka.join(kb, Seq("grp", "__k"), "full_outer")
      .groupBy(col("grp"))
      .agg(
        sum(when(col("__ta").isNull, 1L).otherwise(0L)).as("n_added"),
        sum(when(col("__tb").isNull, 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("__ta").isNotNull && col("__tb").isNotNull, 1L)
          .otherwise(0L)).as("n_common"),
        sum(when(col("__ta").isNull, col("__tb")).otherwise(0L)).as("tokens_added"),
        sum(when(col("__tb").isNull, col("__ta")).otherwise(0L)).as("tokens_removed"))
  }

  /** Cross-source duplication overlap matrix — which sources copy from
    * each other: for every source pair (a ≤ b), the number of distinct
    * texts they share and the number of duplicate document pairs those
    * texts induce (diagonal rows count within-source duplication,
    * n·(n−1)/2 per text). The provenance table a pipeline reads to decide
    * which crawl/source to drop when two overlap heavily.
    *
    * Scale shape: the corpus reduces to a (text-digest, source, n)
    * histogram with ONE map-side-combining aggregate — at most one row
    * per distinct text per source, no text on the wire after the digest
    * projection. The pair join then runs on the histogram keyed by
    * digest, so a text duplicated across k sources costs k² histogram
    * rows — never n_docs² — and the result aggregate is |sources|²-bounded.
    * Pair counts come from n_a·n_b arithmetic, not from enumerating
    * document pairs.
    */
  def sourceOverlap(
      docs: DataFrame,
      textCol: String,
      srcCol: String): DataFrame = {
    val h = docs
      .select(Text.exactKey(col(textCol)).as("__k"), col(srcCol).as("__src"))
      .groupBy(col("__k"), col("__src")).agg(count(lit(1)).as("__n"))
    val a = h.select(col("__k"), col("__src").as("source_a"), col("__n").as("__na"))
    val b = h.select(col("__k"), col("__src").as("source_b"), col("__n").as("__nb"))
    a.join(b, Seq("__k"))
      .filter(col("source_a") < col("source_b") ||
        (col("source_a") === col("source_b") && col("__na") >= 2))
      .groupBy(col("source_a"), col("source_b"))
      .agg(
        count(lit(1)).as("n_texts"),
        sum(when(col("source_a") === col("source_b"),
          shiftright(col("__na") * (col("__na") - 1), 1))
          .otherwise(col("__na") * col("__nb"))).as("n_pairs"))
  }
}
