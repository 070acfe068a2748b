package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.exprs.AcMatches

/** Multi-pattern blocklist scan — banned-phrase / policy-term
  * filtering over a crawl corpus in ONE text pass per document
  * ([[graft.exprs.AcMatches]], Aho–Corasick inside whole-stage
  * codegen), instead of a scan per pattern or a backtracking regex
  * alternation. The reference's analogue is its blacklist routing
  * (contract/action match); here the match unit is free text.
  *
  * 100 TB shape: the automaton is plan-constant (a few KB broadcast in
  * the generated code's references), the scan is O(len) per document,
  * the per-pattern rollup is one partial-aggregable explode bounded by
  * |patterns| rows per document, and `flagged` is a scan-local filter.
  */
object Blocklist {

  /** Per-document occurrence counts: `idCol, match_counts` (element i
    * counts ALL occurrences of `patterns(i)`, overlaps included).
    */
  def matchCounts(
      df: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String]): DataFrame =
    df.select(col(idCol), AcMatches(col(textCol), patterns).as("match_counts"))

  /** Documents with ANY blocklist hit, with total hit count — the
    * filter stage of a policy pipeline.
    */
  def flagged(
      df: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String]): DataFrame =
    matchCounts(df, idCol, textCol, patterns)
      .withColumn("n_hits", aggregate(col("match_counts"), lit(0L), _ + _))
      .filter(col("n_hits") > 0)
      .select(col(idCol), col("n_hits"))

  /** Per-pattern corpus rollup: `pattern, n_occurrences, n_docs`. */
  def summary(
      df: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String]): DataFrame =
    matchCounts(df, idCol, textCol, patterns)
      .select(posexplode(col("match_counts")).as(Seq("pid", "cnt")))
      .groupBy(element_at(lit(patterns.toArray), col("pid") + 1).as("pattern"))
      .agg(
        sum(col("cnt")).as("n_occurrences"),
        sum(when(col("cnt") > 0, 1L).otherwise(0L)).as("n_docs"))
}
