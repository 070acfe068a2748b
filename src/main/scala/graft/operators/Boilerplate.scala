package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CCNet-style boilerplate line removal: lines repeated verbatim across
  * many documents (site headers, nav menus, cookie banners, copyright
  * footers) carry no training signal and skew n-gram statistics; the
  * standard fix is to drop every line whose cross-document frequency
  * reaches a threshold while preserving each document's remaining lines
  * in order.
  *
  * Matching is EXACT on the raw line (no trim/casefold) — normalization
  * is the caller's choice via [[graft.exprs.NormalizeText]] upstream, and
  * exactness is what keeps the operator bit-reproducible by any engine.
  *
  * Scale shape at 100 TB:
  *  - the line DF aggregate shuffles (line, id) pairs AFTER an in-doc
  *    `distinct` (a doc repeating its own separator 1000× contributes one
  *    row), with map-side partial counts on the line key;
  *  - the boilerplate set joins back onto the exploded lines WITHOUT a
  *    broadcast hint: its size is threshold-dependent (a low threshold on
  *    a template-heavy crawl can flag a large line population), so AQE
  *    picks broadcast when it measures small and falls back to a shuffle
  *    join when it does not — the same policy as [[Ann.semDedup]]'s
  *    dropped-set join;
  *  - reassembly is ONE groupBy on the doc id; the per-doc sort is
  *    array_sort over that doc's own lines (never a global or per-group
  *    window).
  */
object Boilerplate {

  /** The per-line table: one row per (doc, position, line), split on
    * '\n'. Position is 0-based and dense, so reassembly order is total.
    */
  def lines(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
      posexplode(split(col(textCol), "\n")).as(Seq("line_no", "line")))

  /** Cross-document line frequency: (line, line_df) where line_df counts
    * DISTINCT documents containing the line (in-doc repeats don't
    * inflate it). The two-step distinct-then-count form aggregates on
    * the same key twice — one shuffle, map-side combined.
    */
  def lineDf(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    lines(docs, idCol, textCol)
      .select(col("line"), col("id")).distinct()
      .groupBy(col("line"))
      .agg(count(lit(1)).as("line_df"))

  /** Every document with its boilerplate lines (line_df ≥ `minDf`)
    * removed and the survivors rejoined in original order. The output
    * keeps the INPUT schema: every other column (lang, url, …) rides
    * through untouched and `textCol` is replaced in place with the
    * cleaned text, so the operator composes mid-pipeline without a
    * re-join. Documents whose lines are ALL boilerplate survive with
    * empty text — dropping them is a separate, explicit filter decision.
    */
  def removeBoilerplate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minDf: Long): DataFrame = {
    require(minDf > 1, s"minDf must be > 1 (a line always matches itself), got $minDf")
    val ls = lines(docs, idCol, textCol)
    val boiler = lineDf(docs, idCol, textCol)
      .filter(col("line_df") >= minDf)
      .select(col("line"))
    val rebuilt = ls
      .join(boiler, Seq("line"), "left_anti")
      .groupBy(col("id"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("line_no"), col("line")))),
          e => e.getField("line")),
        "\n").as("__clean"))
      .select(col("id").as(idCol), col("__clean"))
    docs.join(rebuilt, Seq(idCol), "left")
      .withColumn(textCol, coalesce(col("__clean"), lit("")))
      .drop("__clean")
  }
}
