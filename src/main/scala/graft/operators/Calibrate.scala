package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Filter-threshold calibration: the precision/recall/F1 sweep a pipeline
  * runs before committing to a quality cutoff — "if I keep everything with
  * score ≥ t, what fraction is actually good, and how much good data do I
  * lose?" evaluated at EVERY candidate threshold in one pass.
  *
  * The naive form sorts the corpus by score and runs a global cumulative
  * window — the single-partition plan shape that cannot scale. Instead the
  * same histogram decomposition as [[Selection]]: one map-side-combined
  * (score → count, positives) aggregate — shuffle volume = distinct
  * scores, not rows — then the sweep itself is driver arithmetic over the
  * guard-bounded histogram (the sweep table IS the output, and it is
  * histogram-sized by construction). Long-exact counts, IEEE double
  * division, 4-dp snap: any engine reproduces the table bit-for-bit.
  */
object Calibrate {

  /** Sweep predicted-positive = `score ≥ threshold` over every distinct
    * (snapped) score against a boolean label. Returns one row per
    * distinct score value, descending:
    * `(threshold, pred_pos, tp, precision, recall, f1)`.
    *
    * `bucketize` snaps the score to that many decimal places first
    * (default 4, the repo convention) — REQUIRED for continuous scores,
    * where distinct-score count ≈ row count; [[Selection.boundedHistogram]]
    * fail-fasts past `maxScoreCardinality` rather than silently collecting
    * row-sized data to the driver.
    *
    * F1 at tp = 0 is defined as 0.0 (the precision+recall denominator
    * vanishes); recall with zero labeled positives is defined as 0.0.
    */
  def sweep(
      df: DataFrame,
      scoreCol: Column,
      labelCol: Column,
      bucketize: Option[Int] = Some(4),
      maxScoreCardinality: Int = Selection.DefaultMaxScoreCardinality): DataFrame = {
    val hist = Selection.boundedHistogram(
      df.select(
          Selection.snap(scoreCol, bucketize).as("threshold"),
          labelCol.cast("long").as("__y"))
        .filter(col("threshold").isNotNull && col("__y").isNotNull)
        .groupBy(col("threshold"))
        .agg(count(lit(1)).as("n"), sum(col("__y")).as("pos"))
        .orderBy(col("threshold").desc),
      maxScoreCardinality, "Calibrate.sweep")
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    val totalPos = hist.map(_._3).sum
    def snap4(d: Double) =
      BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    var pp = 0L
    var tp = 0L
    val rows = hist.map { case (t, n, pos) =>
      pp += n; tp += pos
      val precision = tp.toDouble / pp
      val recall = if (totalPos == 0) 0.0 else tp.toDouble / totalPos
      val f1 =
        if (tp == 0) 0.0 else 2 * precision * recall / (precision + recall)
      (t, pp, tp, snap4(precision), snap4(recall), snap4(f1))
    }
    val spark = df.sparkSession
    import spark.implicits._
    rows.toSeq
      .toDF("threshold", "pred_pos", "tp", "precision", "recall", "f1")
  }
}
