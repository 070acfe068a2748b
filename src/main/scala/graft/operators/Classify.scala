package graft.operators

import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classification — the model-based
  * quality/domain filter of a training-data pipeline (the exact-count
  * analog of a fastText classifier): train per-class token counts on a
  * labeled seed set, then score the corpus and keep/route documents by
  * predicted class. Everything is closed-form count arithmetic, so the
  * prediction is bit-reproducible by any engine — which is what makes a
  * model-based filter auditable (a trained neural scorer is not).
  *
  * Reference scope: the reference has no trained classifier; this comes
  * from the LLM-pipeline brief (domain/quality routing at corpus scale).
  */
case class NbModel(
    /** Sparse (label, term, cnt) token counts — vocabulary×classes-sized. */
    termCounts: DataFrame,
    /** (label, n_docs, n_tokens) — class-cardinality-sized. */
    labelStats: DataFrame,
    /** Distinct training vocabulary size (the smoothing denominator). */
    vocabSize: Long,
    /** Add-α smoothing mass. */
    alpha: Double)

object Classify {

  /** Train: one token explode → (label, term) count aggregate. The label
    * stats and vocabulary size derive FROM that aggregate (vocabulary-
    * sized input, not the corpus), so training is one corpus-scale
    * shuffle total. `vocabSize` is a single scalar fetch (metadata-sized,
    * same pattern as the IVF centroid seed).
    */
  def nbTrain(
      train: DataFrame,
      labelCol: String,
      textCol: String,
      alpha: Double = 1.0): NbModel = {
    require(alpha > 0, "smoothing mass must be positive")
    val toks = train
      .select(col(labelCol).as("label"), explode(Text.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) >= 1)
    val tc = toks.groupBy("label", "term").agg(count(lit(1)).as("cnt"))
    val nDocs = train.groupBy(col(labelCol).as("label")).agg(count(lit(1)).as("n_docs"))
    val nToks = tc.groupBy("label").agg(sum("cnt").as("n_tokens"))
    val v = tc.select("term").distinct().count()
    NbModel(tc, nDocs.join(nToks, "label"), v, alpha)
  }

  /** Score + argmax. The per-class log-posterior decomposes as
    *
    *   score(d, l) = ln P(l) − n_d·ln(N_l + αV) + n_d·ln α
    *                 + Σ_{w ∈ d ∩ vocab_l} c_w·(ln(c_{w,l} + α) − ln α)
    *
    * so only the (term, label) pairs PRESENT in the sparse model
    * contribute to the join — absent pairs fall to the smoothing floor
    * algebraically, never materialized. Plan: one doc-token count
    * aggregate, an un-hinted hash join with the sparse model (AQE
    * broadcasts while the model measures small; a web-scale vocabulary
    * does not broadcast), one (doc, label) aggregate, then the full
    * doc×class grid via a broadcast of the class-cardinality-sized label
    * stats — classes are inherently few, so the grid is a narrow
    * projection, not a shuffle. The argmax is a per-doc WindowGroupLimit.
    * Scores rank on the 4-dp-rounded value with label-ascending
    * tie-break (the cross-engine reproducibility convention — ln noise
    * must not flip near-tied classes between engines).
    */
  /** The 4-dp decimal snap shared with the SQL oracle: both engines
    * round the SAME double (every upstream value is 4-dp-snapped or an
    * exact rational), so HALF_UP on the decimal repr agrees.
    */
  private def round4(d: Double): Double =
    BigDecimal.valueOf(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** σ(w·x) with the cross-engine determinism contract: the linear term
    * folds left in declared feature order (both engines left-associate
    * `+`), and the sigmoid output is 4-dp snapped — `exp` is the one
    * libm call in the model, and the snap absorbs its last-ulp
    * cross-engine drift exactly as the LM/DSIR scorers do.
    */
  private def sigmoid4(
      w: Seq[Double],
      xCols: Seq[String]): org.apache.spark.sql.Column = {
    val z = xCols.zipWithIndex.foldLeft(lit(w.head): org.apache.spark.sql.Column) {
      case (acc, (c, i)) => acc + lit(w(i + 1)) * col(c)
    }
    round(lit(1.0) / (lit(1.0) + exp(-z)), 4)
  }

  /** Train a binary logistic-regression classifier by full-batch gradient
    * descent — the trained-in-the-engine quality filter (the GPT-3/CCNet
    * pattern: fit a small linear model on labeled seeds, score the whole
    * corpus). Features are dense engineered columns (length bands,
    * punctuation ratios — [[graft.functions.Text.qualityScore]]'s
    * vocabulary), so training is `iters` distributed aggregates, each
    * ONE pass producing |w| partial-summed gradients: shuffle volume per
    * iteration is |w| doubles per task — a constant of the model, not
    * the corpus. At 100 TB: cache the feature frame once, run the same
    * loop; the driver holds only w.
    *
    * Reproducibility contract (what makes a TRAINED model oracle-able):
    * w starts at 0 (first pass has σ ≡ 0.5 — no libm at all), each
    * per-row probability is 4-dp snapped before it enters the gradient
    * sum, each gradient coordinate is 4-dp snapped before the update,
    * and each weight is 4-dp snapped after it — so an external engine
    * unrolling the same `iters` aggregates reproduces w EXACTLY, and
    * gradient-sum reorderings under Spark's partial aggregation stay
    * under the snap. Returns w = (bias, w_1..w_k) in `xCols` order.
    */
  def logisticTrain(
      feat: DataFrame,
      yCol: String,
      xCols: Seq[String],
      iters: Int = 3,
      eta: Double = 1.0): Seq[Double] = {
    require(iters >= 1, "at least one gradient step")
    require(xCols.nonEmpty, "at least one feature")
    var w: Seq[Double] = Vector.fill(xCols.length + 1)(0.0)
    for (_ <- 0 until iters) {
      val err = sigmoid4(w, xCols) - col(yCol)
      val gradCols = (round(avg(err), 4).as("g0") +:
        xCols.zipWithIndex.map { case (c, i) =>
          round(avg(err * col(c)), 4).as(s"g${i + 1}")
        })
      val g = feat.agg(gradCols.head, gradCols.tail: _*).head()
      w = w.zipWithIndex.map { case (wj, j) =>
        round4(wj - eta * g.getDouble(j))
      }
    }
    w
  }

  /** Score a corpus under trained weights: P(y=1|x), 4-dp snapped. */
  def logisticScore(
      feat: DataFrame,
      idCol: String,
      xCols: Seq[String],
      w: Seq[Double]): DataFrame = {
    require(w.length == xCols.length + 1, "one weight per feature plus bias")
    feat.select(col(idCol), sigmoid4(w, xCols).as("prob"))
  }

  def nbScore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: NbModel): DataFrame = {
    val a = model.alpha
    val dt = docs
      .select(col(idCol), explode(Text.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) >= 1)
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("__c"))
    val docLen = dt.groupBy(col(idCol)).agg(sum("__c").as("__n_doc"))
    val overlap = dt
      .join(model.termCounts, "term")
      .groupBy(col(idCol), col("label"))
      .agg(sum(col("__c") * (log(col("cnt") + lit(a)) - lit(math.log(a)))).as("__ov"))
    val t = model.labelStats.agg(sum("n_docs")).head()
    if (t.isNullAt(0)) // empty training set — no classes to score against
      return docs.limit(0).select(col(idCol), lit("").as("pred_label"), lit(0.0).as("score"))
    val totalDocs = t.getLong(0).toDouble
    val grid = docLen.crossJoin(broadcast(model.labelStats))
    val score =
      log(col("n_docs") / lit(totalDocs)) +
        col("__n_doc") * (lit(math.log(a)) - log(col("n_tokens") + lit(a * model.vocabSize))) +
        coalesce(col("__ov"), lit(0.0))
    val w = Window.partitionBy(col(idCol))
      .orderBy(round(score, 4).desc, col("label").asc)
    grid
      .join(overlap, Seq(idCol, "label"), "left")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("label").as("pred_label"), round(score, 4).as("score"))
  }
}
