package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data selection under a token budget: greedily take documents in
  * (score DESC, id ASC) order until the budget is exhausted — the
  * "best data first" corpus-selection step of a training pipeline
  * (quality-ranked selection with a fixed token spend). A document whose
  * first token lands inside the budget is taken whole.
  */
object Selection {

  /** Equivalent to the global greedy — sort everything, running token
    * sum, cut at the budget — WITHOUT the global single-partition window
    * that greedy implies (the one plan shape that cannot scale). Three
    * phases:
    *
    *   1. score histogram: per-score token totals via one map-side-
    *      combined aggregate — shuffle volume = distinct scores, not rows;
    *   2. driver cumsum over the (metadata-sized) histogram → the
    *      boundary score θ and the budget remaining when θ is reached;
    *   3. `score > θ` strata pass with a narrow filter (no shuffle, no
    *      window); only the single θ stratum runs an id-ordered prefix
    *      window, partition-bounded by that stratum's size.
    *
    * Requires bounded score cardinality (true of any rule-based quality
    * score — a ratio of small integers or a quantized model score). The
    * driver collect is the same metadata-sized pattern as IVF centroid
    * seeding, not a data collect.
    */
  /** Curriculum staging: split the corpus into `k` quality stages
    * (0 = worst … k−1 = best) by EXACT score quantiles — the
    * easy-to-hard data ordering curriculum training consumes.
    *
    * The naive form is `ntile(k)` over a global sort — a single-partition
    * window over the corpus. Instead: one map-side-combined score
    * histogram (shuffle volume = distinct scores), a histogram-sized
    * cumulative window (bounded cardinality — the same boundedness
    * [[selectByBudget]] requires), and a broadcast join back onto the
    * corpus. Docs sharing a score share a stage, so stages are exact
    * quantiles up to score-tie granularity, deterministic, and
    * reproducible by any engine.
    */
  def curriculumStages(
      docs: DataFrame,
      scoreCol: Column,
      k: Int): DataFrame = {
    require(k > 0, "need at least one stage")
    val scored = docs.withColumn("score", scoreCol.cast("double"))
      .filter(col("score").isNotNull)
    val n = scored.count()
    val w = Window.orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hist = scored.groupBy(col("score")).agg(count(lit(1)).as("c"))
      .withColumn("__cumb", sum(col("c")).over(w) - col("c"))
      .withColumn("stage",
        least(floor(lit(k) * col("__cumb") / lit(math.max(n, 1L))).cast("int"),
          lit(k - 1)))
      .select(col("score"), col("stage"))
    scored.join(broadcast(hist), Seq("score"))
  }

  def selectByBudget(
      docs: DataFrame,
      idCol: String,
      scoreCol: Column,
      tokensCol: Column,
      budget: Long): DataFrame = {
    require(budget >= 0, "token budget must be non-negative")
    // docs without a score or token count cannot be ranked or budgeted —
    // they are excluded (a null-text doc has no place in a token spend)
    val scored = docs
      .withColumn("score", scoreCol.cast("double"))
      .withColumn("n_tokens", tokensCol.cast("long"))
      .filter(col("score").isNotNull && col("n_tokens").isNotNull)
    val hist = scored.groupBy(col("score")).agg(sum("n_tokens").as("t"))
      .orderBy(col("score").desc)
      .collect().map(r => (r.getDouble(0), r.getLong(1)))

    // walk strata best-first: full strata while they fit STRICTLY under
    // the budget. A stratum that exactly exhausts it is the boundary,
    // not full: a zero-token doc sorted after the exhausting tokens
    // starts AT the budget, which greedy excludes (start < budget) —
    // only the within-stratum window can see that distinction
    var acc = 0L
    var theta = Option.empty[(Double, Long)] // (boundary score, budget left there)
    val it = hist.iterator
    while (theta.isEmpty && it.hasNext) {
      val (s, t) = it.next()
      if (acc + t >= budget) theta = Some((s, budget - acc))
      acc += t
    }

    theta match {
      case None => scored // the whole corpus fits the budget
      case Some((th, rem)) =>
        val full = scored.filter(col("score") > th)
        val w = Window.partitionBy(col("score")).orderBy(col(idCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val boundary = scored.filter(col("score") === th)
          .withColumn("__start", sum(col("n_tokens")).over(w) - col("n_tokens"))
          .filter(col("__start") < rem)
          .drop("__start")
        full.unionByName(boundary)
    }
  }
}
