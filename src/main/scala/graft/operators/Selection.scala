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

  /** Ceiling on distinct score values before the histogram stops being
    * metadata and becomes data. 64k scores × ~24 bytes is well under any
    * driver/broadcast limit; a rule-based quality score (ratio of small
    * integers, quantized model score) sits orders of magnitude below it.
    */
  val DefaultMaxScoreCardinality = 65536

  /** Snap a raw score to `bucketize` decimal places (None = use as-is) —
    * the quantization that turns a continuous model score (raw perplexity,
    * an un-rounded logit) into a bounded-cardinality histogram key. Ties
    * introduced by the snap resolve by the caller's id ordering, which is
    * exactly the reproducible-across-engines convention the 4-dp rounded
    * operators (TfIdf, UnigramLm) already follow.
    */
  private[operators] def snap(score: Column, bucketize: Option[Int]): Column =
    bucketize.fold(score.cast("double"))(d => round(score.cast("double"), d))

  /** Collect the per-score histogram with a hard cardinality fail-fast:
    * a `limit(max+1)` probe (TakeOrderedAndProject — top-k merge, never a
    * global sort) either returns the whole histogram or proves it is too
    * big, in which case proceeding would turn the metadata-sized driver
    * fetch into a data collect. Failing fast with the fix in the message
    * beats an eventual driver OOM at 100 TB.
    */
  private[operators] def boundedHistogram(
      hist: DataFrame,
      maxScoreCardinality: Int,
      op: String): Array[org.apache.spark.sql.Row] = {
    require(maxScoreCardinality > 0, "maxScoreCardinality must be positive")
    val rows = hist.limit(maxScoreCardinality + 1).collect()
    if (rows.length > maxScoreCardinality) throw new IllegalArgumentException(
      s"$op: score cardinality exceeds $maxScoreCardinality — the score " +
        "histogram would be row-sized, not metadata-sized. Quantize the " +
        "score first (pass bucketize = Some(dp) to snap it to dp decimal " +
        "places) or raise maxScoreCardinality if the scores are genuinely " +
        "discrete.")
    rows
  }

  /** Curriculum staging: split the corpus into `k` quality stages
    * (0 = worst … k−1 = best) by EXACT score quantiles — the
    * easy-to-hard data ordering curriculum training consumes.
    *
    * The naive form is `ntile(k)` over a global sort — a single-partition
    * window over the corpus. Instead: one map-side-combined score
    * histogram (shuffle volume = distinct scores, not rows), a driver-side
    * cumsum over the guard-bounded histogram, and a broadcast join back
    * onto the corpus. Docs sharing a score share a stage, so stages are
    * exact quantiles up to score-tie granularity, deterministic, and
    * reproducible by any engine.
    *
    * `bucketize` snaps the score to that many decimal places first —
    * REQUIRED for continuous scores (raw perplexity, un-rounded model
    * logits), where distinct-score count ≈ row count and the histogram
    * contract breaks; [[boundedHistogram]] fail-fasts in that case rather
    * than silently collecting data to the driver.
    */
  def curriculumStages(
      docs: DataFrame,
      scoreCol: Column,
      k: Int,
      bucketize: Option[Int] = None,
      maxScoreCardinality: Int = DefaultMaxScoreCardinality): DataFrame = {
    require(k > 0, "need at least one stage")
    val scored = docs.withColumn("score", snap(scoreCol, bucketize))
      .filter(col("score").isNotNull)
    val n = scored.count()
    val hist = boundedHistogram(
      scored.groupBy(col("score")).agg(count(lit(1)).as("c"))
        .orderBy(col("score")),
      maxScoreCardinality, "curriculumStages")
      .map(r => (r.getDouble(0), r.getLong(1)))
    // driver cumsum over the bounded histogram — same long-exact arithmetic
    // and double division the previous in-plan window used, so stage
    // assignment is bit-identical and engine-reproducible
    var cumb = 0L
    val stages = hist.map { case (s, c) =>
      val stage = math.min(
        math.floor(k.toLong * cumb.toDouble / math.max(n, 1L).toDouble).toInt,
        k - 1)
      cumb += c
      (s, stage)
    }
    val spark = docs.sparkSession
    import spark.implicits._
    scored.join(broadcast(stages.toSeq.toDF("score", "stage")), Seq("score"))
  }

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
    * Requires bounded score cardinality, now ENFORCED: the histogram fetch
    * fail-fasts above `maxScoreCardinality` distinct scores instead of
    * silently degrading into a row-sized driver collect. For continuous
    * scores (e.g. raw [[UnigramLm.docLogLoss]] perplexity) pass
    * `bucketize = Some(dp)` to snap the score to `dp` decimal places
    * first; the returned `score` column is the snapped value.
    */
  def selectByBudget(
      docs: DataFrame,
      idCol: String,
      scoreCol: Column,
      tokensCol: Column,
      budget: Long,
      bucketize: Option[Int] = None,
      maxScoreCardinality: Int = DefaultMaxScoreCardinality): DataFrame = {
    require(budget >= 0, "token budget must be non-negative")
    // docs without a score or token count cannot be ranked or budgeted —
    // they are excluded (a null-text doc has no place in a token spend)
    val scored = docs
      .withColumn("score", snap(scoreCol, bucketize))
      .withColumn("n_tokens", tokensCol.cast("long"))
      .filter(col("score").isNotNull && col("n_tokens").isNotNull)
    val hist = boundedHistogram(
      scored.groupBy(col("score")).agg(sum("n_tokens").as("t"))
        .orderBy(col("score").desc),
      maxScoreCardinality, "selectByBudget")
      .map(r => (r.getDouble(0), r.getLong(1)))

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

  /** Per-group token budgets — the data-MIXING form of [[selectByBudget]]:
    * every group (source domain, language, quality tier) independently
    * runs the best-first greedy until ITS budget is spent. This is the
    * domain-rebalancing step of corpus assembly: cap web at X tokens,
    * books at Y, without three separate jobs.
    *
    * Same scale shape, one extra key: the histogram aggregates per
    * (group, score) — shuffle volume = groups × distinct scores, still
    * guard-bounded metadata — the per-group cumsums run on the driver,
    * the boundary thetas broadcast back, and only each group's single
    * boundary stratum runs a (group, score)-partitioned prefix window.
    * No global window, no per-group jobs, ONE pass over the corpus.
    */
  def selectByBudgetPerGroup(
      docs: DataFrame,
      idCol: String,
      groupCol: String,
      scoreCol: Column,
      tokensCol: Column,
      budgetPerGroup: Long,
      bucketize: Option[Int] = None,
      maxScoreCardinality: Int = DefaultMaxScoreCardinality): DataFrame = {
    require(budgetPerGroup >= 0, "token budget must be non-negative")
    val scored = docs
      .withColumn("score", snap(scoreCol, bucketize))
      .withColumn("n_tokens", tokensCol.cast("long"))
      .filter(col("score").isNotNull && col("n_tokens").isNotNull &&
        col(groupCol).isNotNull)
    val hist = boundedHistogram(
      scored.groupBy(col(groupCol).as("__g"), col("score"))
        .agg(sum("n_tokens").as("t"))
        .orderBy(col("__g"), col("score").desc),
      maxScoreCardinality, "selectByBudgetPerGroup")
      .map(r => (r.get(0), r.getDouble(1), r.getLong(2)))

    // per-group best-first walk (groups arrive contiguous, scores desc)
    val thetas = hist.groupBy(_._1).flatMap { case (g, strata) =>
      var acc = 0L
      var theta = Option.empty[(Any, Double, Long)]
      val it = strata.iterator
      while (theta.isEmpty && it.hasNext) {
        val (_, s, t) = it.next()
        if (acc + t >= budgetPerGroup) theta = Some((g, s, budgetPerGroup - acc))
        acc += t
      }
      theta // None = the whole group fits its budget
    }.toSeq

    if (thetas.isEmpty) scored // every group fits
    else {
      val spark = docs.sparkSession
      import spark.implicits._
      val thetaDf = broadcast(
        thetas.map { case (g, th, rem) => (g.toString, th, rem) }
          .toDF("__g", "__theta", "__rem"))
      val joined = scored.join(thetaDf,
        col(groupCol).cast("string") === col("__g"), "left")
      // groups without a theta row fit whole; above-theta strata pass a
      // NARROW filter (no window touches them); only each group's single
      // boundary stratum runs the (group, score)-partitioned prefix window
      val full = joined.filter(
        col("__theta").isNull || col("score") > col("__theta"))
      val w = Window.partitionBy(col(groupCol), col("score"))
        .orderBy(col(idCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val boundary = joined.filter(col("score") === col("__theta"))
        .withColumn("__start", sum(col("n_tokens")).over(w) - col("n_tokens"))
        .filter(col("__start") < col("__rem"))
        .drop("__start")
      full.unionByName(boundary).drop("__g", "__theta", "__rem")
    }
  }

  /** Per-group document cap (RefinedWeb-style per-domain limits): keep
    * at most `cap` rows per group, chosen by a deterministic salted md5
    * draw (ties → min id) — so the kept set is reproducible, stable
    * under reruns, and unbiased within the group, unlike "first cap by
    * ingest order" which keeps whatever crawled first.
    *
    * Scale shape: ONE keyed shuffle on the group column; the rank
    * window rewrites to WindowGroupLimit, so every map partition
    * pre-selects its local top-`cap` per group BEFORE the exchange —
    * the shuffle carries ≤ cap·partitions rows per group, never the
    * group's full population. Hot domains (the reason per-domain caps
    * exist) are therefore bounded at the map side, not funneled into
    * one reducer.
    */
  def capPerGroup(
      docs: DataFrame,
      groupCol: String,
      idCol: String,
      cap: Int,
      salt: String = "cap"): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(concat(lit(salt), col(idCol).cast("string"))), col(idCol))
    docs
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap)
      .drop("__rn")
  }

  /** DoReMi-flavored mixture-weight optimizer (Xie et al. 2023,
    * linearized): iteratively up-weights the sources whose language-
    * model loss exceeds the corpus reference — "spend more of the token
    * budget where the model is worst" — using multiplicative weights
    * w_i ← w_i·(1 + η·excess_i) instead of the paper's exponential
    * (the first-order Hedge expansion), because the linear update stays
    * in EXACT integer arithmetic end to end: per-doc NLL arrives 4-dp
    * snapped (the [[UnigramLm.docLogLoss]] convention), per-source
    * token-weighted mean loss is an integer floor-division, and every
    * round's update and ppm renormalization is a Long multiply +
    * floor-divide — so the whole optimization replays bit-exactly in
    * SQL as unrolled CTEs, no float exp drift across engines.
    *
    * Scale shape: ONE corpus pass (token explode → per-source partial
    * aggregate); the optimization itself runs on the |sources|-row
    * summary — metadata-sized by definition, the repo's accepted
    * collect class (a mixture has tens of sources, not millions).
    *
    * Input: per-doc rows (sourceCol, nllCol 4-dp, tokenCol). Output:
    * one row per source with the loss/excess diagnostics, the final
    * ppm weight, and the token allocation of `budgetTokens`.
    */
  def mixtureOptimizer(
      perDoc: DataFrame,
      sourceCol: String,
      nllCol: String,
      tokenCol: String,
      rounds: Int = 5,
      etaPer1e4Nat: Long = 100L,
      budgetTokens: Long = 1000000L): DataFrame = {
    val spark = perDoc.sparkSession
    import spark.implicits._
    val perSource = perDoc
      .select(col(sourceCol).as("source"),
        round(col(nllCol) * 10000).cast("long").as("li"),
        col(tokenCol).cast("long").as("nt"))
      .groupBy(col("source"))
      .agg(sum(col("li") * col("nt")).as("lsum"), sum(col("nt")).as("tsum"))
      .as[(String, Long, Long)]
      .collect()
      .sortBy(_._1)
    require(perSource.nonEmpty, "no sources to optimize over")
    val totalL = perSource.map(_._2).sum
    val totalT = perSource.map(_._3).sum
    val ref = totalL / totalT // integer floor: reference loss, 1e-4 nats
    val loss = perSource.map(s => s._2 / s._3)
    val excess = loss.map(l => math.max(0L, l - ref))
    var w = Array.fill(perSource.length)(1000000L)
    var r = 0
    while (r < rounds) {
      var i = 0
      while (i < w.length) {
        w(i) = w(i) * (1000000L + etaPer1e4Nat * excess(i)) / 1000000L
        i += 1
      }
      val sw = w.sum
      i = 0
      while (i < w.length) { w(i) = w(i) * 1000000L / sw; i += 1 }
      r += 1
    }
    val sw = w.sum
    val rows = perSource.indices.map { i =>
      (perSource(i)._1, perSource(i)._3, loss(i), excess(i), w(i),
        w(i) * budgetTokens / sw)
    }
    rows.toDF("source", "n_tokens", "loss_e4", "excess_e4", "weight_ppm", "tokens_target")
  }
}
