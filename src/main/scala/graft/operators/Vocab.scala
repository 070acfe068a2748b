package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vocabulary-construction and token-safety operators over the corpus'
  * token stream — the tokenizer-training and memorization-risk side of
  * a data pipeline.
  */
object Vocab {

  /** Adjacent character-pair frequencies — the candidate table of BPE
    * training's first merge step (Sennrich et al. 2016): every in-word
    * character bigram, counted corpus-wide, top-k by frequency. One
    * word explode + one in-word bigram explode + one hash aggregate;
    * the top-k is a `TakeOrdered` (never a global sort materialized).
    * The in-word enumeration is a `transform` HOF — interpreted, but a
    * two-op lambda over short arrays, and the surrounding aggregate
    * dominates. Iterating merges (step 2..n) re-runs this over a
    * re-paired corpus; each step is the same linear plan.
    */
  def bpePairCounts(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    docs
      .select(explode(split(trim(col(textCol)), " +")).as("__w"))
      .filter(length(col("__w")) >= 2)
      .select(explode(transform(
        sequence(lit(1), length(col("__w")) - 1),
        i => col("__w").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair").asc)
      .limit(k)
  }

  /** Documents carrying rare tokens — the memorization-risk signal: a
    * token whose corpus document frequency is below `minDf` is likely a
    * unique identifier, key, or personal string; documents containing
    * many of them are flagged for review/removal before training.
    *
    * Scale shape: one distinct-(doc, token) explode feeds the df
    * aggregate; the rare-token set (df < minDf) is by construction the
    * long tail — potentially LARGE — so the flag join is a plain hash
    * join on token, NOT a broadcast hint; AQE broadcasts when the rare
    * set measures small. Returns (doc id, n_rare_tokens, min_df).
    */
  /** Iterative BPE training (Sennrich et al. 2016): run `merges` actual
    * merge steps, not just the first candidate table. Words are encoded
    * as sentinel-wrapped symbol strings — `"abc"` → `"(a)(b)(c)"` — so a
    * merge is a plain left-to-right non-overlapping string `replace` of
    * `"(a)(b)"` with `"(ab)"`, exactly the greedy semantics of the
    * reference algorithm (in `"aaa"`, merging `(a,a)` yields `aa·a`).
    * Sentinels make cross-symbol false matches impossible: `"(ab)"`
    * never contains the substring `"(a)"`.
    *
    * Scale shape: ONE corpus-scale pass (word explode → frequency
    * aggregate), cached; every loop step then runs over the DISTINCT-word
    * table — bounded by vocabulary size, orders of magnitude below the
    * corpus — as one small pair-count shuffle plus one arithmetic-only
    * token-count aggregate. The per-step `collect()` moves exactly one
    * row (the arg-max pair): that is the algorithm's inherent sequential
    * dependency, not a driver-side data loop. Lineage is re-cached every
    * 8 steps so a long merge schedule doesn't re-replay the replace
    * chain. Candidate counts use overlapping pair occurrences (the
    * classic `Counter(zip(w, w[1:]))` convention), so `pair_n` can
    * exceed the merges actually applied; `corpus_tokens` is therefore
    * measured from the re-encoded table, never derived as `prev − n`.
    *
    * Returns the learned merge table: one row per step with
    * (step, left_sym, right_sym, pair_n, corpus_tokens-after-step).
    * Ties on count break on the encoded pair string ascending.
    */
  def bpeTrain(docs: DataFrame, textCol: String, merges: Int): DataFrame = {
    require(merges > 0, s"merges must be positive, got $merges")
    val spark = docs.sparkSession
    import spark.implicits._

    // the one corpus-scale pass: word frequencies, then vocabulary-sized
    // everywhere below. Sentinel chars in a word would corrupt the
    // encoding, so such words are excluded (none exist in normal text).
    val base = docs
      .select(explode(split(trim(col(textCol)), " +")).as("__w"))
      .filter(length(col("__w")) >= 1 &&
        !col("__w").contains("(") && !col("__w").contains(")"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__cnt"))
      .select(regexp_replace(col("__w"), "(.)", "($1)").as("__enc"), col("__cnt"))
      .cache()

    val symCount = length(col("__enc")) - length(translate(col("__enc"), "(", ""))
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long, Long)]
    var enc = base
    var prevCached: DataFrame = base
    var step = 1
    var done = false
    while (step <= merges && !done) {
      val syms = split(regexp_replace(col("__enc"), "^\\(|\\)$", ""), "\\)\\(")
      val top = enc
        .filter(symCount >= 2)
        .select(col("__cnt"), syms.as("__syms"))
        .select(col("__cnt"), explode(transform(
          sequence(lit(1), size(col("__syms")) - 1),
          i => struct(
            element_at(col("__syms"), i).as("l"),
            element_at(col("__syms"), i + 1).as("r")))).as("__p"))
        .groupBy(col("__p.l").as("l"), col("__p.r").as("r"))
        .agg(sum(col("__cnt")).as("n"))
        .withColumn("pat", concat(lit("("), col("l"), lit(")("), col("r"), lit(")")))
        .orderBy(col("n").desc, col("pat").asc)
        .limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val row = top(0)
        val (l, r, n) = (row.getString(0), row.getString(1), row.getLong(2))
        enc = enc.withColumn("__enc",
          replace(col("__enc"), lit(s"($l)($r)"), lit(s"($l$r)")))
        if (step % 8 == 0) {
          val snapped = enc.cache()
          snapped.count()
          if (prevCached ne base) prevCached.unpersist()
          prevCached = snapped
          enc = snapped
        }
        val toks = enc.agg(sum(col("__cnt") * symCount).cast("long")).as[Long].head()
        learned += ((step, l, r, n, toks))
        step += 1
      }
    }
    if (prevCached ne base) prevCached.unpersist()
    base.unpersist()
    learned.toSeq.toDF("step", "left_sym", "right_sym", "pair_n", "corpus_tokens")
  }

  /** Apply a learned BPE merge table ([[bpeTrain]]'s output order) to the
    * corpus — the other half of the tokenizer loop: train once, then
    * measure what the corpus costs in TRAINED tokens (the budget that
    * matters downstream is post-merge tokens, not whitespace words).
    * Each word is sentinel-encoded exactly as in training and the merges
    * replay as ordered non-overlapping string replaces, so apply(train(C))
    * on the training corpus itself reproduces training's final encoding.
    *
    * Returns (id, n_words, n_tokens_bpe). Scale shape: one word explode,
    * `merges.size` narrow chained `replace`s (codegen'd string ops, no
    * HOF), one per-doc aggregate — a single corpus-sized shuffle. The
    * merge table is model-sized by definition (it arrived through a
    * driver-side `collect` in training), so passing it as a literal Seq
    * is not a data collect.
    */
  def bpeApply(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val enc0 = regexp_replace(col("__w"), "(.)", "($1)")
    val encoded = merges.foldLeft(enc0) { case (e, (l, r)) =>
      replace(e, lit(s"($l)($r)"), lit(s"($l$r)"))
    }
    docs
      .select(col(idCol), explode(split(trim(col(textCol)), " +")).as("__w"))
      .filter(length(col("__w")) >= 1 &&
        !col("__w").contains("(") && !col("__w").contains(")"))
      .select(col(idCol), encoded.as("__enc"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_words"),
        sum(length(col("__enc")) - length(translate(col("__enc"), "(", "")))
          .as("n_tokens_bpe"))
  }

  /** Zipf rank–frequency fit — the corpus-health scalar: natural text has
    * log(freq) ≈ intercept + slope·log(rank) with slope near −1; a much
    * flatter slope signals templated/synthetic text, a much steeper one a
    * degenerate vocabulary. Least-squares on the log-log points, computed
    * with the explicit covar/var formula (identical algebra on the SQL
    * side — never mix `regr_slope` on one engine with the formula on the
    * other).
    *
    * Plan: one corpus-scale token aggregate, then everything is
    * vocabulary-sized: the rank is a single-partition window over the
    * (token, freq) table — fine because types ≪ tokens by Heaps' law; at
    * extreme vocabulary (billions of types) substitute a two-pass
    * rank-by-partition-offset. Output is ONE row (n_types, slope,
    * intercept), 4-dp-snapped (ln noise).
    */
  def zipfSlope(docs: DataFrame, textCol: String): DataFrame = {
    val freq = docs
      .select(explode(split(trim(col(textCol)), " +")).as("__w"))
      .filter(length(col("__w")) >= 1)
      .groupBy(col("__w")).agg(count(lit(1)).as("__f"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__f").desc, col("__w").asc)
    val pts = freq
      .withColumn("__x", log(row_number().over(w).cast("double")))
      .withColumn("__y", log(col("__f").cast("double")))
    pts.agg(
      count(lit(1)).as("n_types"),
      round(covar_pop(col("__x"), col("__y")) / var_pop(col("__x")), 4).as("slope"),
      round(
        avg(col("__y")) -
          covar_pop(col("__x"), col("__y")) / var_pop(col("__x")) * avg(col("__x")),
        4).as("intercept"))
  }

  /** Per-group KL divergence from the corpus token distribution —
    * KL(P_group ‖ Q_corpus) = Σ_w P(w)·ln(P(w)/Q(w)) — the domain-shift
    * scalar behind source-mixture decisions: a source whose unigram
    * distribution sits far from the corpus mean is specialist content
    * (code, legalese, another register) and gets weighted deliberately
    * rather than by volume. No smoothing is needed: every group token is
    * by construction in the corpus, so Q > 0 wherever P > 0.
    *
    * Plan: ONE token explode feeds the (group, token) aggregate; corpus
    * counts derive FROM that aggregate (vocabulary-sized input), join
    * back un-hinted (vocab grows with the corpus; AQE broadcasts while
    * it measures small), and group totals ride a vocabulary-sized
    * window. KL is 4-dp-snapped (ln + order-dependent summation).
    */
  def sourceDivergence(
      docs: DataFrame,
      groupCol: String,
      textCol: String): DataFrame = {
    val gt = docs
      .select(col(groupCol).as("grp"),
        explode(split(trim(col(textCol)), " +")).as("__w"))
      .filter(length(col("__w")) >= 1)
      .groupBy(col("grp"), col("__w")).agg(count(lit(1)).as("__n"))
    val corpus = gt.groupBy(col("__w")).agg(sum(col("__n")).as("__cn"))
    val total = gt.agg(sum(col("__n"))).head().getLong(0).toDouble
    val wGrp = org.apache.spark.sql.expressions.Window.partitionBy("grp")
    gt.join(corpus, Seq("__w"))
      .withColumn("__gn", sum(col("__n")).over(wGrp))
      .withColumn("__p", col("__n") / col("__gn"))
      .withColumn("__q", col("__cn") / lit(total))
      .groupBy(col("grp"))
      .agg(
        max(col("__gn")).as("n_tokens"),
        round(sum(col("__p") * log(col("__p") / col("__q"))), 4).as("kl"))
  }

  def rareTokenDocs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minDf: Long): DataFrame = {
    require(minDf >= 1, s"minDf must be >= 1, got $minDf")
    val docTokens = docs
      .select(col(idCol), explode(graft.exprs.Shingles(col(textCol), 1)).as("__tok"))
    val df = docTokens
      .groupBy(col("__tok"))
      .agg(countDistinct(col(idCol)).as("__df"))
      .filter(col("__df") < minDf)
    docTokens
      .join(df, "__tok")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_rare_tokens"), min(col("__df")).as("min_df"))
  }
}
