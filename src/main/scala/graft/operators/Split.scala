package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting and sampling for training-data
  * pipelines. Both operators key on a cryptographic digest of the row id
  * rather than `rand()`: the assignment is then reproducible across runs,
  * stable under repartitioning, immune to input order, and — because md5
  * is a standard — reproducible by ANY engine (the DuckDB oracle included),
  * which is what makes a train/test split auditable.
  */
object Split {

  /** Hash bucket in [0, 100): first 8 hex chars of md5(salt ‖ id) as an
    * integer, mod 100. Pure codegen'd column arithmetic, zero shuffle.
    * The empty-salt default is byte-identical to md5(id).
    */
  def hashBucket(id: Column, salt: String = ""): Column =
    hashDraw32(id, salt) % 100

  /** Full-resolution 32-bit hash draw in [0, 2³²): the first 8 hex chars
    * of md5(salt ‖ id). The uniform variate behind [[weightedSample]];
    * [[hashBucket]] is this mod 100.
    */
  def hashDraw32(id: Column, salt: String = ""): Column =
    hashDraw32(id, lit(salt))

  /** Column-salted draw — the same derivation with a PER-ROW salt (e.g.
    * a source-label column), for single-scan operators over labeled
    * tables.
    */
  def hashDraw32(id: Column, salt: Column): Column =
    conv(substring(md5(concat(salt, id.cast("string")).cast("binary")), 1, 8), 16, 10)
      .cast("long")

  /** Deterministic weighted sampling: keep each row with probability
    * `weightCol` (in [0, 1]) by comparing a 32-bit md5 draw on the id
    * against weight·2³² — the quality-weighted downsampling step of a
    * training pipeline (keep better documents with higher probability),
    * with the same auditability as [[assign]]: reproducible across runs
    * and engines, stable under reordering, zero shuffle (a narrow
    * codegen'd filter).
    */
  def weightedSample(
      df: DataFrame,
      idCol: String,
      weightCol: Column,
      salt: String = ""): DataFrame =
    df.filter(hashDraw32(col(idCol), salt) <
      floor(weightCol * lit(4294967296.0)).cast("long"))

  /** Temperature-scaled source mixture — the multilingual/multi-source
    * rebalancing step (mT5/XLM-R style): target share of source s is
    * qₛ ∝ nₛ^α, so α = 1 keeps natural proportions, α → 0 flattens
    * toward uniform (upsampling the tails by keeping more of them while
    * heads are downsampled). Each source keeps rows whose 32-bit md5
    * draw (salted by the source name) falls under
    * rate_s = min(1, qₛ·T / nₛ) for a target total T.
    *
    * The per-source counts are ONE count job each (metadata-sized,
    * eager by nature — the rates ARE the operator's output contract);
    * the sampling itself is the zero-shuffle [[weightedSample]] filter.
    * Rates are snapped to 6 dp BEFORE the 2³² threshold multiply so the
    * `pow`-derived boundary is engine-reproducible (pow differs in the
    * last ulp across libms; the snap absorbs it — the knnJoin 4-dp rank
    * convention, applied to a keep-rate).
    */
  def temperatureMixture(
      sources: Seq[(String, DataFrame)],
      idCol: String,
      alpha: Double,
      targetRows: Long): DataFrame = {
    require(sources.nonEmpty, "need at least one source")
    val rates = temperatureRates(
      sources.map { case (name, df) => (name, df.count()) }, alpha, targetRows)
    sources.map { case (name, df) =>
      // the sampling IS weightedSample — one filter definition repo-wide
      weightedSample(df, idCol, lit(rates(name)), salt = name)
        .withColumn("source", lit(name))
        .withColumn("keep_rate", lit(rates(name)))
    }.reduce(_ unionByName _)
  }

  /** Single-scan variant for the common case of ONE labeled table: the
    * per-source counts come from one `groupBy(sourceCol)` job and the
    * sampling is one narrow filtered pass with a per-row column-salted
    * draw against a source-keyed threshold — no per-source scans, no
    * union. Row-identical to [[temperatureMixture]] over the per-label
    * slices (spec-locked). Rows with a NULL source label are excluded
    * from both the rate computation and the output.
    */
  def temperatureMixtureByColumn(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      alpha: Double,
      targetRows: Long): DataFrame = {
    // null labels are excluded up front (the Calibrate.sweep convention):
    // without this, the count collect would NPE on String ordering while
    // the sampling filter silently dropped the same rows — inconsistent
    val labeled = df.filter(col(sourceCol).isNotNull)
    val counts = labeled.groupBy(col(sourceCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq.sortBy(_._1)
    require(counts.nonEmpty, "no source labels to mix")
    val rates = temperatureRates(counts, alpha, targetRows)
    val thr = counts.map { case (name, _) =>
      (name, math.floor(rates(name) * 4294967296.0).toLong)
    }
    def chain[T](pairs: Seq[(String, T)]): Column =
      pairs.tail.foldLeft(
        when(col(sourceCol) === pairs.head._1, lit(pairs.head._2))) {
        case (acc, (name, v)) => acc.when(col(sourceCol) === name, lit(v))
      }
    labeled.filter(hashDraw32(col(idCol), col(sourceCol)) < chain(thr))
      .withColumn("keep_rate", chain(rates.toSeq.sortBy(_._1)))
  }

  /** Shared α-rate arithmetic: qₛ ∝ nₛ^α, rate_s = min(1, qₛ·T/nₛ),
    * snapped at 6 dp so the pow-derived boundary is engine-exact.
    */
  private def temperatureRates(
      counts: Seq[(String, Long)],
      alpha: Double,
      targetRows: Long): Map[String, Double] = {
    require(alpha > 0 && alpha <= 1, s"temperature alpha in (0, 1], got $alpha")
    require(targetRows > 0, "target size must be positive")
    val weights = counts.map { case (_, n) => math.pow(n.toDouble, alpha) }
    val wSum = weights.sum
    require(wSum > 0, "all sources are empty")
    counts.zip(weights).map { case ((name, n), w) =>
      val rate =
        if (n == 0) 0.0
        else math.min(1.0, w / wSum * targetRows.toDouble / n.toDouble)
      name -> BigDecimal(rate)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
  }

  /** Exact-k importance resampling WITHOUT replacement
    * (Efraimidis–Spirakis): every row draws key = ln(u)/w from its
    * deterministic md5 uniform u ∈ (0, 1] and weight w > 0, and the k
    * LARGEST keys win — inclusion probability proportional to weight,
    * sample size exactly k. This is the selection step a DSIR-weighted
    * corpus actually runs ([[graft.operators.Dsir]] produces the w
    * column), and with w = token count it is token-proportional document
    * sampling.
    *
    * Scale shape: the key is a narrow codegen'd projection (zero
    * shuffle); the top-k is TakeOrderedAndProject — per-partition heaps
    * + a k-row driver merge, never a global sort. That makes k driver-
    * bounded, hence the guard: sample-sized k only. For budget-scale
    * selection ("the best N billion tokens") use
    * [[Selection.selectByBudget]], whose histogram decomposition has no
    * driver-side k.
    *
    * The key is snapped to 6 dp before ranking (ties broken by id ASC):
    * `ln` differs across engines in the last ulp, and an unsnapped
    * boundary row would make the k-th seat engine-dependent — same
    * convention as [[graft.operators.Ann.knnJoin]]'s 4-dp cosine rank.
    * Rows with w ≤ 0 or null are excluded (never sampled).
    */
  def weightedTopK(
      df: DataFrame,
      idCol: String,
      weightCol: Column,
      k: Int,
      salt: String = ""): DataFrame = {
    require(k > 0 && k <= (1 << 22),
      "weightedTopK's top-k merges k rows per partition on the driver; " +
        "for corpus-scale selection use Selection.selectByBudget")
    val u = (hashDraw32(col(idCol), salt).cast("double") + 1.0) / 4294967296.0
    val key = round(log(u) / weightCol, 6)
    df.filter(weightCol.isNotNull && weightCol > 0)
      .withColumn("__k", key)
      .orderBy(col("__k").desc, col(idCol).asc)
      .limit(k)
      .drop("__k")
  }

  /** The split-label expression over a [0, 100) bucket column — shared
    * by id-keyed [[assign]] and cluster-keyed [[assignByCluster]] so the
    * boundary arithmetic can never drift between the two.
    */
  private def splitLabel(bucket: Column, weights: Seq[(String, Int)]): Column = {
    require(weights.map(_._2).sum == 100, "split weights must sum to 100")
    val bounds = weights.scanLeft(0) { case (acc, (_, w)) => acc + w }.tail
    weights.zip(bounds).tail
      .foldLeft(when(bucket < bounds.head, lit(weights.head._1))) {
        case (acc, ((name, _), hi)) => acc.when(bucket < hi, lit(name))
      }
  }

  /** Adds a `split` label column from percentage weights, e.g.
    * `Seq("train" -> 80, "val" -> 10, "test" -> 10)`. Weights must sum
    * to 100. The split is a narrow projection — at 100 TB it costs one
    * pass with no shuffle, and rows keep their label forever (adding
    * data never reassigns existing rows across splits).
    */
  def assign(df: DataFrame, idCol: String, weights: Seq[(String, Int)]): DataFrame =
    df.withColumn("split", splitLabel(hashBucket(col(idCol)), weights))

  /** LEAKAGE-SAFE split: the label is drawn on the dedup CLUSTER id, not
    * the document id, so near-duplicates can never straddle train/test —
    * the classic eval-leakage failure an id-keyed [[assign]] cannot
    * prevent (two independent draws split a near-dup pair across labels
    * 1 − (0.8² + 0.1² + 0.1²) = 34% of the time at 80/10/10). `members` is a (id, cluster_id) frame, e.g.
    * [[Cluster.connectedComponents]] output; docs absent from it are
    * singletons and key on their own id, BIT-IDENTICALLY to [[assign]]
    * (same md5 bucket on the same decimal string), so adding a dedup
    * pass never reshuffles the unaffected corpus across splits.
    *
    * Scale shape: the pair graph is ≪ corpus (only colliding docs
    * appear), so the membership join broadcasts — same justification as
    * [[Cluster.canonical]]; the label itself stays a narrow projection.
    */
  def assignByCluster(
      docs: DataFrame,
      idCol: String,
      members: DataFrame,
      weights: Seq[(String, Int)]): DataFrame = {
    // same hazard as Cluster.canonical: a non-integral id would
    // cast('long') to NULL in the singleton fallback, and hashBucket(NULL)
    // → splitLabel(NULL) silently labels every such doc split = NULL
    Cluster.requireIntegralIds(docs, idCol)
    val m = members.select(col("id").as(idCol), col("cluster_id").as("__cid"))
    docs.join(broadcast(m), Seq(idCol), "left")
      .withColumn("cluster_id", coalesce(col("__cid"), col(idCol).cast("long")))
      .drop("__cid")
      .withColumn("split", splitLabel(hashBucket(col("cluster_id")), weights))
  }

  /** Exact stratified sample: per stratum, keep `ceil(frac · n)` rows,
    * chosen by md5-rank (deterministic, uniform, engine-reproducible).
    * One shuffle on the stratum key; the rank and the stratum count ride
    * the same window partition. Strata are typically language/source
    * labels — bounded cardinality, so skew salting is not needed; for a
    * shuffle-free approximate variant at extreme scale, filter on
    * [[hashBucket]] < frac·100 instead.
    */
  def stratifiedSample(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      frac: Double): DataFrame = {
    val w = Window.partitionBy(strataCol)
    val byHash = w.orderBy(md5(col(idCol).cast("string").cast("binary")).asc,
      col(idCol).asc)
    df.withColumn("__rn", row_number().over(byHash))
      .withColumn("__n", count(lit(1)).over(w))
      .filter(col("__rn") <= ceil(col("__n") * frac))
      .drop("__rn", "__n")
  }

  /** Deterministic weighted mixture of sources — the dataset-weighting
    * step of a training mix (e.g. web 50%, books 25%). Each source keeps
    * rows whose salted hash bucket falls under its percentage; the source
    * name salts the hash so shared id spaces stay uncorrelated across
    * sources (the same id is an independent draw in each). A tagged
    * `source` column rides along. Zero shuffle — each branch is a narrow
    * filtered scan and the union is plan-level only.
    *
    * Rates are integer percents: exact bucket arithmetic, no float
    * boundary ambiguity about which rows a 0.1 rate keeps.
    */
  def mixture(sources: Seq[(String, DataFrame, Int)], idCol: String): DataFrame = {
    require(sources.nonEmpty && sources.forall { case (_, _, r) => r >= 0 && r <= 100 },
      "mixture rates are integer percents in [0, 100]")
    sources.map { case (name, df, rate) =>
      df.filter(hashBucket(col(idCol), salt = name) < rate)
        .withColumn("source", lit(name))
    }.reduce(_ unionByName _)
  }
}
