package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PCA for embedding columns — the dimensionality-reduction step before
  * clustering / ANN / visualization, decomposed the way it scales:
  *
  *   1. ONE corpus pass builds the d×d covariance — each row explodes to
  *     its d² position-pair products, map-side combine collapses every
  *     partition to ≤ d² partial sums, so the shuffle carries
  *     partitions × d² rows regardless of corpus size;
  *   2. the eigendecomposition runs on the DRIVER over the d² matrix —
  *     dim-bounded arithmetic (a 64-dim cov is 32 KiB; the guard caps d
  *     where d² stops being metadata), classic cyclic Jacobi;
  *   3. projection is a broadcast of k·d literal weights into a
  *     codegen'd expression — zero shuffle, zero UDF, whole-stage.
  *
  * Only step 1 touches the corpus; steps 2–3 cost the same at 100 TB as
  * at 1 GB. This is the standard big-data PCA decomposition (compute the
  * Gram/covariance distributed, solve the small eigenproblem centrally).
  */
object Pca {

  /** d above which the d² covariance stops being "metadata-sized" for a
    * driver collect + broadcast-literal projection (1024² doubles = 8 MiB).
    * Past this, PCA wants a randomized/iterative method, not a bigger
    * collect — fail loud instead of OOMing quiet.
    */
  val MaxDim = 1024

  /** The shared one-pass moment aggregate: each row explodes to its
    * UPPER-TRIANGULAR position-pair products (cov is symmetric — emitting
    * both halves would double the explode for information the matrix
    * already has) plus d single-value rows tagged j = −1 for the means.
    * One corpus pass, one shuffle of ≤ partitions × (d(d+1)/2 + d) rows
    * after map-side combine. Returns (i, j, exy) with the j = −1 rows
    * carrying E[xᵢ].
    *
    * The vector is `slice`d to `dim` FIRST, so the explode and the
    * downstream driver collect are bounded by the DECLARED dimension
    * even when a row carries a wider array — the [[MaxDim]] guard
    * cannot be bypassed by data (positions past `dim` are ignored, the
    * documented ragged-input semantics in reverse; [[fit]]'s exact-width
    * guard refuses mixed widths outright).
    */
  private type PlanKey =
    (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, String, Int)

  /** Session-scoped moments capture: the triangular pass is a pure
    * function of (input plan, vecCol, dim) and its collected form is
    * metadata-sized (≤ d(d+1)/2 + d doubles, [[MaxDim]]-bounded), so
    * consumers that need several views of ONE covariance — the full
    * matrix, the eigensolve, the trace — pay the corpus pass once per
    * session instead of once per view. Keyed on the CANONICALIZED
    * logical plan: two frames reading the same source through the same
    * operators share the entry even though they are distinct Dataset
    * objects. The capture assumes the source is immutable for the
    * session (true of an analytics snapshot); the in-place mutation
    * paths ([[graft.sources.Layout.compact]] / `rewriteFiltered` /
    * `expire`) fire [[graft.Caches.invalidateAll]], which clears these
    * via the hook registered below — call [[clearCaches]] yourself only
    * after mutating a source through some OTHER channel. Entry count is
    * bounded at [[MaxCachedPlans]] (each entry ≤ d(d+1)/2 + d doubles);
    * on overflow the whole map clears — a full re-pay beats unbounded
    * driver growth across many-dataset sessions.
    */
  private val momentsCache = new java.util.concurrent.ConcurrentHashMap[
    PlanKey, Map[(Int, Int), Double]]()
  private val cleanCache: java.util.Set[(
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      String, Int, Boolean)] =
    java.util.concurrent.ConcurrentHashMap.newKeySet()
  private val MaxCachedPlans = 64
  graft.Caches.register(() => clearCaches())

  def clearCaches(): Unit = {
    momentsCache.clear(); cleanCache.clear()
  }
  private[graft] def momentsCacheSize: Int = momentsCache.size

  private def collectedMoments(
      emb: DataFrame, vecCol: String, dim: Int): Map[(Int, Int), Double] = {
    val key = (emb.queryExecution.analyzed.canonicalized, vecCol, dim)
    if (momentsCache.size >= MaxCachedPlans && !momentsCache.containsKey(key))
      clearCaches()
    momentsCache.computeIfAbsent(key, _ =>
      moments(emb, vecCol, dim).collect()
        .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap)
  }

  private def moments(emb: DataFrame, vecCol: String, dim: Int): DataFrame = {
    val v = slice(col(vecCol), 1, dim)
    val tri = flatten(transform(v, (xi, i) =>
      transform(slice(v, i + lit(1), size(v) - i), (xj, jj) => struct(
        i.as("i"), (i + jj).as("j"),
        (xi.cast("double") * xj.cast("double")).as("xy")))))
    val singles = transform(v, (x, i) =>
      struct(i.as("i"), lit(-1).as("j"), x.cast("double").as("xy")))
    emb.select(explode(concat(tri, singles)).as("p"))
      .select(col("p.i"), col("p.j"), col("p.xy"))
      .groupBy("i", "j").agg(avg("xy").as("exy"))
  }

  /** Population covariance of an array column as a (i, j, cov) frame,
    * 0-based positions, snapped to `snapDp` decimals (None = raw).
    *
    * ONE corpus pass: the triangular [[moments]] aggregate is collected
    * (≤ d(d+1)/2 + d cells — metadata by the [[MaxDim]] guard) and the
    * full matrix is mirrored by DRIVER arithmetic. A plan-level mirror
    * (union of the upper triangle with its transpose) re-runs the
    * corpus explode per branch — Catalyst pushes each branch's filter
    * below the aggregate, so the exchanges never unify for reuse; the
    * driver mirror costs d² tuples instead of a second pass. Rows
    * shorter than `dim` or carrying null elements fail loudly up front
    * (same guard family as [[fit]]; wider rows are fine — positions past
    * `dim` are sliced off) — a ragged input would otherwise average each
    * cell over a different count, silently skewing the matrix.
    */
  def covariance(
      emb: DataFrame,
      vecCol: String,
      dim: Int,
      snapDp: Option[Int] = Some(6)): DataFrame = {
    require(dim > 0 && dim <= MaxDim,
      s"covariance is driver-collected as d² cells; dim=$dim exceeds $MaxDim")
    requireCleanVectors(emb, vecCol, dim, exactWidth = false)
    val mom = collectedMoments(emb, vecCol, dim)
    def snap(d: Double) = snapDp.fold(d)(p =>
      BigDecimal(d).setScale(p, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val rows = mom.keysIterator.filter(_._2 >= 0).flatMap { case (i, j) =>
      val cov = snap(mom((i, j)) - mom((i, -1)) * mom((j, -1)))
      if (i == j) Iterator((i, j, cov)) else Iterator((i, j, cov), (j, i, cov))
    }.toSeq
    val spark = emb.sparkSession
    import spark.implicits._
    rows.toDF("i", "j", "cov")
  }

  /** Eigendecomposition of a symmetric matrix by cyclic Jacobi rotations
    * (driver-side; O(sweeps·n³) on an n ≤ [[MaxDim]] matrix). Returns
    * eigenvalues descending and the matching eigenvectors as ROWS, each
    * sign-canonicalized (largest-|component| positive) so the output is
    * deterministic — eigenvector sign is otherwise arbitrary.
    */
  def eigenSym(m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = m.length
    require(m.forall(_.length == n), "matrix must be square")
    val a = m.map(_.clone())
    val vec = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      for (i <- 0 until n; j <- i + 1 until n) s += a(i)(j) * a(i)(j)
      s
    }
    var sweep = 0
    while (off() > 1e-22 && sweep < 64) {
      for (p <- 0 until n; q <- p + 1 until n if math.abs(a(p)(q)) > 1e-18) {
        val theta = (a(q)(q) - a(p)(p)) / (2 * a(p)(q))
        val t =
          if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1))
          else 1.0 / (theta - math.sqrt(theta * theta + 1))
        val c = 1.0 / math.sqrt(t * t + 1)
        val s = t * c
        var k = 0
        while (k < n) {
          val akp = a(k)(p); val akq = a(k)(q)
          a(k)(p) = c * akp - s * akq
          a(k)(q) = s * akp + c * akq
          k += 1
        }
        k = 0
        while (k < n) {
          val apk = a(p)(k); val aqk = a(q)(k)
          a(p)(k) = c * apk - s * aqk
          a(q)(k) = s * apk + c * aqk
          k += 1
        }
        k = 0
        while (k < n) {
          val vkp = vec(k)(p); val vkq = vec(k)(q)
          vec(k)(p) = c * vkp - s * vkq
          vec(k)(q) = s * vkp + c * vkq
          k += 1
        }
      }
      sweep += 1
    }
    val order = (0 until n).sortBy(i => -a(i)(i))
    val vals = order.map(i => a(i)(i)).toArray
    val vecs = order.map { c =>
      val col = Array.tabulate(n)(r => vec(r)(c))
      val pivot = col.indices.maxBy(i => math.abs(col(i)))
      if (col(pivot) < 0) col.map(-_) else col
    }.toArray
    (vals, vecs)
  }

  /** A fitted PCA basis: `components(c)` is the c-th principal axis. */
  final case class Model(
      dim: Int,
      means: Array[Double],
      eigenvalues: Array[Double],
      components: Array[Array[Double]])

  /** Ragged/null fail-fast shared by [[fit]] (exact width) and
    * [[covariance]] (width ≥ dim — wider rows are sliced): a short vector
    * or a NULL ELEMENT inside one would null out pair products, making
    * `avg` skip them per cell with DIFFERING counts — silently skewed
    * covariance, the worst kind of wrong. One narrow limit(1) scan.
    */
  private def requireCleanVectors(
      emb: DataFrame, vecCol: String, dim: Int, exactWidth: Boolean): Unit = {
    // a PASSED check is cached per canonical plan (same capture contract
    // as [[collectedMoments]] — the scan is narrow but corpus-length, so
    // re-proving a snapshot clean per view is pure waste); a FAILED check
    // is never cached, it throws
    val key = (emb.queryExecution.analyzed.canonicalized, vecCol, dim, exactWidth)
    if (cleanCache.contains(key)) return
    if (cleanCache.size >= MaxCachedPlans) cleanCache.clear()
    val v = col(vecCol)
    val widthBad = if (exactWidth) size(v) =!= dim else size(v) < dim
    val bad = emb
      .filter(v.isNull || widthBad ||
        exists(slice(v, 1, dim), x => x.isNull))
      .limit(1).count()
    require(bad == 0, s"found a $vecCol row that is null, " +
      s"ragged (${if (exactWidth) "not exactly" else "shorter than"} $dim " +
      "wide), or has null elements — such rows would silently skew " +
      "covariance cells; filter or pad first")
    cleanCache.add(key)
  }

  /** Fit on ONE triangular [[moments]] pass (collected as ≤ d(d+1)/2 + d
    * cells — metadata-sized) plus a narrow ragged/null-input fail-fast
    * scan (a short vector or null element would silently skew cells).
    */
  def fit(emb: DataFrame, vecCol: String, dim: Int): Model = {
    requireCleanVectors(emb, vecCol, dim, exactWidth = true)
    val mom = collectedMoments(emb, vecCol, dim)
    require(mom.nonEmpty,
      s"fit: no $vecCol rows to fit on — an empty corpus has no covariance")
    val means = Array.tabulate(dim)(i => mom((i, -1)))
    val matrix = Array.tabulate(dim, dim) { (i, j) =>
      mom((math.min(i, j), math.max(i, j))) - means(i) * means(j)
    }
    val (vals, vecs) = eigenSym(matrix)
    Model(dim, means, vals, vecs)
  }

  /** Project onto the top-k axes: k codegen'd dot products against
    * literal weights — a narrow plan (no shuffle, no UDF, no broadcast
    * exchange; the model rides in the expression tree).
    */
  def project(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      model: Model,
      k: Int,
      whiten: Boolean = false): DataFrame = {
    require(k > 0 && k <= model.dim, s"k=$k out of range 1..${model.dim}")
    if (whiten) require(model.eigenvalues(k - 1) > 1e-12,
      s"cannot whiten: axis ${k - 1} is degenerate " +
        s"(λ=${model.eigenvalues(k - 1)}); reduce k below the effective rank")
    val v = col(vecCol)
    val coords = (0 until k).map { c =>
      // whitening folds 1/√λ into the SAME literal weights — the
      // unit-variance decorrelated coordinates cost nothing extra
      val scale = if (whiten) 1.0 / math.sqrt(model.eigenvalues(c)) else 1.0
      val w = model.components(c)
      (0 until model.dim).map { i =>
        (element_at(v, i + 1).cast("double") - lit(model.means(i))) *
          lit(w(i) * scale)
      }.reduce(_ + _).as(s"pc$c")
    }
    emb.select(col(idCol) +: coords: _*)
  }

  /** Variance-explained report: one row per component, eigenvalue and
    * cumulative fraction of total variance (= trace), 6-dp snapped.
    */
  def varianceExplained(emb: DataFrame, vecCol: String, dim: Int, k: Int): DataFrame = {
    val model = fit(emb, vecCol, dim)
    val total = model.eigenvalues.sum
    def snap(d: Double) =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    var cum = 0.0
    val rows = model.eigenvalues.take(k).zipWithIndex.map { case (ev, c) =>
      cum += ev
      (c, snap(ev), snap(if (total == 0) 0.0 else cum / total))
    }
    val spark = emb.sparkSession
    import spark.implicits._
    rows.toSeq.toDF("component", "eigenvalue", "cum_var_frac")
  }
}
