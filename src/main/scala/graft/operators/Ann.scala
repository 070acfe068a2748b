package graft.operators

import graft.functions.Sim
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *  - `bruteForceTopK`: exact cosine top-k — one narrow pass over the
  *    corpus (query vector folded into the plan as literals, so Catalyst
  *    keeps the whole scan+score in one codegen stage) plus a
  *    TakeOrderedAndProject. This is the correctness baseline and is
  *    already the right plan for "one query vs the corpus" at any scale
  *    (no shuffle at all until the final top-k merge of k·partitions rows).
  *  - `ivf`: inverted-file index — k-means-lite centroid assignment;
  *    probe only the nProbe nearest centroids' partitions. The scale path
  *    for query *batches*: corpus scored only where it matters, and the
  *    centroid assignment is a broadcast join.
  */
object Ann {

  /** Fold a query vector into literal form. */
  private def vecLit(q: Seq[Double]): Column = array(q.map(lit): _*)

  /** Exact cosine top-k of `query` against the corpus. */
  def bruteForceTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int): DataFrame = {
    // native fused-loop expression (graft.exprs.CosineSim) — one codegen'd
    // pass per row, no intermediate arrays; the plan is scan → project →
    // TakeOrderedAndProject (no shuffle until the final k·partitions merge)
    val cos = graft.exprs.CosineSim(col(vecCol), vecLit(query))
    emb.select(col(idCol), round(cos, 4).as("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }

  /** IVF index build: assign every vector to its nearest of `centroids`.
    * Returns the corpus with a `centroid_id` partition key; persist
    * partitioned by it so probes prune partitions at read time.
    */
  def ivfAssign(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Seq[(Int, Seq[Double])]): DataFrame = {
    // fused native arg-max kernel (graft.exprs.NearestCentroid), not
    // greatest() over k struct(sim, cid) branches: struct comparison is
    // interpreted InternalRow ordering that never enters codegen, and
    // with k scaled to corpus size that made ASSIGNMENT — not the
    // pairwise stage — the semDedup bottleneck in the 10x rehearsal
    // (14 s of a 16 s query). One k×dim codegen'd loop, zero allocation,
    // bit-identical per-centroid arithmetic and tie order.
    emb.withColumn("centroid_id",
      graft.exprs.NearestCentroid(col(vecCol), centroids))
  }

  /** IVF probe: search only rows assigned to the nProbe centroids nearest
    * the query, then exact top-k within them.
    */
  def ivfTopK(
      assigned: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Seq[(Int, Seq[Double])],
      query: Seq[Double],
      k: Int,
      nProbe: Int = 2): DataFrame = {
    val qn = math.sqrt(query.map(x => x * x).sum)
    def cos(c: Seq[Double]): Double = {
      val cn = math.sqrt(c.map(x => x * x).sum)
      val d = c.zip(query).map { case (a, b) => a * b }.sum
      if (cn == 0 || qn == 0) 0.0 else d / (cn * qn)
    }
    val probeIds = centroids.sortBy { case (_, c) => -cos(c) }.take(nProbe).map(_._1)
    bruteForceTopK(
      assigned.filter(col("centroid_id").isin(probeIds: _*)),
      idCol, vecCol, query, k)
  }

  /** One Lloyd refinement step: recompute each centroid as the mean of
    * its assigned vectors (dropping centroids that lost all members).
    * One distributed aggregation over the corpus per step — partial
    * (map-side) mean accumulation, shuffle volume = k × dim doubles per
    * task regardless of corpus size, centroids collected to the driver
    * (k·dim values — metadata-sized). Chain `ivfAssign → lloydStep`
    * a few times before the final assignment for tighter partitions;
    * seeding alone suffices for recall, refinement reduces probe skew
    * (balanced partitions → balanced probe cost at 100 TB).
    */
  def lloydStep(
      assigned: DataFrame,
      vecCol: String): Seq[(Int, Seq[Double])] = {
    import scala.jdk.CollectionConverters._
    // explode to (centroid, dim-index, component): the per-(centroid, dim)
    // mean aggregates map-side first, so the only shuffle carries
    // k × dim partial sums per task — never vectors, never groups
    val rows = assigned
      .select(col("centroid_id"),
        posexplode(col(vecCol).cast("array<double>")))
      .groupBy(col("centroid_id"), col("pos"))
      .agg(avg(col("col")).as("m"))
      .groupBy(col("centroid_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("m")))),
        e => e.getField("m")).as("mean"))
      .collectAsList().asScala
    rows.map { r =>
      (r.getInt(0), r.getSeq[Double](1).toIndexedSeq: Seq[Double])
    }.toSeq.sortBy(_._1)
  }

  /** Mini-batch centroid seeding: deterministic sample of `k` corpus
    * vectors as centroids (k-means|| seeding step; full Lloyd iterations
    * optional — for LSH-style bucketing recall, seeds suffice).
    */
  def seedCentroids(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): Seq[(Int, Seq[Double])] = {
    import scala.jdk.CollectionConverters._
    val rows = emb.orderBy(col(idCol)).limit(k)
      .select(col(vecCol).cast("array<double>")).collectAsList().asScala
    rows.zipWithIndex.map { case (r, i) =>
      (i, r.getSeq[Double](0).toIndexedSeq)
    }.toSeq
  }

  /** Batch k-NN join: each query row gets its k nearest corpus rows by
    * cosine — the shape a training pipeline runs (score a probe SET, not
    * one vector). The query side broadcasts (small by contract), so the
    * scoring pass is a broadcast nested-loop: corpus-partition-parallel,
    * zero shuffle, native fused CosineSim per candidate. The per-query
    * top-k is a rank window that Spark rewrites to WindowGroupLimit: each
    * corpus partition pre-selects its local top-k per query BEFORE the
    * exchange, so the shuffle carries k·partitions rows per query, never
    * the scored cross product. For huge query sets, IVF-partition both
    * sides first ([[ivfAssign]]) and knnJoin within probe cells.
    */
  def knnJoin(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val scored = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
      .crossJoin(broadcast(q))
      .select(col("query_id"), col("neighbor_id"),
        graft.exprs.CosineSim(col("__cv"), col("__qv")).as("__cos"))
    // rank on the 4-dp-snapped cosine (same convention as bruteForceTopK):
    // sub-ulp float noise between engines can flip near-tied raw ranks, so
    // the selected top-k must be decided on the rounded value + id tie-break
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(round(col("__cos"), 4).desc, col("neighbor_id").asc)
    scored
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("__cos"), 4).as("cos"))
  }

  /** Per-group embedding centroids — drift monitoring, class prototypes,
    * warm IVF seeds: the element-wise mean vector of each group, emitted
    * FLAT as (label, dim, mean_v) rows so the result is join-able,
    * SQL-oracle-able, and never materializes a per-group array on a
    * single reducer. One `posexplode` + one (label, dim) hash aggregate:
    * map-side partial sums make the shuffle carry groups×dim rows per
    * partition — independent of corpus size, the same k×dim shape as
    * [[lloydStep]]'s centroid update. The mean is 4-dp-snapped
    * (order-dependent float accumulation, the repo-wide convention).
    */
  def centroidsByGroup(
      emb: DataFrame,
      groupCol: String,
      vecCol: String): DataFrame =
    emb
      .select(col(groupCol).as("label"),
        posexplode(col(vecCol)).as(Seq("dim", "__v")))
      .groupBy(col("label"), col("dim"))
      .agg(round(avg(col("__v").cast("double")), 4).as("mean_v"),
        count(lit(1)).as("n_vecs"))

  /** Embedding outliers — the k vectors per group LEAST similar to their
    * own group's centroid: mis-labeled docs, embedding-model failures,
    * off-topic strays. The quality gate run after [[centroidsByGroup]]
    * in an embedding-drift pipeline.
    *
    * Plan: the FLAT centroid output folds back to one array row per
    * group (groups-bounded, metadata-sized — a justified broadcast,
    * unlike data-dependent drop sets), joins onto the corpus with zero
    * shuffle, and the bottom-k is a per-group rank window whose
    * WindowGroupLimit prunes local losers before the single exchange.
    * Centroid means are 4-dp-snapped by [[centroidsByGroup]] and the
    * cosine is ranked on its own 4-dp snap with an id tie-break (the
    * cross-engine convention), so the selected k is engine-independent.
    */
  def centroidOutliers(
      emb: DataFrame,
      idCol: String,
      groupCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val cent = centroidsByGroup(emb, groupCol, vecCol)
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("mean_v")))),
        s => s.getField("mean_v")).as("__c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("label").orderBy(col("cos").asc, col(idCol).asc)
    emb
      .select(col(groupCol).as("label"), col(idCol), col(vecCol).as("__v"))
      .join(broadcast(cent), Seq("label"))
      .withColumn("cos", round(graft.exprs.CosineSim(col("__v"), col("__c")), 4))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("label"), col(idCol), col("cos"))
  }

  /** Hard-negative mining for contrastive training: each query row gets
    * its k most-similar corpus rows whose `labelCol` DIFFERS from the
    * query's — high-cosine wrong-label examples, the negatives that
    * actually move a contrastive loss. Same scale shape as [[knnJoin]]
    * (broadcast query set, zero-shuffle scoring, WindowGroupLimit top-k)
    * with the label-mismatch predicate applied BEFORE the rank window,
    * so same-label candidates never reach the exchange. In production
    * the label is whatever partitions positives from negatives — a dedup
    * cluster id ([[Cluster]]), a source tag, or a supervision class.
    */
  def hardNegatives(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int): DataFrame = {
    val q = queries.select(
      col(idCol).as("query_id"), col(vecCol).as("__qv"), col(labelCol).as("__ql"))
    val scored = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
        col(labelCol).as("__cl"))
      .crossJoin(broadcast(q))
      .filter(col("__cl") =!= col("__ql"))
      .select(col("query_id"), col("neighbor_id"),
        graft.exprs.CosineSim(col("__cv"), col("__qv")).as("__cos"))
    // rank on the 4-dp-snapped cosine + id tie-break (knnJoin convention)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(round(col("__cos"), 4).desc, col("neighbor_id").asc)
    scored
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("__cos"), 4).as("cos"))
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023): drop a vector
    * when an EARLIER (lower-id) vector in the same IVF cell is within
    * `threshold` cosine — the cluster-then-prune trick that makes
    * semantic dedup tractable: pairwise comparison only within cells,
    * never across the corpus.
    *
    * Scale shape: one shuffle per side keyed on `centroid_id` (the cells
    * come from [[ivfAssign]], a broadcast-only pass), a within-cell pair
    * filter with the fused native [[graft.exprs.CosineSim]], and an anti
    * join on the dropped ids. The dropped-set size is THRESHOLD-DEPENDENT:
    * SemDeDup thresholds commonly drop 20–50% of a web corpus, so the
    * anti join is deliberately NOT broadcast-hinted — AQE picks broadcast
    * when the dropped set measures small and falls back to a shuffle anti
    * join when it does not. Cell population bounds the quadratic term — run
    * [[lloydStep]] refinements to balance cells before deduping so no
    * single cell dominates; at 100 TB, cap cell size by splitting hot
    * cells on a secondary hash.
    *
    * The keep-lowest-id rule is exists-based, not chain-based: each drop
    * decision compares against ALL earlier cell members, so it needs one
    * pair pass, no iteration, and is order-deterministic.
    */
  def semDedup(
      assigned: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    val left = assigned.select(
      col("centroid_id"), col(idCol).as("__id_a"), col(vecCol).as("__va"))
    val right = assigned.select(
      col("centroid_id"), col(idCol).as("__id_b"), col(vecCol).as("__vb"))
    val dropped = left.join(right, Seq("centroid_id"))
      .filter(col("__id_a") < col("__id_b") &&
        graft.exprs.CosineSim(col("__va"), col("__vb")) >= threshold)
      .select(col("__id_b").as(idCol))
      .distinct()
    assigned.join(dropped, Seq(idCol), "left_anti")
  }

  // ------------------------------------------------------------ int8 path

  /** Symmetric per-vector int8 quantization: scale = max |vᵢ|, qᵢ =
    * ⌊vᵢ/scale·127 + ½⌋ ∈ [−127, 127], stored as array<tinyint> — 4× less
    * embedding storage/shuffle than float32, 8× less than float64, which
    * at 100 TB is the difference between an embedding store that fits the
    * cluster and one that doesn't. Scales cancel in cosine, so ANN
    * scoring needs only the int arrays ([[graft.exprs.CosineSimInt]]);
    * keep `scale` alongside for dequantization (max abs error per
    * element: scale/254). Every arithmetic step is double-IEEE or
    * integer, so an engine mirroring the formula reproduces the
    * quantized values BIT-FOR-BIT. A zero vector quantizes to zeros
    * (scale 0 guard), not NaN.
    */
  def quantizeInt8(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb
      .withColumn("scale",
        array_max(transform(col(vecCol), v => abs(v.cast("double")))))
      .withColumn("qvec",
        transform(col(vecCol), v => when(col("scale") === 0.0, lit(0L))
          .otherwise(floor(v.cast("double") / col("scale") * 127.0 + 0.5))
          .cast("byte")))
      .select(col(idCol), col("qvec"), col("scale"))

  /** Driver-side mirror of [[quantizeInt8]] for folding a query vector
    * into the plan as int literals — same formula, same IEEE doubles.
    */
  def quantizeVec(q: Seq[Double]): Seq[Int] = {
    val scale = q.map(math.abs).foldLeft(0.0)(math.max)
    if (scale == 0.0) q.map(_ => 0)
    else q.map(v => math.floor(v / scale * 127.0 + 0.5).toInt)
  }

  /** Full iterated Lloyd's k-means over the embedding corpus, emitting
    * the per-step centroid trace `(step, centroid_id, dim, n, mean)` —
    * the convergence curve a pipeline actually inspects before freezing
    * an IVF index or a semantic-dedup partitioning. Composes the
    * existing primitives ([[seedCentroids]] → assign → mean) into the
    * whole training loop, the way [[graft.operators.Vocab.bpeTrain]]
    * closes the tokenizer loop.
    *
    * Engine-stable by construction (the repo's cross-engine convention):
    * assignment ranks on the 4-dp-ROUNDED cosine with ties to the LARGER
    * centroid id (the [[graft.exprs.NearestCentroid]] tie rule), and each
    * step's means are 4-dp-snapped BEFORE feeding the next step — so both
    * engines iterate from bit-identical centroid tables and the whole
    * N-step trace is reproducible by an unrolled SQL mirror. Production
    * IVF builds that don't need an oracle can keep the full-precision
    * [[ivfAssign]]/[[lloydStep]] pair; the loop shape is identical.
    *
    * Scale shape: each step is ONE distributed pass — the k rounded
    * cosines evaluate as a codegen'd literal-centroid struct array and
    * `array_max` folds the argmax (largest cos, then largest cid) with
    * zero shuffle; the only exchange per step carries k × dim partial
    * (sum, count) pairs (map-side-combined posexplode aggregate), and
    * only the k × dim × steps trace rows ever reach the driver —
    * metadata-sized, independent of corpus size. Centroids that lose
    * all members are dropped (the [[lloydStep]] convention).
    */
  def kmeansTrace(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      steps: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(steps >= 1 && steps <= 16,
      s"steps must be in [1, 16] (each step is a full corpus pass), got $steps")
    val spark = emb.sparkSession
    import spark.implicits._
    // a null vector has no cosine to any centroid (CosineSim convention:
    // null, not 0) — drop it here rather than let a null-field struct
    // ride into array_max with engine-defined ordering
    val nonNull = emb.filter(col(vecCol).isNotNull)
    val vecs = nonNull.select(col(vecCol).cast("array<double>").as("__v"))
    var centroids: Seq[(Int, Seq[Double])] = seedCentroids(nonNull, idCol, vecCol, k)
    val trace = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int, Long, Double)]
    var s = 1
    while (s <= steps && centroids.nonEmpty) { // empty corpus → empty trace
      // snapped-cosine argmax: struct comparison orders by (cos, cid), so
      // array_max IS "ORDER BY cos DESC, cid DESC LIMIT 1"
      val scored = array(centroids.map { case (cid, c) =>
        struct(round(graft.exprs.CosineSim(col("__v"), vecLit(c)), 4).as("c"),
          lit(cid).as("cid"))
      }: _*)
      // per-(centroid, dim) snapped mean + member count; the count is the
      // cluster size (every member vector contributes each dim once)
      val rows = vecs
        .select(array_max(scored).getField("cid").as("__cid"),
          posexplode(col("__v")))
        .groupBy(col("__cid"), col("pos"))
        .agg(round(avg(col("col")), 4).as("m"), count(lit(1)).as("n"))
        .collect()
      centroids = rows.groupBy(_.getInt(0)).map { case (cid, rs) =>
        (cid, rs.sortBy(_.getInt(1)).map(_.getDouble(2)).toIndexedSeq: Seq[Double])
      }.toSeq.sortBy(_._1)
      rows.foreach { r =>
        trace += ((s, r.getInt(0), r.getInt(1), r.getLong(3), r.getDouble(2)))
      }
      s += 1
    }
    trace.toSeq.toDF("step", "centroid_id", "dim", "n", "mean")
  }

  /** Exact top-k by QUANTIZED cosine: the int8 analog of
    * [[bruteForceTopK]] — same one-pass scan → project →
    * TakeOrderedAndProject plan, but the scan reads tinyint arrays (4×
    * narrower) and the hot loop is integer multiply-adds
    * ([[graft.exprs.CosineSimInt]], exact in long — no float
    * accumulation noise at all). `emb` must already carry `qvec` from
    * [[quantizeInt8]]. Ranking follows the repo convention: rounded
    * cosine, id tie-break.
    */
  def bruteForceTopKQuantized(
      quantized: DataFrame,
      idCol: String,
      query: Seq[Int],
      k: Int): DataFrame = {
    val qLit = array(query.map(v => lit(v.toByte)): _*)
    val cos = graft.exprs.CosineSimInt(col("qvec"), qLit)
    quantized.select(col(idCol), round(cos, 4).as("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }

  /** Seeded product-quantization codebooks: `m` subspaces of `dim/m`
    * dims, `k` centroids each, taken from the SUBVECTORS of the first
    * `k` corpus vectors by id (the [[seedCentroids]] convention —
    * deterministic, collect-bounded at k×dim doubles, and replayable by
    * an external engine straight from the table). Production indexes
    * refine these with per-subspace Lloyd iterations ([[lloydStep]]'s
    * shape applied to `slice`d subvectors — PqSpec runs one); the
    * seeded form is the oracled path.
    */
  def pqSeedCodebooks(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      k: Int,
      dim: Int): Array[Array[Array[Double]]] = {
    require(dim % m == 0, s"dim=$dim must split evenly into m=$m subspaces")
    val sub = dim / m
    val seeds = emb.orderBy(col(idCol))
      .select(col(vecCol).cast("array<double>"))
      .limit(k).collect()
      .map(_.getSeq[Double](0).toArray)
    require(seeds.length == k, s"need $k seed vectors, corpus has ${seeds.length}")
    Array.tabulate(m)(s => seeds.map(v => v.slice(s * sub, (s + 1) * sub)))
  }

  /** PQ encode: one small code per subspace — the nearest codebook entry
    * by 4-dp-ROUNDED squared L2 with ties to the LARGER index (the
    * [[graft.exprs.NearestCentroid]] tie rule, so both engines pick the
    * same entry even at a rounding boundary). One fused native
    * expression ([[graft.exprs.PqCodes]] — the codebooks ride as a
    * reference object, not as ~3000 literal Catalyst nodes, which cost
    * seconds of per-invocation planning in the unrolled form): one
    * narrow pass, zero shuffle, and the output row is m small ints —
    * at 100 TB this is the 32× storage shrink (64 floats → 8 codes)
    * that makes an embedding store scannable. The unrolled form is kept
    * as [[pqEncodeUnrolled]], the executable reference PqSpec proves
    * the kernel bit-equal to.
    */
  def pqEncode(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      codebooks: Array[Array[Array[Double]]]): DataFrame =
    emb.select(col(idCol),
      graft.exprs.PqCodes(col(vecCol), codebooks).as("codes"))

  /** The literal-folded combinator form of [[pqEncode]] — the
    * executable reference the fused [[graft.exprs.PqCodes]] kernel is
    * proven bit-equal to (PqSpec), the `Sim.minHash` vs `MinHashSig`
    * pattern. Not used by any registered query (its ~m·k·sub-node
    * expression tree pays seconds of Catalyst planning per invocation).
    */
  private[graft] def pqEncodeUnrolled(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val m = codebooks.length
    val k = codebooks(0).length
    val sub = codebooks(0)(0).length
    require(m.toLong * k * sub <= 65536,
      s"pqEncode builds m*k*sub literal terms (${m.toLong * k * sub}); " +
        "past 65536 the expression tree defeats codegen")
    val v = col(vecCol)
    val codes = array((0 until m).map { s =>
      val cands = array((0 until k).map { j =>
        val d2 = (0 until sub).map { i =>
          val diff = element_at(v, s * sub + i + 1).cast("double") -
            lit(codebooks(s)(j)(i))
          diff * diff
        }.reduce(_ + _)
        struct((-round(d2, 4)).as("nd"), lit(j).as("cid"))
      }: _*)
      array_max(cands).getField("cid")
    }: _*)
    emb.select(col(idCol), codes.as("codes"))
  }

  /** Asymmetric-distance (ADC) top-k over PQ codes: the query expands to
    * m per-subspace lookup tables (driver arithmetic — m×k doubles, each
    * 4-dp snapped), the scan scores each row as the SUM of m table
    * lookups indexed by its codes, and top-k orders by (score, id). The
    * hot loop never touches a float vector — m `element_at`s into
    * literal arrays plus m−1 adds per row, the reason PQ is the
    * standard 100 TB ANN scan.
    */
  def pqAdcTopK(
      codes: DataFrame,
      idCol: String,
      query: Seq[Double],
      codebooks: Array[Array[Array[Double]]],
      topK: Int): DataFrame = {
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    require(query.length == m * sub, "query width must equal m * subdim")
    val tables = codebooks.zipWithIndex.map { case (cb, s) =>
      cb.map { cent =>
        val d2 = (0 until sub).map { i =>
          val diff = query(s * sub + i) - cent(i)
          diff * diff
        }.sum
        BigDecimal(d2).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
    val score = (0 until m).map { s =>
      element_at(array(tables(s).map(lit): _*), col("codes")(s) + 1)
    }.reduce(_ + _)
    codes.select(col(idCol), round(score, 4).as("score"))
      .orderBy(col("score").asc, col(idCol).asc)
      .limit(topK)
  }

  /** IVF-PQ probe (Jégou et al. 2011 §IV): coarse-quantize the corpus
    * into IVF cells, PQ-encode the rows of the `nProbe` cells nearest
    * the query, score them by asymmetric distance, exact top-k on the
    * scores. The composition of [[ivfAssign]] and [[pqAdcTopK]] — and
    * the standard layout for billion-vector ANN: at 100 TB the codes
    * are PRE-computed and stored partitioned by `centroid_id` (m bytes
    * per vector — a 32× shrink of the store), so a probe is a
    * partition-pruned scan of nProbe/nCells of the code table doing m
    * table lookups + m−1 adds per row; neither the float vectors nor
    * the unprobed cells are ever read. Here the whole path — assign →
    * prune → encode → ADC — runs as one narrow jobless pipeline with a
    * single [[org.apache.spark.sql.execution.TakeOrderedAndProjectExec]]
    * at the end (AnnSpec locks the shape); the per-row kernels are the
    * native [[graft.exprs.NearestCentroid]] and [[graft.exprs.PqCodes]],
    * both whole-stage-codegen'd.
    *
    * Probe-cell selection mirrors [[ivfTopK]] (driver arithmetic over
    * k·dim doubles): nearest centroids by cosine, ties to the SMALLER
    * id (stable sort); assignment ties to the LARGER id (the
    * NearestCentroid rule) — both orders fixed so an external engine
    * replays cell membership exactly.
    */
  def ivfPqTopK(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Seq[(Int, Seq[Double])],
      codebooks: Array[Array[Array[Double]]],
      query: Seq[Double],
      topK: Int,
      nProbe: Int = 2): DataFrame = {
    val qn = math.sqrt(query.map(x => x * x).sum)
    def cos(c: Seq[Double]): Double = {
      val cn = math.sqrt(c.map(x => x * x).sum)
      val d = c.zip(query).map { case (a, b) => a * b }.sum
      if (cn == 0 || qn == 0) 0.0 else d / (cn * qn)
    }
    val probeIds = centroids.sortBy { case (_, c) => -cos(c) }.take(nProbe).map(_._1)
    val probed = ivfAssign(emb, idCol, vecCol, centroids)
      .filter(col("centroid_id").isin(probeIds: _*))
    pqAdcTopK(pqEncode(probed, idCol, vecCol, codebooks), idCol,
      query, codebooks, topK)
  }

  /** The deterministic Rademacher sign for random-projection cell
    * (c, i): +1 when the 32-bit md5 draw of "salt:c:i" (the literal
    * ':'-joined string, empty salt included) is even, −1 when odd —
    * `Split.hashDraw32`'s derivation on a synthetic key via the shared
    * [[graft.exprs.Md5Draw]] kernel, so ANY engine rebuilds the
    * identical matrix from the salt alone (nothing to store or
    * broadcast), and distinct (salt, c) pairs can never collide into
    * one key.
    */
  private[operators] def rademacherSign(salt: String, c: Int, i: Int): Double = {
    val key = s"$salt:$c:$i".getBytes("UTF-8")
    if (graft.exprs.Md5Draw.draw32(key, 0, key.length) % 2 == 0) 1.0 else -1.0
  }

  /** Johnson–Lindenstrauss random projection to `k` dimensions with a
    * Rademacher (±1/√k) matrix — the dimensionality reduction that works
    * where [[Pca]] cannot: no training pass, no d² covariance, distances
    * preserved in expectation (E‖f(x)‖² = ‖x‖²) with distortion
    * O(√(log n / k)). Use it to shrink vectors past Pca's dim guard, or
    * to cheapen a downstream ANN/near-dup join.
    *
    * The matrix never exists as data: each of the k output coordinates
    * is a codegen'd sum of d literal-signed terms (the signs derive from
    * md5("salt:c:i") parity — [[rademacherSign]]), so the plan is one
    * narrow projection: zero shuffle, zero UDF, zero broadcast, and an
    * external SQL engine reproduces every output value from the salt.
    * Coordinates are 4-dp snapped (both engines sum the d terms in
    * index order; the snap absorbs last-ulp libm drift).
    */
  def randomProject(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      k: Int,
      salt: String = ""): DataFrame = {
    require(k > 0, "target dimension must be positive")
    // the plan holds k·dim literal-signed terms; past ~64k expression
    // nodes whole-stage codegen falls back to interpreted evaluation and
    // Catalyst planning itself becomes the bottleneck (JVM 64KB method
    // bodies are split, but the tree walk is not) — fail loud at the
    // codegen-realistic bound instead of stalling quiet
    require(dim > 0 && dim.toLong * k <= 65536,
      s"randomProject builds dim*k literal terms (${dim.toLong * k}); " +
        "past 65536 the expression tree defeats codegen — reduce in two " +
        "stages (project to an intermediate width, then again)")
    val v = col(vecCol)
    val invSqrtK = 1.0 / math.sqrt(k.toDouble)
    val coords = (0 until k).map { c =>
      (0 until dim).map { i =>
        element_at(v, i + 1).cast("double") *
          lit(rademacherSign(salt, c, i) * invSqrtK)
      }.reduce(_ + _)
    }.zipWithIndex.map { case (e, c) => (round(e, 4) + lit(0.0)).as(s"r$c") }
    emb.select(col(idCol) +: coords: _*)
  }
}
