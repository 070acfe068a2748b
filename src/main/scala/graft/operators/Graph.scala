package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity-graph construction and triangle analytics — the graph-
  * quality half of a dedup/clustering pipeline: a k-NN graph over the
  * embedding column, then per-node triangle counts and local clustering
  * coefficients (how clique-like each doc's neighborhood is — high
  * coefficient = mirror-cluster, low = hub/bridge, the standard signal
  * for telling near-dup cliques from topical hubs before collapsing).
  */
object Graph {

  /** Undirected k-NN graph: an edge {a,b} exists iff b is among a's
    * top-k cosine neighbors OR a is among b's (union semantics, the
    * standard kNN-graph construction). Self-pairs are excluded BEFORE
    * ranking; ranking is on the 4-dp-snapped cosine with an id
    * tie-break (the [[Ann.knnJoin]] convention — sub-ulp float noise
    * must not flip the selected set across engines). Returned as
    * distinct (a, b) rows with a < b.
    *
    * Plan: the exact all-pairs scoring here is the oracle-able
    * DIAGNOSTIC construction (broadcast of the query side — fine while
    * one side fits the broadcast budget). At corpus scale the candidate
    * generator swaps for the bucketed families ([[Ann.ivfTopK]] /
    * [[Dedup.embeddingCosine]]'s hyperplane buckets) — the downstream
    * edge/triangle algebra is identical either way, which is why the
    * graph build is a separate composable step.
    */
  def knnGraph(vecs: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = vecs.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val scored = vecs
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
      // spread the O(m·|q|) scoring explicitly: the stream side otherwise
      // inherits the FILE layout's split count — a small oracle-bounded
      // subset arrives as one split and the quadratic work runs on one
      // core (measured 6.7 s vs 1.7 s for identical work at 1× vs 10×).
      // Hash on the id so the spread is deterministic; the top-k window
      // re-shuffles by query_id either way, so this adds no extra
      // exchange to the plan's floor
      .repartition(col("neighbor_id"))
      .crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(graft.exprs.CosineSim(col("__cv"), col("__qv")), 4).as("__cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("__cos").desc, col("neighbor_id").asc)
    val directed = scored
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
    directed
      .select(
        least(col("query_id"), col("neighbor_id")).as("a"),
        greatest(col("query_id"), col("neighbor_id")).as("b"))
      .distinct()
  }

  /** Scale-path k-NN graph: the BUCKETED candidate generator feeding
    * the same top-k ranking and edge algebra as [[knnGraph]] — the swap
    * that scaladoc has always named, now a first-class construction.
    * Vectors are multi-assigned to their `nProbe` nearest IVF cells
    * (raw-sim ordering with ties to the LARGER cid — the
    * [[graft.exprs.NearestCentroid]] convention, so the assignment
    * replays in SQL as `row_number() ... ORDER BY sim DESC, cid DESC ≤
    * nProbe`); candidate pairs are vectors sharing ≥ 1 cell, scored
    * once (dups from multi-probe collapse in a distinct on the scored
    * pair), ranked per query exactly as [[knnGraph]] ranks. Multi-probe
    * is what recovers cross-boundary neighbors a single-cell partition
    * would miss; recall < 1 only for a pair whose cells are fully
    * disjoint at nProbe probes — the standard IVF trade.
    *
    * 100 TB shape: scoring is CELL-LOCAL — the self-join shuffles on
    * `cell`, so pair work is Σ|cell|² ≈ 4N²/C instead of N², and no
    * side is broadcast except the CENTROID TABLE (the exact
    * [[knnGraph]] needs the whole corpus under the broadcast budget;
    * this needs only C·dim doubles). Centroids arrive as a FRAME, not
    * literals — at production C a literal centroid tree is the measured
    * ~5 s-planning trap ([[graft.exprs.PqCodes]] lesson) — and C should
    * grow ~2√N so assignment (N·C sims) and pair scoring (4N²/C)
    * balance, making the whole build O(N^1.5): sub-quadratic where the
    * exact build is input-bounded. Cell balance is the usual IVF caveat
    * (Lloyd-refine via [[Ann.lloydStep]] against skewed corpora).
    */
  def knnGraphBucketed(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      centroids: DataFrame, // columns: cid (int), cvec (vector)
      nProbe: Int = 2): DataFrame = {
    require(nProbe >= 1, s"nProbe=$nProbe must be >= 1")
    val sims = vecs
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .crossJoin(broadcast(centroids.select(col("cid"), col("cvec"))))
      .select(col("id"), col("v"), col("cid"),
        graft.exprs.CosineSim(col("v"), col("cvec")).as("__sim"))
    // nProbe nearest cells per vector: raw-sim ordering, ties to the
    // LARGER cid (the [[graft.exprs.NearestCentroid]] convention) —
    // replays in SQL as row_number() ... ORDER BY sim DESC, cid DESC
    val aw = Window.partitionBy("id")
      .orderBy(col("__sim").desc, col("cid").desc)
    val assigned = sims
      .withColumn("__rn", row_number().over(aw))
      .filter(col("__rn") <= nProbe)
      .select(col("id"), col("v"), col("cid").as("cell"))
    val scored = assigned.as("l")
      .join(assigned.as("r"),
        col("l.cell") === col("r.cell") && col("l.id") =!= col("r.id"))
      .select(col("l.id").as("query_id"), col("r.id").as("neighbor_id"),
        round(graft.exprs.CosineSim(col("r.v"), col("l.v")), 4).as("__cos"))
      .distinct()
    val w = Window.partitionBy("query_id")
      .orderBy(col("__cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(
        least(col("query_id"), col("neighbor_id")).as("a"),
        greatest(col("query_id"), col("neighbor_id")).as("b"))
      .distinct()
  }

  /** Two-level (coarse→fine) quantized kNN graph — [[knnGraphBucketed]]
    * with the centroid ASSIGNMENT stage itself quantized, the step that
    * keeps the build scale-safe past ~10⁹ rows where the flat variant's
    * own guardrails give out: at C = ⌈2√N⌉ fine cells, flat assignment
    * broadcasts a C-row centroid frame (60k+ rows × dim at 10⁹) and
    * pays N·C similarity ops — the broadcast and the per-row loop both
    * grow as √N.
    *
    * Here: every `stride = ⌈√C⌉`-th fine centroid serves as a COARSE
    * centroid (√C rows — the only broadcast, bounded ~N^(1/4));
    * each vector probes its `nProbeCoarse` nearest coarse cells; fine
    * centroids are pre-assigned to their own nearest coarse cells and
    * the vector→fine scoring becomes a SHUFFLE join on the coarse id —
    * per-row work O(√C + nProbeCoarse·C/√C) = O(√C) instead of O(C),
    * and no √N-sized broadcast anywhere. The trade is one extra
    * shuffle of N·nProbeCoarse vector rows, which the cell-local
    * self-join was going to shuffle anyway.
    *
    * Determinism: every ranking is (sim DESC, cid DESC) — the
    * [[graft.exprs.NearestCentroid]] convention — so the whole
    * schedule replays in SQL. Approximation: a vector can miss a fine
    * cell whose coarse parent it did not probe; `q_knn_triangles_
    * bucketed` keeps the FLAT-schedule oracle, so its hash-green is
    * the measured statement that the two-level assignment reproduced
    * the flat assignment exactly on the gate corpus (RankSpec-style
    * equivalence, enforced by the correctness gate itself).
    */
  def knnGraphBucketed2L(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      centroids: DataFrame, // columns: cid (int), cvec (vector)
      nProbe: Int = 2,
      nProbeCoarse: Int = 2): DataFrame = {
    require(nProbe >= 1 && nProbeCoarse >= 1)
    val cents = centroids.select(col("cid"), col("cvec"))
    // coarse = every stride-th fine centroid; stride from a 1-row agg
    // cross-joined (no driver action, the HITS normalize pattern)
    val cCount = cents.agg(count(lit(1)).as("__c"))
    val withStride = cents.crossJoin(broadcast(cCount))
      .withColumn("__stride", ceil(sqrt(col("__c"))).cast("int"))
    val coarse = withStride
      .filter(pmod(col("cid"), col("__stride")) === 0)
      .select((col("cid") / col("__stride")).cast("int").as("gid"),
        col("cvec").as("gvec"))
    // fine→coarse pre-assignment: C×√C sims, centroid-frame-local
    val fineSims = cents.crossJoin(broadcast(coarse))
      .select(col("cid"), col("cvec"), col("gid"),
        graft.exprs.CosineSim(col("cvec"), col("gvec")).as("__sim"))
    val fw = Window.partitionBy("cid")
      .orderBy(col("__sim").desc, col("gid").desc)
    val fineOf = fineSims
      .withColumn("__rn", row_number().over(fw))
      .filter(col("__rn") <= nProbeCoarse)
      .select(col("gid"), col("cid"), col("cvec"))
    // vector→coarse: the only N-scale broadcast probe, √C rows
    val vg = vecs
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .crossJoin(broadcast(coarse))
      .select(col("id"), col("v"), col("gid"),
        graft.exprs.CosineSim(col("v"), col("gvec")).as("__gsim"))
    val gw = Window.partitionBy("id")
      .orderBy(col("__gsim").desc, col("gid").desc)
    val probed = vg
      .withColumn("__rn", row_number().over(gw))
      .filter(col("__rn") <= nProbeCoarse)
      .select(col("id"), col("v"), col("gid"))
    // vector→fine: shuffle join on the coarse id (fine side is tiny —
    // hint it into the hash-build role), then the flat top-nProbe rank
    val cand = probed
      .join(fineOf.hint("shuffle_hash"), Seq("gid"))
      .select(col("id"), col("v"), col("cid"),
        graft.exprs.CosineSim(col("v"), col("cvec")).as("__sim"))
      // multi-parent fine cells arrive once per shared probed parent —
      // collapse before ranking so row_number never sees duplicates
      .groupBy(col("id"), col("cid"))
      .agg(first(col("v")).as("v"), first(col("__sim")).as("__sim"))
    val aw = Window.partitionBy("id")
      .orderBy(col("__sim").desc, col("cid").desc)
    val assigned = cand
      .withColumn("__rn", row_number().over(aw))
      .filter(col("__rn") <= nProbe)
      .select(col("id"), col("v"), col("cid").as("cell"))
    val scored = assigned.as("l")
      .join(assigned.as("r"),
        col("l.cell") === col("r.cell") && col("l.id") =!= col("r.id"))
      .select(col("l.id").as("query_id"), col("r.id").as("neighbor_id"),
        round(graft.exprs.CosineSim(col("r.v"), col("l.v")), 4).as("__cos"))
      .distinct()
    val w = Window.partitionBy("query_id")
      .orderBy(col("__cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(
        least(col("query_id"), col("neighbor_id")).as("a"),
        greatest(col("query_id"), col("neighbor_id")).as("b"))
      .distinct()
  }

  /** Per-node triangle count + degree + local clustering coefficient
    * over an undirected edge set given as distinct (a, b), a < b.
    *
    * Triangles are enumerated once each by the ordered two-path join:
    * e₁(a,b) ⋈ e₂(b,c) on the middle node gives every a<b<c wedge, and
    * a semi-join against e(a,c) keeps the closed ones — the classic
    * ordered-enumeration shape whose join fan-out is Σ_b deg⁺(b)², with
    * the id-ordering playing the degree-orientation role of
    * compact-forward counting. Each closed triangle then credits its
    * three corners (one generated row each). The coefficient
    * `2·t / (d·(d−1))` is emitted as a RAW deterministic division (both
    * engines' IEEE doubles agree exactly; rounding a decimal-exact
    * rational is the known cross-engine trap).
    *
    * 100 TB shape: two self-joins on node keys + hash aggregates — all
    * co-partitionable on the edge endpoints; no per-node adjacency list
    * ever materializes on one reducer.
    */
  def triangleStats(edges: DataFrame): DataFrame = {
    val e = edges.select(col("a").cast("long").as("a"), col("b").cast("long").as("b"))
    val wedges = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    val tris = wedges
      .join(e.as("e3"), col("x") === col("e3.a") && col("z") === col("e3.b"),
        "left_semi")
    val perNode = tris
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    val deg = e.select(col("a").as("node"))
      .unionAll(e.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    deg
      .join(perNode, Seq("node"), "left")
      .na.fill(0L, Seq("triangles"))
      .withColumn("clustering",
        when(col("degree") >= 2,
          col("triangles") * 2.0 / (col("degree") * (col("degree") - 1)))
          .otherwise(lit(0.0)))
      .select(col("node"), col("triangles"), col("degree"), col("clustering"))
  }

  /** HyperBall (Boldi & Vigna 2013): the per-node neighborhood function
    * N(v, k) = |{u : dist(u, v) ≤ k}| estimated for every k ≤ `maxK` in
    * one pass family — WITHOUT ever materializing a reachability set.
    * Each node carries an HLL register file seeded from its own id; one
    * round of bucket-wise MAX over the in-neighborhood unions every
    * neighbor's ball into the node's (HLL union IS register max), so
    * after k rounds the registers describe the k-ball and the standard
    * estimator reads out its size. This is THE web-graph primitive for
    * effective-diameter / centrality profiles at sizes where exact BFS
    * per node is unthinkable.
    *
    * Determinism & oracle: registers derive from the engine's md5 draw
    * ([[Sketch.hllBucketRank]] — the same derivation the hash-green
    * `q_hll_cardinality` oracle replays in SQL), propagation is integer
    * MAX (order-free), and the estimate is [[Sketch.hllEstimate]]'s
    * exact-binary-fraction sum with a 4-dp snap — every stage replays
    * bit-identically in an external SQL engine as iterated CTEs.
    *
    * 100 TB shape: state is one m-register array per node (m = 2ᵖ ints
    * — node-sized, NOT ball-sized; that is the whole point). Per round:
    * one edge ⋈ state join (shuffle-hash on the node-sized state, the
    * [[Rank.pageRank]] pattern) + one hash aggregate whose map-side
    * combine folds the per-position maxes before the exchange, so the
    * exchange carries ≤ nodes·m ints however large the edge list. The
    * DENSE array carrier keeps the join fan-out at |E| rows (a sparse
    * (node,bucket,mr) carrier would fan out |E|·registers rows).
    * Cache discipline is [[Rank.pageRank]]'s persist-and-release.
    *
    * @param edges symmetric (src, dst) edge list
    * @param p     HLL precision (m = 2ᵖ registers; p=6 matches the
    *              engine's oracled HLL family)
    * @param maxK  largest ball radius to emit (k = 0..maxK rows)
    */
  def hyperBall(
      edges: DataFrame,
      p: Int,
      maxK: Int,
      salt: String = "hb"): DataFrame = {
    require(maxK >= 0 && maxK <= 16, s"maxK=$maxK outside [0,16]")
    // The (node, k, est) result is node-sized and already returned as an
    // eager localCheckpoint, so it is exactly what [[Capture.pinned]]
    // holds: the three registered readouts (ball profile, harmonic
    // centrality, effective diameter) share ONE register propagation
    // per session instead of paying it each — and pin one checkpoint
    // instead of three.
    val key = ("hyperBall",
      edges.queryExecution.analyzed.canonicalized, p, maxK, salt)
    Capture.pinned(key)(hyperBallUncached(edges, p, maxK, salt))
  }

  private def hyperBallUncached(
      edges: DataFrame,
      p: Int,
      maxK: Int,
      salt: String): DataFrame = {
    val m = 1 << p
    val e = edges.select(col("src"), col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // symmetric edge list ⇒ every node appears as a src
    val nodes = e.select(col("src").as("node")).distinct()
    val (bucket, rank) = Sketch.hllBucketRank(col("node"), p, salt)
    // dense m-register array with the node's own rank at its bucket
    val init = nodes.select(col("node"), bucket.as("__b"), rank.as("__r"))
      .select(col("node"), array((0 until m).map(i =>
        when(col("__b") === i, col("__r")).otherwise(lit(0))): _*).as("regs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def estimateAt(regs: DataFrame, k: Int): DataFrame =
      Sketch.hllEstimate(
        regs.select(col("node"), lit(k).as("k"),
          explode(filter(col("regs"), x => x > lit(0))).as("mr")),
        Seq("node", "k"), p)
    val cached = scala.collection.mutable.Buffer(e, init)
    var regs = init
    var out = estimateAt(regs, 0)
    for (k <- 1 to maxK) {
      val prop = e
        .join(regs.hint("shuffle_hash"), e("src") === regs("node"))
        .select(col("dst").as("node"), col("regs"))
      val maxes = (0 until m).map(i =>
        max(element_at(col("regs"), i + 1)).as(s"__m$i"))
      val merged = prop.union(regs.select(col("node"), col("regs")))
        .groupBy("node")
        .agg(maxes.head, maxes.tail: _*)
        .select(col("node"), array((0 until m).map(i =>
          col(s"__m$i")): _*).as("regs"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cached += merged
      regs = merged
      out = out.unionAll(estimateAt(regs, k))
    }
    // eager node-sized snapshot, then release every cache (the
    // [[Rank.pageRank]] contract: no invocation-lifetime pins)
    val result = out.localCheckpoint()
    cached.foreach(_.unpersist())
    result
  }

  /** Harmonic centrality from a [[hyperBall]] neighborhood function:
    * `H(v) = Σ_{k≥1} (N(v,k) − N(v,k−1)) / k` — each newly reached node
    * credited at 1/distance, the standard centrality that stays finite
    * on disconnected graphs (closeness does not). Reads the (node, k,
    * est) frame, so one register propagation serves both views (the
    * PCA-family lesson: shared capture, separate readouts).
    *
    * Determinism: the 4-dp ball estimates are lifted to exact integer
    * ten-thousandths, the 1/k weights to an exact common-denominator
    * integer sum (lcm(1..maxK)), and ONE terminal raw double division
    * is emitted — both engines' IEEE doubles agree exactly, the
    * [[triangleStats]] convention.
    */
  def harmonicCentrality(nf: DataFrame, maxK: Int): DataFrame = {
    require(maxK >= 1, s"maxK=$maxK must be ≥ 1")
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val l = (1 to maxK).map(_.toLong).reduce((a, b) => a / gcd(a, b) * b)
    val pivots = (0 to maxK).map(k =>
      max(when(col("k") === k, col("est"))).as(s"__e$k"))
    val num = (1 to maxK).map(k =>
      lit(l / k) *
        round((col(s"__e$k") - col(s"__e${k - 1}")) * 10000).cast("long"))
      .reduce(_ + _)
    nf.groupBy("node")
      .agg(pivots.head, pivots.tail: _*)
      .select(col("node"), (num / lit(l * 10000.0)).as("harmonic"))
  }

  /** Global neighborhood profile from a [[hyperBall]] nf frame — the
    * effective-diameter readout the algorithm exists for: per k, the
    * total ball mass Σᵥ N(v,k), the mean ball size, and whether radius
    * k already reaches ≥ 90% of the radius-`maxK` mass (the smallest
    * flagged k is the standard "effective diameter at 0.9").
    *
    * Determinism: ball estimates enter as exact integer
    * ten-thousandths, the per-k totals are integer sums (order-free),
    * and the 90% test is the exact integer inequality
    * `10·Σₖ ≥ 9·Σ_maxK` — no float comparison anywhere; the one double
    * emitted (mean) is a terminal raw division.
    */
  def neighborhoodProfile(nf: DataFrame, maxK: Int): DataFrame = {
    val perK = nf
      .select(col("k"), round(col("est") * 10000).cast("long").as("e4"))
      .groupBy("k")
      .agg(count(lit(1)).as("nodes"), sum(col("e4")).as("ball_e4"))
    val total = perK.filter(col("k") === maxK)
      .select(col("ball_e4").as("__total_e4"))
    perK.crossJoin(broadcast(total))
      .select(
        col("k"), col("nodes"), col("ball_e4"),
        (col("ball_e4") / (col("nodes") * 10000.0)).as("mean_ball"),
        (col("ball_e4") * 10 >= col("__total_e4") * 9).as("reaches90"))
      .orderBy(col("k"))
  }

  /** k-core decomposition by synchronous PEELING (the Matula–Beck /
    * Batagelj–Zaversnik core idea, batched into deterministic
    * rounds): each round removes every node whose CURRENT induced
    * degree is below `k`, simultaneously, then recomputes degrees on
    * the induced subgraph. The peel is monotone — once no node falls
    * below `k` further rounds are no-ops — so with `rounds` at least
    * the true peel depth the result IS the k-core; a fixed schedule
    * (the [[labelPropagation]] contract) keeps the whole run one lazy
    * DAG the oracle can unroll as identical SQL CTEs, with no
    * per-round driver action. k-core filtering is the standard
    * link-graph quality gate in crawl curation (keep pages embedded
    * in dense neighborhoods, shed the pendant spam tail).
    *
    * Per round: two survivor semi-joins on the edge list + one degree
    * count — three bounded exchanges at any scale, no window;
    * per-round lazy checkpoint truncates the plan.
    *
    * `edges` must already contain both directions. Returns the
    * surviving nodes with their induced degree.
    */
  def kCore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    // The r17 nPart width knob is REVERTED: the clean matched-window A/B
    // it was waiting on (plans/r18/BENCH_r18_kcore_width_ab.json, ×100
    // rehearsal, 32 threads both arms) measured width 96 29% WORSE than
    // 32 (154.3 → 199.8 s) — the peel is shuffle-volume-bound (guide
    // §2.2 block growth), not per-task-sort-memory-bound.
    //
    // What replaced it (guide §2.4): the dst-membership join runs FIRST
    // and the src-membership join LAST, so the degree aggregate's
    // required hash(src) distribution is already established by the
    // second join — the per-round aggregate exchange disappears, and
    // when `edges` arrives hash(dst)-partitioned (kCoreChecked pins
    // that layout in a persisted cache) the first join's edge side is
    // exchange-free too. Join order is semantics-free here: both joins
    // are independent membership filters on an inner join.
    var deg = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
    (1 to rounds).foreach { _ =>
      val alive = deg.filter(col("deg") >= k).select("node")
      deg = edges
        .join(alive.select(col("node").as("dst")), "dst")
        .join(alive.select(col("node").as("src")), "src")
        .groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("deg"))
        .localCheckpoint(eager = false)
    }
    deg.filter(col("deg") >= k)
  }

  /** [[kCore]] plus a convergence WITNESS — the fixed-schedule
    * contract's failure mode is silent (rounds below the true peel
    * depth return a SUPERSET of the k-core), so this variant
    * materializes the final frame once (eager local checkpoint — the
    * consumer was going to pay that evaluation anyway), runs ONE extra
    * peel round, and compares survivor counts: the peel is monotone,
    * so count equality ⟺ fixed point ⟺ the result IS the k-core.
    * Two metadata-sized `count()` actions total, still zero per-round
    * driver actions. Throws when under-budgeted instead of returning
    * the superset.
    */
  def kCoreChecked(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    // Pinned dst-keyed edge layout (the HITS dual-cache recipe, r17):
    // every peel round's first membership join reads the edge list
    // exchange-free AND sort-free from this cache instead of
    // re-exchanging it per round. kCoreChecked owns an eager lifecycle
    // already (the convergence counts), so it can persist and release
    // safely; plain [[kCore]] stays a single lazy DAG.
    val eByDst = Rank.partitionEdges(edges, "dst")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val core = kCore(eByDst, k, rounds).localCheckpoint(eager = true)
    val next = eByDst
      .join(core.select(col("node").as("dst")), "dst")
      .join(core.select(col("node").as("src")), "src")
      .groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= k)
    val before = core.count()
    val after = next.count()
    eByDst.unpersist()
    if (after != before)
      throw new IllegalStateException(
        s"kCore(k=$k, rounds=$rounds) has not converged: one more peel " +
          s"removes ${before - after} of $before survivors — rounds is " +
          "below the graph's true peel depth; raise it")
    core
  }

  /** Synchronous label propagation (Raghavan et al. 2007's community
    * detection, made DETERMINISTIC): every node starts labeled with
    * itself; each round every node adopts the label held by the
    * PLURALITY of its neighbors, ties broken by the SMALLEST label —
    * the determinism the asynchronous original lacks, so the result is
    * engine-reproducible and the oracle can unroll the identical
    * rounds as SQL CTEs. Fixed round count by design: synchronous LPA
    * can 2-cycle on bipartite structure, so convergence detection
    * would not terminate anyway, and a fixed schedule keeps every
    * round lazy (no per-round driver action — the only action is the
    * node-sized exit snapshot that lets the edge cache be released).
    *
    * Per round: one edge⋈labels join reading the pinned dst-keyed edge
    * cache (exchange-free, sort-free on the edge side), one (node,
    * label) count aggregate, one struct-argmax aggregate — `max(struct(
    * cnt, −label))` picks (max count, min label) with NO window. Plans
    * are lazily checkpointed per round (the PageRank lineage lesson).
    *
    * `edges` must already contain both directions for undirected
    * semantics ([[Rank.tradeGraph]] does).
    */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    // Pinned dst-keyed edge layout (guide §2.4, the HITS dual-cache
    // recipe): every round's edges⋈labels join previously re-exchanged
    // AND re-sorted the full edge list by dst — the labels side is the
    // one that changes per round, and it is node-scale; the edge side
    // is round-invariant and belongs in a partitioned+sorted cache read
    // exchange-free and sort-free. One build-time shuffle buys back
    // `rounds` edge-scale exchange+sorts. MEMORY_AND_DISK (spills,
    // never pins heap); released after the eager node-sized exit
    // snapshot truncates the returned lineage (the pageRank/HITS
    // persist-and-release discipline).
    val eByDst = Rank.partitionEdges(edges, "dst")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = eByDst.select(col("src").as("node")).distinct()
    var labels = nodes.withColumn("label", col("node"))
    (1 to rounds).foreach { _ =>
      val incoming = eByDst
        .join(labels.select(col("node").as("dst"), col("label")), "dst")
        .groupBy(col("src").as("node"), col("label"))
        .agg(count(lit(1)).as("__c"))
      labels = incoming
        .groupBy("node")
        .agg(max(struct(col("__c"), (-col("label")).as("__neg")))
          .as("__best"))
        .select(col("node"), (-col("__best.__neg")).as("label"))
        .localCheckpoint(eager = false)
    }
    val out = labels.localCheckpoint()
    eByDst.unpersist()
    out
  }
}
