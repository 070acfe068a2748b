package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** kNN-graph construction + triangle/clustering invariants on
  * hand-checkable fixtures.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def edges(pairs: (Long, Long)*) = pairs.toDF("a", "b")

  test("triangleStats: a closed triangle credits all three corners once") {
    val st = Graph.triangleStats(edges((1L, 2L), (2L, 3L), (1L, 3L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(st.map(t => (t._1, t._2, t._3)).toSeq ===
      Seq((1L, 1L, 2L), (2L, 1L, 2L), (3L, 1L, 2L)))
    // deg 2, 1 triangle → coefficient 2·1/(2·1) = 1.0 exactly
    assert(st.forall(_._4 === 1.0))
  }

  test("triangleStats: K4 minus one edge — two triangles, correct per-node split") {
    // nodes 1-4, all edges except (1,4): triangles (1,2,3) and (2,3,4)
    val st = Graph.triangleStats(
        edges((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(st.map(t => (t._1, t._2)).toSeq ===
      Seq((1L, 1L), (2L, 2L), (3L, 2L), (4L, 1L)))
    // nodes 2 and 3 have degree 3 and 2 triangles → 2·2/(3·2) = 2/3 exactly
    assert(st(1)._4 === 2.0 / 3.0)
  }

  test("triangleStats: pendant node has zero triangles and zero coefficient") {
    val st = Graph.triangleStats(edges((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)))
      .filter(col("node") === 4L)
      .head()
    assert(st.getLong(1) === 0L)
    assert(st.getDouble(3) === 0.0)
  }

  test("knnGraph: union semantics and a<b normalization on a known fixture") {
    // three near-identical vectors + one distant: with k=1 each of the
    // clique picks a clique member; the outlier's top-1 also lands in
    // the clique (union semantics adds that edge even though no clique
    // member picks the outlier back)
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.99f, 0.01f, 0.0f)),
      (3L, Array(0.98f, 0.02f, 0.0f)),
      (9L, Array(0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val g = Graph.knnGraph(vecs, "vec_id", "embedding", 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(g.forall(p => p._1 < p._2))
    // the outlier appears in exactly one edge (its own top-1 pick)
    assert(g.count(p => p._1 == 9L || p._2 == 9L) === 1)
    // no self-edges
    assert(g.forall(p => p._1 != p._2))
  }

  test("knnGraph edges feed triangleStats: an identical-vector clique closes") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.0f)), (3L, Array(1.0f, 0.0f)),
      (9L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val st = Graph.triangleStats(Graph.knnGraph(vecs, "vec_id", "embedding", 2))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // the three identical vectors form a triangle
    assert(st(1L) >= 1L && st(2L) >= 1L && st(3L) >= 1L)
  }

  test("knnGraphBucketed: C=1 single cell IS the exact build, edge-for-edge") {
    // with one cell every pair is a candidate, so the bucketed ranking
    // degenerates to knnGraph's all-pairs ranking exactly — the
    // equivalence that makes the bucketed form a drop-in scale path
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 60L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val cent = vecs.filter($"vec_id" === 0L)
      .select(lit(0).as("cid"), $"embedding".as("cvec"))
    val exact = Graph.knnGraph(vecs, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = Graph.knnGraphBucketed(
        vecs, "vec_id", "embedding", 3, cent, nProbe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed === exact)
  }

  test("knnGraphBucketed: edges only between cell-mates; multi-probe bridges cells") {
    // two tight clusters on orthogonal axes + their two centroids: with
    // nProbe=1 no cross-cluster pair is ever a candidate
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.99f, 0.01f)), (3L, Array(0.98f, 0.02f)),
      (11L, Array(0.0f, 1.0f)), (12L, Array(0.01f, 0.99f)), (13L, Array(0.02f, 0.98f))
    ).toDF("vec_id", "embedding")
    val cent = Seq((0, Array(1.0, 0.0)), (1, Array(0.0, 1.0)))
      .toDF("cid", "cvec")
    val g1 = Graph.knnGraphBucketed(vecs, "vec_id", "embedding", 2, cent, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(g1.forall(p => (p._1 < 10L) == (p._2 < 10L)),
      s"nProbe=1 must keep edges cell-local, got $g1")
    assert(g1.size === 6, "each 3-clique closes at k=2")
    // nProbe=2 assigns every vector to BOTH cells — cross-cluster pairs
    // become candidates, but top-k still prefers the near neighbors
    val g2 = Graph.knnGraphBucketed(vecs, "vec_id", "embedding", 2, cent, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(g2.intersect(g1) === g1, "widening probes never loses an edge here")
    assert(g2.forall(p => p._1 < p._2))
  }

  test("knnGraphBucketed2L: probing every coarse cell IS the flat bucketed build") {
    // when nProbeCoarse covers all coarse cells, every fine centroid is
    // a candidate for every vector, so the two-level assignment
    // degenerates to the flat scan edge-for-edge — the equivalence that
    // makes the two-level form a drop-in continuation of the scale path
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 80L).map(i =>
      (i, Array.fill(6)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val cw = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)).orderBy($"vec_id")
    val cent = vecs.filter($"vec_id" < 9L) // C=9 fine cells, stride 3
      .select((row_number().over(cw) - 1).as("cid"), $"embedding".as("cvec"))
    val flat = Graph.knnGraphBucketed(vecs, "vec_id", "embedding", 3, cent, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val twoLevel = Graph.knnGraphBucketed2L(
        vecs, "vec_id", "embedding", 3, cent, nProbe = 2, nProbeCoarse = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(twoLevel === flat)
  }

  test("knnGraphBucketed2L: narrow coarse probes stay cell-local and a<b-normalized") {
    val rnd = new scala.util.Random(13)
    val vecs = (0L until 80L).map(i =>
      (i, Array.fill(6)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val cw = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)).orderBy($"vec_id")
    val cent = vecs.filter($"vec_id" < 9L)
      .select((row_number().over(cw) - 1).as("cid"), $"embedding".as("cvec"))
    val g = Graph.knnGraphBucketed2L(
      vecs, "vec_id", "embedding", 3, cent, nProbe = 2, nProbeCoarse = 1)
    val edges = g.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty && edges.forall(p => p._1 < p._2))
    assert(edges.toSet.size === edges.length)
    // plan lock: the fine-candidate join is the hinted shuffle join, and
    // no broadcast carries the fine centroid frame (only coarse probes)
    val plan = g.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"fine-candidate join not shuffle-hash:\n$plan")
  }

  // ------------------------------------------------------------ hyperBall

  private def sym(pairs: (Long, Long)*) =
    pairs.flatMap(p => Seq(p, p.swap)).toDF("src", "dst")

  test("hyperBall: k=0 is the single-element estimate, per-node monotone in k") {
    // path 1-2-3-4-5
    val g = sym((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val est = Graph.hyperBall(g, 6, 3).collect()
      .map(r => ((r.getLong(0), r.getInt(1)), r.getDouble(2))).toMap
    // every node's k=0 ball is exactly {itself}: same single-register
    // estimate shape, strictly positive and ≈ 1
    for (n <- 1L to 5L) assert(est((n, 0)) > 0.5 && est((n, 0)) < 1.5)
    // balls only grow
    for (n <- 1L to 5L; k <- 0 to 2)
      assert(est((n, k)) <= est((n, k + 1)) + 1e-9)
    // the middle of the path reaches everything at k=2
    assert(est((3L, 2)) === est((3L, 3)))
  }

  test("hyperBall: saturation — a triangle's k=1 equals k=2 bit-for-bit") {
    val g = sym((1L, 2L), (2L, 3L), (1L, 3L))
    val byK = Graph.hyperBall(g, 6, 2).collect()
      .map(r => ((r.getLong(0), r.getInt(1)), r.getDouble(2))).toMap
    for (n <- 1L to 3L) assert(byK((n, 1)) === byK((n, 2)))
  }

  test("hyperBall: estimate lands near the exact ball size on a 40-clique") {
    val pairs = for (a <- 1L to 40L; b <- (a + 1) to 40L) yield (a, b)
    val g = sym(pairs: _*)
    val e1 = Graph.hyperBall(g, 6, 1).filter(col("k") === 1).collect()
      .map(_.getDouble(2))
    // m=64 ⇒ σ ≈ 13%; all 40 nodes see the same full-clique registers
    assert(e1.distinct.length === 1)
    assert(math.abs(e1.head - 40.0) < 12.0)
  }

  test("harmonicCentrality: exact arithmetic on a hand-built nf frame") {
    // N(0)=1, N(1)=3, N(2)=6, N(3)=6 → H = 2/1 + 3/2 + 0/3 = 3.5
    val nf = Seq((7L, 0, 1.0), (7L, 1, 3.0), (7L, 2, 6.0), (7L, 3, 6.0))
      .toDF("node", "k", "est")
    val h = Graph.harmonicCentrality(nf, 3).head()
    assert(h.getLong(0) === 7L && h.getDouble(1) === 3.5)
  }

  test("harmonicCentrality: the path center scores highest") {
    val g = sym((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val h = Graph.harmonicCentrality(Graph.hyperBall(g, 6, 3), 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(h(3L) >= h(2L) && h(3L) >= h(4L))
    assert(h(3L) > h(1L) && h(3L) > h(5L))
    // symmetric positions agree exactly (identical ball estimates up to
    // the register draws — NOT guaranteed equal, so compare loosely)
    assert(math.abs(h(2L) - h(4L)) < 1.5)
  }

  test("neighborhoodProfile: exact totals and the 90% flag on a hand frame") {
    // two nodes; totals per k: 2e4, 8e4, 10e4 → k=1 has 8/10 < 9/10,
    // k=2 reaches exactly; k=0 does not
    val nf = Seq((1L, 0, 1.0), (1L, 1, 5.0), (1L, 2, 6.0),
      (2L, 0, 1.0), (2L, 1, 3.0), (2L, 2, 4.0)).toDF("node", "k", "est")
    val rows = Graph.neighborhoodProfile(nf, 2).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
    assert(rows.toSeq === Seq(
      (0, 2L, 20000L, 1.0, false),
      (1, 2L, 80000L, 4.0, false),
      (2, 2L, 100000L, 5.0, true)))
  }

  test("hyperBall: deterministic under repartition") {
    val g = sym((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (2L, 4L))
    val a = Graph.hyperBall(g, 6, 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sorted
    val b = Graph.hyperBall(g.repartition(7), 6, 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sorted
    assert(a.sameElements(b))
  }

  private def lpa(rounds: Int, pairs: (Long, Long)*): Map[Long, Long] =
    Graph.labelPropagation(sym(pairs: _*), rounds).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("labelPropagation: two triangles joined by one bridge separate") {
    // triangle {1,2,3}, triangle {10,11,12}, bridge 3-10
    val l = lpa(4, (1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L))
    assert(l(1L) === 1L && l(2L) === 1L && l(3L) === 1L)
    assert(Set(l(10L), l(11L), l(12L)).size === 1)
    assert(l(10L) !== l(1L))
  }

  test("labelPropagation: plurality wins, smallest label breaks ties") {
    // node 5's neighbors {1, 2, 9} hold one label each → 3-way tie →
    // smallest label (1); node 6 sees {3, 9} → tie → 3
    val l1 = lpa(1, (5L, 1L), (5L, 2L), (5L, 9L), (1L, 2L))
    assert(l1(5L) === 1L)
    val l2 = lpa(1, (6L, 3L), (6L, 9L))
    assert(l2(6L) === 3L)
  }

  test("kCore: peel CASCADES — a pendant tail falls one node per round") {
    // triangle {1,2,3} with tail 3-4-5-6: the 2-core is the triangle,
    // but each round only exposes the next tail node (6 first, then 5,
    // then 4) — the witness that rounds below the peel depth are NOT
    // yet the core, and rounds at/above it are a fixed point
    val g = sym((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    def survivors(rounds: Int) =
      Graph.kCore(g, 2, rounds).collect().map(_.getLong(0)).sorted.toSeq
    assert(survivors(1) === Seq(1L, 2L, 3L, 4L))
    assert(survivors(2) === Seq(1L, 2L, 3L))
    assert(survivors(3) === Seq(1L, 2L, 3L))
    assert(survivors(9) === Seq(1L, 2L, 3L))
    // induced degree is reported: triangle nodes each keep 2
    val rows = Graph.kCore(g, 2, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(rows === Seq((1L, 2L), (2L, 2L), (3L, 2L)))
    // a k above the densest core peels to empty
    assert(Graph.kCore(g, 3, 4).count() === 0L)
  }

  test("kCoreChecked: under-budgeted rounds are DETECTED, not silent") {
    // the cascade graph again: true peel depth is 3 (tail falls one
    // node per round), so rounds = 1 returns a SUPERSET from kCore —
    // kCoreChecked must throw instead
    val g = sym((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    val e = intercept[IllegalStateException] {
      Graph.kCoreChecked(g, 2, 1).collect()
    }
    assert(e.getMessage.contains("not converged"))
    // at/above the peel depth it returns exactly the core
    val ok = Graph.kCoreChecked(g, 2, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(ok === Seq((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("kCore: deterministic under repartition") {
    val g = sym((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (2L, 4L), (5L, 6L), (1L, 4L))
    val a = Graph.kCore(g, 2, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = Graph.kCore(g.repartition(7), 2, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a === b && a.nonEmpty)
  }

  test("labelPropagation: deterministic under repartition") {
    val g = sym((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (2L, 6L))
    val a = Graph.labelPropagation(g, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = Graph.labelPropagation(g.repartition(7), 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a === b)
  }
}
