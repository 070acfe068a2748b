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
}
