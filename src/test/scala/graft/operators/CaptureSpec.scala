package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Shared-capture registry semantics: one build per key, release
  * actually unpersists, Layout-mutation invalidation reaches it, and
  * the two graph entry points (tradeGraph edges, hyperBall nf) really
  * do share across repeated invocations — the round-12 suite-wall fix.
  */
class CaptureSpec extends SparkSpec {
  import spark.implicits._

  test("persisted: one build per key, eq-identical frame handed back") {
    Capture.release()
    var builds = 0
    def build() = { builds += 1; Seq(1L, 2L).toDF("x") }
    val a = Capture.persisted("k1")(build())
    val b = Capture.persisted("k1")(build())
    assert(builds === 1)
    assert(a eq b)
    assert(a.storageLevel.useMemory, "capture must be persisted")
    Capture.persisted("k2")(build())
    assert(builds === 2)
    assert(Capture.persistedSize === 2)
    Capture.release()
    assert(Capture.persistedSize === 0)
    assert(a.storageLevel === org.apache.spark.storage.StorageLevel.NONE,
      "release must unpersist, not just drop the reference")
  }

  test("Caches.invalidateAll reaches the capture registry") {
    Capture.release()
    Capture.persisted("inv")(Seq(1L).toDF("x"))
    Capture.pinned("invp")(Seq(1L).toDF("x").localCheckpoint())
    graft.Caches.invalidateAll()
    assert(Capture.persistedSize === 0)
    assert(Capture.pinnedSize === 0)
  }

  test("tradeGraph: six invocations over equivalent inputs share ONE edge build") {
    Capture.release()
    val orders = Seq((1L, 10L), (2L, 11L), (3L, 10L))
      .toDF("o_orderkey", "o_custkey")
    val lineitem = Seq((1L, 100L), (2L, 100L), (2L, 101L), (3L, 102L))
      .toDF("l_orderkey", "l_suppkey")
    val g1 = Rank.tradeGraph(orders, lineitem, 1000L)
    // distinct Dataset objects over the same data+operators hit the key
    val orders2 = Seq((1L, 10L), (2L, 11L), (3L, 10L))
      .toDF("o_orderkey", "o_custkey")
    val g2 = Rank.tradeGraph(orders2, lineitem, 1000L)
    assert(Capture.persistedSize === 1,
      "equivalent plans must share one persisted edge capture")
    assert(g1.collect().toSet === g2.collect().toSet)
    // a different offset is a different graph, not a stale hit
    Rank.tradeGraph(orders, lineitem, 5000L)
    assert(Capture.persistedSize === 2)
    Capture.release()
  }

  test("hyperBall: readout family shares ONE propagation per session") {
    Capture.release()
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val sym = e.unionAll(e.select($"dst".as("src"), $"src".as("dst")))
    val nf1 = Graph.hyperBall(sym, 4, 2)
    val nf2 = Graph.hyperBall(sym, 4, 2)
    assert(nf1 eq nf2, "same (edges, p, maxK, salt) must reuse the nf frame")
    assert(Capture.pinnedSize === 1)
    // readouts over the shared frame still work
    assert(Graph.harmonicCentrality(nf1, 2).count() === 3L)
    assert(Graph.neighborhoodProfile(nf2, 2).count() === 3L)
    // different radius is a different propagation
    Graph.hyperBall(sym, 4, 1)
    assert(Capture.pinnedSize === 2)
    Capture.release()
  }
}
