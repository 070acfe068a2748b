package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import scala.util.Random

/** Connected-components clustering verified against an in-memory
  * union-find reference on structured and random graphs — the structures
  * (long chains, cycles, stars, forests) that break naive one-pass
  * survivor rules are exactly what the spec plants.
  */
class ClusterSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, min: Int = 10): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(min), p)
    assert(res.passed, res.status.toString)
  }

  /** Union-find reference: id → min id of its component. */
  private def ufComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // path-compress to the final roots, then min-normalize per component
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ns) => val m = ns.min; ns.map(_ -> m) }.toMap
  }

  private def ccMap(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val df = edges.toDF("id_a", "id_b")
    Cluster.connectedComponents(df).as[(Long, Long)].collect().toMap
  }

  test("a transitive chain collapses to one cluster (A~B, B~C => A,B,C)") {
    // 0-1-2-...-19: no one-pass rule closes this; CC must
    val chain = (0L until 19L).map(i => (i, i + 1))
    val got = ccMap(chain)
    assert(got.keySet === (0L to 19L).toSet)
    assert(got.values.toSet === Set(0L))
  }

  test("cycles, stars and disjoint components resolve to per-component minima") {
    val edges = Seq(
      (5L, 1L), (1L, 9L), (9L, 5L),          // cycle rooted at 1
      (20L, 21L), (20L, 22L), (20L, 23L),    // star rooted at 20
      (40L, 41L))                            // isolated pair
    val got = ccMap(edges)
    assert(got === Map(
      1L -> 1L, 5L -> 1L, 9L -> 1L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L,
      40L -> 40L, 41L -> 40L))
  }

  test("random graphs match union-find (ScalaCheck)") {
    val genEdges: Gen[List[(Long, Long)]] = for {
      n     <- Gen.choose(2, 40)
      m     <- Gen.choose(1, 60)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong)
        b <- Gen.choose(0L, n.toLong) if a != b
      } yield (a, b))
    } yield edges
    check(Prop.forAll(genEdges) { edges =>
      edges.isEmpty || ccMap(edges) == ufComponents(edges)
    }, min = 30)
  }

  test("empty pair set yields an empty cluster map") {
    assert(ccMap(Nil).isEmpty)
  }

  test("non-integral ids fail loudly instead of collapsing into one null cluster") {
    import spark.implicits._
    val stringDocs = Seq(("doc-1", "text a"), ("doc-2", "text b")).toDF("doc_id", "text")
    val stringPairs = Seq(("doc-1", "doc-2")).toDF("id_a", "id_b")
    intercept[IllegalArgumentException] {
      Cluster.connectedComponents(stringPairs)
    }
    intercept[IllegalArgumentException] {
      Cluster.canonical(stringDocs, stringPairs, "doc_id", "text")
    }
  }

  test("canonical keeps the longest text per cluster, singletons included") {
    val docs = Seq(
      (0L, "aaaa aaaa aaaa"),  // cluster {0,1,2}: 1 has the longest text
      (1L, "aaaa aaaa aaaa aaaa"),
      (2L, "aaaa aaaa"),
      (7L, "solo doc"),        // singleton
      (8L, "pair one"), (9L, "pair two x")) // cluster {8,9}: 9 longer
    .toDF("doc_id", "text")
    val pairs = Seq((0L, 1L), (1L, 2L), (8L, 9L)).toDF("id_a", "id_b")
    val got = Cluster.canonical(docs, pairs, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 0L, 3L), (7L, 7L, 1L), (9L, 8L, 2L)))
  }

  test("canonical ties break to the smallest doc id") {
    val docs = Seq((3L, "same len"), (4L, "same len"), (5L, "same len"))
      .toDF("doc_id", "text")
    val pairs = Seq((3L, 4L), (4L, 5L)).toDF("id_a", "id_b")
    val got = Cluster.canonical(docs, pairs, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((3L, 3L, 3L)))
  }

  test("convergence is logarithmic: a 200-node chain fixes within the round bound") {
    // diameter 200 would need 200 label-propagation rounds; large/small-star
    // must close it inside the default maxRounds = 25
    val chain = (0L until 199L).map(i => (i, i + 1))
    val got = ccMap(chain)
    assert(got.size === 200 && got.values.toSet === Set(0L))
  }

  test("pair order and orientation do not matter") {
    val rnd = new Random(7)
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    val shuffled = rnd.shuffle(edges.map { case (a, b) => if (rnd.nextBoolean()) (b, a) else (a, b) })
    assert(ccMap(shuffled) === ccMap(edges))
  }
}
