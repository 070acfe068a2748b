package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Decontamination invariants: exact n-gram matching (no partial-gram
  * leakage), per-doc shared-gram counts, and the survivors = corpus −
  * contaminated identity.
  */
class DecontamSpec extends SparkSpec {
  import spark.implicits._

  // benchmark doc shares its middle trigram with doc 1 only; doc 2 shares
  // single words but never a full 3-gram; doc 3 is disjoint
  private lazy val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
  private lazy val corpus = Seq(
    (1L, "x alpha beta gamma y"),   // contains bench 3-gram "alpha beta gamma"
    (2L, "alpha x beta y gamma"),   // shares words, no 3-gram
    (3L, "p q r s t"))              // disjoint
    .toDF("doc_id", "text")

  test("decontaminate drops exactly the docs sharing a full n-gram") {
    val got = Decontam.decontaminate(corpus, bench, "doc_id", "text", n = 3)
      .select("doc_id").as[Long].collect().sorted
    assert(got === Array(2L, 3L))
  }

  test("contaminated reports distinct shared-gram counts") {
    val got = Decontam.contaminated(corpus, bench, "doc_id", "text", n = 2)
      .as[(Long, Long)].collect().toMap
    // doc 1 shares bigrams "alpha beta" and "beta gamma"; doc 2 none of
    // its bigrams appear in bench; doc 3 disjoint
    assert(got === Map(1L -> 2L))
  }

  test("short docs (< n tokens) never match and always survive") {
    val shorts = Seq((10L, "alpha beta"), (11L, "")).toDF("doc_id", "text")
    val got = Decontam.decontaminate(shorts, bench, "doc_id", "text", n = 3)
    assert(got.count() === 2L)
  }

  test("unigram decontamination (n=1) bans every shared word") {
    val got = Decontam.decontaminate(corpus, bench, "doc_id", "text", n = 1)
      .select("doc_id").as[Long].collect().sorted
    // docs 1 and 2 both share single words with the benchmark; only the
    // fully-disjoint doc 3 survives
    assert(got === Array(3L))
  }

  test("an empty benchmark contaminates nothing") {
    val empty = bench.filter($"doc_id" < 0)
    assert(Decontam.decontaminate(corpus, empty, "doc_id", "text", n = 3)
      .count() === 3L)
    assert(Decontam.contaminated(corpus, empty, "doc_id", "text", n = 3)
      .count() === 0L)
  }

  test("semantic contamination flags embedding-space overlap the n-grams miss") {
    // bench vector [1,0,0]; corpus: a paraphrase-like near vector, an
    // orthogonal one, and an anti-parallel one
    val bench = Seq((100L, Seq(1.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Seq(0.95, 0.1, 0.0)),  // near: cos ≈ 0.9945
      (2L, Seq(0.0, 1.0, 0.0)),   // orthogonal: cos 0
      (3L, Seq(-1.0, 0.0, 0.0))). // anti-parallel: cos −1
      toDF("vec_id", "embedding")
    val hits = Decontam.semanticContaminated(corpus, bench, "vec_id", "embedding", 0.9)
      .as[(Long, Long, Double)].collect()
    assert(hits.toSeq === Seq((1L, 1L, 0.9945)))
    val kept = Decontam.semanticDecontaminate(corpus, bench, "vec_id", "embedding", 0.9)
      .select("vec_id").as[Long].collect().sorted
    assert(kept === Array(2L, 3L))
  }

  test("semantic threshold compares the ROUNDED cosine (engine-stable boundary)") {
    val bench = Seq((100L, Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    // cos = 0.8999999... raw; rounds to 0.9 exactly → must be flagged at 0.9
    val v = Seq(0.9, math.sqrt(1 - 0.9 * 0.9) * (1 + 1e-9))
    val corpus = Seq((1L, Seq(v.head / math.sqrt(v.map(x => x * x).sum),
      v(1) / math.sqrt(v.map(x => x * x).sum)))).toDF("vec_id", "embedding")
    val hits = Decontam.semanticContaminated(corpus, bench, "vec_id", "embedding", 0.9)
    assert(hits.count() === 1L, "boundary case must be decided on the 4-dp snap")
  }

  test("semantic decontaminate never force-broadcasts the hit set") {
    val bench = Seq((100L, Seq(1.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    val plan = Decontam.semanticDecontaminate(corpus2, bench, "vec_id", "embedding", 0.5)
      .queryExecution.logical.toString
    // the hit set is threshold-dependent — AQE must choose the join side
    assert(!plan.contains("UnresolvedHint hint=broadcast, child=Join"),
      "hit-set anti join must stay AQE-decided")
  }

  private lazy val corpus2 = Seq(
    (1L, Seq(0.95, 0.1, 0.0)), (2L, Seq(0.0, 1.0, 0.0))).toDF("vec_id", "embedding")

  test("corpus side never shuffles: every exchange is inside a broadcast build") {
    val plan = Decontam.decontaminate(corpus, bench, "doc_id", "text", n = 3)
      .queryExecution.executedPlan.toString
    // both probes are broadcast joins with the corpus streamed; the only
    // shuffles sit inside the broadcast builds (benchmark grams / hit
    // ids), never on the corpus stream
    assert(plan.linesIterator.count(_.contains("BroadcastHashJoin")) === 2, plan)
    assert(topLevelHashExchanges(plan).isEmpty, s"corpus-side shuffle in:\n$plan")
    assert(plan.linesIterator.count(_.contains("Exchange hashpartitioning")) === 2, plan)
  }
}
