package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Ranked retrieval + link analysis invariants — BM25 ordering against a
  * hand-computable fixture, PageRank mass conservation / hub dominance /
  * uniform-ring symmetry, and the integer-carrier determinism contract.
  */
class RankSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------------ BM25

  private def docsDf = Seq(
    (1L, "cat cat cat dog"),      // tf(cat)=3, short
    (2L, "cat dog fish bird owl frog hen cow pig rat bat ant"), // tf(cat)=1, long
    (3L, "dog dog dog dog"),      // no 'cat'
    (4L, "cat cat dog fish")      // tf(cat)=2
  ).toDF("doc_id", "text")

  test("bm25: higher tf wins at comparable length; absent term scores zero rows") {
    val res = Rank.bm25TopK(docsDf, "doc_id", "text", Seq("cat"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // doc 3 has no 'cat' → no partial rows → absent from the result
    assert(!res.map(_._1).contains(3L))
    val byDoc = res.toMap
    // tf 3 > tf 2 at shorter-or-equal length → strictly higher score
    assert(byDoc(1L) > byDoc(4L))
    // doc 2's single hit in a 12-token doc scores below doc 1's 3 hits
    assert(byDoc(1L) > byDoc(2L))
    // result is sorted by score desc before the limit — scores positive
    assert(res.forall(_._2 > 0.0))
  }

  test("bm25: k caps the result and keeps the top scorers") {
    val res = Rank.bm25TopK(docsDf, "doc_id", "text", Seq("cat", "dog"), 2)
      .collect()
    assert(res.length === 2)
    val kept = res.map(_.getLong(0)).toSet
    val all = Rank.bm25TopK(docsDf, "doc_id", "text", Seq("cat", "dog"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val top2 = all.sortBy(r => (-r._2, r._1)).take(2).map(_._1).toSet
    assert(kept === top2)
  }

  test("bm25: length normalization — same tf, longer doc scores lower") {
    val docs = Seq(
      (1L, "term term pad"),
      (2L, "term term pad pad pad pad pad pad pad pad pad pad")
    ).toDF("doc_id", "text")
    val byDoc = Rank.bm25TopK(docs, "doc_id", "text", Seq("term"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(byDoc(1L) > byDoc(2L))
  }

  test("bm25 multi: each query's slice equals the single-query run bit-for-bit") {
    val qs = Seq(
      ("q1", "cat"),
      ("q2", "cat"), ("q2", "dog"),
      ("q3", "zzz_absent")).toDF("query_id", "term")
    val multi = Rank.bm25TopKMulti(docsDf, "doc_id", "text", qs, 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    def single(terms: Seq[String]) =
      Rank.bm25TopK(docsDf, "doc_id", "text", terms, 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(multi.filter(_._1 == "q1").map(t => (t._2, t._3)).toSet ===
      single(Seq("cat")))
    assert(multi.filter(_._1 == "q2").map(t => (t._2, t._3)).toSet ===
      single(Seq("cat", "dog")))
    // a query of only absent terms yields zero rows, not a crash
    assert(!multi.exists(_._1 == "q3"))
  }

  test("bm25 multi: k caps PER QUERY; duplicate query terms don't double-count") {
    val qs = Seq(
      ("a", "cat"), ("a", "dog"), ("a", "cat"), // dup term row
      ("b", "dog")).toDF("query_id", "term")
    val res = Rank.bm25TopKMulti(docsDf, "doc_id", "text", qs, 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(res.count(_._1 == "a") === 2)
    assert(res.count(_._1 == "b") === 2)
    // dedup contract: scores match the distinct-term single-query run
    val single = Rank.bm25TopK(docsDf, "doc_id", "text", Seq("cat", "dog"), 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(res.filter(_._1 == "a").map(t => (t._2, t._3)).toSet === single)
  }

  test("bm25 multi: lazy plan — no driver action at construction") {
    val qs = Seq(("q", "cat")).toDF("query_id", "term")
    // construction must not run jobs (the single-query form takes two
    // driver actions for N/avgdl; the multi form is the lazy deployment
    // shape) — building the frame against an empty-but-valid corpus and
    // never acting on it should not throw
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val planned = Rank.bm25TopKMulti(empty, "doc_id", "text", qs, 5)
    assert(planned.columns.toSeq === Seq("query_id", "doc_id", "score"))
    assert(planned.count() === 0L)
  }

  // -------------------------------------------------------------- PageRank

  private def sym(pairs: Seq[(Long, Long)]) = {
    val e = pairs.toDF("src", "dst")
    e.unionAll(e.select($"dst".as("src"), $"src".as("dst")))
  }

  test("pagerank: rank mass is conserved to within the integer snap") {
    // star: hub 0 — leaves 1..6
    val ranks = Rank.pageRank(sym((1L to 6L).map(l => (0L, l))), 10)
    val total = ranks.agg(sum($"pr_e8")).head().getLong(0)
    // Σ pr = 1 in 1e8 units, up to one rounding unit per node per iteration
    assert(math.abs(total - 100000000L) < 7 * 11)
  }

  test("pagerank: star hub dominates every leaf; leaves are symmetric") {
    val ranks = Rank.pageRank(sym((1L to 6L).map(l => (0L, l))), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val leafRanks = (1L to 6L).map(ranks)
    assert(leafRanks.toSet.size === 1) // identical by symmetry
    assert(ranks(0L) > leafRanks.head * 3)
  }

  test("pagerank: uniform ring converges to the uniform distribution") {
    val n = 8
    val ring = sym((0 until n).map(i => (i.toLong, ((i + 1) % n).toLong)))
    val ranks = Rank.pageRank(ring, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(ranks.values.toSet.size === 1)
    assert(math.abs(ranks(0L) - 100000000L / n) <= 1)
  }

  test("pagerank: deterministic across runs (integer carrier, no float sums)") {
    val g = Rank.tradeGraph(
      Seq((100L, 7L), (101L, 8L), (102L, 7L)).toDF("o_orderkey", "o_custkey"),
      Seq((100L, 1L), (100L, 2L), (101L, 1L), (102L, 2L)).toDF("l_orderkey", "l_suppkey"),
      1000L)
    val a = Rank.pageRank(g, 10).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = Rank.pageRank(g.repartition(7), 10).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(a.sameElements(b))
  }

  // ------------------------------------------------------------------ HITS

  test("hits: authority follows in-degree of hub mass; hub follows breadth") {
    // customers 1,2,3 all buy from supplier 11; customer 1 also from 12
    val e = Seq((1L, 11L), (2L, 11L), (3L, 11L), (1L, 12L)).toDF("src", "dst")
    val res = Rank.hits(e, 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // supplier 11 (3 buyers) dominates supplier 12 (1 buyer)
    assert(res(11L)._2 > res(12L)._2 * 2)
    // customer 1 (2 links) is the top hub
    assert(res(1L)._1 > res(2L)._1)
    assert(res(2L)._1 === res(3L)._1) // symmetric customers tie exactly
    // suppliers have no out-edges → zero hub; customers zero authority
    assert(res(11L)._1 === 0L && res(1L)._2 === 0L)
  }

  test("hits: L1 mass of each side normalizes to 1e8 within rounding") {
    val e = Seq((1L, 11L), (2L, 11L), (3L, 12L), (3L, 13L)).toDF("src", "dst")
    val rows = Rank.hits(e, 10).collect().map(r => (r.getLong(1), r.getLong(2)))
    val hubTot = rows.map(_._1).sum
    val authTot = rows.map(_._2).sum
    assert(math.abs(hubTot - 100000000L) <= rows.length)
    assert(math.abs(authTot - 100000000L) <= rows.length)
  }

  test("hits: deterministic under repartition (integer carrier)") {
    val e = Seq((1L, 11L), (2L, 11L), (3L, 12L), (1L, 13L), (2L, 13L)).toDF("src", "dst")
    val a = Rank.hits(e, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val b = Rank.hits(e.repartition(5), 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(a.sameElements(b))
  }

  // ------------------------------------------------- personalized PageRank

  test("ppr: with ALL nodes as sources it equals pageRank bit-for-bit") {
    val g = Seq((1L, 11L), (11L, 1L), (2L, 11L), (11L, 2L), (2L, 12L),
      (12L, 2L)).toDF("src", "dst")
    val all = g.select(col("src").as("node")).distinct()
    val a = Rank.personalizedPageRank(g, all, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = Rank.pageRank(g, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(a.sameElements(b))
  }

  test("ppr: mass localizes — an unreached component decays to zero") {
    // two disjoint symmetric pairs; source set touches only {1,11}
    val g = Seq((1L, 11L), (11L, 1L), (2L, 12L), (12L, 2L))
      .toDF("src", "dst")
    val res = Rank.personalizedPageRank(
        g, Seq(1L).toDF("node"), 20).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // nodes 2/12 get no teleport and no inbound path from the source
    assert(res(2L) === 0L && res(12L) === 0L)
    // the source component keeps essentially all the mass
    assert(res(1L) + res(11L) > 99000000L)
  }

  test("ppr: deterministic under repartition (integer carrier)") {
    val g = Seq((1L, 11L), (11L, 1L), (2L, 11L), (11L, 2L), (3L, 12L),
      (12L, 3L)).toDF("src", "dst")
    val src = Seq(1L, 3L).toDF("node")
    val a = Rank.personalizedPageRank(g, src, 6).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = Rank.personalizedPageRank(g.repartition(7), src.repartition(3), 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(a.sameElements(b))
  }

  // ------------------------------------------------------ forward-push PPR

  test("ppr push: mass conserved; untouched components never enter the state") {
    val g = Seq((1L, 11L), (11L, 1L), (2L, 11L), (11L, 2L), (3L, 12L),
      (12L, 3L)).toDF("src", "dst")
    val rows = Rank.pprForwardPush(g, Seq(1L).toDF("node"), 8, epsE8 = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the {3,12} component is unreachable from the source: unlike the
    // power method (which carries a zero row per node), push state
    // contains ONLY touched nodes
    assert(!rows.exists(r => r._1 == 3L || r._1 == 12L))
    // estimate + residual conserve the unit mass up to rounding drift
    val total = rows.map(r => r._2 + r._3).sum
    assert(math.abs(total - 100000000L) < 500, s"mass $total")
  }

  test("ppr dispatch: localized sources take push, wide teleport falls back to power") {
    val g = Seq((1L, 11L), (11L, 1L), (2L, 11L), (11L, 2L), (3L, 11L),
      (11L, 3L)).toDF("src", "dst")
    // 1 source ≤ maxPushSources → push path (schema carries r_e8, state
    // holds touched nodes only) and equals the direct push call
    val auto = Rank.ppr(g, Seq(1L).toDF("node"), iterations = 4, rounds = 8,
      epsE8 = 100L, maxPushSources = 2L)
    assert(auto.columns.toSeq === Seq("node", "p_e8", "r_e8"))
    val direct = Rank.pprForwardPush(g, Seq(1L).toDF("node"), 8, epsE8 = 100L)
    assert(auto.orderBy("node").collect().toSeq ===
      direct.orderBy("node").collect().toSeq)
    // 3 sources > maxPushSources=2 → dense power fallback (every node's
    // pr_e8) and equals the direct power call
    val wide = Seq(1L, 2L, 3L).toDF("node")
    val dense = Rank.ppr(g, wide, iterations = 4, rounds = 8,
      maxPushSources = 2L)
    assert(dense.columns.toSeq === Seq("node", "pr_e8"))
    assert(dense.orderBy("node").collect().toSeq ===
      Rank.personalizedPageRank(g, wide, 4).orderBy("node").collect().toSeq)
  }

  test("ppr push: approximates the converged power method within the ACL bound") {
    // path-and-branches around source 0; epsE8=500 ⇒ ppr−p ≤ 500·deg
    // at termination (undirected reversibility bound). damping 0.5 so
    // BOTH algorithms converge within the test's round budget: the
    // residual/power tail decays as damping^k — 0.5^25 ≈ 3e-8, while
    // 0.85^25 would leave 1.7% of the mass un-pushed and the bound
    // meaningless (the registered query sizes rounds accordingly).
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 4L), (4L, 5L), (0L, 6L))
    val g = sym(pairs)
    val deg = pairs.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val srcs = Seq(0L).toDF("node")
    val push = Rank.pprForwardPush(g, srcs, 25, damping = 0.5, epsE8 = 500L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = Rank.personalizedPageRank(g, srcs, 25, damping = 0.5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val slack = 1500L
    for ((node, pr) <- exact) {
      val p = push.getOrElse(node, 0L)
      assert(p <= pr + slack, s"node $node: push $p above ppr $pr")
      assert(pr <= p + 500L * deg(node) + slack,
        s"node $node: push $p misses ppr $pr beyond eps*deg=${500L * deg(node)}")
    }
  }

  test("ppr push: deterministic under repartition (integer carrier)") {
    val g = Seq((1L, 11L), (11L, 1L), (2L, 11L), (11L, 2L), (3L, 12L),
      (12L, 3L)).toDF("src", "dst")
    val src = Seq(1L, 3L).toDF("node")
    val a = Rank.pprForwardPush(g, src, 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val b = Rank.pprForwardPush(g.repartition(7), src.repartition(3), 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(a.sameElements(b))
  }

  test("ppr push: the edge list is broadcast-joined, never shuffled") {
    val g = sym(Seq((0L, 1L), (1L, 2L), (0L, 3L)))
    val out = Rank.pprForwardPush(g, Seq(0L).toDF("node"), 3)
    val plan = out.queryExecution.executedPlan.toString
    // the returned frame is a checkpoint; the invariant is structural:
    // run one round un-checkpointed and inspect its plan instead
    val deg = g.groupBy("src").agg(count(lit(1)).as("deg"))
    val e2 = g.join(deg, "src")
      .join(deg.select(col("src").as("dst"), col("deg").as("dst_deg")), "dst")
    val active = Seq((0L, 100000000L)).toDF("node", "r_e8")
    val pushedPlan = e2
      .join(org.apache.spark.sql.functions.broadcast(active),
        e2("src") === active("node"))
      .groupBy("dst", "dst_deg")
      .agg(sum(round(lit(0.85) * col("r_e8") / e2("deg")).cast("long")).as("in_e8"))
      .queryExecution.executedPlan.toString
    assert(pushedPlan.contains("BroadcastHashJoin"),
      s"frontier not broadcast:\n$pushedPlan")
    assert(out.collect().nonEmpty && plan.nonEmpty)
  }

  test("tradeGraph: symmetric, distinct, offset keyspaces disjoint") {
    val g = Rank.tradeGraph(
      Seq((100L, 7L), (101L, 7L)).toDF("o_orderkey", "o_custkey"),
      Seq((100L, 1L), (100L, 1L), (101L, 2L)).toDF("l_orderkey", "l_suppkey"),
      1000L).collect().map(r => (r.getLong(0), r.getLong(1)))
    // duplicate (cust 7, supp 1) edge collapsed; both directions present
    assert(g.length === 4)
    assert(g.toSet === Set((7L, 1001L), (7L, 1002L), (1001L, 7L), (1002L, 7L)))
  }

  test("phraseSearch: exact positions, overlap counting, boundary cases") {
    val docs = Seq(
      (1L, "a b c a b c a b"), // "a b" at 0, 3, 6
      (2L, "x x x x"),         // "x x" overlapping at 0, 1, 2
      (3L, "a c b"),           // no "a b"
      (4L, "a b"),             // exact doc-length match at 0
      (5L, "b"),               // shorter than the phrase
      (6L, "")
    ).toDF("doc_id", "text")
    val ab = Rank.phraseSearch(docs, "doc_id", "text", Seq("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ab.toSeq === Seq((1L, 3L, 0L), (4L, 1L, 0L)))
    val xx = Rank.phraseSearch(docs, "doc_id", "text", Seq("x", "x"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(xx.toSeq === Seq((2L, 3L, 0L))) // overlapping occurrences count
    val abc = Rank.phraseSearch(docs, "doc_id", "text", Seq("c", "a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(abc.toSeq === Seq((1L, 2L, 2L)))
  }

  test("phraseSearch native scan ≡ the HOF formulation (randomized)") {
    val r = new scala.util.Random(42)
    val vocab = Array("a", "bb", "ccc", "table", "x")
    val docs = (0 until 300).map { i =>
      val n = r.nextInt(30)
      val extraSpace = if (i % 7 == 0) "  " else " " // multi-space runs too
      (i.toLong, (0 until n).map(_ => vocab(r.nextInt(vocab.length)))
        .mkString(extraSpace) + (if (i % 11 == 0) "  " else ""))
    }.toDF("doc_id", "text")
    for (phrase <- Seq(Seq("a"), Seq("table", "table"), Seq("a", "bb", "a"))) {
      val native = Rank.phraseSearch(docs, "doc_id", "text", phrase)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      val hof = Rank.phraseSearchHof(docs, "doc_id", "text", phrase)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      assert(native.toSeq === hof.toSeq, s"phrase $phrase")
    }
  }

  test("phraseSearch is a zero-shuffle scan (no Exchange, no explode)") {
    val docs = spark.range(100).selectExpr("id AS doc_id",
      "concat('w', CAST(id % 5 AS STRING), ' table table x') AS text")
    val plan = Rank.phraseSearch(docs, "doc_id", "text", Seq("table", "table"))
      .queryExecution.executedPlan.toString
    assert(topLevelHashExchanges(plan).isEmpty, s"unexpected shuffle:\n$plan")
    assert(!plan.contains("Generate"), s"explode crept in:\n$plan")
  }
}
