package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Budgeted selection invariants: equivalence with the global greedy,
  * boundary-stratum prefix semantics, and the no-global-window plan.
  */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  // (id, score, tokens)
  private def df(rows: Seq[(Long, Double, Long)]) =
    rows.toDF("id", "s", "n")

  private def select(rows: Seq[(Long, Double, Long)], budget: Long): Set[Long] =
    Selection.selectByBudget(df(rows), "id", col("s"), col("n"), budget)
      .select("id").as[Long].collect().toSet

  /** Reference: literal global greedy on the driver. */
  private def greedy(rows: Seq[(Long, Double, Long)], budget: Long): Set[Long] = {
    var acc = 0L
    rows.sortBy { case (id, s, _) => (-s, id) }
      .filter { case (_, _, n) => val take = acc < budget; acc += n; take }
      .map(_._1).toSet
  }

  test("matches the global greedy across budgets, incl. straddling docs") {
    val rows = Seq(
      (1L, 0.9, 10L), (2L, 0.9, 10L), (3L, 0.8, 25L),
      (4L, 0.8, 5L), (5L, 0.7, 50L), (6L, 1.0, 3L))
    for (budget <- Seq(0L, 3L, 10L, 23L, 48L, 53L, 102L, 1000L))
      assert(select(rows, budget) === greedy(rows, budget), s"budget=$budget")
  }

  test("a doc starting inside the budget is taken whole") {
    // budget 12: doc 1 (10 toks) starts at 0, doc 2 starts at 10 < 12 →
    // taken whole even though it overflows to 30
    assert(select(Seq((1L, 1.0, 10L), (2L, 1.0, 20L)), 12L) === Set(1L, 2L))
    // budget 10: doc 2 starts exactly AT the budget → excluded
    assert(select(Seq((1L, 1.0, 10L), (2L, 1.0, 20L)), 10L) === Set(1L))
  }

  test("zero-token docs after exact budget exhaustion are excluded, like greedy") {
    // doc 1 exhausts the budget exactly; the zero-token doc 2 in the next
    // stratum starts AT the budget, which greedy excludes (start < budget)
    val rows = Seq((1L, 0.9, 10L), (2L, 0.8, 0L), (3L, 0.7, 5L))
    assert(select(rows, 10L) === greedy(rows, 10L))
    assert(select(rows, 10L) === Set(1L))
    // but a zero-token doc INSIDE the budget region is taken
    assert(select(rows, 11L) === greedy(rows, 11L))
    assert(select(rows, 11L) === Set(1L, 2L, 3L))
  }

  test("a zero-token doc inside the exactly-exhausting stratum is excluded") {
    // stratum 0.9 sums to exactly the budget; doc 2 (0 tokens, higher id)
    // starts AT the budget and must be excluded, like greedy
    val rows = Seq((1L, 0.9, 10L), (2L, 0.9, 0L), (3L, 0.7, 5L))
    assert(select(rows, 10L) === greedy(rows, 10L))
    assert(select(rows, 10L) === Set(1L))
    // a zero-token doc sorted BEFORE the exhausting tokens is included
    val rows2 = Seq((1L, 0.9, 0L), (2L, 0.9, 10L))
    assert(select(rows2, 10L) === greedy(rows2, 10L))
    assert(select(rows2, 10L) === Set(1L, 2L))
  }

  test("docs with null score or tokens are excluded, not a driver crash") {
    val df = Seq[(Long, Option[Double], Option[Long])](
      (1L, Some(0.9), Some(5L)), (2L, None, Some(5L)), (3L, Some(0.5), None))
      .toDF("id", "s", "n")
    val got = Selection.selectByBudget(df, "id", col("s"), col("n"), 100L)
      .select("id").as[Long].collect().toSet
    assert(got === Set(1L))
  }

  test("ties within the boundary stratum resolve by ascending id") {
    val rows = Seq((3L, 0.5, 10L), (1L, 0.5, 10L), (2L, 0.5, 10L))
    assert(select(rows, 20L) === Set(1L, 2L))
  }

  test("curriculumStages: monotone in score, near-equal stages, tie-consistent") {
    val rows = (1L to 100L).map(i => (i, (i % 10).toDouble)) // 10 score ties of 10
    val got = Selection.curriculumStages(rows.toDF("id", "s"), col("s"), 4)
      .select($"id", $"score", $"stage").as[(Long, Double, Int)].collect()
    assert(got.length === 100)
    // same score → same stage; higher score → stage never decreases
    val byScore = got.groupBy(_._2).view.mapValues(_.map(_._3).toSet).toMap
    assert(byScore.values.forall(_.size === 1), "score ties split across stages")
    val ordered = byScore.toSeq.sortBy(_._1).map(_._2.head)
    assert(ordered === ordered.sorted, "stage must be monotone in score")
    // 4 stages of ~25 each (quantile exactness up to tie granularity)
    val sizes = got.groupBy(_._3).view.mapValues(_.size).toMap
    assert(sizes.keySet === Set(0, 1, 2, 3))
    assert(sizes.values.forall(s => s >= 20 && s <= 30), sizes.toString)
  }

  test("curriculumStages with fewer score values than stages: ties stay whole") {
    // two score values, k=4: each value maps to ONE stage (0 and 2 by
    // cumulative position); no value is ever split across stages
    val rows = (1L to 10L).map(i => (i, if (i <= 5) 0.1 else 0.9))
    val got = Selection.curriculumStages(rows.toDF("id", "s"), col("s"), 4)
      .select($"score", $"stage").as[(Double, Int)].collect().toSet
    assert(got === Set((0.1, 0), (0.9, 2)))
  }

  test("continuous scores without bucketize fail fast, not a data collect") {
    // 100 distinct raw doubles vs a cardinality cap of 10: proceeding would
    // make the "histogram" row-sized — the guard must throw with the fix
    val rows = (1L to 100L).map(i => (i, 1.0 / i, 5L))
    val e = intercept[IllegalArgumentException] {
      Selection.selectByBudget(df(rows), "id", col("s"), col("n"), 50L,
        maxScoreCardinality = 10)
    }
    assert(e.getMessage.contains("bucketize"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Selection.curriculumStages(rows.toDF("id", "s", "n"), col("s"), 4,
        maxScoreCardinality = 10)
    }
    assert(e2.getMessage.contains("bucketize"), e2.getMessage)
  }

  test("bucketize snaps a continuous score under the cap and matches greedy") {
    // scores i/1000 collapse to 1-dp buckets: cardinality 10 < cap 16
    val rows = (1L to 100L).map(i => (i, i.toDouble / 1000.0, 5L))
    val got = Selection.selectByBudget(df(rows), "id", col("s"), col("n"),
        100L, bucketize = Some(1), maxScoreCardinality = 16)
      .select($"id", $"score").as[(Long, Double)].collect()
    // output score is the snapped value (same HALF_UP semantics as round())
    def snapped(s: Double): Double =
      BigDecimal(s).setScale(1, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.forall { case (id, s) => s == snapped(id.toDouble / 1000.0) })
    // equals the greedy over the SNAPPED score with id tie-break
    var acc = 0L
    val expect = rows.map { case (id, s, n) => (id, snapped(s), n) }
      .sortBy { case (id, s, _) => (-s, id) }
      .filter { case (_, _, n) => val take = acc < 100L; acc += n; take }
      .map(_._1).toSet
    assert(got.map(_._1).toSet === expect)
  }

  test("curriculumStages with bucketize: stages follow the snapped score") {
    val rows = (1L to 100L).map(i => (i, i.toDouble / 1000.0))
    val got = Selection.curriculumStages(rows.toDF("id", "s"), col("s"), 2,
        bucketize = Some(1), maxScoreCardinality = 16)
      .select($"score", $"stage").as[(Double, Int)].collect().toSet
    // snapped scores 0.0 .. 0.1: same snapped score → same stage, monotone
    val byScore = got.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byScore.values.forall(_.size === 1))
    val ordered = byScore.toSeq.sortBy(_._1).map(_._2.head)
    assert(ordered === ordered.sorted)
  }

  test("selectByBudgetPerGroup: each group runs its own greedy to its budget") {
    // (id, group, score, tokens)
    val rows = Seq(
      (1L, "web", 0.9, 10L), (2L, "web", 0.9, 10L), (3L, "web", 0.5, 10L),
      (4L, "books", 1.0, 5L), (5L, "books", 0.4, 25L), (6L, "books", 0.2, 5L),
      (7L, "code", 0.7, 3L))
    val df = rows.toDF("id", "g", "s", "n")
    def got(budget: Long): Set[Long] =
      Selection.selectByBudgetPerGroup(df, "id", "g", col("s"), col("n"), budget)
        .select("id").as[Long].collect().toSet
    def greedy(budget: Long): Set[Long] =
      rows.groupBy(_._2).flatMap { case (_, docs) =>
        var acc = 0L
        docs.sortBy { case (id, _, s, _) => (-s, id) }
          .filter { case (_, _, _, n) => val take = acc < budget; acc += n; take }
          .map(_._1)
      }.toSet
    for (b <- Seq(0L, 5L, 12L, 20L, 30L, 1000L))
      assert(got(b) === greedy(b), s"budget=$b")
    // a group that fits entirely (code, 3 tokens) survives any budget >= 1
    assert(got(4L).contains(7L))
  }

  test("plan has no global window: the boundary window partitions by score") {
    val plan = Selection.selectByBudget(
        df(Seq((1L, 0.5, 10L), (2L, 0.6, 10L))), "id", col("s"), col("n"), 15L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"global shuffle in:\n$plan")
    assert(plan.contains("Window") || plan.contains("score"), plan)
  }

  test("capPerGroup keeps exactly cap rows per group, deterministically") {
    val docs = (1L to 200L).map(i => (i, if (i % 4 == 0) "rare" else "hot"))
      .toDF("id", "src")
    val got = Selection.capPerGroup(docs, "src", "id", cap = 30)
    val counts = got.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(counts === Map("hot" -> 30L, "rare" -> 30L))
    // deterministic across reruns
    val again = Selection.capPerGroup(docs, "src", "id", cap = 30)
      .select("id").as[Long].collect().toSet
    assert(again === got.select("id").as[Long].collect().toSet)
    // a different salt draws a different (but equally sized) sample
    val other = Selection.capPerGroup(docs, "src", "id", cap = 30, salt = "x")
      .select("id").as[Long].collect().toSet
    assert(other != again && other.size === 60)
    // groups under the cap pass through whole
    val small = Selection.capPerGroup(docs.filter($"id" <= 10), "src", "id", 30)
    assert(small.count() === 10)
  }

  test("capPerGroup rank window rewrites to WindowGroupLimit (map-side bound)") {
    val docs = (1L to 50L).map(i => (i, "s")).toDF("id", "src")
    val plan = Selection.capPerGroup(docs, "src", "id", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no group-limit pushdown in:\n$plan")
  }

  test("mixtureOptimizer: uniform losses stay uniform; excess loss gains weight") {
    // three sources, token-weighted: a at mean loss, b above, c below
    val perDoc = Seq(
      ("a", 5.0, 100L), ("a", 5.0, 100L),
      ("b", 9.0, 100L), ("b", 9.0, 100L),
      ("c", 1.0, 100L), ("c", 1.0, 100L)
    ).toDF("source", "nll", "n_tokens")
    val out = Selection.mixtureOptimizer(perDoc, "source", "nll", "n_tokens")
      .orderBy("source")
      .collect()
    val bySrc = out.map(r => r.getString(0) ->
      (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // reference loss = 5.0 ⇒ only b has excess
    assert(bySrc("a")._1 === 0L && bySrc("c")._1 === 0L)
    assert(bySrc("b")._1 === 40000L) // (9.0 - 5.0) in 1e-4 nats
    // b ends strictly heavier; a and c identical
    assert(bySrc("b")._2 > bySrc("a")._2)
    assert(bySrc("a")._2 === bySrc("c")._2)
    // ppm weights and token targets stay near their scales (floor loss only)
    val wsum = out.map(_.getLong(4)).sum
    assert(wsum <= 1000000L && wsum > 999990L)
    val tsum = out.map(_.getLong(5)).sum
    assert(tsum <= 1000000L && tsum > 999990L)

    // all-equal losses: excess 0 everywhere, weights stay uniform
    val flat = Seq(("a", 3.0, 50L), ("b", 3.0, 500L), ("c", 3.0, 5L))
      .toDF("source", "nll", "n_tokens")
    val fo = Selection.mixtureOptimizer(flat, "source", "nll", "n_tokens").collect()
    assert(fo.map(_.getLong(4)).distinct.length === 1)
  }

  test("mixtureOptimizer is deterministic and source-order independent") {
    val perDoc = Seq(
      ("w", 4.5, 10L), ("x", 7.25, 40L), ("y", 2.0, 25L), ("z", 6.0, 80L))
      .toDF("source", "nll", "n_tokens")
    val once = Selection.mixtureOptimizer(perDoc, "source", "nll", "n_tokens")
      .orderBy("source").collect().map(_.toString)
    val again = Selection.mixtureOptimizer(
        perDoc.orderBy(desc("source")).repartition(3), "source", "nll", "n_tokens")
      .orderBy("source").collect().map(_.toString)
    assert(once.toSeq === again.toSeq)
  }
}
