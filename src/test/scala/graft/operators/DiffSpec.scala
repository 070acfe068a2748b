package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DiffSpec extends SparkSpec {
  import spark.implicits._

  test("corpusDiff: added/removed/common per group by text digest") {
    val a = Seq(
      (1L, "s1", "alpha beta"),
      (2L, "s1", "gamma"),
      (3L, "s2", "delta epsilon zeta"))
      .toDF("doc_id", "source", "text")
    val b = Seq(
      (10L, "s1", "alpha beta"),        // same text, new id → common
      (11L, "s1", "new doc here"),      // added (3 tokens)
      (12L, "s2", "delta epsilon zeta"),
      (13L, "s2", "delta epsilon zeta")) // duplicate text → ONE key
      .toDF("doc_id", "source", "text")
    val got = Diff.corpusDiff(a, b, "source", "text")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got("s1") === ((1L, 1L, 1L, 3L, 1L)))  // +new(3 tok), -gamma(1 tok)
    assert(got("s2") === ((0L, 0L, 1L, 0L, 0L)))
  }

  test("corpusDiff join reuses the aggregate partitioning — no extra exchange") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = Diff.corpusDiff(docs, docs.filter($"doc_id" % 2 === 0),
      "source", "text").queryExecution.executedPlan.toString
    // exchanges: one per keyed side aggregate + the final group aggregate;
    // the full-outer join itself must NOT re-shuffle either side
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx === 3, s"expected 3 hash exchanges, got $hashEx in:\n$plan")
    assert(plan.contains("FullOuter"), s"no full-outer join in:\n$plan")
  }

  test("corpusDiff of identical corpora is all-common") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val got = Diff.corpusDiff(docs, docs, "source", "text")
    assert(got.filter($"n_added" =!= 0 || $"n_removed" =!= 0).count() === 0)
    assert(got.agg(sum("n_common")).as[Long].head() ===
      docs.select(md5(lower(trim($"text"))), $"source").distinct().count())
  }

  test("sourceOverlap: hand-computed pair matrix, diagonal only when duplicated") {
    val docs = Seq(
      (1L, "s1", "t1"), (2L, "s1", "t1"), (3L, "s1", "t2"),
      (4L, "s2", "t1"), (5L, "s2", "t3"),
      (6L, "s3", "t2")).toDF("doc_id", "source", "text")
    val got = Diff.sourceOverlap(docs, "text", "source")
      .as[(String, String, Long, Long)].collect().toSet
    // t1: s1×2, s2×1 → (s1,s1): 1 pair; (s1,s2): 2 pairs. t2: s1×1, s3×1
    // → (s1,s3): 1 pair. t3 is unique — no diagonal row for s2 or s3.
    assert(got === Set(
      ("s1", "s1", 1L, 1L),
      ("s1", "s2", 1L, 2L),
      ("s1", "s3", 1L, 1L)))
  }

  test("sourceOverlap pair counts come from histogram arithmetic, not doc pairs") {
    // 10 copies in each of two sources: 100 cross pairs, 45 within each
    val docs = (1 to 20).map(i =>
      (i.toLong, if (i <= 10) "a" else "b", "same")).toDF("doc_id", "source", "text")
    val got = Diff.sourceOverlap(docs, "text", "source")
      .as[(String, String, Long, Long)].collect().toSet
    assert(got === Set(("a", "a", 1L, 45L), ("a", "b", 1L, 100L), ("b", "b", 1L, 45L)))
  }
}
