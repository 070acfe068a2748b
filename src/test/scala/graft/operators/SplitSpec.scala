package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic split/sample invariants: reproducibility under
  * reordering, exact per-stratum counts, label stability as data grows —
  * the properties that make a training split auditable.
  */
class SplitSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = (0L until 1000L).map(i => (i, s"stratum_${i % 4}"))
  private lazy val df = rows.toDF("id", "lang").cache()

  test("hashBucket lands in [0, 100) and is pure column arithmetic") {
    val b = df.select(Split.hashBucket($"id").as("b")).agg(min($"b"), max($"b")).head()
    assert(b.getLong(0) >= 0L && b.getLong(1) < 100L)
  }

  test("assign labels every row and respects weight boundaries roughly") {
    val counts = Split.assign(df, "id", Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum === 1000L)
    assert(counts.keySet === Set("train", "val", "test"))
    // md5 is uniform; at n=1000 the 80% bucket lands within a wide band
    assert(counts("train") > 700L && counts("train") < 900L)
  }

  test("assign is order- and partitioning-invariant") {
    val a = Split.assign(df, "id", Seq("train" -> 90, "test" -> 10))
      .select("id", "split").as[(Long, String)].collect().toMap
    val b = Split.assign(df.orderBy($"id".desc).repartition(7), "id",
        Seq("train" -> 90, "test" -> 10))
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(a === b)
  }

  test("growing the dataset never reassigns an existing row") {
    val w = Seq("train" -> 80, "val" -> 10, "test" -> 10)
    val before = Split.assign(df.filter($"id" < 500), "id", w)
      .select("id", "split").as[(Long, String)].collect().toMap
    val after = Split.assign(df, "id", w)
      .select("id", "split").as[(Long, String)].collect().toMap
    before.foreach { case (id, s) => assert(after(id) === s) }
  }

  test("assign rejects weights that do not sum to 100") {
    intercept[IllegalArgumentException] {
      Split.assign(df, "id", Seq("train" -> 80, "test" -> 10))
    }
  }

  test("stratifiedSample keeps exactly ceil(frac*n) rows per stratum") {
    val got = Split.stratifiedSample(df, "lang", "id", 0.1)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // 4 strata of 250 rows each → ceil(25.0) = 25
    assert(got === Map("stratum_0" -> 25L, "stratum_1" -> 25L,
      "stratum_2" -> 25L, "stratum_3" -> 25L))
  }

  test("stratifiedSample rounds up on fractional quotas and is a subset") {
    val odd = (0L until 103L).map(i => (i, "x")).toDF("id", "lang")
    val got = Split.stratifiedSample(odd, "lang", "id", 0.25)
      .as[(Long, String)].collect()
    assert(got.length === 26) // ceil(25.75)
    assert(got.map(_._1).toSet.subsetOf((0L until 103L).toSet))
  }

  test("mixture: rate 100 keeps everything, rate 0 keeps nothing") {
    val m = Split.mixture(Seq(("all", df, 100), ("none", df, 0)), "id")
    val bySource = m.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySource === Map("all" -> 1000L))
  }

  test("mixture: the source name salts the draw — shared ids decorrelate") {
    val m = Split.mixture(Seq(("web", df, 50), ("books", df, 50)), "id")
    val web = m.filter($"source" === "web").select("id").as[Long].collect().toSet
    val books = m.filter($"source" === "books").select("id").as[Long].collect().toSet
    // identical id spaces, same rate: salted draws must NOT pick the same set
    assert(web !== books)
    // and each is an unbiased-ish half at n=1000
    assert(web.size > 400 && web.size < 600)
    assert(books.size > 400 && books.size < 600)
  }

  test("mixture is deterministic and rejects out-of-range rates") {
    val a = Split.mixture(Seq(("w", df, 25)), "id").select("id").as[Long].collect().sorted.toSeq
    val b = Split.mixture(Seq(("w", df.repartition(9), 25)), "id")
      .select("id").as[Long].collect().sorted.toSeq
    assert(a === b)
    intercept[IllegalArgumentException] {
      Split.mixture(Seq(("w", df, 101)), "id")
    }
  }

  test("weightedSample keep rate tracks the weight and is deterministic") {
    // constant weight 0.3 over 1000 ids → keep ≈ 300, exactly reproducible
    val a = Split.weightedSample(df, "id", lit(0.3))
      .select("id").as[Long].collect().sorted.toSeq
    val b = Split.weightedSample(df.repartition(7), "id", lit(0.3))
      .select("id").as[Long].collect().sorted.toSeq
    assert(a === b)
    assert(a.size > 240 && a.size < 360, s"keep rate off: ${a.size}/1000")
    // weight 0 keeps nothing, weight 1 keeps everything
    assert(Split.weightedSample(df, "id", lit(0.0)).count() === 0L)
    assert(Split.weightedSample(df, "id", lit(1.0)).count() === 1000L)
  }

  test("weightedSample with a per-row weight biases keeps toward high weights") {
    val w = when($"id" < 500L, lit(0.9)).otherwise(lit(0.1))
    val kept = Split.weightedSample(df, "id", w)
      .select("id").as[Long].collect()
    val lo = kept.count(_ < 500L)
    val hi = kept.length - lo
    assert(lo > hi * 3, s"bias missing: $lo low-id vs $hi high-id keeps")
  }

  test("assignByCluster: every member of a cluster shares one split label") {
    // clusters {1,2,3}, {10,11}; the rest singletons
    val members = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("id", "cluster_id")
    val out = Split.assignByCluster(df, "id", members,
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
    val labels = out.filter($"id".isin(1L, 2L, 3L))
      .select("split").distinct().as[String].collect()
    assert(labels.length === 1, "cluster {1,2,3} straddles splits")
    val labels2 = out.filter($"id".isin(10L, 11L))
      .select("split").distinct().as[String].collect()
    assert(labels2.length === 1, "cluster {10,11} straddles splits")
    assert(out.count() === 1000L, "membership join must not drop or dup docs")
  }

  test("assignByCluster: singletons get BIT-IDENTICAL labels to assign") {
    val members = Seq((1L, 1L), (2L, 1L)).toDF("id", "cluster_id")
    val byCluster = Split.assignByCluster(df, "id", members,
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .filter(!$"id".isin(1L, 2L))
      .select("id", "split").as[(Long, String)].collect().sortBy(_._1).toSeq
    val byId = Split.assign(df, "id", Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .filter(!$"id".isin(1L, 2L))
      .select("id", "split").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(byCluster === byId,
      "adding a dedup pass must not reshuffle unaffected docs across splits")
  }

  test("assignByCluster keys the label on the cluster id, not the member id") {
    // cluster 500 pulls doc 999 under doc 500's draw
    val members = Seq((999L, 500L), (500L, 500L)).toDF("id", "cluster_id")
    val out = Split.assignByCluster(df, "id", members,
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .filter($"id".isin(500L, 999L))
      .select("id", "split").as[(Long, String)].collect().toMap
    val expect = Split.assign(Seq(500L).toDF("id"), "id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .select("split").as[String].head()
    assert(out(999L) === expect && out(500L) === expect)
  }

  test("assignByCluster refuses non-integral ids instead of silently NULL-splitting") {
    // a string id would cast('long') → NULL in the singleton fallback and
    // every unclustered doc would get split = NULL — fail loudly instead
    val strDocs = Seq(("doc-a", "x"), ("doc-b", "y")).toDF("id", "text")
    val members = Seq((1L, 1L)).toDF("id", "cluster_id")
    val e = intercept[IllegalArgumentException] {
      Split.assignByCluster(strDocs, "id", members,
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
    }
    assert(e.getMessage.contains("integral"))
  }

  test("stratifiedSample is deterministic across runs and partitionings") {
    val a = Split.stratifiedSample(df, "lang", "id", 0.05)
      .select("id").as[Long].collect().sorted.toSeq
    val b = Split.stratifiedSample(df.repartition(13), "lang", "id", 0.05)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a === b)
  }

  test("weightedTopK matches an independent Scala evaluation of the same keys") {
    val df = (1L to 200L).map(i => (i, 0.5 + (i % 7))).toDF("id", "w")
    val got = Split.weightedTopK(df, "id", col("w"), k = 25)
      .select("id").as[Long].collect().sorted.toSeq
    def draw32(id: Long): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8"))
          .take(4).map("%02x".format(_)).mkString, 16)
    val expect = (1L to 200L).map { i =>
      val u = (draw32(i).toDouble + 1.0) / 4294967296.0
      val key = BigDecimal(math.log(u) / (0.5 + (i % 7)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (i, key)
    }.sortBy { case (i, k) => (-k, i) }.take(25).map(_._1).sorted
    assert(got === expect)
  }

  test("weightedTopK returns exactly k rows and is partitioning-invariant") {
    val df = (1L to 500L).map(i => (i, 1.0 + (i % 3))).toDF("id", "w")
    val a = Split.weightedTopK(df, "id", col("w"), k = 40)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a.size === 40)
    val b = Split.weightedTopK(df.repartition(17), "id", col("w"), k = 40)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a === b)
  }

  test("weightedTopK: dominant weights always win; w <= 0 and null never sampled") {
    val heavy = (1L to 5L).map(i => (i, 1e9))
    val light = (6L to 100L).map(i => (i, 1e-9))
    val junk = Seq((101L, 0.0), (102L, -1.0))
    val df = (heavy ++ light ++ junk).toDF("id", "w")
    val got = Split.weightedTopK(df, "id", col("w"), k = 5)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got === (1L to 5L), s"heavy rows must take every seat: $got")
    val all = Split.weightedTopK(df, "id", col("w"), k = 200)
      .select("id").as[Long].collect().toSet
    assert(!all.contains(101L) && !all.contains(102L))
  }

  test("weightedTopK inclusion rate tracks weight (2x weight ~ 2x the seats)") {
    val df = (1L to 4000L).map(i => (i, if (i <= 2000) 2.0 else 1.0)).toDF("id", "w")
    val picked = Split.weightedTopK(df, "id", col("w"), k = 600)
      .select("id").as[Long].collect()
    val heavyShare = picked.count(_ <= 2000L).toDouble / picked.length
    assert(heavyShare > 0.55 && heavyShare < 0.78,
      s"expected ~2/3 of seats for the double-weight half, got $heavyShare")
  }

  test("weightedTopK plan is a per-partition top-k merge, not a global sort") {
    val df = (1L to 100L).map(i => (i, 1.0)).toDF("id", "w")
    val plan = Split.weightedTopK(df, "id", col("w"), k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$plan")
  }

  test("temperatureMixture: alpha = 1 keeps every source at the same rate") {
    val a = (1L to 900L).map(i => (i, "big"))
    val b = (1001L to 1100L).map(i => (i, "small"))
    def src(rows: Seq[(Long, String)]) = rows.toDF("id", "source").drop("source")
    val out = Split.temperatureMixture(
      Seq("big" -> src(a), "small" -> src(b)), "id", alpha = 1.0, targetRows = 500)
    val rates = out.select("source", "keep_rate").distinct()
      .as[(String, Double)].collect().toMap
    // α=1: rate_s = (n_s/N)·T/n_s = T/N for every source
    assert(rates("big") === rates("small"))
    assert(math.abs(rates("big") - 0.5) < 1e-6)
  }

  test("temperatureMixture: low alpha upsamples the tail source") {
    val a = (1L to 2000L).map(Tuple1(_))
    val b = (10001L to 10100L).map(Tuple1(_))
    val out = Split.temperatureMixture(
      Seq("head" -> a.toDF("id"), "tail" -> b.toDF("id")),
      "id", alpha = 0.3, targetRows = 600)
    val rates = out.select("source", "keep_rate").distinct()
      .as[(String, Double)].collect().toMap
    assert(rates("tail") > rates("head"),
      s"flattening must favor the small source: $rates")
    // and the realized keep fraction tracks the rate
    val kept = out.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(math.abs(kept("head").toDouble / 2000 - rates("head")) < 0.05)
  }

  test("temperatureMixtureByColumn is row-identical to the per-frame variant") {
    val rows = (1L to 600L).map(i =>
      (i, if (i % 7 == 0) "books" else if (i % 3 == 0) "code" else "web"))
    val df = rows.toDF("id", "source")
    val byCol = Split.temperatureMixtureByColumn(df, "id", "source", 0.4, 250)
      .select("id", "source", "keep_rate")
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    val names = rows.map(_._2).distinct.sorted
    val perFrame = Split.temperatureMixture(
      names.map(n => n -> df.filter($"source" === n).drop("source")),
      "id", 0.4, 250)
      .select("id", "source", "keep_rate")
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(byCol === perFrame)
  }

  test("temperatureMixtureByColumn excludes null source labels consistently") {
    // a null label must neither NPE the rate collect nor skew the rates —
    // the result equals the mixture over the non-null slice
    val rows = (1L to 300L).map(i =>
      (i, if (i % 5 == 0) null else if (i % 2 == 0) "a" else "b"))
    val df = rows.toDF("id", "source")
    val got = Split.temperatureMixtureByColumn(df, "id", "source", 0.5, 100)
      .select("id", "source", "keep_rate")
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    val clean = Split.temperatureMixtureByColumn(
      df.filter($"source".isNotNull), "id", "source", 0.5, 100)
      .select("id", "source", "keep_rate")
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(got === clean)
    assert(got.forall(_._2 != null))
  }

  test("temperatureMixture is deterministic and rejects bad parameters") {
    val df = (1L to 50L).map(Tuple1(_)).toDF("id")
    val r1 = Split.temperatureMixture(Seq("s" -> df), "id", 0.5, 25)
      .select("id").as[Long].collect().sorted.toSeq
    val r2 = Split.temperatureMixture(Seq("s" -> df), "id", 0.5, 25)
      .select("id").as[Long].collect().sorted.toSeq
    assert(r1 === r2)
    intercept[IllegalArgumentException] {
      Split.temperatureMixture(Seq("s" -> df), "id", 0.0, 25)
    }
    intercept[IllegalArgumentException] {
      Split.temperatureMixture(Seq.empty, "id", 0.5, 25)
    }
  }

  test("weightedTopK refuses a driver-breaking k") {
    val df = Seq((1L, 1.0)).toDF("id", "w")
    val e = intercept[IllegalArgumentException] {
      Split.weightedTopK(df, "id", col("w"), k = (1 << 22) + 1)
    }
    assert(e.getMessage.contains("selectByBudget"))
  }

  test("a constant-weight md5 sample preserves quantiles within sampling error") {
    import org.apache.spark.sql.functions.{expr, lit}
    // 40k rows of a known uniform distribution: value = i / 40000
    val df = (0 until 40000).map(i => (i.toLong, i / 40000.0)).toDF("id", "v")
    val sampled = Split.weightedSample(df, "id", lit(0.25), salt = "ps")
    val n = sampled.count()
    // deterministic sample near the nominal rate
    assert(math.abs(n - 10000) < 500, s"sample size $n far from 10000")
    val p = sampled.agg(expr("percentile(v, 0.5)")).head().getDouble(0)
    // true median 0.5; sampling std at n~10k is ~0.005 for U(0,1)
    assert(math.abs(p - 0.5) < 0.02, s"sampled median $p drifted")
    // and the sample is bit-stable across evaluations
    assert(Split.weightedSample(df, "id", lit(0.25), salt = "ps").count() === n)
  }
}
