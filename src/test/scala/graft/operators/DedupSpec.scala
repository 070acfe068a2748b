package graft.operators

import graft.SparkSpec
import graft.functions.{Sim, Text}
import org.apache.spark.sql.functions._
import scala.util.Random

/** Near-dup detection on planted duplicates (the synthetic corpus has no
  * natural near-dups, so these suites construct them).
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def corpus: Seq[(Long, String)] = {
    val rnd = new Random(42)
    val vocab = Vector("spark", "query", "table", "scan", "merge", "join", "filter",
      "group", "sort", "window", "hash", "batch", "row", "value", "data", "key")
    val base = (0L until 60L).map { i =>
      i -> Seq.fill(30)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    // plant near-dups: 100..102 are light edits of docs 0..2
    val dups = (0L until 3L).map { i =>
      (100L + i) -> (base(i.toInt)._2.split(" ").updated(5, "EDITED").mkString(" "))
    }
    // plant one exact dup of doc 3
    base ++ dups :+ (200L -> base(3)._2)
  }

  private lazy val docs = corpus.toDF("doc_id", "text").cache()

  test("exact dedup groups identical texts") {
    val d = Dedup.exact(docs, "doc_id", "text")
    val dupGroups = d.filter($"dup_count" > 1).collect()
    assert(dupGroups.length === 1)
    assert(dupGroups.head.getAs[Long]("keep_id") === 3L)
    assert(d.count() === 63) // 64 docs, one merged pair
  }

  test("span dedup keeps first occurrence corpus-wide and reassembles in order") {
    def span(c: Char) = Seq.fill(10)(c.toString).mkString(" ")
    val d = Seq(
      (1L, span('a') + " " + span('b')),
      (2L, span('a') + " " + span('c')), // span a already seen in doc 1
      (3L, span('b'))) // entirely boilerplate → doc vanishes
      .toDF("doc_id", "text")
    val got = Dedup.dedupSpans(d, "doc_id", "text", spanTokens = 10)
      .as[(Long, String)].collect().toMap
    assert(got === Map(
      1L -> (span('a') + " " + span('b')),
      2L -> span('c')))
  }

  test("span dedup: partial tail chunks round-trip when nothing duplicates") {
    val d = Seq(
      (1L, (1 to 15).map(i => s"t$i").mkString(" ")), // 10-chunk + 5-tail
      (2L, (1 to 7).map(i => s"u$i").mkString(" ")))  // single short chunk
      .toDF("doc_id", "text")
    val got = Dedup.dedupSpans(d, "doc_id", "text", spanTokens = 10)
      .as[(Long, String)].collect().toMap
    assert(got === Map(
      1L -> (1 to 15).map(i => s"t$i").mkString(" "),
      2L -> (1 to 7).map(i => s"u$i").mkString(" ")))
  }

  test("span dedup: a duplicated middle span closes ranks on reassembly") {
    def span(c: Char) = Seq.fill(10)(c.toString).mkString(" ")
    val d = Seq(
      (1L, span('x')),
      (2L, Seq(span('p'), span('x'), span('q')).mkString(" ")))
      .toDF("doc_id", "text")
    val got = Dedup.dedupSpans(d, "doc_id", "text", spanTokens = 10)
      .as[(Long, String)].collect().toMap
    assert(got(2L) === span('p') + " " + span('q'),
      "survivors must keep their relative order with the duplicate removed")
  }

  test("incrementalExact admits only history-unseen texts, dedupes the batch") {
    val history = Seq(1L -> "seen before", 2L -> "also seen").toDF("doc_id", "text")
    val batch = Seq(
      10L -> "seen before",   // history dup → rejected
      11L -> "brand new",     // fresh → admitted
      12L -> "brand new",     // in-batch dup → merged into 11
      13L -> "another fresh") // fresh → admitted
      .toDF("doc_id", "text")
    val got = Dedup.incrementalExact(batch, history, "doc_id", "text")
      .select("keep_id", "batch_count").as[(Long, Long)].collect().toSet
    assert(got === Set((11L, 2L), (13L, 1L)))
  }

  test("incrementalExact never shuffles or broadcasts the history side") {
    val history = docs
    val batch = Seq(999L -> "tiny batch").toDF("doc_id", "text")
    val p = Dedup.incrementalExact(batch, history, "doc_id", "text")
      .queryExecution.executedPlan.toString
    // every hash-partition shuffle is either inside a broadcast build
    // (batch-key / seen-key distinct) or the final batch-sized aggregate;
    // the history lineage reaches its semi join as a bare scan
    val topLevel = topLevelHashExchanges(p)
    assert(topLevel.size === 1, s"history-side shuffle in:\n$p")
    assert(topLevel.head.contains("text_hash"),
      "the sole top-level shuffle must be the batch aggregate")
  }

  test("incrementalExactBloom: byte-identical to the exact path") {
    val history = docs
    val batch = docs.filter($"doc_id" % 7 === 0)
      .select(($"doc_id" + 500).as("doc_id"),
        // half the batch duplicates history, half is fresh
        when($"doc_id" % 14 === 0, $"text")
          .otherwise(concat(lit("FRESH "), $"text")).as("text"))
    val exact = Dedup.incrementalExact(batch, history, "doc_id", "text")
      .orderBy($"text_hash").collect().toSeq
    val bloom = Dedup.incrementalExactBloom(batch, history, "doc_id", "text",
      expectedItems = 256).orderBy($"text_hash").collect().toSeq
    assert(bloom === exact)
    assert(bloom.nonEmpty)
  }

  test("incrementalExactBloom plants might_contain in the history scan; empty batch is safe") {
    val history = docs
    val batch = Seq(999L -> "tiny batch").toDF("doc_id", "text")
    val plan = Dedup.incrementalExactBloom(batch, history, "doc_id", "text", 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no bloom probe in:\n$plan")
    val empty = Dedup.incrementalExactBloom(
      batch.filter($"doc_id" < 0), history, "doc_id", "text", 64)
    assert(empty.count() === 0)
  }

  test("incrementalNearDup flags batch docs near ANY history doc, not batch pairs") {
    val history = docs.filter($"doc_id" < 60) // base corpus only
    // batch: one light edit of history doc 0, one fresh doc, and a pair of
    // near-identical fresh docs (near each other, NOT near history)
    val fresh = Seq.fill(30)("zebra").mkString(" ")
    val batch = Seq(
      300L -> corpus.head._2.split(" ").updated(7, "EDITED").mkString(" "),
      301L -> fresh,
      302L -> fresh.split(" ").updated(3, "yak").mkString(" "))
      .toDF("doc_id", "text")
    val got = Dedup.incrementalNearDup(batch, history, "doc_id", "text",
      shingleN = 2, numHashes = 64, bands = 16, threshold = 0.5)
      .select("id_b").as[Long].collect().toSet
    assert(got === Set(300L), s"only the history-near doc should flag: $got")
  }

  test("minhash LSH finds planted near-dups without O(n²) compare") {
    val rows = Dedup.minhashLsh(docs, "doc_id", "text",
      shingleN = 2, numHashes = 64, bands = 16, threshold = 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    val pairs = rows.toSet
    assert(rows.length === pairs.size,
      "a pair colliding in several bands must be emitted exactly once")
    (0L until 3L).foreach { i =>
      assert(pairs.contains((i, 100L + i)), s"planted pair ($i, ${100 + i}) missed")
    }
    assert(pairs.contains((3L, 200L)), "exact dup pair missed")
  }

  test("minhash jaccard estimate tracks exact jaccard") {
    val withSets = docs.select($"doc_id",
      Sim.shingles($"text", 2).as("grams"),
      Sim.minHash(Sim.shingles($"text", 2), 128).as("sig"))
    val a = withSets.filter($"doc_id" === 0).select($"grams", $"sig").head()
    val b = withSets.filter($"doc_id" === 100).select($"grams", $"sig").head()
    val exact = a.getSeq[String](0).toSet.intersect(b.getSeq[String](0).toSet).size.toDouble /
      a.getSeq[String](0).toSet.union(b.getSeq[String](0).toSet).size
    val est = a.getSeq[Long](1).zip(b.getSeq[Long](1)).count { case (x, y) => x == y } / 128.0
    assert(math.abs(exact - est) < 0.15, s"exact=$exact est=$est")
  }

  test("simhash: near-dups within small hamming distance, others far") {
    val hashed = docs.select($"doc_id", Sim.simHash(Text.tokens($"text")).as("sh"))
    val h = hashed.as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(3L), h(200L)) === 0, "identical docs → identical simhash")
    val dupDist = ham(h(0L), h(100L))
    val randDist = ham(h(0L), h(50L))
    assert(dupDist < randDist, s"dup=$dupDist rand=$randDist")
  }

  test("simhash banded pair join finds near pairs, each exactly once") {
    val rows = Dedup.simhash(docs, "doc_id", "text", maxHamming = 3)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    val pairs = rows.toSet
    // identical docs collide in ALL chunks — emitted once regardless
    assert(rows.length === pairs.size,
      "a pair colliding in several chunks must be emitted exactly once")
    assert(pairs.contains((3L, 200L)))
  }

  test("embedding cosine LSH finds planted near-identical vectors") {
    val rnd = new Random(7)
    val base = (0 until 40).map(i => (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat)))
    val planted = base.take(3).map { case (i, v) =>
      (100L + i, v.zipWithIndex.map { case (x, j) => if (j == 0) x + 0.01f else x })
    }
    val emb = (base ++ planted).toDF("vec_id", "embedding")
    val rows = Dedup.embeddingCosine(emb, "vec_id", "embedding", threshold = 0.98)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    val pairs = rows.toSet
    // near-identical vectors land in the same bucket in every table —
    // emitted once via the first-collision rule, never deduped by shuffle
    assert(rows.length === pairs.size,
      "a pair colliding in several tables must be emitted exactly once")
    (0 until 3).foreach { i =>
      assert(pairs.contains((i.toLong, 100L + i)), s"planted vector pair $i missed")
    }
  }

  test("ngram jaccard pairs: exact scores, only sharing docs meet") {
    val pairs = Dedup.ngramJaccard(docs, "doc_id", "text", n = 2, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((3L, 200L)))
    val exactPair = pairs.find(p => p._1 == 3L && p._2 == 200L).get
    assert(exactPair._3 === 1.0)
  }

  test("ngram jaccard df-cutoff above corpus max df is a no-op") {
    val plain = Dedup.ngramJaccard(docs, "doc_id", "text", n = 2, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    // 64 docs → no gram can appear in more than 64 of them
    val capped = Dedup.ngramJaccard(docs, "doc_id", "text", n = 2, threshold = 0.5,
      maxDf = 64L)
      .as[(Long, Long, Double)].collect().toSet
    assert(capped === plain)
  }

  test("ngram jaccard df-cutoff drops stop-gram hot buckets") {
    // "the" appears in every doc (the quadratic bucket); rare grams don't
    val stopDocs = Seq(
      1L -> "the alpha beta gamma",
      2L -> "the alpha beta delta",
      3L -> "the omega psi chi",
      4L -> "the mu nu xi").toDF("doc_id", "text")
    val plain = Dedup.ngramJaccard(stopDocs, "doc_id", "text", n = 1, threshold = 0.1)
      .as[(Long, Long, Double)].collect().toSet
    // without a cutoff every pair meets through "the"
    assert(plain.map(p => (p._1, p._2)) === Set(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
    val capped = Dedup.ngramJaccard(stopDocs, "doc_id", "text", n = 1, threshold = 0.1,
      maxDf = 3L)
      .as[(Long, Long, Double)].collect().toSet
    // with df("the")=4 > 3 dropped, only the genuinely-overlapping pair
    // remains, scored over the filtered gram sets: |{alpha,beta}| / |{alpha,
    // beta,gamma,delta}| = 0.5
    assert(capped === Set((1L, 2L, 0.5)))
  }
}

class AnnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001").cache()

  test("knnJoin equals per-query brute force") {
    val queries = emb.filter($"vec_id" < 3)
    val corpus = emb.filter($"vec_id" >= 3)
    val got = Ann.knnJoin(queries, corpus, "vec_id", "embedding", 4)
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
    assert(got.keySet === Set(0L, 1L, 2L))
    got.foreach { case (qid, neighbors) =>
      val qv = emb.filter($"vec_id" === qid)
        .select($"embedding".cast("array<double>")).head().getSeq[Double](0).toIndexedSeq
      val brute = Ann.bruteForceTopK(corpus, "vec_id", "embedding", qv, 4)
        .as[(Long, Double)].collect().toSet
      assert(neighbors === brute, s"query $qid disagrees with brute force")
    }
  }

  test("knnJoin returns exactly k rows per query") {
    val counts = Ann.knnJoin(emb.filter($"vec_id" < 5), emb.filter($"vec_id" >= 5),
        "vec_id", "embedding", 7)
      .groupBy("query_id").count().as[(Long, Long)].collect().toMap
    assert(counts.size === 5 && counts.values.forall(_ === 7L))
  }

  test("centroidsByGroup: flat per-dim means match hand computation") {
    val vecs = Seq(
      (1L, 0, Array(1.0f, 2.0f, 3.0f)),
      (2L, 0, Array(3.0f, 0.0f, 1.0f)),
      (3L, 1, Array(10.0f, -2.0f, 4.0f)))
      .toDF("vec_id", "label", "embedding")
    val got = Ann.centroidsByGroup(vecs, "label", "embedding")
      .as[(Int, Int, Double, Long)].collect()
      .map { case (l, d, m, n) => ((l, d), (m, n)) }.toMap
    assert(got === Map(
      (0, 0) -> (2.0, 2L), (0, 1) -> (1.0, 2L), (0, 2) -> (2.0, 2L),
      (1, 0) -> (10.0, 1L), (1, 1) -> (-2.0, 1L), (1, 2) -> (4.0, 1L)))
    // shuffle payload is groups×dim aggregates: partial aggregation present
    val plan = Ann.centroidsByGroup(vecs, "label", "embedding")
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial"), s"no map-side partial agg in:\n$plan")
  }

  test("centroidOutliers picks the least-centroid-similar vector per group") {
    val vecs = Seq(
      (1L, 0, Array(1.0f, 0.0f)),
      (2L, 0, Array(1.0f, 0.0f)),
      (3L, 0, Array(0.0f, 1.0f)),
      (4L, 1, Array(0.0f, 2.0f)))
      .toDF("vec_id", "label", "embedding")
    // label 0 centroid (4-dp-snapped): (round(2/3), round(1/3))
    val (cx, cy) = (0.6667, 0.3333)
    def snap(d: Double) =
      BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val cosV3 = snap(cy / math.sqrt(cx * cx + cy * cy))
    val got = Ann.centroidOutliers(vecs, "vec_id", "label", "embedding", 1)
      .as[(Int, Long, Double)].collect().toSet
    // label 0: v3 is the stray; label 1: its only member matches exactly
    assert(got === Set((0, 3L, cosV3), (1, 4L, 1.0)))
  }

  test("centroidOutliers plan: centroid fold broadcasts, bottom-k is group-limited") {
    val vecs = Seq((1L, 0, Array(1.0f, 0.0f)), (2L, 0, Array(0.0f, 1.0f)))
      .toDF("vec_id", "label", "embedding")
    val plan = Ann.centroidOutliers(vecs, "vec_id", "label", "embedding", 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"centroid join must broadcast:\n$plan")
    assert(plan.contains("WindowGroupLimit"), s"no pre-shuffle top-k prune in:\n$plan")
  }

  test("hardNegatives returns only wrong-label neighbors, ranked like knnJoin") {
    val queries = emb.filter($"vec_id" < 5)
    val corpus = emb.filter($"vec_id" >= 5)
    val got = Ann.hardNegatives(queries, corpus, "vec_id", "embedding", "label", 5)
      .as[(Long, Long, Double)].collect()
    assert(got.map(_._1).toSet === Set(0L, 1L, 2L, 3L, 4L))
    assert(got.groupBy(_._1).values.forall(_.length === 5))
    val labels = emb.select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    got.foreach { case (q, n, _) =>
      assert(labels(q) !== labels(n), s"neighbor $n shares query $q's label")
    }
    // equals knnJoin run against the pre-filtered wrong-label corpus
    got.groupBy(_._1).foreach { case (q, rows) =>
      val filtered = corpus.filter($"label" =!= labels(q))
      val viaKnn = Ann.knnJoin(queries.filter($"vec_id" === q), filtered,
        "vec_id", "embedding", 5).as[(Long, Long, Double)].collect().toSet
      assert(rows.toSet === viaKnn)
    }
  }

  test("brute-force top-k is ordered and self-consistent") {
    val q = emb.filter($"vec_id" === 1).select($"embedding".cast("array<double>"))
      .head().getSeq[Double](0).toIndexedSeq
    val top = Ann.bruteForceTopK(emb, "vec_id", "embedding", q, 5).collect()
    assert(top.length === 5)
    assert(top.head.getAs[Long]("vec_id") === 1L, "query vector is its own nearest neighbor")
    val sims = top.map(_.getAs[Double]("cos"))
    assert(sims.sameElements(sims.sortBy(-_)))
  }

  test("IVF assignment persisted partitionBy(centroid_id) prunes probe scans") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivf").toString + "/idx"
    val centroids = Ann.seedCentroids(emb, "vec_id", "embedding", 8)
    Ann.ivfAssign(emb, "vec_id", "embedding", centroids)
      .write.partitionBy("centroid_id").parquet(tmp)
    val index = spark.read.parquet(tmp)
    val probed = index.filter($"centroid_id".isin(0, 1))
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("centroid_id") && probed.count() > 0)
    // partition pruning: only 2 of 8 directories are read
    val scanned = probed.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(!scanned.contains("centroid_id=5") || scanned.contains("PartitionFilters"))
  }

  test("Lloyd step tightens clusters and never degrades assignment quality") {
    val seeds = Ann.seedCentroids(emb, "vec_id", "embedding", 8)
    val assigned0 = Ann.ivfAssign(emb, "vec_id", "embedding", seeds).cache()

    // mean cosine of each vector to its assigned centroid, for a given book
    def meanSim(assigned: org.apache.spark.sql.DataFrame,
        cents: Seq[(Int, Seq[Double])]): Double = {
      val simCols = cents.map { case (cid, c) =>
        org.apache.spark.sql.functions.when($"centroid_id" === cid,
          graft.exprs.CosineSim($"embedding",
            org.apache.spark.sql.functions.array(c.map(
              org.apache.spark.sql.functions.lit): _*)))
      }
      assigned.select(org.apache.spark.sql.functions.coalesce(simCols: _*).as("s"))
        .agg(org.apache.spark.sql.functions.avg($"s")).head().getDouble(0)
    }

    val refined = Ann.lloydStep(assigned0, "embedding")
    assert(refined.nonEmpty && refined.forall(_._2.length === 64))
    val assigned1 = Ann.ivfAssign(emb, "vec_id", "embedding", refined)
    val before = meanSim(assigned0, seeds)
    val after = meanSim(assigned1, refined)
    assert(after >= before - 1e-9,
      s"Lloyd step degraded mean centroid similarity: $before -> $after")
  }

  test("IVF probe achieves high recall vs brute force at nProbe=4") {
    val centroids = Ann.seedCentroids(emb, "vec_id", "embedding", 8)
    val assigned = Ann.ivfAssign(emb, "vec_id", "embedding", centroids).cache()
    assert(assigned.select($"centroid_id").distinct().count() === 8)
    val q = emb.filter($"vec_id" === 2).select($"embedding".cast("array<double>"))
      .head().getSeq[Double](0).toIndexedSeq
    val exact = Ann.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
      .select($"vec_id").as[Long].collect().toSet
    val approx = Ann.ivfTopK(assigned, "vec_id", "embedding", centroids, q, 10, nProbe = 4)
      .select($"vec_id").as[Long].collect().toSet
    assert(exact.intersect(approx).size >= 3,
      s"IVF recall too low: ${exact.intersect(approx).size}/10")
  }

  test("semDedup drops planted near-identical copies, keeps the originals") {
    val base = emb.select($"vec_id", $"embedding")
    val copies = base.select(($"vec_id" + 100000L).as("vec_id"),
      org.apache.spark.sql.functions.transform($"embedding",
        x => x * org.apache.spark.sql.functions.lit(1.001f)).as("embedding"))
    val cents = Ann.seedCentroids(base, "vec_id", "embedding", 8)
    val assigned = Ann.ivfAssign(base.union(copies), "vec_id", "embedding", cents)
    val survivors = Ann.semDedup(assigned, "vec_id", "embedding", threshold = 0.95)
      .select($"vec_id").as[Long].collect().toSet
    val baseIds = base.select($"vec_id").as[Long].collect().toSet
    // every copy (cos ≈ 1 with its lower-id original, same IVF cell by
    // scale-invariance of cosine) drops; the natural corpus (max pairwise
    // cos ≈ 0.51) survives untouched
    assert(survivors === baseIds)
  }

  test("semDedup keep-lowest rule is exists-based within a cell") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(1.0f, 0.01f)),   // near-dup of 1 → dropped
      (3L, Array(1.0f, 0.02f)),   // near-dup of both → dropped (exists rule)
      (4L, Array(0.0f, 1.0f)))    // orthogonal survivor
      .toDF("vec_id", "embedding")
      .withColumn("centroid_id", org.apache.spark.sql.functions.lit(0))
    val got = Ann.semDedup(vecs, "vec_id", "embedding", threshold = 0.99)
      .select($"vec_id").as[Long].collect().sorted
    assert(got === Array(1L, 4L))
  }

  test("int8 quantization: bounded reconstruction error, zero-vector guard") {
    val q = Ann.quantizeInt8(emb, "vec_id", "embedding")
      .select($"vec_id", $"qvec", $"scale",
        $"qvec".cast("array<int>").as("qi"))
    assert(q.schema("qvec").dataType.simpleString === "array<tinyint>")
    val rows = q.join(emb, "vec_id")
      .select($"vec_id", $"qi", $"scale", $"embedding".cast("array<double>").as("v"))
      .as[(Long, Seq[Int], Double, Seq[Double])].collect()
    rows.foreach { case (id, qi, scale, v) =>
      assert(qi.forall(x => x >= -127 && x <= 127), s"vec $id out of int8 range")
      // dequantized element error is at most half a quantization step
      v.zip(qi).foreach { case (x, qx) =>
        assert(math.abs(qx * scale / 127.0 - x) <= scale / 254.0 + 1e-12,
          s"vec $id reconstruction error above bound")
      }
    }
    // a zero vector quantizes to zeros and scores 0.0, never NaN
    val z = Seq((99L, Array.fill(4)(0.0f))).toDF("vec_id", "embedding")
    val zq = Ann.quantizeInt8(z, "vec_id", "embedding")
    val (zs, zv) = zq.select($"scale", $"qvec".cast("array<int>"))
      .as[(Double, Seq[Int])].head()
    assert(zs === 0.0 && zv.forall(_ === 0))
    val zcos = Ann.bruteForceTopKQuantized(zq, "vec_id", Seq(1, 2, 3, 4), 1)
      .select($"cos").as[Double].head()
    assert(zcos === 0.0)
  }

  test("int8 quantized top-k recall vs float brute force") {
    val qv = emb.filter($"vec_id" === 2).select($"embedding".cast("array<double>"))
      .head().getSeq[Double](0).toIndexedSeq
    val exact = Ann.bruteForceTopK(emb.filter($"vec_id" =!= 2), "vec_id", "embedding", qv, 10)
      .select($"vec_id").as[Long].collect().toSet
    val quantized = Ann.quantizeInt8(emb.filter($"vec_id" =!= 2), "vec_id", "embedding")
    val got = Ann.bruteForceTopKQuantized(quantized, "vec_id", Ann.quantizeVec(qv), 10)
      .select($"vec_id").as[Long].collect().toSet
    // int8 keeps ~1e-3 cosine fidelity: the top-10 sets should mostly agree
    assert(exact.intersect(got).size >= 8,
      s"quantized recall too low: ${exact.intersect(got).size}/10")
  }

  test("CosineSimInt matches CosineSim on identical integer-valued vectors") {
    val vecs = Seq(
      (1L, Array(3, -5, 7, 0), Array(3.0, -5.0, 7.0, 0.0)),
      (2L, Array(-127, 127, 1, -1), Array(-127.0, 127.0, 1.0, -1.0)))
      .toDF("id", "qa", "da")
    val qlit = org.apache.spark.sql.functions.array(Seq(2, 4, -6, 8).map(v =>
      org.apache.spark.sql.functions.lit(v)): _*)
    val dlit = org.apache.spark.sql.functions.array(Seq(2.0, 4.0, -6.0, 8.0).map(v =>
      org.apache.spark.sql.functions.lit(v)): _*)
    val both = vecs.select(
      graft.exprs.CosineSimInt($"qa", qlit).as("ci"),
      graft.exprs.CosineSim($"da", dlit).as("cd"))
      .as[(Double, Double)].collect()
    both.foreach { case (ci, cd) => assert(math.abs(ci - cd) < 1e-12) }
  }

  // ------------------------------------------------- edit-distance near-dup

  test("editDistancePairs: finds within-band pairs, honors maxDist and blocking") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),  // dist 3, same prefix
      (3L, "the quick brown fox leaps over sleepy dogs!!"), // > maxDist from 1
      (4L, "a completely different opening sentence here")  // different prefix
    ).toDF("doc_id", "text")
    val pairs = Dedup.editDistancePairs(docs, "doc_id", "text", 3, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq === Seq((1L, 2L, 3)))
  }

  test("editDistancePairs: length band prunes before levenshtein; maxBucket drops hot prefixes") {
    import spark.implicits._
    val base = "shared prefix here "
    val hot = (1L to 20L).map(i => (i, base + ("x" * i.toInt)))
    val docs = (hot :+ ((100L, "unique opening text a")) :+ ((101L, "unique opening text b"))).toDF("doc_id", "text")
    // cap 10 drops the 20-doc hot prefix bucket entirely; the pair in the
    // small bucket survives
    val pairs = Dedup.editDistancePairs(docs, "doc_id", "text", 2, 12, maxBucket = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((100L, 101L)))
  }
}
