package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The hot-bucket hazard the affine-bijection ScaleUp corpora cannot
  * exercise: a duplicate CLIQUE (mirror pages, boilerplate templates —
  * routine in web corpora) collides in EVERY LSH band, so a pair-exact
  * bucket self-join emits O(c²) candidates from one bucket. These tests
  * plant a power-law clique corpus (one big clique + a Zipf tail) and
  * prove the `maxBucket` guard's contract:
  *
  *  - with no hot bucket, capped mode is row-identical to pair-exact;
  *  - on the planted corpus, capped volume is O(c) where pair-exact is
  *    O(c²) (counted, not asserted);
  *  - connected components — what the [[Cluster]] consumers build —
  *    are IDENTICAL between the two modes.
  */
class PlantedCliqueSpec extends SparkSpec {
  import spark.implicits._

  /** Power-law duplicate corpus: cliques of identical text with sizes
    * 60, 20, 10, 5, 2 (Zipf-ish), plus distinct singleton docs. Ids are
    * assigned contiguously so each clique's expected cluster is known.
    */
  private def plantedCorpus: Seq[(Long, String)] = {
    val rnd = new scala.util.Random(31)
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo", "fox",
      "golf", "hotel", "india", "juliet", "kilo", "lima", "mike", "nov")
    def text() = Seq.fill(40)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val cliqueSizes = Seq(60, 20, 10, 5, 2)
    var next = 0L
    val cliques = cliqueSizes.flatMap { c =>
      val t = text()
      val members = (0 until c).map { _ => val id = next; next += 1; (id, t) }
      members
    }
    val singles = (0 until 40).map { _ => val id = next; next += 1; (id, text()) }
    cliques ++ singles
  }

  private lazy val docs = plantedCorpus.toDF("doc_id", "text").cache()

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.select(col("id_a"), col("id_b"), col("est_jaccard"))
      .as[(Long, Long, Double)].collect().toSet

  test("with no hot bucket, capped minhashLsh is row-identical to pair-exact") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("spark", "query", "table", "scan", "merge", "join")
    val base = (0L until 40L).map(i => i -> Seq.fill(30)(
      vocab(rnd.nextInt(vocab.size))).mkString(" "))
    // three planted near-dup PAIRS (no clique bigger than 2)
    val dups = (0L until 3L).map(i =>
      (100L + i) -> base(i.toInt)._2.split(" ").updated(3, "EDIT").mkString(" "))
    val df = (base ++ dups).toDF("doc_id", "text")
    val exact = pairSet(Dedup.minhashLsh(df, "doc_id", "text",
      shingleN = 3, numHashes = 16, bands = 8, threshold = 0.5))
    val capped = pairSet(Dedup.minhashLsh(df, "doc_id", "text",
      shingleN = 3, numHashes = 16, bands = 8, threshold = 0.5, maxBucket = 1000))
    assert(exact.nonEmpty, "the fixture must produce pairs")
    assert(capped === exact)
  }

  test("planted clique: capped volume is O(c) where pair-exact is O(c²)") {
    val exact = Dedup.minhashLsh(docs, "doc_id", "text",
      shingleN = 3, numHashes = 16, bands = 8, threshold = 0.5)
    val capped = Dedup.minhashLsh(docs, "doc_id", "text",
      shingleN = 3, numHashes = 16, bands = 8, threshold = 0.5, maxBucket = 8)
    val nExact = exact.count()
    val nCapped = capped.count()
    // pair-exact: 60·59/2 + 20·19/2 + 10·9/2 + 5·4/2 + 1 = 2016 clique pairs
    assert(nExact >= 2016L, s"pair-exact must be quadratic in cliques: $nExact")
    // capped: hot cliques (60, 20, 10) contribute c−1 star edges; small
    // cliques (5, 2) keep exact pairs: 59 + 19 + 9 + 10 + 1 = 98 + noise
    assert(nCapped <= nExact / 8,
      s"capped volume must collapse: capped=$nCapped exact=$nExact")
    assert(nCapped >= 98L, s"every clique must stay represented: $nCapped")
  }

  test("planted clique: connected components are IDENTICAL across modes") {
    def clusters(maxBucket: Int): Map[Long, Long] = {
      val pairs = Dedup.minhashLsh(docs, "doc_id", "text",
        shingleN = 3, numHashes = 16, bands = 8, threshold = 0.5,
        maxBucket = maxBucket)
      Cluster.connectedComponents(pairs)
        .as[(Long, Long)].collect().toMap
    }
    val viaExact = clusters(Int.MaxValue)
    val viaCapped = clusters(8)
    assert(viaExact.nonEmpty)
    assert(viaCapped === viaExact)
    // and the big clique really is one component rooted at its min id
    assert((0L until 60L).forall(id => viaCapped.get(id).contains(0L)),
      "the 60-clique must collapse to cluster 0")
  }

  test("hammingPairs64: capped mode preserves components on a fingerprint clique") {
    // 80 identical fingerprints (a mirror clique), a 3-member near clique
    // at hamming 1, and scattered singles
    val rnd = new scala.util.Random(13)
    val cliqueFp = 0x0123456789ABCDEFL
    val rows =
      (0L until 80L).map(i => (i, cliqueFp)) ++
      Seq((100L, 0x7700FF00FF00FF00L), (101L, 0x7700FF00FF00FF01L),
        (102L, 0x7700FF00FF00FF03L)) ++
      (200L until 230L).map(i => (i, rnd.nextLong() | 0x8000000000000000L))
    val df = rows.toDF("id", "sh")
    val exact = Dedup.hammingPairs64(df, "id", "sh", maxHamming = 3)
    val capped = Dedup.hammingPairs64(df, "id", "sh", maxHamming = 3, maxBucket = 8)
    val nExact = exact.count()
    val nCapped = capped.count()
    assert(nExact >= 80L * 79 / 2, s"exact must be quadratic: $nExact")
    assert(nCapped <= nExact / 8, s"capped must collapse: $nCapped")
    def comp(p: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      Cluster.connectedComponents(p).as[(Long, Long)].collect().toMap
    assert(comp(capped) === comp(exact))
    // hamming values on surviving edges stay exact
    assert(capped.filter(col("hamming") > 3).count() === 0L)
  }

  test("plan shapes: default mode pays NO window stage; capped mode exactly one") {
    val df = docs
    def plan(maxBucket: Int) = Dedup.minhashLsh(df, "doc_id", "text",
      shingleN = 3, numHashes = 16, bands = 8, threshold = 0.5,
      maxBucket = maxBucket).queryExecution.executedPlan.toString
    val exact = plan(Int.MaxValue)
    assert(!exact.contains("Window"),
      "the historical pair-exact plan must stay window-free")
    assert(!exact.contains("BatchEvalPython") && !exact.contains("ScalaUDF"))
    val capped = plan(8)
    // two window EVALUATIONS total: the small-side filter and the star
    // side (size + leader fuse into one Window node per consumer, same
    // partition spec). The join's b side is the un-windowed banded
    // stream — a third evaluation there would be pure waste, since a
    // shared bucket's size is already known from the a side.
    val nWindow = "\\bWindow \\[".r.findAllIn(capped).length
    assert(nWindow === 2, s"capped mode must hold exactly two window evals:\n$capped")
    assert(!capped.contains("CartesianProduct") && !capped.contains("BroadcastNestedLoop"))
  }

  test("embeddingCosine: capped mode collapses an identical-vector clique, same components") {
    // 60 identical embeddings (mirror pages embed identically), two
    // planted near-pairs, scattered far vectors
    val rnd = new scala.util.Random(17)
    def vec(seed: Int): Seq[Float] =
      Seq.tabulate(64)(i => (math.sin(seed * 31 + i) * 2).toFloat)
    val cliqueV = vec(1)
    val rows =
      (0L until 60L).map(i => (i, cliqueV)) ++
      Seq((100L, vec(5)), (101L, vec(5).updated(0, vec(5)(0) + 0.01f))) ++
      (200L until 220L).map(i => (i, vec(i.toInt)))
    val df = rows.toDF("vec_id", "embedding")
    val exact = Dedup.embeddingCosine(df, "vec_id", "embedding", threshold = 0.9)
    val capped = Dedup.embeddingCosine(df, "vec_id", "embedding", threshold = 0.9,
      maxBucket = 8)
    val nExact = exact.count()
    val nCapped = capped.count()
    assert(nExact >= 60L * 59 / 2, s"exact must be quadratic: $nExact")
    assert(nCapped <= nExact / 8, s"capped must collapse: $nCapped")
    def comp(p: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      Cluster.connectedComponents(p, "id_a", "id_b").as[(Long, Long)]
        .collect().toMap
    assert(comp(capped) === comp(exact))
    // and with no hot bucket, capped equals pair-exact row-for-row
    val small = rows.filterNot(_._1 < 55).toDF("vec_id", "embedding")
    def set(d: org.apache.spark.sql.DataFrame) =
      d.as[(Long, Long, Double)].collect().toSet
    assert(set(Dedup.embeddingCosine(small, "vec_id", "embedding", 0.9,
        maxBucket = 1000)) ===
      set(Dedup.embeddingCosine(small, "vec_id", "embedding", 0.9)))
  }

  test("embeddingCosine plan shapes: both modes window-free; capped uses aggregate stats") {
    val rnd = new scala.util.Random(23)
    val df = (0L until 30L).map(i =>
      (i, Seq.tabulate(64)(_ => rnd.nextFloat()))).toDF("vec_id", "embedding")
    def plan(maxBucket: Int) = Dedup.embeddingCosine(df, "vec_id", "embedding",
      threshold = 0.9, maxBucket = maxBucket)
      .queryExecution.executedPlan.toString
    val exact = plan(Int.MaxValue)
    assert(!exact.contains("Window"),
      "the historical pair-exact plan must stay window-free")
    val capped = plan(8)
    // capped mode is window-free too: group stats come from a
    // partial-aggregable groupBy (the clique map-side combines, no
    // per-partition buffering), and only over-cap groups join back
    assert(!capped.contains("Window"),
      s"capped mode must stay window-free (groupBy stats, not a window):\n$capped")
    assert(capped.contains("HashAggregate") || capped.contains("ObjectHashAggregate"),
      s"capped mode must compute group stats via an aggregate:\n$capped")
    assert(!capped.contains("CartesianProduct") && !capped.contains("BroadcastNestedLoop"))
    assert(!capped.contains("BatchEvalPython") && !capped.contains("ScalaUDF"))
  }

  test("capped hamming with NO hot bucket equals pair-exact") {
    val rows = Seq((1L, 0L), (2L, 1L), (3L, 7L), (4L, 0xF0L), (5L, 0xF1L))
    val df = rows.toDF("id", "sh")
    def set(d: org.apache.spark.sql.DataFrame) =
      d.as[(Long, Long, Int)].collect().toSet
    val exact = set(Dedup.hammingPairs64(df, "id", "sh", maxHamming = 3))
    val capped = set(Dedup.hammingPairs64(df, "id", "sh", maxHamming = 3,
      maxBucket = 100))
    assert(exact.nonEmpty)
    assert(capped === exact)
  }
}
