package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VocabSpec extends SparkSpec {
  import spark.implicits._

  test("bpePairCounts: hand-computed pair table, ordered, tie-broken") {
    // words: "abab" → ab, ba, ab ; "abc" → ab, bc ; "x" → none
    val docs = Seq((1L, "abab abc x"), (2L, "abc")).toDF("doc_id", "text")
    val got = Vocab.bpePairCounts(docs, "text", 10)
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(("ab", 4L), ("ba", 1L), ("bc", 2L)).sortBy { case (p, n) => (-n, p) })
  }

  test("bpePairCounts: k bounds the output and keeps the most frequent") {
    val docs = Seq((1L, "aa ab ac ad aa aa ab")).toDF("doc_id", "text")
    val got = Vocab.bpePairCounts(docs, "text", 2).as[(String, Long)].collect()
    assert(got.length === 2)
    assert(got(0) === (("aa", 3L)))
    assert(got(1) === (("ab", 2L)))
  }

  test("bpeTrain: hand-computed 3-step merge schedule with weighted counts") {
    // words: aaab ×2, ab ×1, aa ×1 (12 chars total)
    val docs = Seq((1L, "aaab aaab ab"), (2L, "aa")).toDF("doc_id", "text")
    val got = Vocab.bpeTrain(docs, "text", 3)
      .as[(Int, String, String, Long, Long)].collect().toSeq
    // step 1: (a,a) n = 2·2 + 1 = 5 → aaab→(aa)(a)(b), aa→(aa); 9 tokens
    // step 2: (a,b) n = 2 + 1 = 3 → (aa)(ab) / (ab); 6 tokens
    // step 3: (aa,ab) n = 2 → (aaab); 4 tokens
    assert(got === Seq(
      (1, "a", "a", 5L, 9L),
      (2, "a", "b", 3L, 6L),
      (3, "aa", "ab", 2L, 4L)))
  }

  test("bpeTrain: overlapping pairs count fully but merge greedily") {
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val got = Vocab.bpeTrain(docs, "text", 1)
      .as[(Int, String, String, Long, Long)].collect().toSeq
    // candidate count sees 3 overlapping (a,a) pairs; the greedy replace
    // applies only 2 merges → (aa)(aa), so tokens = 2, not 4 − 3
    assert(got === Seq((1, "a", "a", 3L, 2L)))
  }

  test("bpeTrain: stops early when no pair remains; ties break on pair string") {
    val docs = Seq((1L, "ab cd ab")).toDF("doc_id", "text")
    val got = Vocab.bpeTrain(docs, "text", 10)
      .as[(Int, String, String, Long, Long)].collect().toSeq
    // (a,b) n=2 wins step 1; (c,d) n=1 step 2; then every word is a
    // single symbol — steps 3..10 never run
    assert(got === Seq((1, "a", "b", 2L, 4L), (2, "c", "d", 1L, 3L)))
  }

  test("zipfSlope: two exact power-of-two frequencies give slope −1, intercept ln 4") {
    // a×4, b×2 → ranks 1,2; y = {ln4, ln2}, x = {0, ln2}:
    // slope = (ln2 − ln4)/ln2 = −1 exactly; intercept = 2·ln2
    val docs = Seq((1L, "a a a a b b")).toDF("doc_id", "text")
    val got = Vocab.zipfSlope(docs, "text")
      .as[(Long, Double, Double)].collect().toSeq
    val ln4 = BigDecimal(2 * math.log(2))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === Seq((2L, -1.0, ln4)))
  }

  test("zipfSlope is partitioning-invariant") {
    val docs = Seq.tabulate(40)(i => (i.toLong, s"w${i % 7} w${i % 3} common"))
      .toDF("doc_id", "text")
    val a = Vocab.zipfSlope(docs, "text").collect().toSeq
    val b = Vocab.zipfSlope(docs.repartition(11), "text").collect().toSeq
    assert(a === b)
  }

  test("sourceDivergence: hand-computed KL against the pooled distribution") {
    val docs = Seq((1L, "s1", "a a b"), (2L, "s2", "b"))
      .toDF("doc_id", "source", "text")
    def snap(d: Double) =
      BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // corpus: a=2 b=2 → Q = (.5, .5)
    val kl1 = snap(2.0 / 3 * math.log(2.0 / 3 / 0.5) + 1.0 / 3 * math.log(1.0 / 3 / 0.5))
    val kl2 = snap(math.log(1.0 / 0.5))
    val got = Vocab.sourceDivergence(docs, "source", "text")
      .as[(String, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map("s1" -> ((3L, kl1)), "s2" -> ((1L, kl2))))
  }

  test("sourceDivergence of a single group is zero (P = Q)") {
    val docs = Seq((1L, "only", "x y x z")).toDF("doc_id", "source", "text")
    val got = Vocab.sourceDivergence(docs, "source", "text")
      .as[(String, Long, Double)].collect().toSeq
    assert(got === Seq(("only", 4L, 0.0)))
  }

  test("rareTokenDocs flags docs with below-df tokens, counts distinct rare tokens") {
    val docs = Seq(
      (1L, "common secretkey99 common"),   // 1 rare token
      (2L, "common other unique1 unique2"),// other df=2; unique* df=1 → 2 rare
      (3L, "common other")                 // nothing rare at minDf=2
    ).toDF("doc_id", "text")
    val got = Vocab.rareTokenDocs(docs, "doc_id", "text", 2L)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(1L -> ((1L, 1L)), 2L -> ((2L, 1L))))
    // raising the threshold flags the df=2 token too
    val loose = Vocab.rareTokenDocs(docs, "doc_id", "text", 3L)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(loose === Map(1L -> 1L, 2L -> 3L, 3L -> 1L))
  }

  test("bpeApply: hand-computed encoding under a fixed merge table") {
    // merges: (l,o)→lo then (lo,w)→low. "low lower owl" →
    // low: 1 token; lower: low+e+r = 3; owl: o+w+l = 3 (no 'lo' substring
    // at symbol level: (o)(w)(l) has no (l)(o) pair)
    val docs = Seq((1L, "low lower owl"), (2L, "low low")).toDF("doc_id", "text")
    val got = Vocab.bpeApply(docs, "doc_id", "text", Seq(("l", "o"), ("lo", "w")))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(1L -> ((3L, 7L)), 2L -> ((2L, 2L))))
  }

  test("bpeApply(train(C)) on the training corpus reproduces training's token curve") {
    val docs = (1L to 50L).map(i => (i, s"alpha beta gamma tok${i % 9} alpha beta"))
      .toDF("doc_id", "text")
    val schedule = Vocab.bpeTrain(docs, "text", 5)
    val merges = schedule.orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val finalTokens = schedule.orderBy(col("step").desc).head().getLong(4)
    val applied = Vocab.bpeApply(docs, "doc_id", "text", merges)
      .agg(sum("n_tokens_bpe")).head().getLong(0)
    assert(applied === finalTokens,
      s"apply(train) token total $applied != training's final $finalTokens")
  }

  test("bpeApply with no merges counts characters per word") {
    val docs = Seq((1L, "ab cde")).toDF("doc_id", "text")
    val got = Vocab.bpeApply(docs, "doc_id", "text", Seq.empty)
      .as[(Long, Long, Long)].collect()
    assert(got.toSeq === Seq((1L, 2L, 5L)))
  }

  test("rareTokenDocs rare-set join carries no broadcast hint (AQE decides)") {
    val docs = Seq((1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    val logical = Vocab.rareTokenDocs(docs, "doc_id", "text", 2L)
      .queryExecution.logical.toString
    assert(!logical.contains("hint"), s"unexpected join hint in:\n$logical")
  }
}
