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

  test("rareTokenDocs rare-set join carries no broadcast hint (AQE decides)") {
    val docs = Seq((1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    val logical = Vocab.rareTokenDocs(docs, "doc_id", "text", 2L)
      .queryExecution.logical.toString
    assert(!logical.contains("hint"), s"unexpected join hint in:\n$logical")
  }
}
