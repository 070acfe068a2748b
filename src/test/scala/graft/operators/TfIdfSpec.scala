package graft.operators

import graft.SparkSpec

/** TF-IDF against hand-computed scores on a tiny corpus. */
class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  // N = 3; df: a→1, b→2, c→2, d→1
  private lazy val docs = Seq(
    (1L, "a a b"),
    (2L, "b c"),
    (3L, "c c c d")).toDF("doc_id", "text")

  private def idf(df: Long): Double = math.log(4.0 / (df + 1.0)) + 1.0
  private def score(tf: Long, df: Long): Double =
    BigDecimal(tf * idf(df)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("scores match the smoothed tf·idf formula exactly") {
    val got = TfIdf.topTerms(docs, "doc_id", "text", 10)
      .as[(Long, String, Double)].collect().toSet
    assert(got === Set(
      (1L, "a", score(2, 1)), (1L, "b", score(1, 2)),
      (2L, "b", score(1, 2)), (2L, "c", score(1, 2)),
      (3L, "c", score(3, 2)), (3L, "d", score(1, 1))))
  }

  test("k caps the per-document terms, highest scores first, ties to term asc") {
    val got = TfIdf.topTerms(docs, "doc_id", "text", 1)
      .as[(Long, String, Double)].collect().sortBy(_._1)
    // doc 1: a (tf 2, rare) beats b; doc 2: b ties c on score → b wins
    // lexicographically; doc 3: c (tf 3) beats d
    assert(got.map(r => r._1 -> r._2).toSeq === Seq(1L -> "a", 2L -> "b", 3L -> "c"))
  }

  test("rare terms outrank frequent ones at equal tf") {
    val m = TfIdf.topTerms(docs, "doc_id", "text", 10)
      .as[(Long, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // in doc 3, d (df=1) must outscore a hypothetical common term; compare
    // d against c-at-tf-1 equivalent: idf(1) > idf(2)
    assert(m((3L, "d")) > score(1, 2))
  }
}
