package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed witnesses for the distributed suffix array: the
  * classic "banana" LCPs, identical-suffix capping, cross-document
  * repeats, intra-document self-overlap, convergence early-exit, and
  * a brute-force equivalence sweep against an in-memory reference on
  * randomized corpora.
  */
class SuffixArraySpec extends SparkSpec {
  import spark.implicits._

  private def repeats(docs: Seq[(Long, String)]): Map[(Long, Int), Long] = {
    val df = docs.toDF("doc_id", "text")
    SuffixArray.repeatLengths(df, "doc_id", "text")(spark)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
  }

  /** Brute force: for each position, the longest prefix of its suffix
    * occurring at ≥ 2 distinct (doc, pos) sites.
    */
  private def brute(docs: Seq[(Long, String)]): Map[(Long, Int), Long] = {
    val suf = for ((id, t) <- docs; p <- 0 until t.length) yield (id, p, t.substring(p))
    suf.map { case (id, p, s) =>
      val best = suf.iterator.filter { case (id2, p2, _) => (id2, p2) != ((id, p)) }
        .map { case (_, _, s2) =>
          var k = 0
          val n = math.min(s.length, s2.length)
          while (k < n && s(k) == s2(k)) k += 1
          k
        }.foldLeft(0)(math.max)
      ((id, p), best.toLong)
    }.toMap
  }

  test("banana: per-position longest repeated prefix matches hand computation") {
    val r = repeats(Seq((1L, "banana")))
    // suffixes: banana anana nana ana na a — repeats: ana (3), na (2), a (1)
    val expect = Map(
      (1L, 0) -> 0L, // banana
      (1L, 1) -> 3L, // anana ~ ana
      (1L, 2) -> 2L, // nana ~ na
      (1L, 3) -> 3L, // ana
      (1L, 4) -> 2L, // na
      (1L, 5) -> 1L) // a
    assert(r === expect)
  }

  test("identical documents: rep_len is capped at the true suffix length") {
    val r = repeats(Seq((1L, "hello"), (2L, "hello")))
    for (p <- 0 until 5; d <- Seq(1L, 2L))
      assert(r((d, p)) === (5 - p).toLong, s"doc $d pos $p")
  }

  test("cross-document repeat found exactly, non-shared tails at zero") {
    val r = repeats(Seq((1L, "xxSHAREDyy"), (2L, "zzSHAREDww")))
    assert(r((1L, 2)) === 6L) // SHARED
    assert(r((2L, 2)) === 6L)
    assert(r((1L, 3)) === 5L) // HARED
    assert(r((1L, 0)) === 1L) // 'x' repeats at pos 1 only
    assert(r((2L, 8)) === 1L) // 'w' repeats
    assert(r((1L, 8)) === 1L) // 'y' repeats
  }

  test("intra-document self-overlap: runs of one character") {
    val r = repeats(Seq((7L, "aaaa")))
    // suffix at 0 = aaaa shares aaa with suffix at 1
    assert(r === Map((7L, 0) -> 3L, (7L, 1) -> 3L, (7L, 2) -> 2L, (7L, 3) -> 1L))
  }

  test("randomized corpora match the brute-force reference") {
    val rnd = new scala.util.Random(20260816)
    val alphabet = "abcd"
    for (trial <- 1 to 4) {
      val docs = (1L to 6L).map { id =>
        val n = 5 + rnd.nextInt(30)
        (id, Array.fill(n)(alphabet(rnd.nextInt(alphabet.length))).mkString)
      }
      assert(repeats(docs) === brute(docs), s"trial $trial: $docs")
    }
  }

  test("round schedule is log of MAX DOC LENGTH, fixed up front") {
    val df = Seq((1L, "abcdefghijklmnopqrstuvwxyz0123456789")).toDF("doc_id", "text")
    val sa = SuffixArray.build(df, "doc_id", "text")(spark)
    // 36 chars: packed-3 start, coverage 3→48, i.e. 4 rounds
    // regardless of corpus row count
    assert(sa.coverage === 48L)
  }

  test("duplicatedSpans: interval union reconstructs exactly the shared passages") {
    val docs = Seq(
      (1L, "ABCDEFGHIJ12"),          // passage at [0, 10)
      (2L, "34ABCDEFGHIJ"),          // same passage at [2, 12)
      (3L, "KLMNOPQRST56UVWXYZabcd"), // two passages: [0,10) and [12,22)
      (4L, "78KLMNOPQRST90UVWXYZabcd"))
    val df = docs.toDF("doc_id", "text")
    val spans = SuffixArray.duplicatedSpans(df, "doc_id", "text", 6)(spark)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(spans === Seq(
      (1L, 0L, 10L, 10L),
      (2L, 2L, 12L, 10L),
      (3L, 0L, 10L, 10L), (3L, 12L, 22L, 10L),
      (4L, 2L, 12L, 10L), (4L, 14L, 24L, 10L)))
  }

  test("empty and single-char corpora do not crash") {
    assert(repeats(Seq((1L, ""))) === Map.empty)
    // a single corpus position has no order-neighbor: absent by contract
    assert(repeats(Seq((1L, "q"))) === Map.empty)
  }

  private def sharded(docs: Seq[(Long, String)], docsPerShard: Long,
      cap: Int): Map[(Long, Int), Long] = {
    val df = docs.toDF("doc_id", "text")
    SuffixArray.repeatLengthsSharded(df, "doc_id", "text",
      docsPerShard, cap)(spark)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
  }

  test("sharded: cross-shard repeats found exactly up to the cap") {
    // docsPerShard = 3 => shard 0 = {1, 2}, shard 1 = {3, 4, 5}:
    // HELLOWORLD repeats within shard 0 AND cross-shard into doc 3
    // (true rep 10 > cap 8 — the cross merge must saturate at 8);
    // LONGREPEATEDPASSAGE repeats within shard 1 (intra stays exact
    // beyond the cap)
    val docs = Seq(
      (1L, "xxHELLOWORLDxx"),
      (2L, "yyHELLOWORLDyy"),
      (3L, "zzHELLOWORLDzz"),
      (4L, "LONGREPEATEDPASSAGE"),
      (5L, "qqLONGREPEATEDPASSAGEqq"))
    val g = brute(docs)
    val s = sharded(docs, docsPerShard = 3L, cap = 8)
    assert(s.keySet === g.keySet)
    // exact wherever the true rep_len < cap; saturated >= cap otherwise
    s.foreach { case (k, v) =>
      if (g(k) < 8) assert(v === g(k), s"pos $k")
      else assert(v >= 8L && v <= g(k), s"pos $k: got $v true ${g(k)}")
    }
    // min(rep, cap) equality — the predicate the dedup readouts use
    assert(s.map { case (k, v) => k -> math.min(v, 8L) } ===
      g.map { case (k, v) => k -> math.min(v, 8L) })
    // doc 3's only partners live in the other shard: capped exactly
    assert(g((3L, 2)) === 10L && s((3L, 2)) === 8L)
    // docs 4/5 share a shard: intra-shard rep stays exact past the cap
    assert(g((5L, 2)) === 19L && s((5L, 2)) === 19L)
  }

  test("sharded: randomized corpora match brute force under the cap") {
    val rnd = new scala.util.Random(20260817)
    val alphabet = "abc"
    for (trial <- 1 to 3) {
      val docs = (1L to 9L).map { id =>
        val n = 5 + rnd.nextInt(25)
        (id, Array.fill(n)(alphabet(rnd.nextInt(alphabet.length))).mkString)
      }
      val g = brute(docs)
      val s = sharded(docs, docsPerShard = 3L, cap = 12)
      assert(s.map { case (k, v) => k -> math.min(v, 12L) } ===
        g.map { case (k, v) => k -> math.min(v, 12L) }, s"trial $trial: $docs")
    }
  }

  test("sharded: single shard degenerates to the global result") {
    val docs = Seq((1L, "banana"), (2L, "bandana"))
    assert(sharded(docs, docsPerShard = 100L, cap = 64) === brute(docs))
  }

  private def bounded(docs: Seq[(Long, String)], cap: Int): Map[(Long, Int), Long] = {
    val df = docs.toDF("doc_id", "text")
    SuffixArray.boundedRepeatLengths(df, "doc_id", "text", cap)(spark)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
  }

  test("bounded: min(rep_len, cap) exactly, from the prefix sort alone") {
    val docs = Seq(
      (1L, "xxHELLOWORLDxx"),
      (2L, "yyHELLOWORLDyy"),
      (3L, "zzHELLOWORLDzz"),
      (4L, "LONGREPEATEDPASSAGE"),
      (5L, "qqLONGREPEATEDPASSAGEqq"))
    val g = brute(docs)
    for (cap <- Seq(4, 8, 64)) {
      val b = bounded(docs, cap)
      assert(b.keySet === g.keySet, s"cap $cap")
      assert(b === g.map { case (k, v) => k -> math.min(v, cap.toLong) },
        s"cap $cap")
    }
  }

  test("bounded: randomized corpora match min(brute, cap)") {
    val rnd = new scala.util.Random(20260818)
    val alphabet = "ab"
    for (trial <- 1 to 3) {
      val docs = (1L to 7L).map { id =>
        val n = 4 + rnd.nextInt(28)
        (id, Array.fill(n)(alphabet(rnd.nextInt(alphabet.length))).mkString)
      }
      val g = brute(docs)
      val b = bounded(docs, 9)
      assert(b === g.map { case (k, v) => k -> math.min(v, 9L) },
        s"trial $trial: $docs")
    }
  }
}
