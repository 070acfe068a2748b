package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  /** Independent MD5 gram hash (no shared code with the operator). */
  private def gramHash(g: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(8), 16)
  }

  test("every fingerprint points at a gram whose hash it equals") {
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val k = 8
    val got = Winnow.fingerprints(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text",
      k = k, w = 4).as[(Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (_, pos, fp) =>
      val gram = text.substring(pos.toInt - 1, pos.toInt - 1 + k)
      assert(gramHash(gram) === fp, s"pos $pos gram '$gram'")
    }
  }

  test("fewer grams than the window → exactly the whole-document minimum, rightmost on ties") {
    // k=3 grams of "abcabcabc": abc bca cab abc bca cab abc — the min
    // gram hash repeats; the single window must keep its LAST position
    val text = "abcabcabc"
    val grams = (0 to text.length - 3).map(i => text.substring(i, i + 3))
    val minHash = grams.map(gramHash).min
    val wantPos = grams.lastIndexWhere(g => gramHash(g) == minHash) + 1
    val got = Winnow.fingerprints(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text",
      k = 3, w = 100).as[(Long, Long, Long)].collect()
    assert(got.toSeq === Seq((1L, wantPos.toLong, minHash)))
  }

  test("guarantee: a shared substring of length >= w+k-1 always shares a fingerprint") {
    // w=16, k=8 → any 23-char common substring must be caught. Build 40
    // doc pairs with a shared 23-char core at varying offsets.
    val core = "SHARED-CORE-0123456789A" // 23 chars
    require(core.length == 23)
    val docs = (1 to 40).flatMap { i =>
      val pad1 = s"left pad $i ${"x" * (i % 7)}"
      val pad2 = s"${"y" * (i % 5)} other tail ${i * 31}"
      Seq((i * 2L, s"$pad1 $core end$i"), (i * 2L + 1L, s"begin$i $core $pad2"))
    }
    val pairs = Winnow.overlap(docs.toDF("doc_id", "text"), "doc_id", "text",
      k = 8, w = 16, maxDf = 200)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2)).toSet
    (1 to 40).foreach { i =>
      assert(pairs.contains((i * 2L, i * 2L + 1L)),
        s"pair ${i * 2} / ${i * 2 + 1} missed despite 23-char shared core")
    }
  }

  test("fingerprint density sits near the 2/(w+1) expectation, never above 1 per window") {
    val rnd = new scala.util.Random(7)
    val text = (1 to 4000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val k = 8; val w = 16
    val n = Winnow.fingerprints(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text",
      k = k, w = w).count()
    val ng = text.length - k + 1
    val windows = ng - w + 1
    assert(n <= windows, "more fingerprints than windows")
    val density = n.toDouble / ng
    assert(density > 1.0 / (w + 1) && density < 4.0 / (w + 1),
      s"density $density far from 2/(w+1)=${2.0 / (w + 1)}")
  }

  test("boilerplate fingerprints past maxDf never form pairs") {
    val docs = (1L to 30L).map(i => (i, s"entirely shared boilerplate text body ${i % 1}"))
      .map { case (i, t) => (i, t + " unique" + ("z" * i.toInt)) }
    val got = Winnow.overlap(docs.toDF("doc_id", "text"), "doc_id", "text",
      k = 8, w = 4, maxDf = 5)
    // the shared prefix appears in all 30 docs — df 30 > 5 kills those
    // fingerprints; the unique tails share nothing
    assert(got.count() === 0L)
  }

  test("fused WinnowKeys kernel is bit-equal to the HOF reference form") {
    val rnd = new scala.util.Random(11)
    val docs = (1L to 60L).map { i =>
      val len = rnd.nextInt(400)
      val body = (0 until len).map { _ =>
        rnd.nextInt(6) match {
          case 0 => 'a'                                   // heavy repetition → hash ties
          case 1 => ('a' + rnd.nextInt(3)).toChar
          case 2 => "é".charAt(0)                         // 2-byte UTF-8
          case 3 => '中'                              // 3-byte UTF-8
          case _ => ('a' + rnd.nextInt(26)).toChar
        }
      }.mkString
      (i, body + "😀")                          // 4-byte surrogate pair tail
    }.toDF("doc_id", "text")
    for ((k, w) <- Seq((8, 16), (3, 4), (1, 1), (5, 100))) {
      val native = Winnow.fingerprints(docs, "doc_id", "text", k, w)
        .as[(Long, Long, Long)].collect().toSet
      val hof = Winnow.fingerprintsHof(docs, "doc_id", "text", k, w)
        .as[(Long, Long, Long)].collect().toSet
      assert(native === hof, s"k=$k w=$w")
    }
  }

  test("winnow_keys SQL function matches the operator's key stream") {
    graft.exprs.GraftExtensions.registerAll(spark)
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    df.createOrReplaceTempView("winnow_sql_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, 1073741824 - key % 1073741824 AS pos, shiftright(key, 30) AS fp
        |FROM winnow_sql_docs
        |LATERAL VIEW explode(winnow_keys(text, 8, 4)) t AS key""".stripMargin)
      .as[(Long, Long, Long)].collect().toSet
    val viaOp = Winnow.fingerprints(df, "doc_id", "text", k = 8, w = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(viaSql === viaOp)
  }

  test("plan: fingerprint selection is narrow — no Exchange before the explode") {
    val df = Seq((1L, "some text long enough to produce grams here")).toDF("doc_id", "text")
    val p = Winnow.fingerprints(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"fingerprinting must not shuffle:\n$p")
  }

  test("gram_keys SQL function matches the expression's gram stream") {
    val df = Seq((1L, "the quick brown fox")).toDF("doc_id", "text")
    df.createOrReplaceTempView("gram_sql_docs")
    val viaSql = spark.sql("SELECT gram_keys(text, 8) AS g FROM gram_sql_docs")
      .as[Seq[Long]].head()
    val viaExpr = df.select(graft.exprs.GramKeys(col("text"), 8).as("g"))
      .as[Seq[Long]].head()
    assert(viaSql === viaExpr)
    assert(viaSql.nonEmpty)
  }

  test("fused GramKeys kernel is bit-equal to the HOF md5-draw reference") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "短い multi-byte ✓ text with émojis 😀 and ascii",
      "aaaaaaa", "", "ab")
    for ((t, id) <- texts.zipWithIndex; k <- Seq(3, 8)) {
      val df = Seq((id.toLong, t)).toDF("doc_id", "text")
      val fused = df.select(graft.exprs.GramKeys(col("text"), k).as("g"))
        .as[Seq[Long]].head()
      val ng = t.codePointCount(0, t.length) - k + 1
      val hof =
        if (ng <= 0) Seq.empty[Long]
        else df.select(transform(sequence(lit(1), lit(ng)),
          i => Split.hashDraw32(col("text").substr(i, lit(k)))).as("g"))
          .as[Seq[Long]].head()
      assert(fused === hof, s"text '$t' k=$k")
    }
  }

  // ------------------------------------------------- repeated spans

  private def spans(df: org.apache.spark.sql.DataFrame) =
    df.orderBy(col("id_a"), col("id_b"), col("start_a"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq

  test("repeatedSpans reports the exact shared passage with exact positions") {
    // 30-char shared passage at different offsets; surroundings disjoint
    val p = "SHARED-PASSAGE-OF-THIRTY-CHARS"
    assert(p.length === 30)
    val a = "aaaaaaaaaaaaaaaaaaaa" + p + "zzzzzzzzzz"
    val b = "bbbbbbbbbb" + p + "yyyyyyyyyyyyyyyyyyyy"
    val got = spans(Winnow.repeatedSpans(
      Seq((1L, a), (2L, b)).toDF("doc_id", "text"), "doc_id", "text"))
    assert(got === Seq((1L, 2L, 21L, 11L, 30L)))
  }

  test("two shared passages yield two maximal spans") {
    val p1 = "FIRST-SHARED-PASSAGE-IS-HERE-NOW"  // 32 chars
    val p2 = "SECOND+SHARED+PASSAGE+GOES+THERE" // 32 chars
    val a = "aaaaaa" + p1 + "qqqqqqqqqq" + p2 + "rrrrrr"
    val b = "bbbbbbbbbbbbbb" + p2 + "ssssssssssssssss" + p1 + "tt"
    val got = spans(Winnow.repeatedSpans(
      Seq((1L, a), (2L, b)).toDF("doc_id", "text"), "doc_id", "text"))
    assert(got === Seq(
      (1L, 2L, 7L, 63L, 32L),   // p1: a pos 7, b pos 14+32+16+1 = 63
      (1L, 2L, 49L, 15L, 32L))) // p2: a pos 6+32+10+1 = 49, b pos 15
  }

  test("a sub-threshold shared substring (< w+k-1 chars) is not reported") {
    val p = "ONLY-TWENTY-TWO-CHARS0" // 22 < 16+8-1 = 23
    assert(p.length === 22)
    val a = "aaaaaaaaaaaaaaaaaaaa" + p + "zzzzzzzzzzzzzzzzzzzz"
    val b = "bbbbbbbbbbbbbbbbbbbb" + p + "yyyyyyyyyyyyyyyyyyyy"
    val got = spans(Winnow.repeatedSpans(
      Seq((1L, a), (2L, b)).toDF("doc_id", "text"), "doc_id", "text"))
    assert(got.isEmpty)
  }

  test("the maxDf guard collapses the boilerplate clique's candidate volume") {
    val p = "BOILERPLATE-PASSAGE-SHARED-BY-EVERY-DOCUMENT-IN-THE-SET"
    val docs = (1L to 5L).map(i => (i, s"doc$i-" * 8 + p + s"-tail$i" * 6))
      .toDF("doc_id", "text")
    // with the guard open, every one of the 5·4/2 pairs reports the passage
    val open = spans(Winnow.repeatedSpans(docs, "doc_id", "text", maxDf = 50))
    assert(open.size === 10, s"all 10 pairs expected: $open")
    assert(open.forall(_._5 >= p.length), open)
    // maxDf=2 drops every INTERIOR fingerprint of the shared passage
    // (df = 5) — only boundary-window selections, which are doc-specific,
    // can leak a residual pair. The guard is a candidate-VOLUME bound,
    // not a semantic boilerplate filter: the clique must collapse, and
    // whatever survives must be a span the open run also found (exact,
    // never spurious).
    val guarded = spans(Winnow.repeatedSpans(docs, "doc_id", "text", maxDf = 2))
    assert(guarded.size < open.size / 2, s"clique must collapse: $guarded")
    assert(guarded.toSet.subsetOf(open.toSet), (guarded, open))
  }

  test("a book-sized document (> 1 MiB) fingerprints correctly under the 2^30 packing") {
    // the old 2^20 bound made POS_BOUND − pos go NEGATIVE past 1,048,576
    // characters — silently colliding keys across hash values. The
    // widened packing must fingerprint such documents exactly: kernel ==
    // HOF reference, every fingerprint hash-verifies at its position,
    // and positions reach past the old bound.
    val rnd = new scala.util.Random(11)
    val chars = "abcdefgh "
    val text = new StringBuilder(1600000)
    while (text.length < 1500000) text.append(chars(rnd.nextInt(chars.length)))
    val doc = Seq((1L, text.toString)).toDF("doc_id", "text")
    val k = 8; val w = 64
    val native = Winnow.fingerprints(doc, "doc_id", "text", k, w)
      .as[(Long, Long, Long)].collect()
    assert(native.exists(_._2 > (1L << 20)),
      "positions must reach past the old 2^20 bound")
    // sampled hash-at-position verification (full re-hash of 1.5M grams
    // on the driver would dominate the suite; the HOF twin at this size
    // would be interpreted-lambda minutes — bit-equality is proven on
    // the smaller corpus above, this test targets the position decode)
    native.zipWithIndex.filter(_._2 % 50 == 0).foreach { case ((_, pos, fp), _) =>
      val gram = text.substring(pos.toInt - 1, pos.toInt - 1 + k)
      assert(gramHash(gram) === fp, s"pos $pos")
    }
    // and the winnowing GUARANTEE must hold across the old bound: a
    // passage planted past character 2^20 in the big doc and at the
    // head of a small doc still shares a fingerprint
    val passage = "winnow sentinel passage planted across the two documents " * 3
    val docs = Seq(
      (1L, text.substring(0, 1200000) + passage + text.substring(1200000)),
      (2L, passage + " tail words here")).toDF("doc_id", "text")
    val pairs = Winnow.overlap(docs, "doc_id", "text", k, w, maxDf = 50)
      .as[(Long, Long, Long)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L),
      s"planted passage past 2^20 must surface the pair, got ${pairs.toSeq}")
  }
}
