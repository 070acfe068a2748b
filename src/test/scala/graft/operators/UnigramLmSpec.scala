package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  test("log-loss matches the hand-computed smoothed unigram model") {
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    // vocab: a=2 b=2 c=1; total=5, V=3, α=0.5 → denom = 6.5
    // p(a)=p(b)=2.5/6.5, p(c)=1.5/6.5
    val pa = 2.5 / 6.5
    val pc = 1.5 / 6.5
    val exp1 = BigDecimal(-(2 * math.log(pa) + math.log(pa)) / 3)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp2 = BigDecimal(-(math.log(pa) + math.log(pc)) / 2)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = UnigramLm.docLogLoss(docs, "doc_id", "text")
      .as[(Long, Double, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === ((exp1, 3L)))
    assert(got(2L) === ((exp2, 2L)))
  }

  test("rare vocabulary scores strictly higher loss than common vocabulary") {
    val common = (1L to 20L).map(i => (i, "x y z"))
    val rare = Seq((99L, "qq ww ee"))
    val df = (common ++ rare).toDF("doc_id", "text")
    val got = UnigramLm.docLogLoss(df, "doc_id", "text")
      .as[(Long, Double, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(got(99L) > got(1L) + 1.0, s"rare doc not penalized: $got")
  }

  test("score is stable under repartitioning (accumulation-order-proof)") {
    val df = (1L to 100L).map(i => (i, s"tok${i % 7} tok${i % 11} shared")).toDF("doc_id", "text")
    val a = UnigramLm.docLogLoss(df, "doc_id", "text")
      .as[(Long, Double, Long)].collect().sortBy(_._1).toSeq
    val b = UnigramLm.docLogLoss(df.repartition(13), "doc_id", "text")
      .as[(Long, Double, Long)].collect().sortBy(_._1).toSeq
    assert(a === b)
  }

  test("an empty corpus scores to an empty frame, not a driver crash") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(UnigramLm.docLogLoss(empty, "doc_id", "text").count() === 0L)
  }

  test("plan: vocabulary broadcasts; only the doc aggregate shuffles corpus-sized data") {
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    val p = UnigramLm.docLogLoss(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"vocab join must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"))
  }

  test("bigram log-loss matches the hand-computed smoothed bigram model") {
    val docs = Seq((1L, "a b a"), (2L, "b a"), (3L, "x")).toDF("doc_id", "text")
    // bigrams: doc1 (a,b)(b,a); doc2 (b,a) → c(a,b)=1 c(b,a)=2;
    // contexts c(a·)=1 c(b·)=2; V=3 (a, b, x); α=0.5
    val pba = (1 + 0.5) / (1 + 0.5 * 3) // p(b|a)
    val pab = (2 + 0.5) / (2 + 0.5 * 3) // p(a|b)
    def snap(d: Double) =
      BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = UnigramLm.bigramDocLogLoss(docs, "doc_id", "text")
      .as[(Long, Double, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(
      1L -> ((snap(-(math.log(pba) + math.log(pab)) / 2), 2L)),
      2L -> ((snap(-math.log(pab)), 1L))))
    // doc 3 has no bigrams and drops out entirely
    assert(!got.contains(3L))
  }

  test("bigram model joins carry no broadcast hint (bigram tables grow toward V²)") {
    val docs = Seq((1L, "a b a")).toDF("doc_id", "text")
    val logical = UnigramLm.bigramDocLogLoss(docs, "doc_id", "text")
      .queryExecution.logical.toString
    assert(!logical.contains("hint"), s"unexpected join hint in:\n$logical")
  }

  test("Kneser–Ney log-loss matches the hand-computed interpolated model") {
    val docs = Seq((1L, "a b a"), (2L, "b a")).toDF("doc_id", "text")
    // bigram types: (a,b):1, (b,a):2 → T=2
    // ctx a: c1=1 n1f=1; ctx b: c1=2 n1f=1; cont a: n1b=1; cont b: n1b=1
    val pba = math.max(1 - 0.75, 0) / 1.0 + 0.75 * 1 / 1.0 * (1 / 2.0) // p(b|a)=0.625
    val pab = math.max(2 - 0.75, 0) / 2.0 + 0.75 * 1 / 2.0 * (1 / 2.0) // p(a|b)=0.8125
    def snap(d: Double) =
      BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = UnigramLm.kneserNeyDocLogLoss(docs, "doc_id", "text")
      .as[(Long, Double, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(
      1L -> ((snap(-(math.log(pba) + math.log(pab)) / 2), 2L)),
      2L -> ((snap(-math.log(pab)), 1L))))
  }

  test("Kneser–Ney matches an independent model build and sums to 1 per context") {
    val docs = (1L to 30L)
      .map(i => (i, s"w${i % 5} w${(i + 2) % 7} w${i % 3} w${(i + 1) % 5} w${i % 7}"))
      .toDF("doc_id", "text")
    val d = 0.75
    // independent evaluator: build the model with plain Scala collections
    val texts = docs.as[(Long, String)].collect().toMap
    val bg = texts.toSeq.flatMap { case (id, t) =>
      val w = t.trim.split(" +"); w.zip(w.tail).map(p => (id, p))
    }
    val c12 = bg.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
    val c1 = c12.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val n1f = c12.groupBy(_._1._1).view.mapValues(_.size.toDouble).toMap
    val n1b = c12.groupBy(_._1._2).view.mapValues(_.size.toDouble).toMap
    val types = c12.size.toDouble
    def p(w1: String, w2: String): Double =
      math.max(c12((w1, w2)) - d, 0) / c1(w1) +
        d * n1f(w1) / c1(w1) * (n1b(w2) / types)
    // the interpolated distribution is proper: Σ_w2 p(w2|w1) = 1 when the
    // continuation unigram is summed over its full support
    for (w1 <- c1.keys) {
      // .iterator: mapping a key SET to probabilities would collapse ties
      val seen = c12.keys.iterator.filter(_._1 == w1)
        .map { case (_, w2) => p(w1, w2) }.sum
      val unseenCont = n1b.keys.iterator.filterNot(w2 => c12.contains((w1, w2)))
        .map(w2 => d * n1f(w1) / c1(w1) * (n1b(w2) / types)).sum
      assert(math.abs(seen + unseenCont - 1.0) < 1e-9, s"improper at context $w1")
    }
    val expect = bg.groupBy(_._1).map { case (id, pairs) =>
      val nll = pairs.map { case (_, (w1, w2)) => -math.log(p(w1, w2)) }.sum / pairs.size
      id -> BigDecimal(nll).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = UnigramLm.kneserNeyDocLogLoss(docs, "doc_id", "text")
      .as[(Long, Double, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(got === expect)
  }

  test("Kneser–Ney penalizes single-context words harder than add-α (the Francisco case)") {
    // "francisco" is frequent but only ever follows "san"; "bay" is seen
    // after many distinct contexts. A novel-context occurrence of each
    // ("other francisco" / "other bay", both c=1) should score francisco
    // as the bigger surprise — continuation counts see it, raw counts don't.
    val sanFrancisco = (1L to 10L).map(i => (i, "san francisco"))
    val manyBay = (11L to 20L).map(i => (i, s"ctx${i} bay"))
    val probes = Seq((98L, "other francisco"), (99L, "other bay"))
    val docs = (sanFrancisco ++ manyBay ++ probes).toDF("doc_id", "text")
    val kn = UnigramLm.kneserNeyDocLogLoss(docs, "doc_id", "text")
      .as[(Long, Double, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(kn(98L) > kn(99L),
      s"single-context francisco must surprise more: $kn")
  }

  test("Kneser–Ney model joins carry no broadcast hint; only the 1-row scalar does") {
    val docs = Seq((1L, "a b a")).toDF("doc_id", "text")
    val logical = UnigramLm.kneserNeyDocLogLoss(docs, "doc_id", "text")
      .queryExecution.logical.toString
    // exactly ONE hint: the lazy N₁₊(··) 1-row cross join (the J2
    // scalar-lookup pattern); the corpus-growing model joins stay un-hinted
    val hints = "hint".r.findAllIn(logical.toLowerCase).size
    assert(hints === 1, s"expected only the scalar broadcast hint in:\n$logical")
  }

  test("Kneser–Ney is one lazy plan: constructing it executes nothing") {
    // a corpus whose text column THROWS when evaluated (ANSI divide by
    // zero, data-dependent so it survives constant folding): if the
    // scorer still ran an eager job at construction time (the old
    // big.count()), building the frame would blow up here
    val poisoned = spark.range(2).select(
      col("id").as("doc_id"),
      concat(lit("w "), (col("id") / (col("id") - col("id"))).cast("string"))
        .as("text"))
    val scored = UnigramLm.kneserNeyDocLogLoss(poisoned, "doc_id", "text")
    // ...and the poison is real: acting on the plan does throw
    val e = intercept[Exception] { scored.collect() }
    assert(e.getMessage.toLowerCase.contains("divide"),
      s"expected the ANSI division error, got: ${e.getMessage}")
  }

  test("past broadcast size the model joins degrade to shuffle joins with identical scores") {
    // the claim the plan notes make: when a real corpus pushes the bigram
    // table past broadcast size, the un-hinted joins fall back to
    // shuffle joins — not driver blowups — and results are unchanged
    val docs = (1L to 40L)
      .map(i => (i, s"w${i % 7} w${(i + 1) % 7} w${(i + 2) % 7} w${i % 5} end"))
      .toDF("doc_id", "text")
    val reference = UnigramLm.bigramDocLogLoss(docs, "doc_id", "text")
      .as[(Long, Double, Long)].collect().toSet
    val conf = spark.conf
    val oldStatic = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val oldAqe = conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val scored = UnigramLm.bigramDocLogLoss(docs, "doc_id", "text")
      val plan = scored.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffle-join fallback:\n$plan")
      assert(!plan.contains("BroadcastHashJoin"),
        s"broadcast must be fully disabled:\n$plan")
      assert(scored.as[(Long, Double, Long)].collect().toSet === reference)
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", oldStatic)
      oldAqe match {
        case Some(v) => conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None => conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }
}
