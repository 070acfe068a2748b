package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClassifySpec extends SparkSpec {
  import spark.implicits._

  private def snap4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("posterior matches the hand-computed multinomial model") {
    val train = Seq(("x", "a a b"), ("y", "c c b")).toDF("label", "text")
    val model = Classify.nbTrain(train, "label", "text")
    // vocab {a,b,c} → V=3; N_x = N_y = 3; priors ln(1/2); α=1
    // doc "a b": score_x = ln½ − 2·ln6 + ln(2+1) + ln(1+1)
    //            score_y = ln½ − 2·ln6 + ln(1+1)   ((a,y) absent → floor)
    assert(model.vocabSize === 3L)
    val got = Classify.nbScore(Seq((7L, "a b")).toDF("doc_id", "text"), "doc_id", "text", model)
      .as[(Long, String, Double)].collect()
    val expX = math.log(0.5) - 2 * math.log(6.0) + math.log(3.0) + math.log(2.0)
    assert(got === Array((7L, "x", snap4(expX))))
  }

  test("disjoint vocabularies classify held-out docs to the right class") {
    val train = ((1 to 20).map(i => ("en", s"foo bar word$i english")) ++
      (1 to 20).map(i => ("de", s"baz qux wort$i deutsch"))).toDF("label", "text")
    val model = Classify.nbTrain(train, "label", "text")
    val score = Seq((1L, "foo english bar"), (2L, "qux deutsch baz")).toDF("doc_id", "text")
    val got = Classify.nbScore(score, "doc_id", "text", model)
      .as[(Long, String, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(got === Map(1L -> "en", 2L -> "de"))
  }

  test("a symmetric tie breaks to the lexicographically smaller label") {
    val train = Seq(("b_lbl", "t t"), ("a_lbl", "t t")).toDF("label", "text")
    val model = Classify.nbTrain(train, "label", "text")
    val got = Classify.nbScore(Seq((1L, "t")).toDF("doc_id", "text"), "doc_id", "text", model)
      .as[(Long, String, Double)].collect()
    assert(got.head._2 === "a_lbl")
  }

  test("prediction is stable under repartitioning") {
    val train = (1L to 60L).map(i => (s"c${i % 3}", s"tok${i % 7} tok${i % 5} t$i"))
      .toDF("label", "text")
    val score = (1L to 40L).map(i => (i, s"tok${i % 7} tok${i % 5}")).toDF("doc_id", "text")
    val a = Classify.nbScore(score, "doc_id", "text", Classify.nbTrain(train, "label", "text"))
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    val b = Classify.nbScore(score.repartition(13), "doc_id", "text",
      Classify.nbTrain(train.repartition(7), "label", "text"))
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(a === b)
  }

  test("an empty training set scores to an empty frame, not a crash") {
    val model = Classify.nbTrain(Seq.empty[(String, String)].toDF("label", "text"),
      "label", "text")
    val got = Classify.nbScore(Seq((1L, "a")).toDF("doc_id", "text"), "doc_id", "text", model)
    assert(got.count() === 0L)
  }

  test("plan: the doc×class grid is a broadcast, never a shuffled cross product") {
    val train = Seq(("x", "a"), ("y", "b")).toDF("label", "text")
    val score = Seq((1L, "a b")).toDF("doc_id", "text")
    val p = Classify.nbScore(score, "doc_id", "text", Classify.nbTrain(train, "label", "text"))
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin"), s"grid must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"no shuffled cross product:\n$p")
  }

  // ------------------------------------------------- logistic regression

  /** Linearly separable fixture: class 1 clusters near x=1, class 0 near
    * x=0, on two features.
    */
  private lazy val separable = (0 until 200).map { i =>
    val y = i % 2
    val base = if (y == 1) 0.9 else 0.1
    (i.toLong, y.toDouble, base + 0.001 * (i % 5), base - 0.001 * (i % 7))
  }.toDF("id", "y", "x1", "x2")

  test("logistic GD separates a separable fixture and is deterministic") {
    val w1 = Classify.logisticTrain(separable, "y", Seq("x1", "x2"), iters = 5)
    val w2 = Classify.logisticTrain(separable, "y", Seq("x1", "x2"), iters = 5)
    assert(w1 === w2, "training must be bit-deterministic across runs")
    val scored = Classify.logisticScore(separable, "id", Seq("x1", "x2"), w1)
      .as[(Long, Double)].collect().toMap
    // P(y=1|x) must rank every class-1 row above every class-0 row
    val p1 = (0 until 200).filter(_ % 2 == 1).map(i => scored(i.toLong))
    val p0 = (0 until 200).filter(_ % 2 == 0).map(i => scored(i.toLong))
    assert(p1.min > p0.max,
      s"separable classes must separate: min1=${p1.min} max0=${p0.max}")
  }

  test("first GD step from w=0 is the closed-form 0.5-residual gradient") {
    // w=0 → σ ≡ 0.5 exactly, so w after one step is −round4(avg((0.5−y)·x))
    val tiny = Seq((1L, 1.0, 0.4, 0.2), (2L, 0.0, 0.8, 0.6))
      .toDF("id", "y", "x1", "x2")
    val w = Classify.logisticTrain(tiny, "y", Seq("x1", "x2"), iters = 1)
    // g0 = avg(0.5−1, 0.5−0) = 0
    // g1 = avg(−0.5·0.4, 0.5·0.8) = (−0.2 + 0.4)/2 = 0.1
    // g2 = avg(−0.5·0.2, 0.5·0.6) = (−0.1 + 0.3)/2 = 0.1
    assert(w === Seq(0.0, -0.1, -0.1))
  }

  test("every weight and score is a 4-dp decimal (the oracle snap contract)") {
    val w = Classify.logisticTrain(separable, "y", Seq("x1", "x2"), iters = 3)
    def is4dp(d: Double): Boolean =
      BigDecimal.valueOf(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble == d
    w.foreach(x => assert(is4dp(x), s"weight $x is not 4-dp snapped"))
    Classify.logisticScore(separable, "id", Seq("x1", "x2"), w)
      .as[(Long, Double)].collect()
      .foreach { case (_, p) => assert(is4dp(p), s"score $p is not 4-dp snapped") }
  }

  test("plan: a training step is one partial-aggregated pass; scoring is shuffle-free") {
    val err = org.apache.spark.sql.functions.lit(0.5) - col("y")
    val step = separable.agg(
      org.apache.spark.sql.functions.round(avg(err * col("x1")), 4))
      .queryExecution.executedPlan.toString
    assert(step.contains("partial_avg"),
      s"gradient must map-side combine:\n$step")
    val score = Classify.logisticScore(separable, "id", Seq("x1", "x2"),
      Seq(0.1, 0.2, 0.3)).queryExecution.executedPlan.toString
    assert(!score.contains("Exchange"), s"scoring must be narrow:\n$score")
  }
}
