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
}
