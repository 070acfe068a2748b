package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CalibrateSpec extends SparkSpec {
  import spark.implicits._

  private val fixture = Seq(
    // (score, label): 0.9 → 2 pos / 2; 0.5 → 1 pos / 2; 0.1 → 0 pos / 1
    (0.9, true), (0.9, true), (0.5, true), (0.5, false), (0.1, false)
  ).toDF("score", "label")

  test("sweep matches the hand-computed confusion table at every threshold") {
    val got = Calibrate.sweep(fixture, col("score"), col("label"))
      .as[(Double, Long, Long, Double, Double, Double)].collect().toList
    // totpos = 3
    val expect = List(
      (0.9, 2L, 2L, 1.0, 0.6667, 0.8),
      (0.5, 4L, 3L, 0.75, 1.0, 0.8571),
      (0.1, 5L, 3L, 0.6, 1.0, 0.75))
    assert(got === expect)
  }

  test("recall is monotone and reaches 1; pred_pos is strictly increasing") {
    val df = (1L to 300L)
      .map(i => (i % 17 / 17.0, i % 3 == 0)).toDF("score", "label")
    val rows = Calibrate.sweep(df, col("score"), col("label"))
      .as[(Double, Long, Long, Double, Double, Double)].collect().toList
    val recalls = rows.map(_._5)
    assert(recalls === recalls.sorted, "recall must not decrease as t drops")
    assert(recalls.last === 1.0)
    val preds = rows.map(_._2)
    assert(preds === preds.sorted && preds.distinct === preds)
    assert(preds.last === 300L)
  }

  test("all-negative labels define recall and F1 as 0, not NaN") {
    val df = Seq((0.8, false), (0.2, false)).toDF("score", "label")
    val rows = Calibrate.sweep(df, col("score"), col("label"))
      .as[(Double, Long, Long, Double, Double, Double)].collect().toList
    assert(rows.forall(r => r._5 === 0.0 && r._6 === 0.0))
    assert(rows.forall(r => !r._4.isNaN && !r._5.isNaN && !r._6.isNaN))
  }

  test("continuous scores without bucketize fail fast at the cardinality guard") {
    val df = (1L to 200L).map(i => (i / 1e9 + math.Pi, true)).toDF("score", "label")
    val e = intercept[IllegalArgumentException] {
      Calibrate.sweep(df, col("score"), col("label"),
        bucketize = None, maxScoreCardinality = 100)
    }
    assert(e.getMessage.contains("cardinality"))
  }

  test("null scores and labels are excluded rather than polluting a stratum") {
    val df = Seq[(java.lang.Double, java.lang.Boolean)](
      (0.9, true), (null, true), (0.5, null), (0.5, false))
      .toDF("score", "label")
    val rows = Calibrate.sweep(df, col("score"), col("label"))
      .as[(Double, Long, Long, Double, Double, Double)].collect().toList
    assert(rows.map(r => (r._1, r._2, r._3)) === List((0.9, 1L, 1L), (0.5, 2L, 1L)))
  }
}
