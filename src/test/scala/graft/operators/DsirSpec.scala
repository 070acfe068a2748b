package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  /** Independent evaluator: the same importance weight computed with
    * java.security MD5 + plain Scala maps — no Spark, no shared code
    * with the operator under test.
    */
  private def referenceWeights(
      docs: Seq[(Long, Boolean, String)],
      buckets: Int,
      alpha: Double): Map[Long, Double] = {
    def bucket(term: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(term.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16) % buckets
    }
    val tokens = docs.flatMap { case (id, tgt, text) =>
      text.trim.split(" +").filter(_.nonEmpty).map(t => (id, tgt, bucket(t)))
    }
    val raw = tokens.groupBy(_._3).view.mapValues(_.size.toDouble).toMap
    val tgtC = tokens.filter(_._2).groupBy(_._3).view.mapValues(_.size.toDouble).toMap
    val rawTot = tokens.size.toDouble
    val tgtTot = tokens.count(_._2).toDouble
    tokens.groupBy(_._1).view.mapValues { ts =>
      val w = ts.map { case (_, _, b) =>
        math.log((tgtC.getOrElse(b, 0.0) + alpha) / (tgtTot + alpha * buckets)) -
          math.log((raw(b) + alpha) / (rawTot + alpha * buckets))
      }.sum
      BigDecimal(w).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
  }

  private val corpus = Seq(
    (1L, true, "science research method experiment"),
    (2L, true, "research method data science"),
    (3L, false, "celebrity gossip fashion trend"),
    (4L, false, "science research celebrity data"),
    (5L, false, "gossip trend fashion celebrity"))

  test("weights match an independent MD5-hashed evaluator exactly") {
    val df = corpus.toDF("doc_id", "tgt", "text")
    val got = Dsir.importanceWeights(df, "doc_id", "text", col("tgt"), buckets = 1 << 14)
      .as[(Long, Double, Long)].collect().map(r => r._1 -> r._2).toMap
    val exp = referenceWeights(corpus, 1 << 14, 1.0)
    assert(got === exp)
  }

  test("target-looking documents weigh above off-domain ones") {
    val df = corpus.toDF("doc_id", "tgt", "text")
    val got = Dsir.importanceWeights(df, "doc_id", "text", col("tgt"), buckets = 1 << 14)
      .as[(Long, Double, Long)].collect().map(r => r._1 -> r._2).toMap
    // doc 4 shares 3 of 4 tokens with the target set; doc 5 shares none
    assert(got(4L) > got(5L), s"in-domain doc must outrank off-domain: $got")
    assert(got(1L) > got(3L))
  }

  test("weight is stable under repartitioning") {
    val df = (1L to 200L)
      .map(i => (i, i % 3 == 0, s"tok${i % 11} tok${i % 7} tok${i % 5}"))
      .toDF("doc_id", "tgt", "text")
    val a = Dsir.importanceWeights(df, "doc_id", "text", col("tgt"))
      .as[(Long, Double, Long)].collect().sortBy(_._1).toSeq
    val b = Dsir.importanceWeights(df.repartition(17), "doc_id", "text", col("tgt"))
      .as[(Long, Double, Long)].collect().sortBy(_._1).toSeq
    assert(a === b)
  }

  test("an empty corpus weighs to an empty frame, not a driver crash") {
    val empty = Seq.empty[(Long, Boolean, String)].toDF("doc_id", "tgt", "text")
    assert(Dsir.importanceWeights(empty, "doc_id", "text", col("tgt")).count() === 0L)
  }

  test("plan: the bucket distribution broadcasts; the corpus never self-joins") {
    val df = corpus.toDF("doc_id", "tgt", "text")
    val p = Dsir.importanceWeights(df, "doc_id", "text", col("tgt"))
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"distribution join must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no corpus-sized join:\n$p")
  }
}
