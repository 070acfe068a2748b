package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  // four docs share a header+footer; bodies are unique; doc 4 is ONLY
  // boilerplate; doc 5 shares nothing
  private lazy val docs = Seq(
    (1L, "HEADER\nalpha body one\nFOOTER"),
    (2L, "HEADER\nbeta body two\nFOOTER"),
    (3L, "HEADER\ngamma body three\nmiddle extra\nFOOTER"),
    (4L, "HEADER\nFOOTER"),
    (5L, "standalone page\nwith two lines")).toDF("doc_id", "text")

  test("line df counts distinct docs, not in-doc repeats") {
    val rep = Seq((1L, "X\nX\nX\nY"), (2L, "X\nZ")).toDF("doc_id", "text")
    val df = Boilerplate.lineDf(rep, "doc_id", "text")
      .as[(String, Long)].collect().toMap
    assert(df("X") === 2L) // three repeats in doc 1 count once
    assert(df("Y") === 1L && df("Z") === 1L)
  }

  test("boilerplate lines are removed; unique lines survive in order") {
    val out = Boilerplate.removeBoilerplate(docs, "doc_id", "text", minDf = 4L)
      .orderBy($"doc_id").as[(Long, String)].collect().toMap
    assert(out(1L) === "alpha body one")
    assert(out(3L) === "gamma body three\nmiddle extra")
    assert(out(5L) === "standalone page\nwith two lines")
  }

  test("a doc of pure boilerplate survives with empty text, not a lost row") {
    val out = Boilerplate.removeBoilerplate(docs, "doc_id", "text", minDf = 4L)
      .as[(Long, String)].collect().toMap
    assert(out.size === 5)
    assert(out(4L) === "")
  }

  test("threshold below the planted df keeps everything intact") {
    val out = Boilerplate.removeBoilerplate(docs, "doc_id", "text", minDf = 10L)
      .as[(Long, String)].collect().toMap
    val orig = docs.as[(Long, String)].collect().toMap
    assert(out === orig)
  }

  test("output keeps the input schema: metadata columns ride through, textCol replaced in place") {
    val withMeta = docs.withColumn("lang", concat(lit("l"), $"doc_id" % 2))
      .withColumn("url", concat(lit("https://ex.org/"), $"doc_id"))
    val out = Boilerplate.removeBoilerplate(withMeta, "doc_id", "text", minDf = 4L)
    assert(out.columns.toSeq === Seq("doc_id", "text", "lang", "url"))
    val row = out.filter($"doc_id" === 3L)
      .as[(Long, String, String, String)].head()
    assert(row === ((3L, "gamma body three\nmiddle extra", "l1", "https://ex.org/3")))
  }

  test("the boilerplate join carries no broadcast hint (AQE decides)") {
    val plan = Boilerplate.removeBoilerplate(docs, "doc_id", "text", minDf = 2L)
      .queryExecution.logical.toString
    assert(!plan.contains("UnresolvedHint"), "threshold-dependent set must not force-broadcast")
  }
}
