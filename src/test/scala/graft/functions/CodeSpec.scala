package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Code-corpus quality battery: hand-computed witnesses for every
  * carrier, each published drop rule triggered in isolation, language
  * routing, and the no-UDF plan lock.
  */
class CodeSpec extends SparkSpec {
  import spark.implicits._

  private def metrics(content: String) = {
    val df = Seq((content, "#")).toDF("content", "cmt")
      .select(
        Code.nLines(col("content")).as("n"),
        Code.maxLineLen(col("content")).as("mx"),
        Code.sumLineLen(col("content")).as("sum"),
        Code.alnumChars(col("content")).as("al"),
        Code.commentLines(col("content"), col("cmt")).as("cl"),
        Code.autogenFlag(col("content")).as("ag"),
        Code.keepVerdict(col("content")).as("keep"))
    df.collect()(0)
  }

  test("line carriers: hand-computed") {
    val r = metrics("# hdr\nab cde\n  # indented comment\nxy")
    assert(r.getLong(0) === 4) // lines
    assert(r.getLong(1) === 20) // "  # indented comment"
    assert(r.getLong(2) === 5 + 6 + 20 + 2)
    assert(r.getLong(4) === 2) // "# hdr" + indented
  }

  test("each drop rule fires alone") {
    assert(metrics("ok line\nshort").getBoolean(6))
    // max line > 1000 (padded with short lines so the avg rule stays
    // quiet: sum 1001+12 ≤ 100×13)
    val pad = Seq.fill(12)("x").mkString("\n")
    assert(!metrics(("x" * 1001) + "\n" + pad).getBoolean(6))
    assert(metrics(("x" * 1000) + "\n" + pad).getBoolean(6)) // boundary keeps
    // avg > 100 (sum > 100*n): two lines of 101
    assert(!metrics(("y" * 101) + "\n" + ("y" * 101)).getBoolean(6))
    assert(metrics(("y" * 100) + "\n" + ("y" * 100)).getBoolean(6))
    // alnum fraction < 1/4: 1 alnum char + 4 spaces
    assert(!metrics("a    ").getBoolean(6))
    assert(metrics("a   ").getBoolean(6)) // exactly 1/4 keeps
    // autogen marker, case-insensitive, mid-file
    assert(!metrics("fine\n# Auto-Generated file\nfine").getBoolean(6))
    assert(metrics("handwritten\ncode").getBoolean(6))
    for (m <- Code.AutogenMarkers)
      assert(metrics(s"x\n# ${m.toUpperCase}\ny").getBoolean(5), m)
  }

  test("language routing: extension and shebang") {
    val df = Seq(
      ("a/b.py", "#!/usr/bin/env python3\nx"),
      ("a/b.scala", "object X"),
      ("a/b.mjs", "#!/usr/bin/env node\nx"),
      ("a/run", "#!/bin/bash\nx"),
      ("a/b.weird", "plain")).toDF("path", "content")
      .select(Code.langFromPath(col("path")).as("lp"),
        Code.langFromShebang(col("content")).as("lsb"))
    val rows = df.collect().map(r => (r.getString(0), Option(r.getString(1))))
    assert(rows(0) === ("python", Some("python")))
    assert(rows(1) === ("scala", None))
    assert(rows(2) === ("javascript", Some("javascript")))
    assert(rows(3) === ("other", Some("shell"))) // extensionless: shebang wins
    assert(rows(4) === ("other", None))
  }

  test("whole battery is codegen columns — no UDF in the plan") {
    val df = Seq(("x\ny", "#")).toDF("content", "cmt")
      .select(Code.keepVerdict(col("content")).as("k"),
        Code.commentLines(col("content"), col("cmt")).as("c"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"))
  }
}
