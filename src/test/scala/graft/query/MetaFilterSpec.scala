package graft.query

import graft.SparkSpec
import graft.etl.{ActionDedup, Fixtures}
import org.apache.spark.sql.functions._

/** Operator matrix parity with the reference's checkMetaFilter tests
  * (tests/unit/common-functions.test.ts): eq/ne/gt/gte/lt/lte/contains/
  * starts_with/ends_with over dotted paths, array-any semantics, JSON
  * blob descent, asset coercion.
  */
class MetaFilterSpec extends SparkSpec {
  import spark.implicits._

  private lazy val actions =
    ActionDedup.mergeReceipts(Fixtures.rawTraces(spark, 30, 10, 2)).cache()

  private def count(f: MetaFilter): Long =
    actions.filter(MetaFilters.compile(actions.toDF(), f)).count()

  test("scalar comparisons on typed columns") {
    assert(count(MetaFilter("block_num", "eq", "100")) === 1)
    assert(count(MetaFilter("block_num", "gte", "100")) === actions.count())
    assert(count(MetaFilter("block_num", "lt", "100")) === 0)
    assert(count(MetaFilter("producer", "ne", "eosio")) === 0)
  }

  test("string operators") {
    assert(count(MetaFilter("trx_id", "starts_with", "ctrx")) === 30) // 10 customs x 3 levels
    assert(count(MetaFilter("trx_id", "contains", "rx000000")) > 0)
    assert(count(MetaFilter("block_id", "ends_with", "64")) === 1) // block 100 = 0x64
  }

  test("struct descent via dotted path") {
    assert(count(MetaFilter("act.name", "eq", "transfer")) === 30)
  }

  test("array-any over struct arrays (receipts, auth)") {
    assert(count(MetaFilter("receipts.receiver", "eq", "alice")) ===
      actions.filter(exists($"receipts", r => r.getField("receiver") === "alice")).count())
    assert(count(MetaFilter("act.authorization.actor", "eq", "bob")) ===
      actions.filter(exists($"act.authorization", a => a.getField("actor") === "bob")).count())
  }

  test("terminal scalar array → any-element match") {
    assert(count(MetaFilter("notified", "eq", "carol")) ===
      actions.filter(array_contains($"notified", "carol")).count())
  }

  test("descent into opaque JSON blob falls back to get_json_object") {
    // act.data is a JSON string: act.data.from navigates into it
    assert(count(MetaFilter("act.data.from", "eq", "alice")) ===
      actions.filter(get_json_object($"act.data", "$.from") === "alice").count())
    // numeric coercion inside the blob
    assert(count(MetaFilter("act.data.level", "gte", "1")) ===
      actions.filter(get_json_object($"act.data", "$.level").cast("double") >= 1).count())
  }

  test("asset coercion: quantity compares numerically when symbol matches") {
    val df = Seq(("1.5000 TST", 1), ("20.0000 TST", 2), ("5.0000 EOS", 3))
      .toDF("quantity", "id")
    val got = df.filter(MetaFilters.compile(df, MetaFilter("quantity", "gt", "1.0000 TST")))
      .select($"id").as[Int].collect().toSet
    assert(got === Set(1, 2)) // EOS row: symbol mismatch → null → excluded
  }

  test("and/or modes") {
    val fs = Seq(MetaFilter("act.name", "eq", "transfer"), MetaFilter("block_num", "lt", "110"))
    val andN = actions.filter(MetaFilters.compileAll(actions.toDF(), fs, andMode = true)).count()
    val orN = actions.filter(MetaFilters.compileAll(actions.toDF(), fs, andMode = false)).count()
    assert(andN === 10 && orN === 30)
  }

  test("unknown field raises") {
    intercept[IllegalArgumentException](count(MetaFilter("nope.deep", "eq", "x")))
  }
}
