package graft.query

import graft.SparkSpec
import graft.etl.{ActionDedup, Extensions, Fixtures}
import org.apache.spark.sql.functions._

class FilterCompilerSpec extends SparkSpec {
  import spark.implicits._

  private lazy val actions =
    Extensions.liftTransfer(
      ActionDedup.mergeReceipts(Fixtures.rawTraces(spark, 40, 20, 2))).cache()

  test("F1 term equality") {
    val n = actions.filter(FilterCompiler.termMatch("producer", "eosio")).count()
    assert(n === actions.count())
  }

  test("F3/F4 multi-value with negation: a,b,!c grammar") {
    val c = FilterCompiler.multiVar("act.name", "transfer,doit,!inline")
    val got = actions.filter(c).select($"act.name").distinct().as[String].collect().toSet
    assert(got === Set("transfer", "doit"))
    val negOnly = actions.filter(FilterCompiler.multiVar("act.name", "!transfer"))
      .select($"act.name").distinct().as[String].collect().toSet
    assert(!negOnly.contains("transfer") && negOnly.nonEmpty)
  }

  test("F6 numeric range lo-hi, open ends") {
    assert(actions.filter(FilterCompiler.rangeQuery("block_num", "100-109")).count() === 10)
    assert(actions.filter(FilterCompiler.rangeQuery("block_num", "300-")).count() ===
      actions.filter($"block_num" >= 300).count())
  }

  test("F5 time filter dispatch: integers bound block_num, ISO bounds timestamp") {
    val byBlock = FilterCompiler.timeFilter(Some("100"), Some("105")).get
    assert(actions.filter(byBlock).count() ===
      actions.filter($"block_num".between(100, 105)).count())
    val byTime = FilterCompiler.timeFilter(
      Some("2023-11-14 22:14:15"), None).get
    assert(actions.filter(byTime).count() > 0)
  }

  test("F7 account expansion matches notified, receipt receiver and actor") {
    val alice = actions.filter(FilterCompiler.accountExpansion("alice"))
    // every action authorized by alice or notifying alice
    val expected = actions.filter(
      array_contains($"notified", "alice") ||
        exists($"act.authorization", a => a.getField("actor") === "alice"))
    assert(alice.count() === expected.count() && alice.count() > 0)
  }

  test("F7 compiles to codegen-friendly membership, never an exists HOF") {
    // this predicate runs once per action row on the hottest endpoint;
    // a higher-order function here drags the filter out of whole-stage
    // codegen (the hazard class behind the fused exprs.* rewrites)
    val pred = org.apache.spark.sql.GraftShim.expression(
      FilterCompiler.accountExpansion("alice"))
    val hofs = pred.collect {
      case h: org.apache.spark.sql.catalyst.expressions.HigherOrderFunction => h
    }
    assert(hofs.isEmpty, s"HOFs found in accountExpansion: $hofs")
  }

  test("F8 code:action filter list with wildcards") {
    val c = FilterCompiler.codeActionFilters("eosio.token:transfer,hyp.test:*")
    assert(actions.filter(c).count() === actions.count())
    val onlyDoit = FilterCompiler.codeActionFilters("hyp.test:doit")
    assert(actions.filter(onlyDoit).select($"act.name").distinct().as[String].collect().toSet === Set("doit"))
  }

  test("F10 memo fuzzy match via bounded levenshtein") {
    val memos = Seq("payment 1", "paymnt 1", "refund").toDF("memo")
    assert(memos.filter(FilterCompiler.memoMatch("memo", "payment")).count() === 1)
    assert(memos.filter(FilterCompiler.memoMatch("memo", "payment", fuzziness = 2)).count() === 2)
  }

  test("O1-O4 paging guards mirror the reference") {
    assert(Paging.sortDir(Some("asc")) && !Paging.sortDir(Some("-1")) && !Paging.sortDir(None))
    intercept[IllegalArgumentException](Paging.sortDir(Some("sideways")))
    assert(Paging.skipLimit(Some(10), Some(5000)) === ((10, 1000))) // route cap
    intercept[IllegalArgumentException](Paging.skipLimit(Some(20000), None))
    intercept[IllegalArgumentException](Paging.checkAscGuard(true, None, None))
    Paging.checkAscGuard(true, Some("100"), None) // bounded → fine
  }

  test("O6 capped count early-terminates at cap") {
    assert(Paging.trackedCount(actions.toDF(), track = false, cap = 10) === 10L)
    assert(Paging.trackedCount(actions.toDF(), track = true) === actions.count())
  }

  test("O7 v1 pos/offset arithmetic") {
    assert(Paging.posOffset(-1L, -5L) === ((0L, 6L, false)))
    assert(Paging.posOffset(0L, 9L) === ((0L, 10L, true)))
    assert(Paging.posOffset(100L, -10L) === ((90L, 11L, true)))
  }
}
