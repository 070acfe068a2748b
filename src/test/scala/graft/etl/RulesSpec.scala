package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RulesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val actions =
    ActionDedup.mergeReceipts(Fixtures.rawTraces(spark, 20, 10, 2)).cache()

  test("blacklist removes code::name, code::*, *::name matches; wins over whitelist (F15)") {
    val out = Rules.filterActions(actions.toDF(),
      FilterRules(blacklist = Seq("eosio.token::transfer")))
    assert(out.filter($"act.name" === "transfer").count() === 0)
    assert(out.count() === 30)
    val wild = Rules.filterActions(actions.toDF(), FilterRules(blacklist = Seq("hyp.test::*")))
    assert(wild.count() === 20)
    val byName = Rules.filterActions(actions.toDF(), FilterRules(blacklist = Seq("*::inline")))
    assert(byName.filter($"act.name" === "inline").count() === 0)
    val conflict = Rules.filterActions(actions.toDF(), FilterRules(
      whitelist = Seq("eosio.token::transfer"), blacklist = Seq("eosio.token::transfer")))
    assert(conflict.count() === 0)
  }

  test("whitelist restricts to matching rows only") {
    val out = Rules.filterActions(actions.toDF(), FilterRules(whitelist = Seq("hyp.test::doit")))
    assert(out.count() === 10)
  }

  test("plugin registry transforms only the matching slice, preserves schema (X1/X4)") {
    val plugin = PluginRegistry.Plugin("eosio.token::transfer",
      df => df.withColumn("producer", lit("PLUGIN")))
    val out = PluginRegistry(actions.toDF(), Seq(plugin)).cache()
    assert(out.count() === actions.count())
    assert(out.filter($"producer" === "PLUGIN").count() === 20)
    assert(out.filter($"act.name" =!= "transfer" && $"producer" === "PLUGIN").count() === 0)
  }
}

class NamesSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.Names

  test("identifier validation regexes (C6)") {
    val df = Seq("alice", "eosio.token", "Bad", "toolongname55555", ".lead", "a")
      .toDF("n").withColumn("ok", Names.isValidAccount($"n"))
    val got = df.as[(String, Boolean)].collect().toMap
    assert(got("alice") && got("eosio.token") && got("a"))
    assert(!got("Bad") && !got("toolongname55555") && !got(".lead"))
    assert(Seq("TST").toDF("s").select(Names.isValidSymbol($"s")).as[Boolean].head())
    assert(!Seq("tst8").toDF("s").select(Names.isValidSymbol($"s")).as[Boolean].head())
    assert(Seq("AB" * 32).toDF("t").select(Names.isValidTrxId($"t")).as[Boolean].head())
  }

  test("cache key is deterministic sha256 (C4)") {
    val df = Seq(("chain", "route", "params")).toDF("a", "b", "c")
    val k1 = df.select(Names.cacheKey($"a", $"b", $"c")).as[String].head()
    assert(k1.length === 64 && k1 === df.select(Names.cacheKey($"a", $"b", $"c")).as[String].head())
  }
}
