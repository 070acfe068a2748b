package graft.operators

import graft.SparkSpec
import graft.etl.{ActionDedup, Fixtures}
import org.apache.spark.sql.functions._

/** ABI as-of join semantics (J1): each action decodes against the ABI
  * version valid at its block; the union+window and broadcast plans must
  * agree with each other and with hand-computed expectations.
  */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val actions =
    ActionDedup.mergeReceipts(Fixtures.rawTraces(spark, 100, 50, 3))
      .withColumn("account", $"act.account").cache()
  private lazy val abis = Fixtures.abis(spark).toDF()

  test("as-of join picks the latest ABI at-or-before the action block") {
    val joined = AsOf.join(actions.toDF(), abis,
      keys = Seq("account"), probeSeq = "block_num", dimSeq = "block",
      payload = Seq("abi")).cache()
    // eosio.token: rev1 at block 50, rev2 at block 150 → transfers at
    // blocks 100..149 get rev1, 150..199 get rev2
    val tok = joined.filter($"account" === "eosio.token")
    assert(tok.filter($"block_num" < 150 && !$"abi".contains("\"rev\":1")).count() === 0)
    assert(tok.filter($"block_num" >= 150 && !$"abi".contains("\"rev\":2")).count() === 0)
    // hyp.test: rev1 at 80, rev2 at 320 → customs at 300..319 rev1, 320.. rev2
    val hyp = joined.filter($"account" === "hyp.test")
    assert(hyp.filter($"block_num" < 320 && !$"abi".contains("\"rev\":1")).count() === 0)
    assert(hyp.filter($"block_num" >= 320 && !$"abi".contains("\"rev\":2")).count() === 0)
    assert(joined.count() === actions.count(), "probe rows preserved")
  }

  test("custom-ABI overrides: open interval, precedence, latest-start tie-break (X5)") {
    val probe = Seq(
      (1L, "c1", 100L, "chainAbi"), // chain present → custom loses
      (2L, "c1", 100L, null),       // chain null → custom (10,200) serves
      (3L, "c1", 10L, null),        // b == start: STRICT, no match
      (4L, "c1", 500L, null),       // b == end (of the later def): STRICT, no match
      (5L, "c1", 150L, null),       // two defs cover → latest start wins
      (6L, "c2", 100L, null))       // no defs for c2 → none
      .toDF("gs", "account", "block_num", "abi")
    val customs = Seq(
      ("c1", 10L, 200L, "customA"),
      ("c1", 120L, 500L, "customB"))
      .toDF("account", "starting_block", "ending_block", "abi")
    val out = AsOf.withCustomAbi(probe, customs,
        keys = Seq("account"), blockCol = "block_num", chainAbiCol = "abi")
      .select($"gs", $"abi_resolved", $"abi_source")
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(out(0) === ((1L, "chainAbi", "chain")))
    assert(out(1) === ((2L, "customA", "custom")))
    assert(out(2) === ((3L, null, "none")))
    assert(out(3) === ((4L, null, "none")))
    assert(out(4) === ((5L, "customB", "custom"))) // start 120 > 10
    assert(out(5) === ((6L, null, "none")))
  }

  test("custom-ABI slim rowKey grouping is value-identical to the full-row group") {
    val probe = Seq(
      (1L, "c1", 100L, "chainAbi"),
      (2L, "c1", 100L, null),
      (3L, "c1", 150L, null), // two overlapping defs → latest start
      (4L, "c2", 100L, null))
      .toDF("gs", "account", "block_num", "abi")
    val customs = Seq(
      ("c1", 10L, 200L, "customA"),
      ("c1", 120L, 500L, "customB"))
      .toDF("account", "starting_block", "ending_block", "abi")
    def run(rk: Seq[String]) = AsOf.withCustomAbi(probe, customs,
        keys = Seq("account"), blockCol = "block_num", chainAbiCol = "abi",
        rowKey = rk)
      .select($"gs", $"account", $"block_num", $"abi_resolved", $"abi_source")
    val full = run(Nil)
    val slim = run(Seq("gs"))
    assert(slim.columns.toSeq === full.columns.toSeq)
    assert(full.exceptAll(slim).count() === 0 && slim.exceptAll(full).count() === 0)
  }

  test("probe rows before any dimension row carry null") {
    val probe = Seq(("a", 10L), ("a", 100L)).toDF("account", "block_num")
    val dim = Seq(("a", 50L, "v1")).toDF("account", "block", "abi")
    val out = AsOf.join(probe, dim, Seq("account"), "block_num", "block", Seq("abi"))
      .orderBy($"block_num").select($"abi").as[String].collect()
    assert(out.toSeq === Seq(null, "v1"))
  }

  test("dimension row at exactly the probe block applies (<= semantics)") {
    val probe = Seq(("a", 50L)).toDF("account", "block_num")
    val dim = Seq(("a", 50L, "v1")).toDF("account", "block", "abi")
    val out = AsOf.join(probe, dim, Seq("account"), "block_num", "block", Seq("abi"))
    assert(out.select($"abi").as[String].head() === "v1")
  }

  test("broadcast variant agrees with union+window variant") {
    val a = AsOf.join(actions.toDF(), abis, Seq("account"), "block_num", "block", Seq("abi"))
      .select($"global_sequence", $"abi")
    val b = AsOf.joinBroadcast(actions.toDF(), abis, Seq("account"), "block_num", "block", Seq("abi"))
      .select($"global_sequence", $"abi")
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }
}

class GapsSpec extends SparkSpec {
  import spark.implicits._

  test("windowed and bucketed gap detection agree") {
    val present = ((1L to 100L) ++ (150L to 220L) ++ Seq(222L, 225L) ++ (300L to 320L))
    val df = present.toDF("seq")
    val expected = Set((101L, 149L), (221L, 221L), (223L, 224L), (226L, 299L))
    val a = Gaps.detect(df, "seq").as[(Long, Long)].collect().toSet
    val b = Gaps.detectBucketed(df, "seq", bucketSize = 64).as[(Long, Long)].collect().toSet
    assert(a === expected)
    assert(b === expected)
  }

  test("no gaps → empty result") {
    val df = (1L to 50L).toDF("seq")
    assert(Gaps.detect(df, "seq").count() === 0)
    assert(Gaps.detectBucketed(df, "seq", 16).count() === 0)
  }

  test("bucketed variant works when the source column is not named seq") {
    val df = Seq(1L, 2L, 5L, 9L, 10L).toDF("event_id")
    val got = Gaps.detectBucketed(df, "event_id", bucketSize = 4).as[(Long, Long)].collect().toSet
    assert(got === Set((3L, 4L), (6L, 8L)))
  }
}
