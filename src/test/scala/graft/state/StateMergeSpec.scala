package graft.state

import graft.SparkSpec
import graft.etl.Fixtures
import org.apache.spark.sql.functions._

class StateMergeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val deltas = Fixtures.deltas(spark, 120).toDF().cache()

  test("incremental merge over batches equals recompute-from-history") {
    val keys = Seq("code", "table", "scope", "primary_key")
    // split the history into 4 chronological batches and fold merge
    val batches = (0 until 4).map(i =>
      deltas.filter($"block_num" >= (200 + i * 30) && $"block_num" < (200 + (i + 1) * 30)))
    val empty = deltas.limit(0)
    val folded = batches.foldLeft(empty)((st, b) => StateMerge.merge(st, b, keys))
    val recomputed = StateMerge.fromHistory(deltas, keys)
    assert(folded.select(keys.map(col) :+ col("block_num"): _*)
      .exceptAll(recomputed.select(keys.map(col) :+ col("block_num"): _*)).count() === 0)
    assert(folded.count() === recomputed.count())
  }

  test("present == 0 deletes the row from state") {
    val keys = Seq("code", "table", "scope", "primary_key")
    val state = StateMerge.fromHistory(deltas, keys)
    // fixture deletes at i = 36, 73, 110 → keys row6/row3/row0 in some scope;
    // a deletion only holds if no later update re-creates the key
    val deleted = deltas.filter($"present" === 0)
      .select($"scope", $"primary_key", $"block_num".as("del_block"))
    val resurrection = deltas.filter($"present" === 1)
      .join(deleted, Seq("scope", "primary_key"))
      .filter($"block_num" > $"del_block")
    val stillDeleted = deleted.join(resurrection.select($"scope", $"primary_key").distinct(),
      Seq("scope", "primary_key"), "left_anti")
    val leaked = state.join(stillDeleted, Seq("scope", "primary_key"), "left_semi")
    assert(leaked.count() === 0)
  }

  test("batch beats prior state at equal block_num (scripted-upsert tie rule)") {
    val keys = Seq("k")
    val state = Seq(("a", 10L, 1, "old")).toDF("k", "block_num", "present", "v")
    val batch = Seq(("a", 10L, 1, "new")).toDF("k", "block_num", "present", "v")
    val out = StateMerge.merge(state, batch, keys)
    assert(out.select($"v").as[String].head() === "new")
  }
}

class ForksSpec extends SparkSpec {
  import spark.implicits._

  test("re-adopted blocks cancel their tombstone; live view drops forked rows") {
    val events = Fixtures.forkEvents(spark)
    val tombs = Forks.effectiveTombstones(events)
    val ids = tombs.as[String].collect().toSet
    assert(ids.size === 1 && ids.head.endsWith("96")) // block 150 = 0x96 forked; 151 re-adopted
    val history = Seq(
      (f"00${150L}%014x", 150L, "x"), (f"00${151L}%014x", 151L, "y"), (f"00${152L}%014x", 152L, "z"))
      .toDF("block_id", "block_num", "payload")
    val live = Forks.liveView(history, tombs)
    assert(live.select($"block_num").as[Long].collect().toSet === Set(151L, 152L))
  }

  test("LIB pruning keeps only reversible-window tombstones") {
    val t = Seq(("a", 100L), ("b", 200L)).toDF("block_id", "block_num")
    assert(Forks.pruneBelowLib(t, lib = 150L).select($"block_id").as[String].collect().toSeq === Seq("b"))
  }
}
