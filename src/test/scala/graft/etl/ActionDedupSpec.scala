package graft.etl

import graft.SparkSpec
import graft.schema._
import org.apache.spark.sql.functions._

/** Receipts-merge invariants mirroring the reference's dedup unit tests
  * (tests/unit/action-dedup.test.ts): notification merge, inline
  * separation, duplicate roots kept, receipt conservation.
  */
class ActionDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val traces = Fixtures.rawTraces(spark, transfers = 20, customs = 10, depth = 3)
  private lazy val actions = ActionDedup.mergeReceipts(traces).cache()

  test("notification receipts merge into one action with all receipts") {
    val transferActions = actions.filter($"act.name" === "transfer")
    assert(transferActions.count() === 20)
    val receiptCounts = transferActions.select(size($"receipts")).as[Int].collect()
    assert(receiptCounts.forall(_ === 3), "every transfer carries contract+from+to receipts")
  }

  test("inline actions with distinct digests stay separate") {
    val custom = actions.filter($"act.account" === "hyp.test")
    assert(custom.count() === 10 * 4) // root + 3 inline levels
    assert(custom.filter(size($"receipts") =!= 1).count() === 0)
  }

  test("receipt conservation: no receipt lost or duplicated") {
    val in = traces.count()
    val out = actions.select(explode($"receipts")).count()
    assert(in === out)
  }

  test("global_sequence is the min receipt sequence; notified ordered by receipt") {
    val row = actions.filter($"act.name" === "transfer")
      .orderBy($"global_sequence").select($"global_sequence", $"notified").head()
    assert(row.getLong(0) === 1000001L)
    assert(row.getSeq[String](1).head === "eosio.token")
  }

  test("inline_count = receipts - 1 (reference counts extra notified receivers)") {
    val bad = actions.filter(size($"receipts") - 1 =!= $"inline_count").count()
    assert(bad === 0)
  }

  test("duplicate root actions with identical digests in different trxs are kept") {
    // two transactions containing byte-identical actions (same digest per
    // trx but distinct trx_id) must not merge across transactions
    val a = Act("eosio.token", "transfer", Seq(Authorization("alice", "active")), "{}")
    val t = new java.sql.Timestamp(1700000000000L)
    val rows = Seq(
      RawTrace(t, 1L, "b1", "p", "trxA", 1, 0, a, Receipt("alice", 1L, 1L, Nil), "DIG", 1, 1, Nil),
      RawTrace(t, 1L, "b1", "p", "trxB", 1, 0, a, Receipt("alice", 2L, 1L, Nil), "DIG", 1, 1, Nil))
    val out = ActionDedup.mergeReceipts(spark.createDataset(rows))
    assert(out.count() === 2)
  }
}

class LightBlocksSpec extends SparkSpec {
  import spark.implicits._

  test("light block roll-up: executed counts, usage sums, failures") {
    val lb = LightBlocks.derive(Fixtures.trxStatuses(spark)).cache()
    // transfer blocks: 1 executed trx each
    assert(lb.filter($"block_num" === 100L).select($"trx_count").as[Long].head() === 1L)
    // custom block with i % 13 == 12 → failed
    val failedBlock = lb.filter($"block_num" === (300L + 12))
    assert(failedBlock.select($"trx_count").as[Long].head() === 0L)
    assert(failedBlock.select($"failed_count").as[Long].head() === 1L)
    val failed = LightBlocks.failedTrxs(Fixtures.trxStatuses(spark))
    assert(failed.count() === 3) // customs with i % 13 == 12: i = 12, 25, 38
  }
}
