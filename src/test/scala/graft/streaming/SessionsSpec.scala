package graft.streaming

import graft.SparkSpec
import graft.schema._
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class SessionsSpec extends SparkSpec {
  import spark.implicits._

  private def trace(trx: String, block: Long, gs: Long, digest: String,
      tsMs: Long): RawTrace =
    RawTrace(new Timestamp(tsMs), block, f"b$block%08d", "eosio", trx,
      1, 0, Act("c", "a", Seq(Authorization("x", "active")), "{}"),
      Receipt("c", gs, 1L, Nil), digest, 1, 1, Nil)

  test("transaction receipts split across micro-batches assemble via keyed state") {
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1700000000000L
    val input = MemoryStream[RawTrace]
    val out = Sessions.assembleTransactions(input.toDS(), lateness = "5 seconds")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("trx_out")
      .trigger(Trigger.ProcessingTime("100 milliseconds")).start()
    try {
      // batch 1: two receipts of trxA, one of trxB
      input.addData(
        trace("trxA", 10L, 100L, "d1", t0),
        trace("trxA", 10L, 101L, "d1", t0),
        trace("trxB", 10L, 102L, "d2", t0))
      q.processAllAvailable()
      // batch 2: trxA's THIRD receipt arrives in a later micro-batch
      input.addData(trace("trxA", 10L, 103L, "d3", t0 + 1000))
      q.processAllAvailable()
      assert(spark.table("trx_out").count() === 0, "nothing finalizes before watermark")
      // batch 3: advance event time far beyond lateness → watermark passes
      input.addData(trace("trxLate", 99L, 999L, "dx", t0 + 60000))
      q.processAllAvailable()
      input.addData(trace("trxLater", 100L, 1000L, "dy", t0 + 120000))
      q.processAllAvailable()
      val rows = spark.table("trx_out").as[TrxSession].collect().map(r => r.trx_id -> r).toMap
      assert(rows.contains("trxA") && rows.contains("trxB"))
      val a = rows("trxA")
      assert(a.n_receipts === 3, "receipts from both batches merged")
      assert(a.n_actions === 2, "distinct digests d1, d3")
      assert(a.min_global_sequence === 100L && a.max_global_sequence === 103L)
      assert(rows("trxB").n_receipts === 1)
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS trx_out")
    }
  }
}
