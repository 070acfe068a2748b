package graft.exprs

import graft.SparkSpec
import graft.etl.{ActionDedup, Fixtures}
import org.apache.spark.sql.functions._

class ReceiptsMergeAggSpec extends SparkSpec {
  import spark.implicits._

  test("typed Aggregator equals the DataFrame receipts-merge path") {
    val traces = Fixtures.rawTraces(spark, 30, 10, 2)
    val typed = traces
      .groupByKey(t => (t.trx_id, t.act_digest))
      .agg(ReceiptsMergeAgg.toColumn.name("m"))
      .select($"m.global_sequence".as("global_sequence"),
        size($"m.receipts").as("n_receipts"),
        $"m.notified".as("notified"),
        $"m.inline_count".as("inline_count"))
    val frame = ActionDedup.mergeReceipts(traces)
      .select($"global_sequence", size($"receipts").as("n_receipts"),
        $"notified", $"inline_count")
    assert(typed.exceptAll(frame).count() === 0)
    assert(frame.exceptAll(typed).count() === 0)
  }
}

class SurvivorsSpec extends SparkSpec {
  import spark.implicits._

  test("greedy survivor rule keeps min-id per near-dup pair set") {
    val docs = (1L to 10L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 5L), (1L, 7L), (2L, 9L)).toDF("id_a", "id_b")
    val kept = graft.operators.Dedup.survivors(docs, pairs, "doc_id")
      .select($"doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 3L, 4L, 6L, 8L, 10L))
  }
}
