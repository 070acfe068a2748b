package graft.streaming

import graft.SparkSpec
import graft.etl.Fixtures
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The StateSink boundary: any keyed-upsert writer drops in at the
  * foreachBatch seam (the reference's ES bulk router,
  * elastic-routes.ts:54-109). Proven by running the SAME stream through
  * (a) the parquet sink and (b) a deliberately naive in-memory sink, and
  * requiring identical last-writer-wins results.
  */
class StateSinkSpec extends SparkSpec {

  private val keyCols = Seq("code", "table", "scope", "primary_key")

  /** A minimal alternative sink: accumulates batches and recomputes the
    * LWW state from scratch — semantically equivalent, structurally
    * nothing like the bucketed parquet layout. Stands in for an ES/Delta
    * writer in the plug-compatibility test.
    */
  private final class NaiveMemorySink(val keys: Seq[String]) extends StateSink {
    var history: Option[DataFrame] = None
    var batches: Int = 0
    def mergeBatch(batch: DataFrame)(
        implicit spark: org.apache.spark.sql.SparkSession): Unit = synchronized {
      // materialize: the incoming micro-batch DataFrame is only valid
      // inside foreachBatch
      val rows = batch.collect().toSeq
      val frame = spark.createDataFrame(
        spark.sparkContext.parallelize(rows), batch.schema)
      history = Some(history.map(_.unionByName(frame)).getOrElse(frame))
      batches += 1
    }
    def read(implicit spark: org.apache.spark.sql.SparkSession): DataFrame =
      graft.state.StateMerge.fromHistory(history.get, keys)
  }

  test("a custom StateSink plugs into startStateSink and matches parquet LWW") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val rawDir = s"$tmp/deltas"
    Fixtures.deltas(spark, 120).write.parquet(rawDir)
    def stream = spark.readStream
      .schema(spark.read.parquet(rawDir).schema).parquet(rawDir)

    val parquetSink = new ParquetStateSink(s"$tmp/state", keyCols, nBuckets = 8)
    Ingest.startStateSink(stream, parquetSink, s"$tmp/ckpt_p")
      .awaitTermination(60000)
    val memorySink = new NaiveMemorySink(keyCols)
    Ingest.startStateSink(stream, memorySink, s"$tmp/ckpt_m")
      .awaitTermination(60000)

    assert(memorySink.batches > 0)
    val cols = memorySink.read.columns.toIndexedSeq.map(col)
    val fromParquet = parquetSink.read.select(cols: _*)
    val fromMemory = memorySink.read.select(cols: _*)
    assert(fromParquet.count() === fromMemory.count())
    assert(fromParquet.exceptAll(fromMemory).count() === 0)
    assert(fromMemory.exceptAll(fromParquet).count() === 0)
  }

  test("startStateMerge is exactly the parquet specialization (unchanged behavior)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sink2").toString
    val rawDir = s"$tmp/deltas"
    Fixtures.deltas(spark, 60).write.parquet(rawDir)
    def stream = spark.readStream
      .schema(spark.read.parquet(rawDir).schema).parquet(rawDir)
    Ingest.startStateMerge(stream, s"$tmp/state", s"$tmp/ckpt", keyCols, nBuckets = 4)
      .awaitTermination(60000)
    val viaSink = new ParquetStateSink(s"$tmp/state2", keyCols, nBuckets = 4)
    Ingest.startStateSink(stream, viaSink, s"$tmp/ckpt2")
      .awaitTermination(60000)
    val a = spark.read.parquet(s"$tmp/state")
    val b = viaSink.read.select(a.columns.toIndexedSeq.map(col): _*)
    assert(a.exceptAll(b).count() === 0)
    assert(b.exceptAll(a).count() === 0)
  }
}
