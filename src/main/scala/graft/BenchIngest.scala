package graft

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.schema._

/** Ingest-throughput benchmark — the WRITE-side parity number: sustained
  * blocks/sec, actions/sec and deltas/sec through the three production
  * ingest paths ([[graft.streaming.Ingest.startActionIngest]] receipts-
  * merge history, [[graft.streaming.Ingest.startDecodedActionIngest]]
  * with the real ABI decode ladder + auto-blacklist, and
  * [[graft.streaming.Ingest.startStateMerge]] LWW state), each driven as
  * a genuine Structured Streaming query over multi-file parquet sources
  * split into micro-batches with `maxFilesPerTrigger`.
  *
  * The reference's engineered cadence is 500 ms/block (BASELINE.md:
  * state-reader.ts:530,586 assumes 2 blocks/sec chain production), so
  * `headroom_vs_chain` = measured blocks/sec ÷ 2 — how many times faster
  * than real-time the engine drains a backlog on one node.
  *
  * Scale knob: SPARK_GRAFT_INGEST_BLOCKS (default 5000; the 10× row sets
  * 50000). Fixture shape mirrors graft.etl.Fixtures: every transfer
  * fans out to 3 receipt rows (token contract + both parties) that
  * receipts-merge collapses to one action, so raw rows = 3 × actions.
  *
  * Prints ONE JSON line; per-phase micro-batch stats (batch count, mean/
  * max trigger ms) come from the streaming progress log, not wall-clock
  * division, so framework idle time is visible rather than averaged away.
  */
object BenchIngest {

  private def ts(block: Long): Timestamp = new Timestamp(1600000000000L + block * 500L)
  private[graft] def blockId(n: Long): String = f"00${n}%014x"
  private val accounts = Vector("alice", "bob", "carol", "dave")

  /** Distributed raw-trace generator: `txPerBlock` transfers per block,
    * 3 receipt rows each (the receipts-merge input shape).
    */
  def traces(spark: SparkSession, nBlocks: Long, txPerBlock: Int,
      blockOffset: Long = 0L): Dataset[RawTrace] = {
    import spark.implicits._
    spark.range(0L, nBlocks, 1L, 32).flatMap { b =>
      val block = 1000L + blockOffset + b
      (0 until txPerBlock).flatMap { t =>
        // i keys the GLOBAL sequence numbers: offset rides along so
        // multi-segment soaks produce chain-realistic monotone sequences,
        // never cross-segment duplicates
        val i = (blockOffset + b) * txPerBlock + t
        val from = accounts((i % 4).toInt)
        val to = accounts(((i + 1) % 4).toInt)
        val act = Act("eosio.token", "transfer",
          Seq(Authorization(from, "active")),
          s"""{"from":"$from","to":"$to","quantity":"${i % 50 + 1}.0000 TST","memo":"payment $i"}""")
        Seq("eosio.token", from, to).zipWithIndex.map { case (recv, j) =>
          RawTrace(ts(block), block, blockId(block), "eosio", f"trx$i%012d",
            action_ordinal = 1, creator_action_ordinal = 0, act = act,
            receipt = Receipt(recv, i * 4 + j, 10L + j,
              if (j == 0) Seq(AuthSequence(from, i)) else Nil),
            act_digest = f"digest-$i%012d", cpu_usage_us = 150,
            net_usage_words = 16, signatures = Seq(s"SIG_K1_$i"))
        }
      }
    }
  }

  /** Distributed delta generator: update pressure via a keyspace 1/4 the
    * row count, a delete every 10th row — the LWW merge's worst honest
    * shape (every batch touches most buckets).
    */
  def deltas(spark: SparkSession, n: Long): Dataset[DeltaDoc] = {
    import spark.implicits._
    spark.range(0L, n, 1L, 32).map { i =>
      val block = 1000L + i / 16
      val key = i % (n / 4 max 1L)
      DeltaDoc(ts(block), block, blockId(block), "hyp.test", "scope1", "kv",
        accounts((i % 4).toInt), s"k$key", if (i % 10 == 9) 0 else 1,
        s"""{"v":$i}""")
    }
  }

  /** Hex-action generator for the decode ladder: a pool of REAL
    * abi-encoded transfer payloads (driver-rendered once) tiled over the
    * corpus, with 2% undecodable rows so the ladder and the
    * auto-blacklist do real work.
    */
  def hexActions(spark: SparkSession, n: Long, actionsPerBlock: Int): DataFrame = {
    import spark.implicits._
    val abi =
      """{"version":"eosio::abi/1.2","structs":[{"name":"transfer","base":"","fields":[{"name":"from","type":"name"},{"name":"to","type":"name"},{"name":"quantity","type":"asset"},{"name":"memo","type":"string"}]}],"actions":[{"name":"transfer","type":"transfer"}]}"""
    val parsed = graft.functions.AntelopeAbi.parseAbi(abi)
    val pool = (0 until 64).map { i =>
      graft.functions.AntelopeAbi.jsonToHex(parsed, "transfer",
        s"""{"from":"${accounts(i % 4)}","to":"${accounts((i + 1) % 4)}","quantity":"${i + 1}.0000 TST","memo":"m$i"}""")
    }.toIndexedSeq
    spark.range(0L, n, 1L, 32).map { i =>
      if (i % 50 == 49) // 2%: one persistently undecodable contract::action
        (i, 1000L + i / actionsPerBlock, "bad.ctr", "weird", "deadbeef", abi)
      else
        (i, 1000L + i / actionsPerBlock, "eosio.token", "transfer",
          pool((i % 64).toInt), abi)
    }.toDF("global_sequence", "block_num", "code", "name", "data", "abi")
  }

  /** Run one streaming phase: time to drain `raw` (written as `nFiles`
    * parquet files, `filesPerTrigger` per micro-batch) through `start`.
    */
  private def phase(
      spark: SparkSession,
      dir: String,
      source: DataFrame,
      nFiles: Int,
      filesPerTrigger: Int)(
      start: DataFrame => StreamingQuery): (Double, Seq[Double]) = {
    val raw = s"$dir/raw"
    // block-keyed files, like the chain stream: a block's rows (all
    // receipts of an action, all deltas of a block) arrive together, so
    // per-micro-batch receipts-merge sees whole actions
    source.repartition(nFiles, col("block_num")).write.parquet(raw)
    val stream = spark.readStream
      .schema(spark.read.parquet(raw).schema)
      .option("maxFilesPerTrigger", filesPerTrigger.toString)
      .parquet(raw)
    val t0 = System.nanoTime()
    val q = start(stream)
    require(q.awaitTermination(1800000), "ingest phase did not finish in 30m")
    val wall = (System.nanoTime() - t0) / 1e9
    val batchMs = q.recentProgress.toIndexedSeq
      .filter(_.numInputRows > 0)
      .map(_.durationMs.get("triggerExecution").toDouble)
    (wall, batchMs)
  }

  def main(args: Array[String]): Unit = {
    val nBlocks = sys.env.getOrElse("SPARK_GRAFT_INGEST_BLOCKS", "5000").toLong
    val txPerBlock = 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val sp: SparkSession = spark
    val base = java.nio.file.Files.createTempDirectory("graft_bench_ingest").toString
    val nFiles = 40
    val perTrigger = 4 // → ~10 micro-batches per phase

    // phase 1: receipts-merge action ingest (S1/S4 history path)
    val actions = nBlocks * txPerBlock
    val (w1, b1) = phase(spark, s"$base/p1",
      traces(spark, nBlocks, txPerBlock).toDF(), nFiles, perTrigger) { s =>
      graft.streaming.Ingest.startActionIngest(
        s, s"$base/p1/out", s"$base/p1/ckpt", partitionSize = 100000L)
    }
    val written1 = spark.read.parquet(s"$base/p1/out").count()

    // phase 2: decode-ladder ingest (real ABI codec + auto-blacklist)
    val (w2, b2) = phase(spark, s"$base/p2",
      hexActions(spark, actions, txPerBlock), nFiles, perTrigger) { s =>
      graft.streaming.Ingest.startDecodedActionIngest(
        s, s"$base/p2/out", s"$base/p2/blacklist", s"$base/p2/ckpt",
        partitionSize = 100000L)
    }
    val decoded = spark.read.parquet(s"$base/p2/out")
    val decodedOk = decoded.filter(!col("ds_error")).count()
    val decodedAll = decoded.count()

    // phase 3: LWW state merge (S5 path)
    val nDeltas = nBlocks * 16
    val (w3, b3) = phase(spark, s"$base/p3",
      deltas(spark, nDeltas).toDF(), nFiles, perTrigger) { s =>
      graft.streaming.Ingest.startStateMerge(
        s, s"$base/p3/out", s"$base/p3/ckpt",
        keys = Seq("code", "table", "scope", "primary_key"))
    }

    def fmt(v: Double) = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    def stats(name: String, wall: Double, records: Long, blocks: Long,
        batches: Seq[Double]): String = {
      val mean = if (batches.nonEmpty) batches.sum / batches.size else 0.0
      s""""$name":{"wall_sec":${fmt(wall)},"records":$records,"records_per_sec":${fmt(records / wall)},""" +
        s""""blocks":$blocks,"blocks_per_sec":${fmt(blocks / wall)},""" +
        s""""micro_batches":${batches.size},"batch_ms_mean":${fmt(mean)},"batch_ms_max":${fmt(if (batches.nonEmpty) batches.max else 0.0)}}"""
    }
    // headline = the SLOWEST phase's block rate: the reference indexer
    // runs action indexing and state maintenance concurrently, so
    // sustained end-to-end pace is bounded by the weakest path
    val blocksPerSec = Seq(nBlocks / w1, nBlocks / w2, nBlocks / w3).min
    val line =
      s"""{"metric":"ingest_throughput","value":${fmt(blocksPerSec)},"unit":"blocks/sec","nblocks":$nBlocks,""" +
        s""""headroom_vs_chain":${fmt(blocksPerSec / 2.0)},"phases":{""" +
        stats("action_ingest", w1, written1, nBlocks, b1) + "," +
        stats("decoded_ingest", w2, decodedAll, nBlocks, b2) + "," +
        stats("state_merge", w3, nDeltas, nBlocks, b3) +
        s"""},"decode_ok":$decodedOk,"raw_rows":${actions * 3}}"""
    println(line)
    spark.stop()
  }
}
