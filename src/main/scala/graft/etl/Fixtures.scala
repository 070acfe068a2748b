package graft.etl

import graft.schema._
import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic Hyperion-shaped fixtures, mirroring the reference's e2e
  * load-generator profile (tests/e2e/lib/load-generator.ts:43-48: 100
  * transfers + 50 custom actions, inline depth 3) and its manifest-driven
  * integrity checks. Seeded arithmetic only — stable across runs/JVMs.
  */
object Fixtures {

  val accounts = Vector("alice", "bob", "carol", "dave")
  private def ts(block: Long): Timestamp =
    new Timestamp(1700000000000L + block * 500L) // 500 ms block cadence

  private def blockId(n: Long): String = f"00${n}%014x"

  /** Raw per-receipt trace rows: `transfers` transfer transactions (one
    * action, 3 receipts: contract + from + to) and `customs` custom
    * actions with `depth` inline children (1 receipt each, distinct
    * digests). Matches the shapes exercised by the reference's
    * action-dedup unit tests (tests/unit/action-dedup.test.ts).
    */
  def rawTraces(spark: SparkSession, transfers: Int = 100, customs: Int = 50,
      depth: Int = 3): Dataset[RawTrace] = {
    import spark.implicits._
    var gs = 1000000L
    val rows = Vector.newBuilder[RawTrace]

    (0 until transfers).foreach { i =>
      val block = 100L + i
      val from = accounts(i % accounts.size)
      val to = accounts((i + 1) % accounts.size)
      val trx = f"trx${i}%08d"
      val digest = f"digest-transfer-$i%05d"
      val act = Act("eosio.token", "transfer",
        Seq(Authorization(from, "active")),
        s"""{"from":"$from","to":"$to","quantity":"${(i % 50) + 1}.0000 TST","memo":"payment $i"}""")
      Seq("eosio.token", from, to).zipWithIndex.foreach { case (recv, j) =>
        gs += 1
        rows += RawTrace(ts(block), block, blockId(block), "eosio", trx,
          action_ordinal = 1, creator_action_ordinal = 0, act = act,
          receipt = Receipt(recv, gs, 10L + i + j,
            if (j == 0) Seq(AuthSequence(from, i.toLong)) else Nil),
          act_digest = digest, cpu_usage_us = 150 + i, net_usage_words = 16,
          signatures = Seq(s"SIG_K1_$i"))
      }
    }

    (0 until customs).foreach { i =>
      val block = 300L + i
      val actor = accounts(i % accounts.size)
      val trx = f"ctrx${i}%08d"
      (0 to depth).foreach { lvl =>
        gs += 1
        val act = Act("hyp.test", if (lvl == 0) "doit" else "inline",
          Seq(Authorization(actor, "active")),
          s"""{"id":$i,"level":$lvl,"payload":"${"x" * 64}"}""")
        rows += RawTrace(ts(block), block, blockId(block), "eosio", trx,
          action_ordinal = lvl + 1, creator_action_ordinal = lvl, act = act,
          receipt = Receipt("hyp.test", gs, 20L + i, Seq(AuthSequence(actor, i.toLong))),
          act_digest = f"digest-custom-$i%05d-$lvl",
          cpu_usage_us = 80 + lvl, net_usage_words = 24, signatures = Nil)
      }
    }
    spark.createDataset(rows.result())
  }

  /** Per-transaction status rows for light-block derivation: one status
    * row per fixture transaction; every 13th custom trx fails (status 2).
    */
  def trxStatuses(spark: SparkSession, transfers: Int = 100, customs: Int = 50): Dataset[TrxStatus] = {
    import spark.implicits._
    val t = (0 until transfers).map { i =>
      TrxStatus(100L + i, f"trx${i}%08d", 0, 250L + i, 48L)
    }
    val c = (0 until customs).map { i =>
      TrxStatus(300L + i, f"ctrx${i}%08d", if (i % 13 == 12) 2 else 0, 320L, 96L)
    }
    spark.createDataset(t ++ c)
  }

  /** ABI as-of dimension: per contract, versions at increasing blocks. */
  def abis(spark: SparkSession): Dataset[AbiDoc] = {
    import spark.implicits._
    spark.createDataset(Seq(
      AbiDoc(50L, "eosio.token", """{"version":"eosio::abi/1.1","rev":1}""", "0a11"),
      AbiDoc(150L, "eosio.token", """{"version":"eosio::abi/1.2","rev":2}""", "0a12"),
      AbiDoc(80L, "hyp.test", """{"version":"eosio::abi/1.1","rev":1}""", "0b11"),
      AbiDoc(320L, "hyp.test", """{"version":"eosio::abi/1.2","rev":2}""", "0b12")))
  }

  /** Delta rows for a contract table with updates and a deletion —
    * exercises last-writer-wins + present==0 semantics.
    */
  def deltas(spark: SparkSession, n: Int = 120): Dataset[DeltaDoc] = {
    import spark.implicits._
    val rows = (0 until n).map { i =>
      val key = s"row${i % 10}"  // 10 keys, repeatedly updated
      val block = 200L + i
      DeltaDoc(ts(block), block, blockId(block),
        code = "hyp.test", scope = accounts(i % accounts.size), table = "kv",
        payer = accounts(i % accounts.size), primary_key = key,
        present = if (i % 37 == 36) 0 else 1,
        data = s"""{"k":"$key","v":$i}""")
    }
    spark.createDataset(rows)
  }

  /** Light blocks with a rotating producer schedule and planted holes —
    * producers p0..p3 each produce 6-block rounds; blocks where
    * `num % 50 == 49` are missing (missed-block detection fodder).
    */
  def blocks(spark: SparkSession, n: Int = 200): Dataset[BlockDoc] = {
    import spark.implicits._
    val producers = Vector("prodalpha", "prodbeta", "prodgamma", "proddelta")
    val rows = (0 until n).filter(i => i % 50 != 49).map { i =>
      val num = 100L + i
      BlockDoc(ts(num), num, blockId(num), blockId(num - 1),
        producers((i / 6) % producers.size),
        schedule_version = 1L + i / 100,
        trx_count = (i % 5).toLong, cpu_usage = 1000L + i, net_usage = 500L + i)
    }
    spark.createDataset(rows)
  }

  /** Token-balance state rows (the `*:accounts` lifted table): one row per
    * (account, symbol) with an asset-string balance.
    */
  def accountBalances(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val syms = Vector("TST", "EOS", "HYP")
    accounts.flatMap { a =>
      syms.zipWithIndex.collect {
        case (s, i) if (a.length + i) % 4 != 0 =>
          (a, "eosio.token", s, f"${(a.length * 17 + i * 31) % 1000}%d.${1000 + i}%04d $s")
      }
    }.toDF("account", "code", "symbol", "balance")
  }

  /** Token precision dimension (per code+symbol), the J5 broadcast dim. */
  def tokenPrecisions(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    Seq(("eosio.token", "TST", 4), ("eosio.token", "EOS", 4), ("eosio.token", "HYP", 8))
      .toDF("code", "symbol", "precision")
  }

  /** Permission rows keyed by public key (for get_key_accounts). */
  def permissions(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    accounts.zipWithIndex.flatMap { case (a, i) =>
      Seq((a, "owner", s"PUB_K1_key$i"), (a, "active", s"PUB_K1_key${i % 2}"))
    }.toDF("account", "permission", "pubkey")
  }

  /** Permission links (account → code::action grants). */
  def links(spark: SparkSession): Dataset[LinkDoc] = {
    import spark.implicits._
    spark.createDataset(accounts.zipWithIndex.flatMap { case (a, i) =>
      Seq(
        LinkDoc(ts(400L + i), 400L + i, 1, a, "hyp.test", "doit", "active"),
        LinkDoc(ts(450L + i), 450L + i, if (i == 2) 0 else 1, a, "eosio.token", "transfer", "active"))
    })
  }

  /** newaccount actions (creator chain for get_creator). */
  def newAccountActions(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    accounts.zipWithIndex.map { case (a, i) =>
      val creator = if (i == 0) "eosio" else accounts(i - 1)
      (10L + i, 10L + i, f"ntrx$i%08d", "eosio", "newaccount",
        s"""{"creator":"$creator","newact":"$a"}""", creator, a)
    }.toDF("global_sequence", "block_num", "trx_id", "code", "action",
      "data", "creator", "newact")
  }

  /** Producer schedule versions (for get_schedule / F12). */
  def schedules(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    Seq(
      (1L, 100L, """["prodalpha","prodbeta","prodgamma","proddelta"]""", Some(1L)),
      (2L, 200L, """["prodalpha","prodbeta","prodgamma"]""", None))
      .toDF("version", "block_num", "producers", "activated_version")
  }

  /** Voter state rows (for get_voters): deterministic producer slates,
    * every third voter a proxy, weight monotone in index.
    */
  def voters(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val producers = Vector("prodalpha", "prodbeta", "prodgamma", "proddelta")
    accounts.zipWithIndex.map { case (a, i) =>
      (a, producers.take(i % producers.size + 1), i % 3 == 0,
        1000.0 * (i + 1), 500L + i)
    }.toDF("voter", "producers", "is_proxy", "last_vote_weight", "block_num")
  }

  /** Msig proposal state rows (for get_proposals): requested vs provided
    * approval sets, one executed.
    */
  def proposals(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    Seq(
      ("alice", "upgrade", Seq("bob", "carol"), Seq("bob"), false, 600L),
      ("alice", "payout", Seq("dave"), Seq.empty[String], true, 610L),
      ("bob", "upgrade2", Seq("alice", "carol"), Seq("alice", "carol"), false, 620L))
      .toDF("proposer", "proposal_name", "requested_approvals",
        "provided_approvals", "executed", "block_num")
  }

  /** Fork events: block ids retracted (and one re-adopted). */
  def forkEvents(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    Seq(
      (blockId(150L), 150L, 1L, true),   // forked
      (blockId(151L), 151L, 2L, true),   // forked
      (blockId(151L), 151L, 3L, false)   // re-adopted → tombstone cancelled
    ).toDF("block_id", "block_num", "seq", "retracted")
  }
}
