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

  /** Custom-ABI override defs (X5): per-contract ABI valid over an OPEN
    * block interval — the `custom-abi/<chain>/<code>-<start>-<end>`
    * file drops of the reference (ds-pool.ts:147-181). The two
    * overlapping hyp.test defs exercise the latest-start tie-break; the
    * eosio.token def exercises chain-ABI precedence.
    */
  def customAbis(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    Seq(
      ("hyp.test", 250L, 400L, """{"version":"eosio::abi/1.1","rev":"custom-a"}"""),
      ("hyp.test", 320L, 500L, """{"version":"eosio::abi/1.1","rev":"custom-b"}"""),
      ("eosio.token", 10L, 9999L, """{"version":"eosio::abi/1.1","rev":"custom-c"}"""))
      .toDF("account", "starting_block", "ending_block", "abi")
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

  /** Permission rows keyed by REAL-form public keys (for the C11
    * either-form get_key_accounts path): canonical `PUB_K1_…` strings
    * stored, derived from deterministic 33-byte payloads.
    */
  def keyPermissions(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    def k1(i: Int): String = graft.functions.AntelopeKeys.encodeK1(
      (Array(0x02.toByte) ++
        (0 until 32).map(j => ((i * 7 + j * 13 + 1) % 256).toByte)).toArray)
    accounts.zipWithIndex.flatMap { case (a, i) =>
      Seq((a, "owner", k1(i)), (a, "active", k1(i % 2)))
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

  /** System-contract action traces covering the full X2 action-lift
    * family (one or two rows per handled action type, plus one unhandled
    * action for the passthrough branch). Minimal action shape: the lifts
    * only touch `act.{account,name,data}`.
    */
  def systemActionTraces(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{array, col, lit, struct}
    import spark.implicits._
    val rows: Seq[(Long, Long, String, String, String, String)] = Seq(
      (2001L, 500L, "eosio.token", "transfer", "alice",
        """{"from":"alice","to":"bob","quantity":"12.5000 TST","memo":"m1"}"""),
      (2002L, 501L, "fake.token", "transfer", "carol",
        """{"from":"carol","to":"dave","quantity":"3.0000 FAKE","memo":""}"""),
      (2003L, 502L, "eosio", "newaccount", "alice",
        """{"creator":"alice","newact":"newbie1","owner":{"threshold":1,"keys":[{"key":"PUB_K1_key1","weight":1}],"accounts":[],"waits":[]},"active":{"threshold":1,"keys":[{"key":"PUB_K1_key2","weight":1}],"accounts":[],"waits":[]}}"""),
      (2004L, 503L, "eosio", "newaccount", "bob",
        """{"creator":"bob","name":"newbie2","owner":{"threshold":1,"keys":[{"key":"PUB_K1_key3","weight":1}],"accounts":[],"waits":[]},"active":{"threshold":1,"keys":[{"key":"PUB_K1_key4","weight":1}],"accounts":[],"waits":[]}}"""),
      (2005L, 504L, "eosio", "updateauth", "alice",
        """{"account":"alice","permission":"deposit","parent":"active","auth":{"threshold":2,"keys":[{"key":"PUB_K1_key5","weight":1},{"key":"PUB_K1_key6","weight":1}],"accounts":[],"waits":[]}}"""),
      (2006L, 505L, "eosio", "delegatebw", "alice",
        """{"from":"alice","receiver":"bob","stake_net_quantity":"1.5000 EOS","stake_cpu_quantity":"2.2500 EOS","transfer":false}"""),
      (2007L, 506L, "eosio", "undelegatebw", "bob",
        """{"from":"bob","receiver":"bob","unstake_net_quantity":"0.5000 EOS","unstake_cpu_quantity":"1.0000 EOS"}"""),
      (2008L, 507L, "eosio", "buyram", "carol",
        """{"payer":"carol","receiver":"dave","quant":"4.5000 EOS"}"""),
      (2009L, 508L, "eosio", "buyrambytes", "dave",
        """{"payer":"dave","receiver":"dave","bytes":8192}"""),
      (2010L, 509L, "eosio", "buyrex", "alice",
        """{"from":"alice","amount":"100.0000 EOS"}"""),
      (2011L, 510L, "eosio", "unstaketorex", "bob",
        """{"owner":"bob","receiver":"bob","from_net":"1.0000 EOS","from_cpu":"0.2500 EOS"}"""),
      (2012L, 511L, "eosio", "voteproducer", "carol",
        """{"voter":"carol","proxy":"","producers":["prodalpha","prodbeta"]}"""),
      (2013L, 512L, "eosio", "voteproducer", "dave",
        """{"voter":"dave","proxy":"bigproxy","producers":[]}"""),
      (2014L, 513L, "hyp.test", "doit", "alice", """{"id":1}"""))
    rows.toDF("global_sequence", "block_num", "account", "name", "actor", "data")
      .select(col("global_sequence"), col("block_num"),
        struct(col("account").as("account"), col("name").as("name"),
          array(struct(col("actor").as("actor"),
            lit("active").as("permission"))).as("authorization"),
          col("data").as("data")).as("act"))
  }

  /** Contract-table delta rows covering the X2 tableHandler family
    * (voters/global/producers/userres/delband + wildcard accounts, plus
    * one guard-miss row for the passthrough branch).
    */
  def systemDeltas(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    Seq(
      (600L, "eosio", "eosio", "voters", "alice", 1,
        """{"owner":"alice","is_proxy":false,"proxy":"","producers":["prodalpha"],"last_vote_weight":"123.5","proxied_vote_weight":"0.0","staked":"1000.0"}"""),
      (601L, "eosio", "eosio", "voters", "bob", 1,
        """{"owner":"bob","is_proxy":false,"proxy":"bigproxy","producers":[],"last_vote_weight":"10.0","proxied_vote_weight":"0.0","staked":"50.0"}"""),
      (602L, "eosio", "eosio", "global", "global", 1,
        """{"max_block_net_usage":1048576}"""),
      (603L, "eosio", "eosio", "producers", "prodalpha", 1,
        """{"owner":"prodalpha","total_votes":"9999.125","is_active":true,"unpaid_blocks":42,"url":"https://a"}"""),
      (604L, "eosio", "alice", "userres", "alice", 1,
        """{"owner":"alice","net_weight":"1.5000 EOS","cpu_weight":"2.2500 EOS","ram_bytes":4096}"""),
      (605L, "eosio", "alice", "delband", "bob", 1,
        """{"from":"alice","to":"bob","net_weight":"0.5000 EOS","cpu_weight":"0.7500 EOS"}"""),
      (606L, "eosio.token", "alice", "accounts", "TST", 1,
        """{"balance":"99.1234 TST"}"""),
      (607L, "fake.token", "bob", "accounts", "FAKE", 1,
        """{"balance":"5.0000 FAKE"}"""),
      (608L, "eosio", "carol", "userres", "carol", 1,
        """{"owner":"carol","ram_bytes":1}"""))
      .toDF("block_num", "code", "scope", "table", "primary_key", "present", "data")
  }

  /** Pre-decoded SHIP delta payloads covering the X3 deltaStructHandler
    * family (one row per handled type + the two guard-miss branches:
    * eosio's own resource_usage row and an account row without an ABI).
    */
  def shipDeltas(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    Seq(
      (700L, "account", 1,
        """{"name":"hyp.test","abi":{"version":"eosio::abi/1.2","actions":[{"name":"doit","type":"doit"},{"name":"transfer","type":"transfer"}],"tables":[{"name":"kv","type":"kv_s"}]}}"""),
      (701L, "permission", 1,
        """{"owner":"alice","name":"active","parent":"owner","auth":{"threshold":1,"keys":[{"key":"PUB_K1_x","weight":1}],"accounts":[],"waits":[]}}"""),
      (702L, "permission_link", 1,
        """{"account":"bob","code":"eosio.token","message_type":"transfer","required_permission":"active"}"""),
      (703L, "resource_limits", 1,
        """{"owner":"carol","net_weight":"10000","cpu_weight":"20000","ram_bytes":"65536"}"""),
      (704L, "resource_usage", 1,
        """{"owner":"dave","net_usage":["usage_accumulator_v0",{"last_ordinal":5,"value_ex":1000,"consumed":250}],"cpu_usage":["usage_accumulator_v0",{"last_ordinal":5,"value_ex":2000,"consumed":500}],"ram_usage":["varuint64",12345]}"""),
      (705L, "resource_usage", 1,
        """{"owner":"eosio","net_usage":["usage_accumulator_v0",{"last_ordinal":5,"value_ex":1,"consumed":1}],"cpu_usage":["usage_accumulator_v0",{"last_ordinal":5,"value_ex":1,"consumed":1}],"ram_usage":["varuint64",1]}"""),
      (706L, "account", 1, """{"name":"plain.acct"}"""))
      .toDF("block_num", "type", "present", "value")
  }

  /** C8 raw-hex action payloads with their as-of ABIs, for the REAL
    * pure-Scala codec path (AntelopeAbi ← deserializer.ts:869-908). The
    * hex is produced once at fixture build by `jsonToHex` over the same
    * public binary layout the decoder reads; absolute correctness of that
    * layout is pinned by AntelopeAbiSpec's published vectors (the `eosio`
    * name constant, the `1.0000 EOS` asset bytes, LEB128). Groups:
    *   A 3000000+ transfers (name/asset/string),
    *   B 3000100+ voteproducer (name arrays),
    *   C 3000200+ updateauth (nested authority, real PUB_K1 keys),
    *   D 3000300+ composite custom ABI (optional/alias/variant/extension),
    *   E 3000400+ failure witnesses for every rung of the ds_error ladder
    *     (truncated, unknown action, bad hex, trailing bytes, bad ABI).
    */
  def hexActions(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import graft.functions.{AntelopeAbi => A}
    val tokenAbi =
      """{"version":"eosio::abi/1.2","structs":[{"name":"transfer","base":"","fields":[{"name":"from","type":"name"},{"name":"to","type":"name"},{"name":"quantity","type":"asset"},{"name":"memo","type":"string"}]}],"actions":[{"name":"transfer","type":"transfer"}]}"""
    val systemAbi =
      """{"version":"eosio::abi/1.2","structs":[
        {"name":"voteproducer","base":"","fields":[{"name":"voter","type":"name"},{"name":"proxy","type":"name"},{"name":"producers","type":"name[]"}]},
        {"name":"key_weight","base":"","fields":[{"name":"key","type":"public_key"},{"name":"weight","type":"uint16"}]},
        {"name":"permission_level","base":"","fields":[{"name":"actor","type":"name"},{"name":"permission","type":"name"}]},
        {"name":"permission_level_weight","base":"","fields":[{"name":"permission","type":"permission_level"},{"name":"weight","type":"uint16"}]},
        {"name":"wait_weight","base":"","fields":[{"name":"wait_sec","type":"uint32"},{"name":"weight","type":"uint16"}]},
        {"name":"authority","base":"","fields":[{"name":"threshold","type":"uint32"},{"name":"keys","type":"key_weight[]"},{"name":"accounts","type":"permission_level_weight[]"},{"name":"waits","type":"wait_weight[]"}]},
        {"name":"updateauth","base":"","fields":[{"name":"account","type":"name"},{"name":"permission","type":"name"},{"name":"parent","type":"name"},{"name":"auth","type":"authority"}]}],
        "actions":[{"name":"voteproducer","type":"voteproducer"},{"name":"updateauth","type":"updateauth"}]}"""
    val customAbi =
      """{"version":"eosio::abi/1.2","types":[{"new_type_name":"account_name","type":"name"}],"structs":[
        {"name":"pair","base":"","fields":[{"name":"key","type":"account_name"},{"name":"value","type":"uint64"}]},
        {"name":"holder","base":"","fields":[{"name":"id","type":"uint32"},{"name":"maybe","type":"string?"},{"name":"owners","type":"account_name[]"},{"name":"which","type":"choice"},{"name":"ext","type":"uint16$"}]}],
        "variants":[{"name":"choice","types":["uint64","pair"]}],
        "actions":[{"name":"hold","type":"holder"}]}"""
    val tok = A.parseAbi(tokenAbi)
    val sys = A.parseAbi(systemAbi)
    val cus = A.parseAbi(customAbi)
    def k1(i: Int): String = graft.functions.AntelopeKeys.encodeK1(
      (Array(0x02.toByte) ++
        (0 until 32).map(j => ((i * 7 + j * 13 + 1) % 256).toByte)).toArray)
    val names = accounts
    val transfers = (0 until 30).map { i =>
      val json = s"""{"from":"${names(i % 4)}","to":"${names((i + 1) % 4)}","quantity":"${i % 50 + 1}.0000 TST","memo":"payment $i"}"""
      (3000000L + i, "transfer", A.jsonToHex(tok, "transfer", json), tokenAbi)
    }
    val votes = (0 until 8).map { i =>
      val prods = Seq("proda", "prodb", "prodc").take(i % 3 + 1)
      val json = s"""{"voter":"${names(i % 4)}","proxy":"","producers":[${prods.map("\"" + _ + "\"").mkString(",")}]}"""
      (3000100L + i, "voteproducer", A.jsonToHex(sys, "voteproducer", json), systemAbi)
    }
    val auths = (0 until 4).map { i =>
      val json = s"""{"account":"${names(i)}","permission":"active","parent":"owner","auth":{"threshold":1,"keys":[{"key":"${k1(i)}","weight":1}],"accounts":[],"waits":[]}}"""
      (3000200L + i, "updateauth", A.jsonToHex(sys, "updateauth", json), systemAbi)
    }
    val composites = (0 until 6).map { i =>
      val json =
        if (i % 2 == 0)
          s"""{"id":$i,"maybe":"m$i","owners":["alice","bob"],"which":["pair",{"key":"carol","value":"${i * 7}"}],"ext":${100 + i}}"""
        else
          s"""{"id":$i,"maybe":null,"owners":[],"which":["uint64","${i * 7}"]}"""
      (3000300L + i, "hold", A.jsonToHex(cus, "holder", json), customAbi)
    }
    // minimal transfer {"from":"a","to":"b","quantity":"1.0000 EOS","memo":""}
    // — layout pinned in AntelopeAbiSpec
    val okHex = "00000000000000300000000000000038102700000000000004454f530000000000"
    val failures = Seq(
      (3000400L, "transfer", "0000000000000030", tokenAbi), // truncated mid-struct
      (3000401L, "nosuchact", okHex, tokenAbi),             // unknown action
      (3000402L, "transfer", "zz-not-hex", tokenAbi),       // not hex at all
      (3000403L, "transfer", okHex + "ff", tokenAbi),       // trailing byte
      (3000404L, "transfer", okHex, "{not an abi"))         // unparseable ABI
    (transfers ++ votes ++ auths ++ composites ++ failures)
      .toDF("global_sequence", "action", "payload", "abi")
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
