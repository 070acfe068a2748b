package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** System-contract `@`-extension lifting (X2) — the reference's full
  * action-handler + tableHandler families, not just `@transfer`:
  *
  *   - action lifts: `@transfer @newaccount @updateauth @delegatebw
  *     @undelegatebw @buyram @buyrambytes @buyrex @unstaketorex
  *     @voteproducer` (src/indexer/modules/action_data/ TS modules,
  *     index-templates.ts:98-175)
  *   - delta lifts: `@voters @global @producers @userres @delband
  *     @accounts` (src/indexer/workers/deserializer.ts:1855-2012)
  *
  * Spark-first: each lift is a `when(match, struct(from_json(...)))`
  * column — codegen'd, evaluated only on matching rows, and pruned by
  * Catalyst when the extension column is never selected. The reference's
  * imperative per-row handler mutation becomes a declarative projection.
  *
  * Two deliberate simplifications, documented here: `is_proxy`/`is_active`
  * are typed boolean (the reference passes the chain's raw 0/1 through),
  * and `@updateauth.auth` drops empty `accounts`/`keys`/`waits` arrays via
  * null-out + `to_json` null-omission (the reference deletes the keys
  * imperatively — same output JSON).
  */
object Lifts {

  // ---------------------------------------------------------------- schemas

  /** eosio authority object (owner/active/auth fields). */
  private[etl] val authority: DataType = StructType(Seq(
    StructField("threshold", LongType),
    StructField("keys", ArrayType(StructType(Seq(
      StructField("key", StringType),
      StructField("weight", IntegerType))))),
    StructField("accounts", ArrayType(StructType(Seq(
      StructField("permission", StructType(Seq(
        StructField("actor", StringType),
        StructField("permission", StringType)))),
      StructField("weight", IntegerType))))),
    StructField("waits", ArrayType(StructType(Seq(
      StructField("wait_sec", LongType),
      StructField("weight", IntegerType)))))))

  private def schemaOf(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t) })

  /** parseFloat over an asset string ("1.5000 EOS" → 1.5). */
  private def qty(c: Column): Column = Assets.amount(c)

  private[etl] def emptyToNull(arr: Column): Column = when(size(arr) > 0, arr)

  // ------------------------------------------------------------ action lifts

  /** Lift column per action type: (name, matched-contract-or-*, builder). */
  private def actionLift(
      contract: Option[String], action: String,
      contractCol: Column, nameCol: Column,
      body: Column): Column = {
    val matches = contract.map(contractCol === _).getOrElse(lit(true)) &&
      nameCol === action
    when(matches, body)
  }

  /** The lifted action extension column names, in fold-back precedence
    * order (at most one is non-null per row by construction).
    */
  val actionExtCols: Seq[String] = Seq("transfer", "newaccount", "updateauth",
    "delegatebw", "undelegatebw", "buyram", "buyrambytes", "buyrex",
    "unstaketorex", "voteproducer")

  /** Add all system-action extension columns. Field order inside each
    * struct mirrors the reference handler's object insertion order, so
    * `to_json` round-trips byte-identically with the reference's docs.
    */
  def liftSystemActions(
      actions: DataFrame,
      contractCol: Column = col("act.account"),
      nameCol: Column = col("act.name"),
      dataCol: Column = col("act.data")): DataFrame = {

    // *::transfer (transfer.ts): parsed quantity split into amount+symbol
    val t = from_json(dataCol, schemaOf(
      "from" -> StringType, "to" -> StringType,
      "quantity" -> StringType, "memo" -> StringType))
    val transfer = actionLift(None, "transfer", contractCol, nameCol, struct(
      t.getField("from").as("from"), t.getField("to").as("to"),
      qty(t.getField("quantity")).as("amount"),
      Assets.symbol(t.getField("quantity")).as("symbol"),
      t.getField("memo").as("memo")))

    // eosio::newaccount (eosio-newaccount.ts): newact with `name` fallback
    val na = from_json(dataCol, schemaOf(
      "creator" -> StringType, "newact" -> StringType, "name" -> StringType,
      "owner" -> authority, "active" -> authority))
    val naName = coalesce(na.getField("newact"), na.getField("name"))
    val newaccount = actionLift(Some("eosio"), "newaccount", contractCol, nameCol,
      when(naName.isNotNull, struct(
        na.getField("active").as("active"),
        na.getField("owner").as("owner"),
        naName.as("newact"))))

    // eosio::updateauth (eosio-updateauth.ts): empty auth arrays dropped
    val ua = from_json(dataCol, schemaOf(
      "account" -> StringType, "permission" -> StringType,
      "parent" -> StringType, "auth" -> authority))
    val auth = ua.getField("auth")
    val updateauth = actionLift(Some("eosio"), "updateauth", contractCol, nameCol,
      struct(
        ua.getField("permission").as("permission"),
        ua.getField("parent").as("parent"),
        struct(
          auth.getField("threshold").as("threshold"),
          emptyToNull(auth.getField("keys")).as("keys"),
          emptyToNull(auth.getField("accounts")).as("accounts"),
          emptyToNull(auth.getField("waits")).as("waits")).as("auth")))

    // eosio::delegatebw (eosio-delegatebw.ts): cpu/net 0 unless BOTH present
    val db = from_json(dataCol, schemaOf(
      "from" -> StringType, "receiver" -> StringType,
      "stake_net_quantity" -> StringType, "stake_cpu_quantity" -> StringType,
      "transfer" -> BooleanType))
    val dbBoth = db.getField("stake_net_quantity").isNotNull &&
      db.getField("stake_cpu_quantity").isNotNull
    val dbCpu = when(dbBoth, qty(db.getField("stake_cpu_quantity"))).otherwise(0.0)
    val dbNet = when(dbBoth, qty(db.getField("stake_net_quantity"))).otherwise(0.0)
    val delegatebw = actionLift(Some("eosio"), "delegatebw", contractCol, nameCol,
      struct((dbCpu + dbNet).as("amount"),
        dbCpu.as("stake_cpu_quantity"), dbNet.as("stake_net_quantity"),
        db.getField("from").as("from"), db.getField("receiver").as("receiver"),
        db.getField("transfer").as("transfer")))

    // eosio::undelegatebw (eosio-undelegatebw.ts)
    val ub = from_json(dataCol, schemaOf(
      "from" -> StringType, "receiver" -> StringType,
      "unstake_net_quantity" -> StringType, "unstake_cpu_quantity" -> StringType))
    val ubBoth = ub.getField("unstake_net_quantity").isNotNull &&
      ub.getField("unstake_cpu_quantity").isNotNull
    val ubCpu = when(ubBoth, qty(ub.getField("unstake_cpu_quantity"))).otherwise(0.0)
    val ubNet = when(ubBoth, qty(ub.getField("unstake_net_quantity"))).otherwise(0.0)
    val undelegatebw = actionLift(Some("eosio"), "undelegatebw", contractCol, nameCol,
      struct((ubCpu + ubNet).as("amount"),
        ubCpu.as("unstake_cpu_quantity"), ubNet.as("unstake_net_quantity"),
        ub.getField("from").as("from"), ub.getField("receiver").as("receiver")))

    // eosio::buyram (eosio-buyram.ts): quant omitted when absent
    val br = from_json(dataCol, schemaOf(
      "payer" -> StringType, "receiver" -> StringType, "quant" -> StringType))
    val buyram = actionLift(Some("eosio"), "buyram", contractCol, nameCol,
      struct(br.getField("payer").as("payer"),
        br.getField("receiver").as("receiver"),
        qty(br.getField("quant")).as("quant")))

    // eosio::buyrambytes (eosio-buyrambytes.ts)
    val bb = from_json(dataCol, schemaOf(
      "payer" -> StringType, "receiver" -> StringType, "bytes" -> LongType))
    val buyrambytes = actionLift(Some("eosio"), "buyrambytes", contractCol, nameCol,
      struct(bb.getField("bytes").as("bytes"),
        bb.getField("payer").as("payer"),
        bb.getField("receiver").as("receiver")))

    // eosio::buyrex (eosio-buyrex.ts): amount defaults 0
    val bx = from_json(dataCol, schemaOf(
      "from" -> StringType, "amount" -> StringType))
    val buyrex = actionLift(Some("eosio"), "buyrex", contractCol, nameCol,
      struct(coalesce(qty(bx.getField("amount")), lit(0.0)).as("amount"),
        bx.getField("from").as("from")))

    // eosio::unstaketorex (eosio-unstaketorex.ts)
    val ur = from_json(dataCol, schemaOf(
      "owner" -> StringType, "receiver" -> StringType,
      "from_net" -> StringType, "from_cpu" -> StringType))
    val urBoth = ur.getField("from_net").isNotNull && ur.getField("from_cpu").isNotNull
    val urAmt = when(urBoth,
      qty(ur.getField("from_cpu")) + qty(ur.getField("from_net"))).otherwise(0.0)
    val unstaketorex = actionLift(Some("eosio"), "unstaketorex", contractCol, nameCol,
      struct(urAmt.as("amount"), ur.getField("owner").as("owner"),
        ur.getField("receiver").as("receiver")))

    // eosio::voteproducer (eosio-voteproducer.ts): proxy/producers as-is
    val vp = from_json(dataCol, schemaOf(
      "voter" -> StringType, "proxy" -> StringType,
      "producers" -> ArrayType(StringType)))
    val voteproducer = actionLift(Some("eosio"), "voteproducer", contractCol, nameCol,
      struct(vp.getField("proxy").as("proxy"),
        vp.getField("producers").as("producers")))

    actions
      .withColumn("transfer", transfer)
      .withColumn("newaccount", newaccount)
      .withColumn("updateauth", updateauth)
      .withColumn("delegatebw", delegatebw)
      .withColumn("undelegatebw", undelegatebw)
      .withColumn("buyram", buyram)
      .withColumn("buyrambytes", buyrambytes)
      .withColumn("buyrex", buyrex)
      .withColumn("unstaketorex", unstaketorex)
      .withColumn("voteproducer", voteproducer)
  }

  // ------------------------------------------------------------- delta lifts

  /** The lifted delta extension column names (one per tableHandler). */
  val deltaExtCols: Seq[String] =
    Seq("voters", "global", "producers", "userres", "delband", "accounts")

  /** Add all contract-table extension columns (the reference's
    * tableHandlers). `global` is a raw-JSON passthrough column; the rest
    * are typed structs.
    */
  def liftSystemDeltas(
      deltas: DataFrame,
      codeCol: Column = col("code"),
      tableCol: Column = col("table"),
      dataCol: Column = col("data")): DataFrame = {

    // eosio:voters — proxy omitted when "", producers omitted when empty
    val v = from_json(dataCol, schemaOf(
      "owner" -> StringType, "is_proxy" -> BooleanType, "proxy" -> StringType,
      "producers" -> ArrayType(StringType), "last_vote_weight" -> StringType,
      "proxied_vote_weight" -> StringType, "staked" -> StringType))
    val voters = when(codeCol === "eosio" && tableCol === "voters", struct(
      v.getField("is_proxy").as("is_proxy"),
      when(v.getField("proxy") =!= "", v.getField("proxy")).as("proxy"),
      emptyToNull(v.getField("producers")).as("producers"),
      v.getField("last_vote_weight").cast(DoubleType).as("last_vote_weight"),
      v.getField("proxied_vote_weight").cast(DoubleType).as("proxied_vote_weight"),
      v.getField("staked").cast(DoubleType).as("staked")))

    // eosio:global — verbatim passthrough of the data blob
    val global = when(codeCol === "eosio" && tableCol === "global", dataCol)

    // eosio:producers
    val p = from_json(dataCol, schemaOf(
      "owner" -> StringType, "total_votes" -> StringType,
      "is_active" -> BooleanType, "unpaid_blocks" -> LongType))
    val producers = when(codeCol === "eosio" && tableCol === "producers", struct(
      p.getField("total_votes").cast(DoubleType).as("total_votes"),
      p.getField("is_active").as("is_active"),
      p.getField("unpaid_blocks").as("unpaid_blocks")))

    // eosio:userres — lifted only when both weights present
    val u = from_json(dataCol, schemaOf(
      "owner" -> StringType, "net_weight" -> StringType,
      "cpu_weight" -> StringType, "ram_bytes" -> LongType))
    val uBoth = u.getField("net_weight").isNotNull && u.getField("cpu_weight").isNotNull
    val userres = when(codeCol === "eosio" && tableCol === "userres" && uBoth, struct(
      u.getField("owner").as("owner"),
      qty(u.getField("net_weight")).as("net_weight"),
      qty(u.getField("cpu_weight")).as("cpu_weight"),
      round(qty(u.getField("net_weight")) + qty(u.getField("cpu_weight")), 4)
        .as("total_weight"),
      u.getField("ram_bytes").as("ram_bytes")))

    // eosio:delband
    val db = from_json(dataCol, schemaOf(
      "from" -> StringType, "to" -> StringType,
      "net_weight" -> StringType, "cpu_weight" -> StringType))
    val dbBoth = db.getField("net_weight").isNotNull && db.getField("cpu_weight").isNotNull
    val delband = when(codeCol === "eosio" && tableCol === "delband" && dbBoth, struct(
      db.getField("from").as("from"), db.getField("to").as("to"),
      qty(db.getField("net_weight")).as("net_weight"),
      qty(db.getField("cpu_weight")).as("cpu_weight"),
      round(qty(db.getField("net_weight")) + qty(db.getField("cpu_weight")), 4)
        .as("total_weight")))

    // *:accounts — any contract's token-balance table
    val a = from_json(dataCol, schemaOf("balance" -> StringType))
    val accounts = when(tableCol === "accounts" && a.getField("balance").isNotNull,
      struct(qty(a.getField("balance")).as("amount"),
        Assets.symbol(a.getField("balance")).as("symbol")))

    deltas
      .withColumn("voters", voters)
      .withColumn("global", global)
      .withColumn("producers", producers)
      .withColumn("userres", userres)
      .withColumn("delband", delband)
      .withColumn("accounts", accounts)
  }
}
