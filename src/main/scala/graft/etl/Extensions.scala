package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Asset-string parsing (C1) — the reference splits `"12.3456 EOS"` into
  * `amount: float` + `symbol` during ETL
  * (src/indexer/workers/deserializer.ts:1994-2006). Pure `functions._`
  * composition, codegen'd.
  */
object Assets {
  def amount(asset: Column): Column =
    element_at(split(asset, " "), 1).cast(DoubleType)
  def symbol(asset: Column): Column =
    element_at(split(asset, " "), 2)
  /** (amount, symbol) struct, null-safe on malformed inputs. */
  def parse(asset: Column): Column =
    when(asset.rlike("^-?\\d+(\\.\\d+)? [A-Z]{1,7}$"),
      struct(amount(asset).as("amount"), symbol(asset).as("symbol")))
}

/** `@`-extension lifting (X2) — the reference's tableHandlers/action
  * handlers lift well-known action payloads from the opaque JSON blob into
  * typed queryable struct columns (`@transfer`, `@accounts`, … —
  * src/indexer/workers/deserializer.ts:1855-2012, action handlers under
  * src/indexer/modules/action_data/). Here: pattern-matched `from_json`
  * projections at ETL time; Catalyst prunes the struct columns for free.
  */
object Extensions {

  private val transferSchema = StructType(Seq(
    StructField("from", StringType),
    StructField("to", StringType),
    StructField("quantity", StringType),
    StructField("memo", StringType)))

  /** Lift `@transfer` from `act.data` for eosio.token::transfer rows:
    * from/to/memo plus the parsed quantity (amount, symbol).
    */
  def liftTransfer(actions: DataFrame): DataFrame = {
    val isTransfer = col("act.account") === "eosio.token" && col("act.name") === "transfer"
    val parsed = from_json(col("act.data"), transferSchema)
    actions.withColumn("transfer",
      when(isTransfer, struct(
        parsed.getField("from").as("from"),
        parsed.getField("to").as("to"),
        Assets.amount(parsed.getField("quantity")).as("amount"),
        Assets.symbol(parsed.getField("quantity")).as("symbol"),
        parsed.getField("memo").as("memo"))))
  }

  /** Read-time merge of a lifted extension back into one logical object —
    * mergeActionMeta (src/api/helpers/functions.ts:842-865): clients see
    * `act.data` plus the typed fields of the extension struct.
    */
  def mergeActionMeta(actions: DataFrame, extCol: String = "transfer"): DataFrame =
    actions.withColumn("act",
      struct(
        col("act.account").as("account"),
        col("act.name").as("name"),
        col("act.authorization").as("authorization"),
        when(col(extCol).isNotNull, to_json(col(extCol)))
          .otherwise(col("act.data")).as("data")))

  /** Read-time merge across the FULL extension family (P2/X2): fold
    * whichever `@`-extension struct is non-null back into `act.data` as
    * JSON — at most one lift matches per row by construction, so this is
    * a `coalesce` over the serialized candidates with the raw blob as the
    * fallback (mergeActionMeta over all handler outputs,
    * functions.ts:842-865).
    */
  def mergeActionMetaAll(actions: DataFrame, extCols: Seq[String]): DataFrame = {
    val candidates = extCols.map(e => to_json(col(e))) :+ col("act.data")
    actions.withColumn("act",
      struct(
        col("act.account").as("account"),
        col("act.name").as("name"),
        col("act.authorization").as("authorization"),
        coalesce(candidates: _*).as("data")))
  }

  /** Delta-side equivalent over the tableHandler family: string-typed
    * lifts (`@global`) pass through verbatim, struct lifts serialize.
    */
  def mergeDeltaMetaAll(deltas: DataFrame, extCols: Seq[String]): DataFrame = {
    val candidates = extCols.map { e =>
      deltas.schema(e).dataType match {
        case StringType => col(e)
        case _          => to_json(col(e))
      }
    } :+ col("data")
    deltas.withColumn("data", coalesce(candidates: _*))
  }

  /** Read-time delta meta merge — mergeDeltaMeta (functions.ts:852-865):
    * fold a lifted `@`-extension struct back into the delta's `data`
    * JSON, add the `timestamp` alias the reference exposes.
    */
  def mergeDeltaMeta(deltas: DataFrame, extCol: String): DataFrame =
    deltas.withColumn("data",
      when(col(extCol).isNotNull, to_json(col(extCol))).otherwise(col("data")))

  /** noBinary truncation (P4): strings longer than 256 chars in the data
    * blob shortened to 32 + "..." (get_actions.ts:104-112).
    */
  def noBinary(c: Column): Column =
    when(length(c) > 256, concat(substring(c, 1, 32), lit("..."))).otherwise(c)

  /** Variant `[type, value]` unwrap (C10/P5): a 2-element JSON array
    * becomes (type, value-json) — extractDeltaStruct
    * (deserializer.ts:28-36).
    */
  def unwrapVariant(c: Column): Column =
    when(get_json_object(c, "$[0]").isNotNull && get_json_object(c, "$[1]").isNotNull,
      struct(
        get_json_object(c, "$[0]").as("type"),
        get_json_object(c, "$[1]").as("value")))
      .otherwise(struct(lit(null).cast(StringType).as("type"), c.as("value")))
}
