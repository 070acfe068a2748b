package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-SHIP-type delta parsers (X3) — the reference's
  * `deltaStructHandlers` family (src/indexer/workers/
  * deserializer.ts:1294-1638): each SHIP table-delta type gets its own
  * typed document shape. The engine ingests pre-decoded JSON payloads
  * (binary SHIP decoding is the `AbiCodec` pluggable boundary, per
  * SURVEY), so each handler here is a `filter(type) + from_json /
  * get_json_object` projection producing one typed Dataset per event
  * type — `contract_row` itself is the generic delta path
  * (`Lifts.liftSystemDeltas` + `StateMerge`).
  *
  * Input model: rows `(block_num, timestamp, type, present, value)` with
  * `value` the variant-unwrapped JSON payload of that type (the
  * `[type, value]` outer variant is `Extensions.unwrapVariant`).
  *
  * The reference attaches `@timestamp` to every doc; here the timestamp
  * column is carried alongside rather than folded into the JSON (the
  * engine keeps typed columns; serialization is a sink concern).
  */
object ShipDeltas {

  /** `account` deltas carrying an ABI (deserializer.ts:1376-1434): the
    * ABI-dimension doc for the as-of join — account, block, the ABI
    * JSON, and the extracted action/table name lists. The name
    * extraction (`transform` over parsed arrays) is a bounded projection
    * on a dimension-sized table, not a hot path.
    */
  def abiDocs(raw: DataFrame): DataFrame = {
    val abiStr = get_json_object(col("value"), "$.abi")
    val abi = from_json(abiStr, StructType(Seq(
      StructField("actions", ArrayType(StructType(Seq(
        StructField("name", StringType))))),
      StructField("tables", ArrayType(StructType(Seq(
        StructField("name", StringType))))))))
    raw.filter(col("type") === "account" && abiStr.isNotNull)
      .select(
        get_json_object(col("value"), "$.name").as("account"),
        col("block_num").as("block"),
        abiStr.as("abi"),
        transform(abi.getField("actions"), a => a.getField("name")).as("actions"),
        transform(abi.getField("tables"), t => t.getField("name")).as("tables"))
  }

  /** `permission` deltas (deserializer.ts:1452-1472): owner/name/parent +
    * auth with empty `keys`/`accounts`/`waits` dropped — same null-out +
    * omission shaping as `@updateauth`.
    */
  def permissions(raw: DataFrame): DataFrame = {
    val p = from_json(col("value"), StructType(Seq(
      StructField("owner", StringType),
      StructField("name", StringType),
      StructField("parent", StringType),
      StructField("auth", Lifts.authority))))
    val auth = p.getField("auth")
    raw.filter(col("type") === "permission")
      .select(col("block_num"), col("present"),
        p.getField("owner").as("owner"),
        p.getField("name").as("name"),
        p.getField("parent").as("parent"),
        struct(
          auth.getField("threshold").as("threshold"),
          Lifts.emptyToNull(auth.getField("keys")).as("keys"),
          Lifts.emptyToNull(auth.getField("accounts")).as("accounts"),
          Lifts.emptyToNull(auth.getField("waits")).as("waits")).as("auth"))
  }

  /** `permission_link` deltas (deserializer.ts:1436-1450): the renames
    * `message_type`→`action`, `required_permission`→`permission` — this
    * IS the links table the F13 endpoint serves.
    */
  def permissionLinks(raw: DataFrame): DataFrame =
    raw.filter(col("type") === "permission_link")
      .select(col("block_num"), col("present"),
        get_json_object(col("value"), "$.account").as("account"),
        get_json_object(col("value"), "$.code").as("code"),
        get_json_object(col("value"), "$.message_type").as("action"),
        get_json_object(col("value"), "$.required_permission").as("permission"))

  /** `resource_limits` deltas (deserializer.ts:1523-1537): parsed
    * weights + derived total.
    */
  def resourceLimits(raw: DataFrame): DataFrame = {
    val cpu = get_json_object(col("value"), "$.cpu_weight").cast(LongType)
    val net = get_json_object(col("value"), "$.net_weight").cast(LongType)
    raw.filter(col("type") === "resource_limits")
      .select(col("block_num"),
        get_json_object(col("value"), "$.owner").as("owner"),
        get_json_object(col("value"), "$.ram_bytes").cast(LongType).as("ram_bytes"),
        cpu.as("cpu_weight"), net.as("net_weight"),
        (cpu + net).as("total_weight"))
  }

  /** `resource_usage` deltas (deserializer.ts:1541-1580): the
    * usage-accumulator variants unwrap positionally (`usage[1]` is the
    * payload of the `[type, value]` pair); `eosio`'s own row is skipped
    * like the reference; pct is 0.0 when the window total is 0.
    */
  def resourceUsage(raw: DataFrame): DataFrame = {
    def used(field: String) =
      get_json_object(col("value"), s"$$.$field[1].consumed").cast(LongType)
    def total(field: String) =
      get_json_object(col("value"), s"$$.$field[1].value_ex").cast(LongType)
    def pct(u: Column, t: Column) =
      when(t > 0, u.cast(DoubleType) / t.cast(DoubleType)).otherwise(0.0)
    val netU = used("net_usage"); val netT = total("net_usage")
    val cpuU = used("cpu_usage"); val cpuT = total("cpu_usage")
    raw.filter(col("type") === "resource_usage" &&
        get_json_object(col("value"), "$.owner") =!= "eosio")
      .select(col("block_num"),
        get_json_object(col("value"), "$.owner").as("owner"),
        netU.as("net_used"), netT.as("net_total"), pct(netU, netT).as("net_pct"),
        cpuU.as("cpu_used"), cpuT.as("cpu_total"), pct(cpuU, cpuT).as("cpu_pct"),
        get_json_object(col("value"), "$.ram_usage[1]").cast(LongType).as("ram"))
  }
}
