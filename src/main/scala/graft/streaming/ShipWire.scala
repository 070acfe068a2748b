package graft.streaming

import graft.functions.AntelopeAbi
import org.json4s._
import org.json4s.jackson.JsonMethods

/** SHIP (state-history plugin) BINARY wire decode — the reference's
  * websocket ingestion protocol, decoded end-to-end by the repo's own
  * from-spec ABI engine ([[graft.functions.AntelopeAbi]]).
  *
  * Protocol (public Antelope state_history_plugin ABI; the reference
  * consumes it in src/indexer/workers/state-reader.ts:737-767 and
  * src/indexer/modules/parsers/3.2-parser.ts:80-152):
  *
  *  1. the node's FIRST frame is the protocol ABI itself (JSON text) —
  *     [[ShipAbi]] reproduces the subset those messages need;
  *  2. every later binary frame is the ABI-encoded `result` variant:
  *     `["get_status_result_v0", …]` or `["get_blocks_result_v0", …]`;
  *  3. a blocks result carries head/LIB/this/prev `block_position`s
  *     plus three OPTIONAL nested-binary fields that decode against
  *     the same ABI: `block` as `signed_block`, `traces` as
  *     `transaction_trace[]`, `deltas` as `table_delta[]`;
  *  4. requests go the other way (`request` variant) —
  *     [[encodeRequest]] serializes `get_blocks_request_v0` /
  *     `get_blocks_ack_request_v0` exactly as the reference's
  *     `send()` does (state-reader.ts:839-848).
  *
  * Delta row payloads (`row.data`) stay `bytes` here — they decode
  * against per-CONTRACT ABIs via the as-of join + [[graft.functions.AbiCodec]]
  * seam, exactly like the reference's ds_pool stage.
  *
  * Scale shape: one frame per row inside `mapPartitions` —
  * bytes-linear, scan-local, zero shuffle before the caller's
  * aggregate; the ABI is a parsed-once JVM singleton (metadata-sized).
  */
object ShipWire {

  /** The state_history_plugin protocol ABI (the subset `result` /
    * `request` / `signed_block` / `transaction_trace[]` /
    * `table_delta[]` reach) — written from the public protocol
    * definition the node ships as its first websocket frame.
    */
  val ShipAbi: String = """{
    "version": "eosio::abi/1.1",
    "types": [{"new_type_name": "transaction_id", "type": "checksum256"}],
    "structs": [
      {"name": "block_position", "base": "", "fields": [
        {"name": "block_num", "type": "uint32"},
        {"name": "block_id", "type": "checksum256"}]},
      {"name": "get_status_request_v0", "base": "", "fields": []},
      {"name": "get_status_result_v0", "base": "", "fields": [
        {"name": "head", "type": "block_position"},
        {"name": "last_irreversible", "type": "block_position"},
        {"name": "trace_begin_block", "type": "uint32"},
        {"name": "trace_end_block", "type": "uint32"},
        {"name": "chain_state_begin_block", "type": "uint32"},
        {"name": "chain_state_end_block", "type": "uint32"},
        {"name": "chain_id", "type": "checksum256$"}]},
      {"name": "get_blocks_request_v0", "base": "", "fields": [
        {"name": "start_block_num", "type": "uint32"},
        {"name": "end_block_num", "type": "uint32"},
        {"name": "max_messages_in_flight", "type": "uint32"},
        {"name": "have_positions", "type": "block_position[]"},
        {"name": "irreversible_only", "type": "bool"},
        {"name": "fetch_block", "type": "bool"},
        {"name": "fetch_traces", "type": "bool"},
        {"name": "fetch_deltas", "type": "bool"}]},
      {"name": "get_blocks_ack_request_v0", "base": "", "fields": [
        {"name": "num_messages", "type": "uint32"}]},
      {"name": "get_blocks_result_v0", "base": "", "fields": [
        {"name": "head", "type": "block_position"},
        {"name": "last_irreversible", "type": "block_position"},
        {"name": "this_block", "type": "block_position?"},
        {"name": "prev_block", "type": "block_position?"},
        {"name": "block", "type": "bytes?"},
        {"name": "traces", "type": "bytes?"},
        {"name": "deltas", "type": "bytes?"}]},
      {"name": "row", "base": "", "fields": [
        {"name": "present", "type": "bool"},
        {"name": "data", "type": "bytes"}]},
      {"name": "table_delta_v0", "base": "", "fields": [
        {"name": "name", "type": "string"},
        {"name": "rows", "type": "row[]"}]},
      {"name": "permission_level", "base": "", "fields": [
        {"name": "actor", "type": "name"},
        {"name": "permission", "type": "name"}]},
      {"name": "action", "base": "", "fields": [
        {"name": "account", "type": "name"},
        {"name": "name", "type": "name"},
        {"name": "authorization", "type": "permission_level[]"},
        {"name": "data", "type": "bytes"}]},
      {"name": "account_auth_sequence", "base": "", "fields": [
        {"name": "account", "type": "name"},
        {"name": "sequence", "type": "uint64"}]},
      {"name": "action_receipt_v0", "base": "", "fields": [
        {"name": "receiver", "type": "name"},
        {"name": "act_digest", "type": "checksum256"},
        {"name": "global_sequence", "type": "uint64"},
        {"name": "recv_sequence", "type": "uint64"},
        {"name": "auth_sequence", "type": "account_auth_sequence[]"},
        {"name": "code_sequence", "type": "varuint32"},
        {"name": "abi_sequence", "type": "varuint32"}]},
      {"name": "account_delta", "base": "", "fields": [
        {"name": "account", "type": "name"},
        {"name": "delta", "type": "int64"}]},
      {"name": "action_trace_v0", "base": "", "fields": [
        {"name": "action_ordinal", "type": "varuint32"},
        {"name": "creator_action_ordinal", "type": "varuint32"},
        {"name": "receipt", "type": "action_receipt?"},
        {"name": "receiver", "type": "name"},
        {"name": "act", "type": "action"},
        {"name": "context_free", "type": "bool"},
        {"name": "elapsed", "type": "int64"},
        {"name": "console", "type": "string"},
        {"name": "account_ram_deltas", "type": "account_delta[]"},
        {"name": "except", "type": "string?"},
        {"name": "error_code", "type": "uint64?"}]},
      {"name": "action_trace_v1", "base": "", "fields": [
        {"name": "action_ordinal", "type": "varuint32"},
        {"name": "creator_action_ordinal", "type": "varuint32"},
        {"name": "receipt", "type": "action_receipt?"},
        {"name": "receiver", "type": "name"},
        {"name": "act", "type": "action"},
        {"name": "context_free", "type": "bool"},
        {"name": "elapsed", "type": "int64"},
        {"name": "console", "type": "string"},
        {"name": "account_ram_deltas", "type": "account_delta[]"},
        {"name": "except", "type": "string?"},
        {"name": "error_code", "type": "uint64?"},
        {"name": "return_value", "type": "bytes"}]},
      {"name": "partial_transaction_v0", "base": "", "fields": [
        {"name": "expiration", "type": "time_point_sec"},
        {"name": "ref_block_num", "type": "uint16"},
        {"name": "ref_block_prefix", "type": "uint32"},
        {"name": "max_net_usage_words", "type": "varuint32"},
        {"name": "max_cpu_usage_ms", "type": "uint8"},
        {"name": "delay_sec", "type": "varuint32"},
        {"name": "transaction_extensions", "type": "extension[]"},
        {"name": "signatures", "type": "signature[]"},
        {"name": "context_free_data", "type": "bytes[]"}]},
      {"name": "transaction_trace_v0", "base": "", "fields": [
        {"name": "id", "type": "checksum256"},
        {"name": "status", "type": "uint8"},
        {"name": "cpu_usage_us", "type": "uint32"},
        {"name": "net_usage_words", "type": "varuint32"},
        {"name": "elapsed", "type": "int64"},
        {"name": "net_usage", "type": "uint64"},
        {"name": "scheduled", "type": "bool"},
        {"name": "action_traces", "type": "action_trace[]"},
        {"name": "account_ram_delta", "type": "account_delta?"},
        {"name": "except", "type": "string?"},
        {"name": "error_code", "type": "uint64?"},
        {"name": "failed_dtrx_trace", "type": "transaction_trace?"},
        {"name": "partial", "type": "partial_transaction?"}]},
      {"name": "extension", "base": "", "fields": [
        {"name": "type", "type": "uint16"},
        {"name": "data", "type": "bytes"}]},
      {"name": "producer_key", "base": "", "fields": [
        {"name": "producer_name", "type": "name"},
        {"name": "block_signing_key", "type": "public_key"}]},
      {"name": "producer_schedule", "base": "", "fields": [
        {"name": "version", "type": "uint32"},
        {"name": "producers", "type": "producer_key[]"}]},
      {"name": "block_header", "base": "", "fields": [
        {"name": "timestamp", "type": "block_timestamp_type"},
        {"name": "producer", "type": "name"},
        {"name": "confirmed", "type": "uint16"},
        {"name": "previous", "type": "checksum256"},
        {"name": "transaction_mroot", "type": "checksum256"},
        {"name": "action_mroot", "type": "checksum256"},
        {"name": "schedule_version", "type": "uint32"},
        {"name": "new_producers", "type": "producer_schedule?"},
        {"name": "header_extensions", "type": "extension[]"}]},
      {"name": "signed_block_header", "base": "block_header", "fields": [
        {"name": "producer_signature", "type": "signature"}]},
      {"name": "transaction_receipt_header", "base": "", "fields": [
        {"name": "status", "type": "uint8"},
        {"name": "cpu_usage_us", "type": "uint32"},
        {"name": "net_usage_words", "type": "varuint32"}]},
      {"name": "packed_transaction", "base": "", "fields": [
        {"name": "signatures", "type": "signature[]"},
        {"name": "compression", "type": "uint8"},
        {"name": "packed_context_free_data", "type": "bytes"},
        {"name": "packed_trx", "type": "bytes"}]},
      {"name": "transaction_receipt", "base": "transaction_receipt_header", "fields": [
        {"name": "trx", "type": "transaction_variant"}]},
      {"name": "signed_block", "base": "signed_block_header", "fields": [
        {"name": "transactions", "type": "transaction_receipt[]"},
        {"name": "block_extensions", "type": "extension[]"}]}
    ],
    "variants": [
      {"name": "request", "types": ["get_status_request_v0", "get_blocks_request_v0", "get_blocks_ack_request_v0"]},
      {"name": "result", "types": ["get_status_result_v0", "get_blocks_result_v0"]},
      {"name": "action_receipt", "types": ["action_receipt_v0"]},
      {"name": "action_trace", "types": ["action_trace_v0", "action_trace_v1"]},
      {"name": "partial_transaction", "types": ["partial_transaction_v0"]},
      {"name": "transaction_trace", "types": ["transaction_trace_v0"]},
      {"name": "transaction_variant", "types": ["transaction_id", "packed_transaction"]},
      {"name": "table_delta", "types": ["table_delta_v0"]}
    ]
  }"""

  /** Parsed once per JVM — the ABI is metadata-sized and immutable. */
  lazy val abi: AntelopeAbi.Abi = AntelopeAbi.parseAbi(ShipAbi)

  /** Parse the node's FIRST websocket frame (the protocol ABI as JSON
    * text) into the decode ABI. A live reader should prefer this over
    * the bundled [[ShipAbi]] copy: binary field order is
    * wire-significant, so decoding against the ABI the node actually
    * shipped is immune to protocol revisions (the reference does the
    * same — state-reader.ts feeds the first frame's ABI to its
    * deserializer).
    */
  def abiFromFirstFrame(abiJson: String): AntelopeAbi.Abi =
    AntelopeAbi.parseAbi(abiJson)

  /** Decode one binary `result` frame to its JSON form
    * (`["get_blocks_result_v0", {…}]`) — step 2 of the protocol.
    */
  def decodeResult(frame: Array[Byte]): String =
    AntelopeAbi.binToJson(abi, "result", frame)

  /** Encode a `request` frame (`["get_blocks_request_v0", {…}]` etc.)
    * — the reference's `send()` direction.
    */
  def encodeRequest(json: String): Array[Byte] =
    AntelopeAbi.jsonToBin(abi, "request", json)

  /** Encode a `result` frame — the fixture direction (a replayed node). */
  def encodeResult(json: String): Array[Byte] =
    AntelopeAbi.jsonToBin(abi, "result", json)

  // ------------------------------------------------------- blocks walk

  /** One decoded `get_blocks_result_v0`, flattened to the light-block
    * rollup shape the reference derives in processBlock
    * (deserializer.ts:277-330) — block position/linkage, header
    * fields, and the trace/delta tallies of the nested binaries.
    * `corrupt` rows (null block_id) are frames that failed ABI decode.
    */
  final case class BlockRow(
      block_num: Long,
      block_id: String,
      prev_id: String,
      head_num: Long,
      lib_num: Long,
      producer: String,
      schedule_version: Long,
      timestamp: String,
      trx_count: Long, // transaction receipts in the signed block
      cpu_total: Long, // sum of receipt cpu_usage_us
      n_traces: Long, // transaction traces
      n_actions: Long, // action traces across them
      min_gs: java.lang.Long, // receipt global_sequence extremes
      max_gs: java.lang.Long,
      n_delta_rows: Long,
      n_deltas_present: Long,
      corrupt: Boolean)

  private def jLong(v: JValue): Long = v match {
    case JInt(n) => n.toLong
    case JLong(n) => n
    case JString(s) => s.toLong // 64-bit ints render as strings
    case JDouble(d) => d.toLong
    case other => throw new IllegalArgumentException(s"not a number: $other")
  }
  private def jStr(v: JValue): String = v match {
    case JString(s) => s
    case other => throw new IllegalArgumentException(s"not a string: $other")
  }

  /** Decode one frame into a [[BlockRow]]; a frame that is not a
    * non-idle `get_blocks_result_v0` (status results, head-of-chain
    * idle frames without `this_block`) yields None; an undecodable
    * frame yields a corrupt row.
    */
  def blockRow(frame: Array[Byte]): Option[BlockRow] = blockRow(frame, abi)

  /** As [[blockRow]], decoding against a caller-supplied ABI (e.g. the
    * one the node shipped in its first frame — [[abiFromFirstFrame]]).
    */
  def blockRow(frame: Array[Byte], abi: AntelopeAbi.Abi): Option[BlockRow] = {
    try {
      val parsed = JsonMethods.parse(AntelopeAbi.binToJson(abi, "result", frame))
      val JArray(List(JString(kind), res)) = parsed: @unchecked
      if (kind != "get_blocks_result_v0") return None
      if (res \ "this_block" == JNull) return None // idle frame
      val thisB = res \ "this_block"
      val headNum = jLong(res \ "head" \ "block_num")
      val libNum = jLong(res \ "last_irreversible" \ "block_num")
      val prevId = res \ "prev_block" match {
        case JNull | JNothing => null
        case p => jStr(p \ "block_id")
      }
      // nested binaries decode against the same ABI (parser.ts:103,134,143)
      var producer: String = null
      var schedVer = 0L
      var ts: String = null
      var trxCount = 0L
      var cpuTotal = 0L
      (res \ "block") match {
        case JNull | JNothing => ()
        case b =>
          val blk = JsonMethods.parse(
            AntelopeAbi.hexToJson(abi, "signed_block", jStr(b)))
          producer = jStr(blk \ "producer")
          schedVer = jLong(blk \ "schedule_version")
          ts = jStr(blk \ "timestamp")
          val JArray(txs) = (blk \ "transactions"): @unchecked
          trxCount = txs.length.toLong
          cpuTotal = txs.map(t => jLong(t \ "cpu_usage_us")).sum
      }
      var nTraces = 0L
      var nActions = 0L
      var minGs: java.lang.Long = null
      var maxGs: java.lang.Long = null
      (res \ "traces") match {
        case JNull | JNothing => ()
        case t =>
          val traces = JsonMethods.parse(
            AntelopeAbi.hexToJson(abi, "transaction_trace[]", jStr(t)))
          val JArray(list) = traces: @unchecked
          nTraces = list.length.toLong
          list.foreach { arm =>
            val JArray(List(JString(_), tv)) = arm: @unchecked
            val JArray(ats) = (tv \ "action_traces"): @unchecked
            nActions += ats.length
            ats.foreach { at =>
              val JArray(List(JString(_), atv)) = at: @unchecked
              atv \ "receipt" match {
                case JNull | JNothing => ()
                case r =>
                  val JArray(List(JString(_), rv)) = r: @unchecked
                  val gs = jLong(rv \ "global_sequence")
                  if (minGs == null || gs < minGs) minGs = gs
                  if (maxGs == null || gs > maxGs) maxGs = gs
              }
            }
          }
      }
      var nRows = 0L
      var nPresent = 0L
      (res \ "deltas") match {
        case JNull | JNothing => ()
        case d =>
          val deltas = JsonMethods.parse(
            AntelopeAbi.hexToJson(abi, "table_delta[]", jStr(d)))
          val JArray(list) = deltas: @unchecked
          list.foreach { arm =>
            val JArray(List(JString(_), dv)) = arm: @unchecked
            val JArray(rows) = (dv \ "rows"): @unchecked
            nRows += rows.length
            nPresent += rows.count(r => (r \ "present") == JBool(true))
          }
      }
      Some(BlockRow(jLong(thisB \ "block_num"), jStr(thisB \ "block_id"),
        prevId, headNum, libNum, producer, schedVer, ts, trxCount, cpuTotal,
        nTraces, nActions, minGs, maxGs, nRows, nPresent, corrupt = false))
    } catch {
      case _: Exception => Some(BlockRow(-1L, null, null, -1L, -1L, null,
        -1L, null, 0L, 0L, 0L, 0L, null, null, 0L, 0L, corrupt = true))
    }
  }

  /** Partition-parallel wire walk over (frame) rows. When `abiJson`
    * is given (the node's first frame), every partition decodes
    * against THAT ABI — parsed once per partition, metadata-sized —
    * instead of the bundled copy.
    */
  def parseFrames(frames: org.apache.spark.sql.DataFrame,
      abiJson: Option[String] = None)(
      implicit spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.Dataset[BlockRow] = {
    import spark.implicits._
    frames.select("frame").as[Array[Byte]]
      .mapPartitions { it =>
        val a = abiJson.map(abiFromFirstFrame).getOrElse(abi)
        it.flatMap(blockRow(_, a))
      }
  }

  // ---------------------------------------------------------- fixtures

  /** One replayed-node `get_blocks_result_v0` frame for a block of
    * events — every derived field is a closed form of
    * (event_id, user_id, event_type) so a SQL oracle can replay the
    * decode rollup. Both `action_trace` arms are exercised (v1 on
    * even event ids, v0 on odd); deltas carry a present flag on
    * `event_id % 3 != 0`.
    */
  def fixtureFrame(blockNum: Long,
      events: Seq[(Long, Long, String)]): Array[Byte] = {
    def id64(n: Long): String = f"$n%064X"
    def userName(u: Long) = s"user${('a' + (u % 20)).toChar}"
    val producer = s"prod${('a' + (blockNum % 5)).toChar}"
    val sb = new java.lang.StringBuilder(4096)
    def pos(n: Long): String =
      s"""{"block_num":$n,"block_id":"${id64(n)}"}"""
    // signed_block: one transaction receipt per event
    val txs = events.map { case (e, _, _) =>
      s"""{"status":0,"cpu_usage_us":${e % 1000 + 10},"net_usage_words":${e % 50},"trx":["transaction_id","${id64(e)}"]}"""
    }.mkString(",")
    val slot = blockNum * 2 // deterministic block_timestamp slot
    val tsMs = 946684800000L + slot * 500L // block epoch 2000-01-01
    val tsIso = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS")
      .format(java.time.LocalDateTime.ofInstant(
        java.time.Instant.ofEpochMilli(tsMs), java.time.ZoneOffset.UTC))
    // a VALID base58check signature over deterministic bytes (the
    // encoder verifies the checksum, so a made-up string would throw)
    val sigBytes = Array.tabulate[Byte](65)(i => ((blockNum + i) % 251).toByte)
    val sig = graft.functions.AntelopeKeys.encodeChecked("SIG_K1_", sigBytes, "K1")
    val blockJson =
      s"""{"timestamp":"$tsIso","producer":"$producer","confirmed":0,
          "previous":"${id64(blockNum - 1)}",
          "transaction_mroot":"${id64(0)}","action_mroot":"${id64(0)}",
          "schedule_version":1,"new_producers":null,"header_extensions":[],
          "producer_signature":"$sig",
          "transactions":[$txs],"block_extensions":[]}"""
    val traces = events.map { case (e, u, et) =>
      val receipt =
        s"""["action_receipt_v0",{"receiver":"${userName(u)}",
            "act_digest":"${id64(e)}","global_sequence":${1000000L + e},
            "recv_sequence":${e % 97},
            "auth_sequence":[{"account":"${userName(u)}","sequence":${e % 13}}],
            "code_sequence":1,"abi_sequence":1}]"""
      val actBody =
        s""""receipt":$receipt,"receiver":"${userName(u)}",
            "act":{"account":"graft.token","name":"$et",
              "authorization":[{"actor":"${userName(u)}","permission":"active"}],
              "data":"${f"${e % 251}%02X"}"},
            "context_free":false,"elapsed":${e % 5000},"console":"",
            "account_ram_deltas":[],"except":null,"error_code":null"""
      val at =
        if (e % 2 == 0)
          s"""["action_trace_v1",{"action_ordinal":1,"creator_action_ordinal":0,
              $actBody,"return_value":""}]"""
        else
          s"""["action_trace_v0",{"action_ordinal":1,"creator_action_ordinal":0,
              $actBody}]"""
      s"""["transaction_trace_v0",{"id":"${id64(e)}","status":0,
          "cpu_usage_us":${e % 1000 + 10},"net_usage_words":${e % 50},
          "elapsed":${e % 5000},"net_usage":${8 * (e % 50)},"scheduled":false,
          "action_traces":[$at],"account_ram_delta":null,"except":null,
          "error_code":null,"failed_dtrx_trace":null,"partial":null}]"""
    }.mkString(",")
    val deltaRows = events.map { case (e, _, _) =>
      s"""{"present":${e % 3 != 0},"data":"${f"${e % 251}%02X${e % 17}%02X"}"}"""
    }.mkString(",")
    val deltas = s"""["table_delta_v0",{"name":"contract_row","rows":[$deltaRows]}]"""
    def hex(b: Array[Byte]) = b.map(x => f"$x%02X").mkString
    val blockBin = hex(AntelopeAbi.jsonToBin(abi, "signed_block", blockJson))
    val tracesBin = hex(AntelopeAbi.jsonToBin(abi, "transaction_trace[]", s"[$traces]"))
    val deltasBin = hex(AntelopeAbi.jsonToBin(abi, "table_delta[]", s"[$deltas]"))
    sb.append("[\"get_blocks_result_v0\",{")
      .append(s""""head":${pos(blockNum)},""")
      .append(s""""last_irreversible":${pos(math.max(1L, blockNum - 10))},""")
      .append(s""""this_block":${pos(blockNum)},""")
      .append(s""""prev_block":${pos(blockNum - 1)},""")
      .append(s""""block":"$blockBin",""")
      .append(s""""traces":"$tracesBin",""")
      .append(s""""deltas":"$deltasBin"}]""")
    encodeResult(sb.toString)
  }
}
