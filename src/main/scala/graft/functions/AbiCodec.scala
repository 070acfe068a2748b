package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The pluggable ABI codec boundary (C8) — in the reference, hex action
  * payloads are decoded against the as-of ABI by a native codec
  * (abieos with an Antelope Serializer fallback,
  * src/indexer/workers/deserializer.ts:869-908), with a retry ladder and
  * auto-blacklist for undecodable types; decode failure is recorded as
  * `ds_error` rather than dropping the row.
  *
  * Engine-side, the codec is a registered function `(hex, abiJson) →
  * dataJson` behind this boundary; the engine itself ingests pre-decoded
  * JSON (per SURVEY §2.9 C8) and models only the *fallback/ds_error
  * semantics*, which is the part that affects query results:
  *
  *   - decode success → decoded JSON in `data`
  *   - decode failure → original payload preserved, `ds_error = true`
  *
  * `withDecoder` installs a real codec as a Scala function (it runs as a
  * deserializing UDF — the one place the engine accepts a UDF, because
  * the work is an external native call, not columnar math).
  */
object AbiCodec {

  type Decoder = (String, String) => Option[String] // (hex, abi) → json

  /** Stub decoder used in tests: "decodes" payloads shaped `hex:<json>`
    * by stripping the prefix; anything else fails → ds_error.
    */
  val stubDecoder: Decoder = (hex, _) =>
    if (hex != null && hex.startsWith("hex:")) Some(hex.substring(4)) else None

  /** Apply the decode ladder to a DataFrame with (payload, abi) columns:
    * produces `data` (decoded or original payload) + `ds_error`.
    */
  def decode(df: DataFrame, payloadCol: String, abiCol: String,
      decoder: Decoder = stubDecoder): DataFrame = {
    val dec = udf(decoder)
    df.withColumn("__decoded", dec(col(payloadCol), col(abiCol)))
      .withColumn("ds_error", col("__decoded").isNull)
      .withColumn("data", coalesce(col("__decoded"), col(payloadCol)))
      .drop("__decoded")
  }

  // --------------------------------------------------------- real hex codec

  /** Per-JVM cache of parsed ABIs keyed by the ABI JSON text. ABIs repeat
    * per contract (a handful of distinct strings across billions of rows),
    * so the cache is metadata-sized; bounded defensively anyway.
    */
  private val abiCache =
    new java.util.concurrent.ConcurrentHashMap[String, AntelopeAbi.Abi]()

  private def cachedAbi(abiJson: String): AntelopeAbi.Abi = {
    if (abiCache.size > 1024) abiCache.clear()
    abiCache.computeIfAbsent(abiJson, AntelopeAbi.parseAbi(_))
  }

  /** The real pure-Scala codec (AntelopeAbi) as a ladder decoder for
    * ACTION payloads: resolves the action's type from the ABI's `actions`
    * binding, then decodes the raw hex against the ABI's structs. Any
    * failure — unknown action, unknown type, truncated or trailing bytes,
    * bad hex — returns None, which the ladder records as `ds_error`.
    */
  def hexActionDecoder(actionName: String): Decoder = (hex, abiJson) =>
    try {
      val abi = cachedAbi(abiJson)
      abi.actionType(actionName).map(t => AntelopeAbi.hexToJson(abi, t, hex))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Decode raw hex ACTION payloads against per-row (abi, action-name)
    * columns with the full ds_error ladder — the engine-side equivalent of
    * `processActionNative` (deserializer.ts:869-908): type lookup, decode,
    * failure → original payload + ds_error.
    *
    * Runs as a 3-arg deserializing UDF — the documented single UDF
    * exception at this boundary (an external-format codec, not columnar
    * math); the per-row cost is the codec itself, the ABI parse amortizes
    * through the executor-local cache.
    */
  /** (hex, abiJson, actionName) → decoded JSON, via the pure-Scala codec. */
  val defaultHexDecoder: (String, String, String) => Option[String] =
    (hex, abiJson, name) =>
      if (hex == null || abiJson == null || name == null) None
      else hexActionDecoder(name)(hex, abiJson)

  def decodeHex(df: DataFrame, payloadCol: String, abiCol: String,
      nameCol: String): DataFrame = {
    val dec = udf(defaultHexDecoder)
    df.withColumn("__decoded", dec(col(payloadCol), col(abiCol), col(nameCol)))
      .withColumn("ds_error", col("__decoded").isNull)
      .withColumn("data", coalesce(col("__decoded"), col(payloadCol)))
      .drop("__decoded")
  }

  /** [[decodeHex]] with a pre-derived blacklist wired in — the
    * `ds_blacklist` check of deserializer.ts:760-776: a (code, action)
    * pair on the list skips the codec entirely (the branch guard keeps
    * the UDF uninvoked for those rows) and goes straight to the
    * ds_error passthrough, with `ds_blacklisted` marking the skip.
    *
    * `blacklist` is [[autoBlacklist]]'s output (`rule` = "code::name") —
    * metadata-sized (distinct undecodable pairs), hence broadcast.
    */
  def decodeHexBlacklisted(df: DataFrame, payloadCol: String, abiCol: String,
      codeCol: String, nameCol: String, blacklist: DataFrame,
      decoder: (String, String, String) => Option[String] = defaultHexDecoder): DataFrame = {
    val dec = udf(decoder)
    df.join(broadcast(blacklist.select(col("rule"))),
        concat(col(codeCol), lit("::"), col(nameCol)) === col("rule"), "left")
      .withColumn("__decoded",
        when(col("rule").isNull, dec(col(payloadCol), col(abiCol), col(nameCol))))
      .withColumn("ds_blacklisted", col("rule").isNotNull)
      .withColumn("ds_error", col("__decoded").isNull)
      .withColumn("data", coalesce(col("__decoded"), col(payloadCol)))
      .drop("__decoded", "rule")
  }

  /** Re-encode decoded JSON back to hex (`hex_data` on the v1 get_actions
    * response — the reference's issue #133 path, where only ABI-declared
    * fields serialize and extra JSON fields are ignored). Failure → null.
    */
  def encodeHex(df: DataFrame, dataCol: String, abiCol: String,
      nameCol: String): DataFrame = {
    val enc = udf { (json: String, abiJson: String, name: String) =>
      if (json == null || abiJson == null || name == null) None
      else try {
        val abi = cachedAbi(abiJson)
        abi.actionType(name).map(t => AntelopeAbi.jsonToHex(abi, t, json))
      } catch { case scala.util.control.NonFatal(_) => None }
    }
    df.withColumn("hex_data", enc(col(dataCol), col(abiCol), col(nameCol)))
  }

  /** Auto-blacklist derivation (deserializer.ts:760-776): contract/action
    * pairs whose decode failure rate is total get skipped on future
    * passes — recomputed from history instead of kept as mutable state.
    */
  def autoBlacklist(decoded: DataFrame, codeCol: String, nameCol: String,
      minAttempts: Long = 3): DataFrame =
    decoded.groupBy(col(codeCol).as("code"), col(nameCol).as("name"))
      .agg(count(lit(1)).as("attempts"),
        sum(when(col("ds_error"), 1).otherwise(0)).as("failures"))
      .filter(col("attempts") >= minAttempts && col("failures") === col("attempts"))
      .select(concat(col("code"), lit("::"), col("name")).as("rule"))
}
