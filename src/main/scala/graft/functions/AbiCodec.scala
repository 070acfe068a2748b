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
