package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corrupt-tolerant raw-text ingest — the schema-on-read front door of
  * a training-data pipeline: JSONL arrives with truncated lines,
  * missing fields, and junk, and the engine must classify rather than
  * crash (the reference's ingest ladder demotes undecodable payloads
  * the same way — `src/indexer` decoding fallbacks — rather than
  * failing the stream).
  *
  * Semantics (Spark's PERMISSIVE `from_json`, pinned by RawIngestSpec):
  *   - an unparseable line fills the corrupt-record column with the raw
  *     line (Spark 4 PERMISSIVE returns an ALL-NULL struct for bad
  *     records, NOT a null struct — detection must go through
  *     `columnNameOfCorruptRecord`, not `rec IS NULL`) → `is_corrupt`,
  *     raw line retained for quarantine;
  *   - a parseable line with MISSING fields parses with nulls and is
  *     NOT corrupt (schema-on-read tolerance, not strictness);
  *   - classification is per-line — no driver loop, no exception path,
  *     linear in bytes at any scale.
  */
object RawIngest {

  /** Parse a JSONL line column against a DDL schema. Returns the input
    * plus `rec` (the parsed struct; its `_corrupt_record` field holds
    * the raw line iff unparseable) and `is_corrupt`.
    */
  def jsonl(lines: DataFrame, lineCol: String, ddl: String): DataFrame =
    lines
      .withColumn("rec", from_json(col(lineCol), s"$ddl, _corrupt_record STRING",
        Map("columnNameOfCorruptRecord" -> "_corrupt_record")))
      .withColumn("is_corrupt",
        col("rec").isNull || col("rec._corrupt_record").isNotNull)
}
