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

  /** RFC 4180 record splitting over whole-file CSV blobs — the part a
    * line-based reader gets WRONG: a quoted field may contain the
    * record delimiter itself, so record boundaries require quote-state
    * tracking (newline outside quotes splits; inside quotes it is
    * data; `""` is an escaped quote, not a state change). An unclosed
    * quote at end-of-blob yields the tail as ONE record flagged
    * unterminated. Per-blob linear scan, partition-parallel.
    */
  private[operators] def splitCsvRecords(blob: String): Seq[(String, Boolean)] = {
    val out = scala.collection.mutable.Buffer.empty[(String, Boolean)]
    val n = blob.length
    var start = 0
    var i = 0
    var inQuote = false
    while (i < n) {
      val c = blob.charAt(i)
      if (inQuote) {
        if (c == '"') {
          if (i + 1 < n && blob.charAt(i + 1) == '"') i += 1 // escaped quote
          else inQuote = false
        }
      } else {
        if (c == '"') inQuote = true
        else if (c == '\n') {
          val end = if (i > start && blob.charAt(i - 1) == '\r') i - 1 else i
          if (end > start) out += ((blob.substring(start, end), false))
          start = i + 1
        }
      }
      i += 1
    }
    if (start < n) {
      val tail = blob.substring(start)
      if (tail.nonEmpty) out += ((tail, inQuote)) // unterminated-quote flag
    }
    out.toSeq
  }

  /** Split (doc_id, blob) CSV files into records, partition-parallel. */
  def csvRecords(blobs: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col(idCol).cast("long"), col(blobCol)).as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, blob) =>
        splitCsvRecords(if (blob == null) "" else blob)
          .map { case (rec, unterminated) => (id, rec, unterminated) }
      })
      .toDF("blob_id", "record", "unterminated")
  }

  /** Parse a CSV record column against a DDL schema (RFC 4180 quoting:
    * quote-doubling escape, not backslash). PERMISSIVE: a malformed
    * field (type failure, broken quoting) fills the corrupt-record
    * column; missing trailing fields parse as nulls (schema-on-read
    * tolerance), matching the [[jsonl]] contract.
    */
  def csv(records: DataFrame, recCol: String, ddl: String): DataFrame = {
    val unterminated =
      if (records.columns.contains("unterminated")) col("unterminated")
      else lit(false)
    records
      .withColumn("rec", from_csv(col(recCol),
        org.apache.spark.sql.types.StructType.fromDDL(s"$ddl, _corrupt_record STRING"),
        Map(
          "columnNameOfCorruptRecord" -> "_corrupt_record",
          "escape" -> "\"",
          "mode" -> "PERMISSIVE")))
      .withColumn("is_corrupt",
        col("rec").isNull || col("rec._corrupt_record").isNotNull || unterminated)
  }
}
