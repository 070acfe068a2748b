package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's synthetic parquet tables (TESTDATA.md).
  *
  * All timestamp columns are normalized to session-local TIMESTAMP (the
  * session runs in UTC) so that comparisons and `unix_timestamp` behave
  * identically to the DuckDB oracle, which treats naive parquet
  * timestamps as UTC. The `events.ts` column is written with nanosecond
  * precision; Spark truncates to microseconds on read, which is fine for
  * every query here (DuckDB results are compared after truncation to
  * micro-or-coarser granularity in all declared oracles).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame =
    table(s, d, "orders").withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
  def lineitem(s: SparkSession, d: String): DataFrame =
    table(s, d, "lineitem").withColumn("l_shipdate", col("l_shipdate").cast("timestamp"))
  def events(s: SparkSession, d: String): DataFrame = {
    // events.ts has shipped as three parquet footer shapes across driver
    // testdata refreshes — TIMESTAMP(NANOS) (Spark rejects natively; read
    // as raw int64 via nanosAsLong and truncate to micros), TIMESTAMP
    // (MICROS, isAdjustedToUTC=false) (reads as TIMESTAMP_NTZ; the session
    // runs in UTC, so an NTZ→LTZ cast is value-identical to how DuckDB
    // treats the same naive micros), and plain session-local TIMESTAMP
    // (e.g. ScaleUp's rewritten copy — passes through). Normalizing all
    // three here keeps every downstream query and oracle shape-agnostic.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
