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
    // events.ts is parquet TIMESTAMP(NANOS) which Spark rejects natively;
    // read the raw int64 nanos and truncate to microseconds (matches what
    // any micro-precision consumer of this column observes). A rewritten
    // copy of the table (e.g. ScaleUp's) already carries micros — pass
    // that through unchanged.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
