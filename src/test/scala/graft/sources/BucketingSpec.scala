package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.Exchange

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed-by-key join plans with no Exchange (co-located join)") {
    val warehouse = java.nio.file.Files.createTempDirectory("graft_wh").toString
    // managed tables land in the session warehouse; use unique names
    val left = (1L to 1000L).map(i => (i, s"payload$i")).toDF("k", "p")
    val right = (1L to 1000L).filter(_ % 2 == 0).map(i => (i, i * 10)).toDF("k", "v")
    Bucketing.writeBucketed(left, "bk_left", "k", 8, sortCols = Seq("k"))
    Bucketing.writeBucketed(right, "bk_right", "k", 8, sortCols = Seq("k"))
    try {
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      try {
        val joined = Bucketing.colocatedJoin(spark, "bk_left", "bk_right", "k")
        val exchanges = joined.queryExecution.executedPlan.collect { case e: Exchange => e }
        assert(exchanges.isEmpty, s"expected no shuffle, got: $exchanges")
        assert(joined.count() === 500)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bk_left")
      spark.sql("DROP TABLE IF EXISTS bk_right")
    }
  }
}
