package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing for the suffix-array dedup path: build-only,
  * pairing+LCP, and rollup, at SPARK_GRAFT_SF_DIR. One JSON line.
  */
object BenchSuffix {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val s: SparkSession = spark
    import graft.operators.SuffixArray
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("source"), col("text"))
    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val (_, tBuildOrder) = t {
      val sa = SuffixArray.build(docs, "doc_id", "text")
      sa.order.count() // materialize the full doubling chain
    }
    val (_, tFull) = t {
      SuffixArray.repeatLengths(docs, "doc_id", "text").count()
    }
    val (_, tPairs) = t {
      val sa = SuffixArray.build(docs, "doc_id", "text")
      val (pairs, h) = SuffixArray.adjacentLcp(sa, docs, "doc_id", "text")
      pairs.count()
      h.unpersist()
    }
    println(s"""{"metric":"suffix_stages","build_order_sec":$tBuildOrder,""" +
      s""""pairs_lcp_sec":$tPairs,"full_sec":$tFull,"sf":"$sfDir"}""")
    spark.stop()
  }
}
